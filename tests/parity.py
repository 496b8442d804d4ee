"""Local replica of the driver's oracle-differential check (SURVEY.md §5.2).

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet fixtures, then compares row count, column names, and values
order-insensitively (columns sorted by name, rows sorted by all
columns) — the same discipline the driver's value-hash implies, but
with readable diffs on mismatch.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from dynamodb_pitr_restore_cdc_spark.sources.fixtures import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    sort_cols = list(df.columns)
    if sort_cols:
        df = df.sort_values(sort_cols, na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def assert_parity(spark_df, oracle_pdf: pd.DataFrame, name: str, float_atol: float = 0.0):
    from dynamodb_pitr_restore_cdc_spark.registry import release_persisted

    raw_got, raw_want = spark_df.toPandas(), oracle_pdf
    release_persisted()  # builder persists are consumed once toPandas lands
    # STRICT dtype agreement before any normalization: the driver's
    # schema check may compare bit widths (int32 vs int64, HUGEINT
    # surfacing as float64), which value comparison would mask
    for c in raw_got.columns:
        if c in raw_want.columns:
            assert str(raw_got[c].dtype) == str(raw_want[c].dtype), (
                f"{name}: dtype mismatch on {c}: "
                f"spark={raw_got[c].dtype} oracle={raw_want[c].dtype}"
            )
    got = _normalize(raw_got)
    want = _normalize(raw_want)

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"

    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            both_nan = g.isna() & w.isna()
            close = np.isclose(g.fillna(0), w.fillna(0), rtol=0, atol=max(float_atol, 1e-9))
            ok = both_nan | (close & (g.isna() == w.isna()))
            if not ok.all():
                bad = (~ok).idxmax()
                raise AssertionError(
                    f"{name}: float col {c} differs at row {bad}: "
                    f"spark={g.iloc[bad]!r} oracle={w.iloc[bad]!r}"
                )
            exact = (g.fillna(0) == w.fillna(0)) | both_nan
            if not exact.all():
                # driver hashes raw values — tolerate but surface non-bitwise floats
                n = int((~exact).sum())
                print(f"WARNING {name}: {n} float values in {c} equal only within 1e-9")
        else:
            eq = (g == w) | (g.isna() & w.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"{name}: col {c} differs at row {bad}: "
                    f"spark={g.iloc[bad]!r} oracle={w.iloc[bad]!r}"
                )
