"""Registry integrity: naming, uniqueness, and — most usefully for
future rounds — that every oracle SQL still COMPILES in DuckDB against
the fixture views (catches typos/dialect drift without running data)."""

import re

import duckdb

from dynamodb_pitr_restore_cdc_spark.registry import all_queries
from dynamodb_pitr_restore_cdc_spark.sources.fixtures import TABLES

SPECS = all_queries()
SF = "/root/testdata/sf0.001"


def test_names_are_wellformed_and_unique():
    assert len(SPECS) == len(set(SPECS))
    for name in SPECS:
        assert re.fullmatch(r"q_[a-z0-9_]+", name), name


def test_every_oracle_compiles_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    bad = []
    for name, spec in SPECS.items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001 - collecting all failures
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_builders_have_docstrings():
    missing = [n for n, s in SPECS.items() if not (s.builder.__doc__ or "").strip()]
    assert not missing, missing
