"""Direct tests of the engine-stable fixed-point discipline
(functions/rounding.py) — including the exact binary-representable tie
values (.125/.375/.625/.875) that defeat every float-side rounding
scheme, which is the whole reason the integer path exists."""

import duckdb
import pandas as pd
from decimal import Decimal, ROUND_HALF_UP

from dynamodb_pitr_restore_cdc_spark.functions.rounding import avg_div, cents, unit_div

TIE_VALUES = [0.125, 0.375, 0.625, 0.875, 2.675, 1.005, 1486.125, 13.155]


def _py_half_up(x_units: int, d: int) -> float:
    return float(
        (Decimal(x_units) / Decimal(d)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    ) / 100.0


def test_unit_div_matches_decimal_half_up(spark):
    # units of 1e-3 (d=10): every tie value expressed exactly as an int
    rows = [(int(round(v * 1000)),) for v in TIE_VALUES]
    df = spark.createDataFrame(rows, schema="u long")
    got = [r.out for r in df.select(unit_div("u", 10).alias("out")).collect()]
    want = [_py_half_up(int(round(v * 1000)), 10) for v in TIE_VALUES]
    assert got == want, list(zip(TIE_VALUES, got, want))


def test_unit_div_twin_agrees_with_duckdb(spark):
    rows = [(int(round(v * 1000)),) for v in TIE_VALUES]
    df = spark.createDataFrame(rows, schema="u long")
    got = [r.out for r in df.select(unit_div("u", 10).alias("out")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": [r[0] for r in rows]}))
    want = [r[0] for r in con.execute("SELECT ((u + 5) // 10) / 100.0 FROM t").fetchall()]
    assert got == want


def test_avg_div_half_up(spark):
    # avg of cent-sums: 301/3 = 100.333.. -> 100 cents; 302/3 -> 101;
    # exact half 101/2 = 50.5 -> 51 cents (half-up)
    df = spark.createDataFrame([(301, 3), (302, 3), (101, 2)], schema="s long, n long")
    got = [r.out for r in df.select(avg_div("s", "n").alias("out")).collect()]
    assert got == [1.00, 1.01, 0.51]


def test_cents_is_exact_on_two_decimal_inputs(spark):
    vals = [0.01, 0.07, 185.22, 99999.99, 0.0, 123.45]
    df = spark.createDataFrame([(v,) for v in vals], schema="x double")
    got = [r.c for r in df.select(cents("x").alias("c")).collect()]
    assert got == [int(round(v * 100)) for v in vals]
