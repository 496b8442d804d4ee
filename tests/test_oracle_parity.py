"""Every SQL-oracled query must hash-match its DuckDB twin (driver's t2 gate)."""

import pytest

from dynamodb_pitr_restore_cdc_spark.registry import all_queries

from .parity import assert_parity, run_oracle

SPECS = all_queries()
ORACLED = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, sf_dir)
    odf = run_oracle(spec.oracle, sf_dir)
    assert_parity(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
