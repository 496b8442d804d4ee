"""Every SQL-oracled query must hash-match its DuckDB twin (driver's t2 gate).

Execution order is REGISTRY order (`all_queries()` dict order), not
alphabetical — round-13 structural fix. The driver evaluates queries in
registry/window order inside one session; until r12 this suite ran
alphabetically, so a query that mutated a session-shared artifact could
pass locally for six rounds and crash at the driver the first time the
window ordered the mutator before a reader (`q_cdc_time_travel` expired
v1 of the shared sink before `q_cdc_history` read it — the r12 red
row). Running the SAME order the driver runs makes that class of bug
fire here first. pytest executes parametrized cases in list order
within a module, so the list below IS the execution order.
"""

import pytest

from dynamodb_pitr_restore_cdc_spark.registry import all_queries

from .parity import assert_parity, run_oracle

SPECS = all_queries()
# registry order, NOT sorted(): matches the driver's execution order
ORACLED = [n for n, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in SPECS.items() if s.oracle is None]


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
