"""Driver-contract probes for the `__spark_entry__` surface.

The external driver consumes entry()/queries()/oracle_sql() with its
own session and no engine imports; these tests pin the contract edges
the parity suite doesn't: key consistency between the two maps, clean
failure on a bad sf_dir, and same-session re-run idempotence (builders
that write temp artifacts must not collide with themselves).
"""

import pytest

from dynamodb_pitr_restore_cdc_spark.registry import all_queries, release_persisted

from .conftest import SF_SMOKE


def _entry():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_oracle_keys_subset_of_queries():
    e = _entry()
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs), set(osql) - set(qs)


def test_registry_is_entry_surface():
    # every registered query is exported, with oracle iff declared
    e = _entry()
    qs = e.queries()
    specs = all_queries()
    assert set(qs) == set(specs)
    assert set(e.oracle_sql()) == {n for n, s in specs.items() if s.oracle}


def test_bad_sf_dir_fails_cleanly(spark):
    from pyspark.errors.exceptions.captured import AnalysisException

    e = _entry()
    fn = e.queries()["q_scan_project_filter"]
    with pytest.raises(AnalysisException):
        fn(spark, "/root/testdata/sf-does-not-exist").collect()


@pytest.mark.parametrize(
    "name",
    [
        "q_scan_csv_source",       # temp CSV dir per call
        "q_scan_orc_source",       # temp ORC dir per call
        "q_cdc_schema_evolution",  # temp two-schema parquet dir per call
        "q_cdc_snapshot_rebuild",  # flagship
    ],
)
def test_rerun_same_session_is_idempotent(spark, name):
    e = _entry()
    fn = e.queries()[name]
    a = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    release_persisted()
    b = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    release_persisted()
    assert a == b
