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


def test_bench_headline_queries_exist():
    # bench.py's one-line summary must only name registered queries
    import bench

    assert set(bench.HEADLINE) <= set(SPECS)


def test_release_persisted_frees_builder_caches(spark):
    """The round-2 leak class: builder-side persist/cache that outlives
    its run. Every persist in these builders must go through
    tracked_persist, so running them + release_persisted() leaves the
    session's persistent-RDD set no larger than before. (Queries using
    localCheckpoint are excluded — those RDDs are freed by the
    ContextCleaner on GC, not by unpersist.)"""
    from dynamodb_pitr_restore_cdc_spark.registry import release_persisted

    names = [
        "q_llm_jaccard_exact",
        "q_llm_simhash_pairs",
        "q_llm_near_dedup",
        "q_llm_dedup_clusters",
        "q_llm_embed_neardup",
        "q_scan_json_source",
        "q_sink_roundtrip",
    ]
    # warm the per-corpus artifacts first: the LSH band store and the
    # IVF index (whose trainer localCheckpoints the centroids) are
    # SESSION-lifetime by design — build them before measuring so the
    # loop below exercises only per-run builder caches
    from dynamodb_pitr_restore_cdc_spark.llm.dedup import band_buckets
    from dynamodb_pitr_restore_cdc_spark.llm.similarity import _cell_members

    band_buckets(spark, SF)
    _cell_members(spark, SF)
    release_persisted()  # start from a clean tracked list
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for n in names:
        df = SPECS[n].builder(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        release_persisted()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before, f"persist leak: {before} cached RDDs before, {after} after"
