"""Reranker packing invariants parity can't isolate (both engines
would compute the same wrong answer): the integer score must keep the
documented lexicographic priority coverage > phrase hits > gap — a
phrase-spam document must never outrank a higher-coverage one."""

import pandas as pd

from dynamodb_pitr_restore_cdc_spark.registry import all_queries, release_persisted

SPECS = all_queries()


def _corpus(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "src0"
    spark.createDataFrame(
        pdf, schema="doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_phrase_spam_cannot_outrank_coverage(spark, tmp_path):
    spam = "spark join " * 150  # coverage 2, ~149 phrase hits
    full = "spark alpha join beta data"  # coverage 3, no adjacent bigram
    filler = [(i, f"w{i} x y z q r s t") for i in range(3, 12)]
    sf = _corpus(spark, tmp_path, [(1, spam.strip()), (2, full), *filler])
    got = SPECS["q_llm_rerank_crossfeat"].builder(spark, sf).collect()
    release_persisted()
    by_rank = {r["rank"]: r for r in got}
    # the coverage-3 doc wins despite the spam doc's 100+ phrase hits
    assert by_rank[1].doc_id == 2 and by_rank[1].coverage == 3
    assert by_rank[2].doc_id == 1 and by_rank[2].coverage == 2
    assert by_rank[2].phrase_hits == 99  # capped to its packing bucket
    assert by_rank[2].min_gap == 1
    # coverage-3 doc: no adjacent query bigram, min distinct-term gap 2
    assert by_rank[1].phrase_hits == 0 and by_rank[1].min_gap == 2
