"""Round-13 staged-query semantics tests (the staged r13 queries'
pytest complement: tombstone/compaction contracts live in
test_index_delete.py; this file covers the new audit/streaming
operators)."""

from __future__ import annotations

def test_span_recall_audit_semantics(spark):
    """span_recall_audit on constructed corpora: anchor_bits=0 makes
    the candidate leg THE truth leg (recall exactly 1); at the real
    anchor density on unaligned copies recall lands strictly inside
    (0,1); no duplicates -> NULL recall; hit == anchored (anchored
    windows are truth windows by construction — measured, not
    assumed)."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import span_recall_audit

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(1, base), (2, "xx" + base), (3, "unrelated text " * 12)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    r0 = span_recall_audit(d, "text", "doc_id", anchor_bits=0).collect()[0]
    assert r0["recall"] == 1.0
    assert r0["truth_chars"] > 0

    r = span_recall_audit(d, "text", "doc_id", anchor_bits=4).collect()[0]
    assert 0.0 < r["recall"] < 1.0
    assert r["hit_chars"] == r["anchored_chars"] <= r["truth_chars"]
    assert r["n_sample"] == 3

    nodup = spark.createDataFrame(
        [(1, "alpha " * 10), (2, "omega " * 10)], "doc_id long, text string")
    rn = span_recall_audit(nodup, "text", "doc_id").collect()[0]
    assert rn["recall"] is None and rn["truth_chars"] == 0
