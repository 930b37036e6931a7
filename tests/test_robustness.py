"""Edge-case robustness: empty inputs, degenerate strings, single rows.

These mirror failure modes the reference handles with ad-hoc guards (or
crashes on); the engine must return empty/identity results, not throw.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ncbi_analysis_spark.operators import asof, cluster, dedup, distribution, intervals
from ncbi_analysis_spark.operators.suppression import local_max_suppress
from ncbi_analysis_spark.operators.topk import topk_per_group
from ncbi_analysis_spark.similarity.scorers import (
    consistency_score,
    direct_score,
    text_edit_score,
)


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_empty_topk_suppress_distribution(spark):
    df = _empty(spark, "g string, id long, score double")
    assert topk_per_group(df, ["g"], [F.desc("score")], 3).count() == 0
    assert local_max_suppress(df, ["g"], "id", "score", 5).count() == 0
    assert distribution.value_distribution(df, ["g"]).count() == 0


def test_empty_joins(spark):
    probe = _empty(spark, "k long, t long")
    build = spark.createDataFrame([(1, 5, "x")], ["k", "bt", "v"])
    assert asof.asof_join(probe, build, ["k"], "t", "bt", ["v"]).count() == 0
    left = _empty(spark, "ls long, le long")
    right = spark.createDataFrame([(1, 5)], ["rs", "re"])
    assert intervals.interval_join_binned(left, right, "ls", "le", "rs", "re").count() == 0


def test_dedup_on_empty_and_single(spark):
    df = _empty(spark, "id long, text string")
    assert dedup.exact_dedup(df, "text", "id").count() == 0
    assert dedup.minhash_lsh_pairs(df, "text", "id", num_perm=4, bands=2).count() == 0
    one = spark.createDataFrame([(1, "only one document here")], ["id", "text"])
    assert dedup.exact_dedup(one, "text", "id").count() == 1
    assert dedup.ngram_jaccard_pairs(one, "text", "id").count() == 0


def test_scorers_degenerate_strings(spark):
    assert direct_score("", "") == 0.0
    assert consistency_score("", "", 2) == 0.0
    assert text_edit_score("", "", None) == 0.0
    assert text_edit_score("a", "a", 1) == 1.0
    # window shorter than gene: positional functions just stop early
    assert direct_score("acgt", "ac") == 2.0


def test_single_char_and_whitespace_text(spark):
    from ncbi_analysis_spark.functions import text as textf

    df = spark.createDataFrame([(1, "x"), (2, "   "), (3, "")], ["id", "text"])
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            textf.token_count(F.col("text")).alias("tc"),
            textf.lang_id(F.col("text")).alias("lang"),
            textf.simhash32(F.col("text")).alias("sh"),
        ).collect()
    }
    assert rows[1]["tc"] == 1 and rows[2]["tc"] == 0 and rows[3]["tc"] == 0
    assert rows[2]["lang"] == "und"
    assert rows[3]["sh"] is not None


def test_gap_regions_single_interval(spark):
    df = spark.createDataFrame([("a", 10, 20)], ["acc", "s", "e"])
    assert intervals.gap_regions(df, ["acc"], "s", "e").count() == 0


def test_cluster_single_row(spark):
    df = spark.createDataFrame([("AA", 7)], ["seq", "no"])
    row = cluster.cluster_by_key(df, F.col("seq"), F.col("no")).collect()[0]
    assert row["cluster_size"] == 1 and row["members"] == "7"


def test_decon_empty_benchmark(spark):
    from ncbi_analysis_spark.operators import dedup as dd

    docs = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    bench = spark.createDataFrame([], "doc_id LONG, text STRING")
    row = dd.benchmark_ngram_overlap(docs, bench, "text", "doc_id", 3).collect()[0]
    assert row["n_shared"] == 0 and row["contamination"] == 0.0


def test_char_window_dup_short_docs_dropped(spark):
    from ncbi_analysis_spark.operators import dedup as dd

    docs = spark.createDataFrame([(1, "short"), (2, "short")], ["doc_id", "text"])
    assert dd.char_window_dup_pairs(docs, "text", "doc_id", window=32).count() == 0


def test_curation_empty_corpus(spark):
    from ncbi_analysis_spark.plans.curation import curate_corpus

    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    bench = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    assert curate_corpus(empty, bench).count() == 0


def test_hash_split_single_class_weights(spark):
    from ncbi_analysis_spark.operators.scale import hash_split

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    rows = hash_split(df, "doc_id", {"all": 1.0}).collect()
    assert all(r["split"] == "all" for r in rows)


def test_pii_redact_null_text(spark):
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.functions.text import redact_pii

    df = spark.createDataFrame([(1, None)], "doc_id LONG, text STRING")
    assert df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"] is None


def test_round5_ops_on_empty_and_degenerate(spark):
    from ncbi_analysis_spark.operators import similarity_search as ss
    from ncbi_analysis_spark.operators.scale import leakage_safe_split

    # leakage split with an empty components frame == plain hash split
    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    comp = _empty(spark, "id long, component long")
    out = leakage_safe_split(docs, "doc_id", comp).collect()
    assert {r["doc_id"]: r["rep"] for r in out} == {1: 1, 2: 2}

    # PQ over an empty corpus: encode and search both return empty
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 2.0]) for i in range(8)], ["vec_id", "embedding"]
    )
    B = ss.train_pq_codebooks(emb, m=2, codewords=4, sample_cap=8, n_iter=2, seed=0)
    empty_emb = _empty(spark, "vec_id long, embedding array<double>")
    assert ss.pq_encode(empty_emb, B).count() == 0
    q = emb.limit(1).select(F.col("vec_id").alias("q_id"), "embedding")
    assert ss.pq_topk(ss.pq_encode(empty_emb, B), q, B, k=3).count() == 0

    # refinement over an empty corpus keeps the seed centroids unchanged
    cents = ss.train_ivf_centroids(emb, k=2, sample_cap=8, n_iter=2, seed=0)
    refined = ss.refine_ivf_centroids(empty_emb, cents, n_iter=1)
    a = sorted((r["c_id"], tuple(r["embedding"])) for r in cents.collect())
    b = sorted((r["c_id"], tuple(r["embedding"])) for r in refined.collect())
    assert a == b

    # bloom probe on an empty-text doc: the single partial shingle
    # (documented shingle_rows semantics for size<n) still yields a row
    bench = spark.createDataFrame([(1, "a b c d")], ["id", "text"])
    bloom = dedup.build_ngram_bloom(bench, "text", "id", n=3, n_bits=1 << 12)
    corpus = spark.createDataFrame([(2, "")], ["id", "text"])
    assert dedup.bloom_ngram_overlap(corpus, bloom, "text", "id").count() == 1


def test_windowed_scan_edges(spark, tmp_path):
    """New r6 paths on degenerate inputs: empty window set, single tiny
    window shorter than a chunk, FASTA file with no records."""
    from ncbi_analysis_spark.plans.similarity_scan import (
        chunk_genome_from_windows,
        similarity_scan_windowed,
    )
    from ncbi_analysis_spark.sources.fasta import read_fasta_windows

    empty = _empty(spark, "accession string, window_id int, win_offset long, seq string")
    q = spark.createDataFrame([("q1", "acgt")], ["name", "gene"])
    assert chunk_genome_from_windows(empty, 64, 3).count() == 0
    assert similarity_scan_windowed(empty, q, {"direct": 1.0}).count() == 0

    tiny = spark.createDataFrame([("a", 0, 0, "ac")],
                                 ["accession", "window_id", "win_offset", "seq"])
    rows = chunk_genome_from_windows(tiny, 64, 3, halo=2).collect()
    assert {(r["strand"], r["chunk_seq"]) for r in rows} == {("+", "ac"), ("-", "gt")}

    p = tmp_path / "empty.fa"
    p.write_text("; no records here\n")
    assert read_fasta_windows(spark, str(p), window_size=16).count() == 0


def test_batched_kernels_degenerate_shapes():
    """Zero offsets / length-1 genes through the batched kernels."""
    import numpy as np

    from ncbi_analysis_spark.similarity.pattern import MatchPattern, pattern_scores_chunk
    from ncbi_analysis_spark.similarity.scorers import text_edit_scores_batch

    g = np.frombuffer(b"a", dtype=np.uint8)
    assert text_edit_scores_batch(g, np.empty((0, 1), np.uint8), 2).tolist() == []
    assert text_edit_scores_batch(
        g, np.frombuffer(b"t", np.uint8).reshape(1, 1), None).tolist() == [0.0]
    pat = MatchPattern("a", {"must": [{"offset": 0, "length": 1}]})
    assert pattern_scores_chunk(pat, "ta", np.array([], dtype=np.int64), 1).tolist() == []
    assert pattern_scores_chunk(pat, "ta", np.array([0, 1]), 1).tolist() == [0.0, 1.0]


def test_auto_decoders_never_raise_on_arbitrary_bytes():
    """The mapInPandas crash-safety contract, fuzzed: auto_image_decoder
    and auto_audio_decoder must return a feature dict (never raise) for
    ANY payload — random bytes, magic-prefixed junk, truncated real
    files, marker soup. One poisoned row must never kill a batch."""
    import random

    from ncbi_analysis_spark.operators import multimodal as mm

    rnd = random.Random(99)
    fx = "tests/fixtures"
    real_jpg = open(f"{fx}/media/gradient_rgb.jpg", "rb").read()
    real_png = open(f"{fx}/media/gradient_rgb.png", "rb").read()
    real_wav = open(f"{fx}/media/sine440.wav", "rb").read()

    payloads = [b"", None, b"\x00" * 64]
    for _ in range(60):
        payloads.append(bytes(rnd.randrange(256)
                              for _ in range(rnd.randrange(1, 200))))
    # magic-prefixed junk for every sniffed format
    for magic in (b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"BM", b"RIFF",
                  b"RIFF1234WAVE"):
        for _ in range(10):
            payloads.append(magic + bytes(rnd.randrange(256)
                                          for _ in range(rnd.randrange(0, 120))))
    # truncations and single-byte corruptions of real files
    for real in (real_jpg, real_png, real_wav):
        for cut in (4, 12, 30, len(real) // 2, len(real) - 3):
            payloads.append(real[:cut])
        for _ in range(15):
            pos = rnd.randrange(len(real))
            payloads.append(real[:pos]
                            + bytes([rnd.randrange(256)])
                            + real[pos + 1:])

    for p in payloads:
        img = mm.auto_image_decoder(p, {})
        aud = mm.auto_audio_decoder(p, {})
        assert set(img) >= {"width", "height", "mean_luma", "phash64"}
        assert set(aud) >= {"sample_rate", "duration_ms", "n_samples",
                            "rms", "peak"}
