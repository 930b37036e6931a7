"""Sequence / text / vector expression-library tests (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ncbi_analysis_spark.functions import sequence as seqf
from ncbi_analysis_spark.functions import text as textf
from ncbi_analysis_spark.functions import vectors as vecf


def one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("x")).collect()[0]["x"]


def test_revcomp(spark):
    # reference composes complement map + [::-1] (src/utils/gene_util.py:1-8)
    assert one(spark, seqf.revcomp(F.col("s")), s="acgt") == "acgt"
    assert one(spark, seqf.revcomp(F.col("s")), s="aacg") == "cgtt"


def test_subseq_1based(spark):
    # dna_code[left-1:right] (src/utils/ncbi_database.py:156)
    assert one(
        spark, seqf.subseq_1based(F.col("s"), F.lit(2), F.lit(4)), s="abcdef"
    ) == "bcd"


def test_extract_strand_seq_reverse(spark):
    # start > end encodes reverse strand -> revcomp of [end..start]
    got = one(spark, seqf.extract_strand_seq(F.col("s"), F.lit(4), F.lit(1)), s="aacgtt")
    assert got == "cgtt"  # revcomp("aacg")


def test_flanks(spark):
    assert one(
        spark, seqf.upstream_flank(F.col("s"), F.lit(4), 2), s="abcdefgh"
    ) == "bc"
    assert one(
        spark, seqf.downstream_flank(F.col("s"), F.lit(4), 3), s="abcdefgh"
    ) == "efg"
    # clamped at sequence start like python slicing
    assert one(spark, seqf.upstream_flank(F.col("s"), F.lit(2), 5), s="abcdefgh") == "a"


def test_parse_locus(spark):
    df = spark.createDataFrame([("NC_1:15-99(-)",)], ["locus"])
    row = df.select(*seqf.parse_locus(F.col("locus"))).collect()[0]
    assert (row.accession, row.left, row.right, row.direction) == ("NC_1", 15, 99, "-")


def test_overlap_math(spark):
    assert one(
        spark,
        seqf.overlap_size(F.lit(1), F.lit(10), F.lit(5), F.lit(20)),
        dummy=1,
    ) == 6
    assert one(
        spark,
        seqf.interval_relation(F.lit(5), F.lit(8), F.lit(1), F.lit(10)),
        dummy=1,
    ) == "CoveredBy"


def test_alphabet_and_histogram(spark):
    assert one(spark, seqf.alphabet_ok(F.col("s")), s="AUCG") is True
    assert one(spark, seqf.alphabet_ok(F.col("s")), s="AUXG") is False
    hist = one(spark, seqf.base_histogram(F.col("s")), s="aacgt")
    assert hist["a"] == 2 and hist["t"] == 1


def test_map_drop_empty(spark):
    df = spark.createDataFrame([({"a": "1", "b": "", "c": None},)], ["m"])
    got = df.select(seqf.map_drop_empty(F.col("m")).alias("m")).collect()[0]["m"]
    assert got == {"a": "1"}


def test_token_counts(spark):
    assert one(spark, textf.token_count(F.col("s")), s="a b  c") == 3
    assert one(spark, textf.token_count(F.col("s")), s="  ") == 0


def test_lang_id(spark):
    assert one(spark, textf.lang_id(F.col("s")), s="the cat of the hat") == "en"
    assert one(spark, textf.lang_id(F.col("s")), s="le chat et la mer") == "fr"
    assert one(spark, textf.lang_id(F.col("s")), s="zzz qqq") == "und"


def test_simhash_expression_matches_agg(spark):
    """The shuffle-free expression form and the codegen agg form must agree."""
    from ncbi_analysis_spark.operators.dedup import simhash_fingerprints

    df = spark.createDataFrame(
        [(1, "spark window agg join"), (2, "key value table scan row")],
        ["id", "text"],
    )
    expr = {r["id"]: r["x"] for r in df.select("id", textf.simhash32(F.col("text")).alias("x")).collect()}
    agg = {r["id"]: r["simhash"] for r in simhash_fingerprints(df, "text", "id").collect()}
    assert expr == agg


def test_hamming32(spark):
    assert one(spark, textf.hamming32(F.lit(0b1011), F.lit(0b0010)), d=1) == 2


def test_vector_math(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [1.0, 2.0, 2.0])], ["a", "b"])
    row = df.select(
        vecf.dot(F.col("a"), F.col("b")).alias("d"),
        vecf.cosine(F.col("a"), F.col("b")).alias("c"),
        vecf.l2_distance(F.col("a"), F.col("b")).alias("l2"),
    ).collect()[0]
    assert row["d"] == 9.0 and row["c"] == 1.0 and row["l2"] == 0.0


def test_pii_scrub(spark):
    from ncbi_analysis_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "mail a.b+c@test.org and ip 192.168.0.1 and phone 555-867-5309"),
         (2, "nothing sensitive here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", *pii_counts(F.col("text")), redact_pii(F.col("text")).alias("red")
    ).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ip"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["red"] == "mail <EMAIL> and ip <IP> and phone <PHONE>"
    assert out[2]["n_email"] == 0 and out[2]["red"] == "nothing sensitive here"


def test_gopher_repetition_metrics(spark):
    # Gopher (Rae et al. 2021) word-level repetition rules as pure
    # Column folds — no shuffle, so edge cases must be handled in-row.
    def m(fn, s, *a):
        return one(spark, fn(textf.tokens(F.col("s")), *a), s=s)

    # dup_word_frac: 4 words, 2 distinct -> 0.5; all-unique -> 0.0
    assert m(textf.dup_word_frac, "a b a b") == 0.5
    assert m(textf.dup_word_frac, "a b c d") == 0.0
    # empty / whitespace-only doc -> 0, not null or div-by-zero
    assert m(textf.dup_word_frac, "   ") == 0.0

    # top_ngram_frac: "a b a b a" bigrams = [a b, b a, a b, b a] -> 2/4
    assert m(textf.top_ngram_frac, "a b a b a", 2) == 0.5
    # a tie keeps only the max count (no gram identity leaks out)
    assert m(textf.top_ngram_frac, "x y z x y", 2) == 0.5
    # fewer than n words -> 0 (word_ngrams_exact emits no short tail)
    assert m(textf.top_ngram_frac, "solo", 2) == 0.0
    assert m(textf.top_ngram_frac, "", 3) == 0.0
    # trigram run: "a b c a b c a" -> [abc, bca, cab, abc, bca] -> 2/5
    assert m(textf.top_ngram_frac, "a b c a b c a", 3) == 0.4

    # mean_word_len: ("ab","c","def") -> 6/3 = 2.0; empty -> 0
    assert m(textf.mean_word_len, "ab c def") == 2.0
    assert m(textf.mean_word_len, "") == 0.0

    # word_ngrams_exact is exact-width: 3 words -> exactly 2 bigrams
    got = one(spark, textf.word_ngrams_exact(textf.tokens(F.col("s")), 2),
              s="a b c")
    assert got == ["a b", "b c"]


def test_repetition_metrics_np_bit_parity(spark):
    # The Arrow-batched twin must produce BIT-identical doubles to the
    # Column folds (every metric is one double division of integer
    # counts), including the JVM tokenization corners: Java trim/ASCII-\s
    # semantics, empty and whitespace-only docs, NULL text, unicode
    # whitespace (U+00A0 is NOT a Java \s separator), ties, short docs.
    rows = [
        (1, "a b a b a"),
        (2, "x y z x y"),
        (3, "solo"),
        (4, ""),
        (5, "   "),
        (6, None),
        (7, "the quick brown fox jumps over the lazy dog the quick"),
        (8, "nb sp stays one token"),
        (9, "tab\tand\nnewline \x0b\x0c\r separators"),
        (10, "\x01ctrl\x01 chars\x01"),
        (11, "a " * 500 + "b"),
        (12, "w" * 40),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    expr = {
        r["doc_id"]: r
        for r in textf.repetition_metrics(df, engine="expr").collect()
    }
    npv = {
        r["doc_id"]: r
        for r in textf.repetition_metrics(df, engine="np").collect()
    }
    assert set(expr) == set(npv)
    for k in expr:
        for c in textf.REPETITION_METRIC_COLS:
            assert expr[k][c] == npv[k][c], (k, c, expr[k][c], npv[k][c])

    # auto: probe routes small inputs to expr, big ones to np — same rows
    auto = textf.repetition_metrics(df, engine="auto", max_expr_rows=3)
    got = {r["doc_id"]: r for r in auto.collect()}
    assert all(
        got[k][c] == expr[k][c]
        for k in expr for c in textf.REPETITION_METRIC_COLS
    )

    # keep may include the text column itself (curation_v4 carries text
    # through the gate) — both engines must not double-select it
    for eng in ("expr", "np"):
        carried = textf.repetition_metrics(
            df, keep=("doc_id", "text"), engine=eng)
        row = {r["doc_id"]: r for r in carried.collect()}
        assert row[1]["text"] == "a b a b a"
        assert row[1]["dup_word_frac"] == expr[1]["dup_word_frac"]
