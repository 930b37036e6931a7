"""Vocabulary-drift monitoring between corpus snapshots — the
distribution-shift leg of the crawl-bookkeeping trio (cardinality =
``sketches.hll_*``, overlap = ``sketches.kmv_*``, drift = this).

A training-data pipeline re-crawling monthly needs to know not just how
many documents changed (HLL) and how much content is shared (KMV) but
whether the LANGUAGE ITSELF moved — topic shifts, spam bursts, encoding
regressions, a scraper suddenly ingesting a new domain. The standard
monitor is a divergence between the two snapshots' unigram
distributions over a HASHED vocabulary (fixed bucket count, the DSIR /
quality-classifier feature space): bounded state regardless of true
vocabulary size, no vocabulary build, mergeable counts.

Statistic: per-bucket chi-square-style contribution
``(p_a - p_b)^2 / (p_a + p_b)`` — rational arithmetic only (the JS/KL
alternatives need ``log``, a libm transcendental that would break the
exact cross-engine oracle; for a fixed bucket space the chi-square
ranking is the same monitoring signal). Summed over buckets this is
(half) the squared Hellinger-like chi distance; per-bucket rows are the
actionable output — WHICH buckets moved, with the dominant token per
side as the human-readable witness.

No reference analog (the reference compares corpora only by exact
membership — e.g. the cluster map diffs in
src/analysis/cluster_sequence_analysis.py); LLM-pipeline extension.

Scale shape: tokenize+bucket is a map-side projection; the count
aggregate's shuffle is bounded by ``n_buckets`` rows per side
(map-side partial sums); everything downstream (join, totals, fold) is
bucket-table-sized — corpus-size-free. The witness-token rank is the
only corpus-cardinality shuffle (distinct tokens of the top-k buckets
only, pre-filtered by a broadcast semi join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ncbi_analysis_spark.functions.text import _hash32, tokens


def token_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-token counts with bucket assignment: ``(bucket, g, c)`` —
    the shared base table of the drift family. Tokenize+explode the
    corpus ONCE, persist this, and both the bucket histogram
    (``hashed_vocab_counts``) and the witness ranks
    (``top_drifted_tokens``) derive from it without re-reading text.
    Cardinality = distinct tokens (Zipf: << token occurrences); the
    groupBy's map-side partial sums keep the shuffle at that bound."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("g"))
        .filter(F.length("g") > 0)
        .select(
            F.pmod(_hash32(F.col("g")), F.lit(n_buckets)).alias("bucket"),
            "g",
        )
        .groupBy("bucket", "g")
        .agg(F.count("*").cast("long").alias("c"))
    )


def hashed_vocab_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Unigram counts over the hashed vocabulary: ``(bucket, n)``, at
    most ``n_buckets`` rows. Empty/NULL texts contribute nothing.
    Pass ``counts`` (a persisted ``token_bucket_counts``) to reuse an
    existing tokenize pass — it must have been built with the SAME
    ``n_buckets``: a mismatched table would silently mis-bucket the
    drift comparison, so the reuse path validates the schema
    driver-side and re-derives each row's bucket from its token IN-PLAN
    (the temperature_quotas loud-failure pattern). The recompute guard
    is COMPLETE in both directions — ``bucket`` must equal
    ``pmod(hash32(g), n_buckets)`` by definition, so a table built with
    any other bucket count (larger OR smaller) raises at execution on
    its first disagreeing row, and a table that fully agrees is
    semantically correct for this ``n_buckets`` whatever parameter it
    was built with. Cost: one md5 per counts row — the table is
    vocabulary-bounded, not corpus-sized."""
    if counts is None:
        counts = token_bucket_counts(df, text_col, n_buckets)
    else:
        missing = {"bucket", "g", "c"} - set(counts.columns)
        if missing:
            raise ValueError(
                "hashed_vocab_counts: counts= is not a "
                f"token_bucket_counts table (missing columns {sorted(missing)})"
            )
        expected = F.pmod(_hash32(F.col("g")), F.lit(n_buckets))
        guard = F.when(
            F.col("bucket") == expected, F.col("bucket")
        ).otherwise(
            F.raise_error(F.concat(
                F.lit("hashed_vocab_counts: counts table has bucket "),
                F.col("bucket").cast("string"),
                F.lit(" for token whose bucket under "
                      f"n_buckets={n_buckets} differs — the table was "
                      "built with a different n_buckets; rebuild or pass "
                      "the matching value"),
            ))
        )
        counts = counts.select(guard.alias("bucket"), "g", "c")
    return counts.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("n")
    )


def vocab_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    a_counts: DataFrame | None = None,
    b_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-bucket drift table between two snapshots.

    Output ``(bucket, n_a, n_b, p_a, p_b, contrib)`` — one row per
    bucket seen on either side; ``contrib`` is the chi-square-style
    term ``(p_a - p_b)^2 / (p_a + p_b)``, every step one IEEE op in a
    pinned shape (two exact-integer divisions, subtract, self-multiply,
    add, divide) so a DuckDB mirror agrees bit-for-bit.
    """
    ca = hashed_vocab_counts(
        a, text_col, n_buckets, counts=a_counts
    ).withColumnRenamed("n", "n_a")
    cb = hashed_vocab_counts(
        b, text_col, n_buckets, counts=b_counts
    ).withColumnRenamed("n", "n_b")
    merged = (
        ca.join(cb, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    # totals are aggregates OVER THE BUCKET TABLE (<= n_buckets rows),
    # not the corpus — the one-row cross join is the
    # quality_quantile_gate pinned shape
    totals = merged.agg(
        F.sum("n_a").cast("long").alias("__ta"),
        F.sum("n_b").cast("long").alias("__tb"),
    )
    p_a = F.col("n_a").cast("double") / F.col("__ta").cast("double")
    p_b = F.col("n_b").cast("double") / F.col("__tb").cast("double")
    out = merged.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
    )
    contrib = F.when(
        (F.col("p_a") + F.col("p_b")) > 0,
        ((F.col("p_a") - F.col("p_b")) * (F.col("p_a") - F.col("p_b")))
        / (F.col("p_a") + F.col("p_b")),
    ).otherwise(F.lit(0.0))
    return out.withColumn("contrib", contrib)


def drift_statistic(drift: DataFrame) -> DataFrame:
    """One-row total: ``(n_buckets_seen, drift_stat)`` where
    ``drift_stat`` folds ``contrib`` in BUCKET ORDER (sorted
    collect_list, the hll_estimate pinning pattern — at most
    ``n_buckets`` elements of bounded driver-free state), so the float
    accumulation order is engine-reproducible. Ranges [0, 2]: 0 =
    identical distributions, 2 = disjoint support."""
    pairs = F.array_sort(F.collect_list(F.struct("bucket", "contrib")))
    return drift.agg(
        F.count("*").cast("long").alias("n_buckets_seen"),
        F.aggregate(
            pairs,
            F.lit(0.0),
            lambda acc, s: acc + s["contrib"],
        ).alias("drift_stat"),
    )


def top_drifted_tokens(
    a: DataFrame,
    b: DataFrame,
    drift: DataFrame,
    k: int = 10,
    text_col: str = "text",
    n_buckets: int = 1024,
    a_counts: DataFrame | None = None,
    b_counts: DataFrame | None = None,
) -> DataFrame:
    """The k most-drifted buckets with a human-readable witness: the
    dominant token (max count, ties to the lexicographically smallest)
    per side in each bucket. Deterministic total order everywhere
    (contrib desc then bucket; count desc then token).

    Scale: pass the persisted ``token_bucket_counts`` tables (the
    report composition does) so the corpus is tokenized once for the
    whole drift family; the rank then touches only the token rows of
    the top-k buckets, pre-filtered by a broadcast semi join on the
    k-row bucket list."""
    from ncbi_analysis_spark.operators.topk import topk_per_group

    top = (
        drift.orderBy(F.desc("contrib"), F.asc("bucket"))
        .limit(k)
        .select("bucket", "n_a", "n_b", "p_a", "p_b", "contrib")
    )

    def witness(df: DataFrame, counts, name: str) -> DataFrame:
        if counts is None:
            counts = token_bucket_counts(df, text_col, n_buckets)
        toks = counts.join(
            F.broadcast(top.select("bucket")), "bucket", "left_semi"
        )
        return topk_per_group(
            toks,
            ["bucket"],
            [F.desc("c"), F.asc("g")],
            1,
            keep_rank=False,
        ).select("bucket", F.col("g").alias(name))

    wa = witness(a, a_counts, "top_token_a")
    wb = witness(b, b_counts, "top_token_b")
    return (
        top.join(wa, "bucket", "left")
        .join(wb, "bucket", "left")
    )


def top_drifted_tokens_exact(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    n: int = 20,
    m: int = 256,
) -> DataFrame:
    """The ACTUAL top-``n`` drifted tokens between two snapshots —
    exact unigram-share drift ``|p_a - p_b|`` per token, without a
    vocabulary-sized shuffle (the round-11 gap: ``top_drifted_tokens``
    names one witness per hashed bucket, not the global offenders).

    Candidate coverage by the heavy-hitter bound: a token with
    ``|p_a - p_b| > 1/(m+1)`` has ``p_a > 1/(m+1)`` or
    ``p_b > 1/(m+1)``, so it is a Misra-Gries heavy hitter of THAT
    side and must appear in that side's partition-top-``m`` candidates
    (``heavy_hitters.partition_top_tokens``). Both sides' candidates
    union (<= m * partitions rows), get exact recounts on both sides
    (semi-join prunes each token explode BEFORE its groupBy), and the
    top-``n`` by drift follows. Every returned row carries
    ``guaranteed``: its drift clears ``1/(m+1)`` — checked in EXACT
    integer arithmetic (``|n_a*N_b - n_b*N_a|*(m+1) > N_a*N_b``) — so
    non-candidate tokens provably cannot out-drift it and its rank is
    layout-independent. Rows below the bound are correct for this
    layout (raise ``m`` to certify deeper).

    Output ``(token, n_a, n_b, p_a, p_b, drift, guaranteed)`` ordered
    (drift desc, token asc); shares are exact-integer IEEE divisions
    and the drift one subtract + abs — bit-reproducible cross-engine
    (the vocab_drift contribution convention).
    """
    from ncbi_analysis_spark.operators.heavy_hitters import (
        partition_top_tokens,
    )

    if n < 1:
        raise ValueError(f"top_drifted_tokens_exact: n={n} must be >= 1")
    ta = (
        a.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.length("token") > 0)
    )
    tb = (
        b.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.length("token") > 0)
    )
    cands = (
        partition_top_tokens(ta, "token", m).select("token")
        .unionByName(partition_top_tokens(tb, "token", m).select("token"))
        .distinct()
    )
    n_a_tot = ta.count()
    n_b_tot = tb.count()
    if n_a_tot == 0 or n_b_tot == 0:
        raise ValueError(
            "top_drifted_tokens_exact: empty token stream on one side — "
            "shares are undefined"
        )

    def _counts(t, out):
        return (
            t.join(F.broadcast(cands), "token", "left_semi")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(out))
        )

    joined = _counts(ta, "n_a").join(_counts(tb, "n_b"), "token",
                                     "full_outer")
    na = F.coalesce(F.col("n_a"), F.lit(0)).cast("long")
    nb = F.coalesce(F.col("n_b"), F.lit(0)).cast("long")
    # the guarantee is computed in DecimalType(38,0): int64 would
    # overflow once each side exceeds ~3e9 tokens (|n*N| passes 2^63 —
    # a crash under ANSI mode, a silent mis-flag without), at odds with
    # the operator's at-scale pitch; 38-digit decimals carry
    # n*N*(m+1) ~ 1e22 with room to spare (oracle mirrors in HUGEINT)
    dec = "decimal(38,0)"
    dna, dnb = na.cast(dec), nb.cast(dec)
    tna = F.lit(n_a_tot).cast(dec)
    tnb = F.lit(n_b_tot).cast(dec)
    p_a = na.cast("double") / F.lit(float(n_a_tot))
    p_b = nb.cast("double") / F.lit(float(n_b_tot))
    scored = joined.select(
        "token",
        na.alias("n_a"),
        nb.alias("n_b"),
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        F.abs(p_a - p_b).alias("drift"),
        (
            F.abs(dna * tnb - dnb * tna) * F.lit(m + 1).cast(dec)
            > tna * tnb
        ).alias("guaranteed"),
    )
    return scored.orderBy(F.desc("drift"), F.asc("token")).limit(n)
