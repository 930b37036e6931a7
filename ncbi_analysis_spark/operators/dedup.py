"""Deduplication family for training-data pipelines (BASELINE.json
north-star extension: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup).

Design for 100 TB:

- Exact dedup: groupBy on ``md5(normalized text)`` — shuffle bytes are the
  32-char digest, not the document; map-side combine shrinks early.
- MinHash+LSH: per-row signature (no shuffle) -> explode to
  (band, band_hash) keys -> self-join *within buckets only* (the LSH
  point: candidate pairs ~ true-near-dup pairs, not n^2).
- n-gram Jaccard: inverted-index join — explode shingles, pair documents
  sharing a shingle, count common shingles per pair, Jaccard from
  |A|+|B|-common. Cost ~ sum of shingle-bucket sizes squared; cap hot
  shingles (stopword shingles) by frequency to bound skew.
- SimHash: per-row 32-bit fingerprint; near-dup = small Hamming distance,
  found by banding the fingerprint bits (4 bands of 8 bits -> any pair at
  Hamming<=3 shares a band by pigeonhole... with 4 bands any pair with <4
  differing bits shares at least one identical band).
- Embedding near-dup: cosine >= threshold; brute force within LSH-ish
  buckets (random-hyperplane signs) for scale, exact pairwise as oracle.

All hash functions are md5-derived -> bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions.vectors import cosine

_cap_seq = itertools.count()


def _capped(df: DataFrame, size: Column, cap: int, what: str) -> DataFrame:
    """Drop hot buckets above ``cap`` — observably.

    The dropped bucket/member counts are emitted as ``observe()`` metrics
    (named ``<what>_cap_<n>``; the counter keeps names unique when one
    query composes several capped stages), readable from a
    QueryExecutionListener or the Spark UI. Without this a capped run
    silently loses near-dup recall on degenerate corpora with no signal
    that anything was dropped.
    """
    name = f"{what}_cap_{next(_cap_seq)}"
    return df.observe(
        name,
        F.coalesce(F.sum((size > cap).cast("long")), F.lit(0)).alias("dropped_buckets"),
        F.coalesce(F.sum(F.when(size > cap, size.cast("long"))), F.lit(0)).alias("dropped_members"),
    ).filter(size <= cap)


def shingle_rows(df: DataFrame, text: str, id_col: str, n: int = 3) -> DataFrame:
    """Word n-gram shingles as rows ``(id_col, sh)`` — codegen formulation.

    posexplode the tokens, then ``lead`` windows build each n-gram; the
    whole pipeline (split, explode, window, concat) stays in whole-stage
    codegen, unlike the array higher-order-function form
    (functions.text.word_shingles) which runs interpreted.

    Semantics match word_shingles exactly: size>=n -> size-n+1 full
    n-grams; size<n -> one partial shingle of all tokens.

    Scale: one shuffle keyed by id; downstream per-id aggregations
    (minhash minima, distinct) reuse the same partitioning, so the
    shingle window costs no extra exchange.
    """
    from ncbi_analysis_spark.functions.text import tokens

    if n == 1:
        # every token IS a 1-gram (the pos <= greatest(cnt-1, 0) filter
        # keeps every exploded row when n=1, and the size<1 partial case
        # is empty under both forms), so the window — and its shuffle by
        # id — is pure overhead: a straight explode is row-identical and
        # keeps the scan pipelined (r15 optimization; the hashed-feature
        # paths that union an n=1 leg stop paying an id-keyed exchange)
        return df.select(
            F.col(id_col), F.explode(tokens(F.col(text))).alias("sh")
        )
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text))).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    cnt = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    return (
        toks.withColumn("__cnt", cnt)
        .withColumn("sh", F.concat_ws(" ", *leads))
        .filter(F.col("pos") <= F.greatest(F.col("__cnt") - n, F.lit(0)))
        .select(id_col, "sh")
    )


def minhash_signatures(
    df: DataFrame,
    text: str,
    id_col: str,
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures as columns ``mh0..mh{n-1}`` — explode+aggregate
    formulation.

    The Column-expression form (functions.text.minhash_signature) is
    shuffle-free but runs in Spark's interpreted higher-order-function
    evaluator. This form explodes shingles to rows and computes the
    per-permutation minima as codegen'd hash aggregates with map-side
    combine — ~5-10x faster per byte and the right shape at 100 TB (the
    shuffle carries only (id, 4x32B partial minima) after partial agg).

    NB: rows whose text yields zero shingles are dropped (explode of an
    empty array); the expression form yields nulls instead.
    """
    sh = shingle_rows(df, text, id_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def simhash_fingerprints(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """32-bit SimHash per row — explode+aggregate formulation (see
    minhash_signatures for why; 32 conditional SUMs stay in codegen)."""
    from ncbi_analysis_spark.functions.text import _hash32, tokens

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text))).alias("tok"))
    h = toks.withColumn("hv", _hash32(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(32)
    ]
    bits = h.groupBy(id_col).agg(*bit_sums)
    sim = None
    for j in range(32):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return bits.select(F.col(id_col), sim.alias("simhash"))


def doc_fingerprints(df: DataFrame, text: str, id_col: str, k: int = 8,
                     stride: int = 4) -> DataFrame:
    """Min char-k-gram hash fingerprint per row — explode+aggregate form
    of functions.text.doc_fingerprint (same value, codegen'd md5 + hash
    aggregate instead of the interpreted array fold)."""
    from ncbi_analysis_spark.functions.text import _hash32, char_shingles

    # slice the k-grams BEFORE exploding so exploded rows carry 8-char
    # strings, not a copy of the whole document per position
    sh = df.select(
        F.col(id_col), F.explode(char_shingles(F.col(text), k, stride)).alias("__sh")
    )
    return (
        sh.select(id_col, _hash32(F.col("__sh")).alias("__h"))
        .groupBy(id_col)
        .agg(F.min("__h").alias("fp32"))
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact-normalized-text group."""
    w = Window.partitionBy(F.md5(normalize_text(F.col(text)))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def exact_dedup_against(
    new_df: DataFrame,
    ref_df: DataFrame,
    text: str,
    ref_text: str | None = None,
) -> DataFrame:
    """Incremental-crawl dedup: drop every row of ``new_df`` whose
    normalized text already exists in ``ref_df`` (the previously
    ingested corpus, or a precomputed 1-column ``__ref_hash`` digest
    table — pass that instead of re-hashing the full corpus each
    increment). The within-batch dedup step is separate by design
    (``exact_dedup`` on the survivors) so callers control keep-order.

    Scale: anti join keyed on the md5 digest — shuffle carries 32-char
    hashes from the smaller (new) side; for a large reference the digest
    table should be the persisted artifact, bucketed by ``__ref_hash``
    so each increment co-locates with zero reference shuffle. For
    probabilistic pre-filtering at extreme scale, compose with the Bloom
    path (``build_ngram_bloom``) upstream.
    """
    ref_hashes = (
        ref_df.select(F.col("__ref_hash"))
        if "__ref_hash" in ref_df.columns
        else ref_df.select(
            F.md5(normalize_text(F.col(ref_text or text))).alias("__ref_hash"))
    ).distinct()
    return new_df.join(
        ref_hashes,
        F.md5(normalize_text(F.col(text))) == F.col("__ref_hash"),
        "left_anti",
    )


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    text: str,
    id_col: str,
) -> DataFrame:
    """Snapshot diff between two corpus versions — the change audit an
    incremental crawl publishes alongside the data: one row per doc id
    present in either snapshot, with
    ``status ∈ {added, removed, changed, unchanged}`` by id presence and
    normalized-content digest (``normalize_text`` + md5, the SAME
    canonical form ``exact_dedup``/``exact_dedup_against`` key on, so
    "changed" means exactly "would no longer dedup together").

    Scale: two map-side digest projections and ONE full outer join
    keyed by the id — no text moves through the shuffle, only ids and
    32-char digests. Downstream: ``filter(status = 'added')`` is the
    ingest increment; ``'changed'`` triggers re-scoring.
    """
    # presence flags, not digest-NULL checks: a NULL-text doc has a
    # NULL digest but IS present, and must not masquerade as added/
    # removed; digest comparison is null-safe so two NULL-text versions
    # compare unchanged
    o = old_df.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text))).alias("__d_old"),
        F.lit(True).alias("__in_old"),
    )
    n = new_df.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text))).alias("__d_new"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__d_old").eqNullSafe(F.col("__d_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def exact_dup_groups(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """Duplicate-group report: (text_hash, dup_count, min_id) for groups
    with more than one member."""
    return (
        df.groupBy(F.md5(normalize_text(F.col(text))).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def _minhash_band_rows(
    df: DataFrame,
    text: str,
    id_col: str,
    num_perm: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """LSH band rows ``(id, band, band_hash)`` — the shared front half of
    within-corpus pairing (`minhash_lsh_pairs`) and cross-corpus
    contamination (`fuzzy_decon_pairs`)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text, id_col, num_perm, shingle_n)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[
                F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
            ])).alias("band_hash"),
        )
        for b in range(bands)
    ])
    return sigs.select(
        F.col(id_col).alias("id"), F.explode(band_structs).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.band_hash").alias("band_hash"))


def minhash_lsh_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    max_band_freq: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Returns distinct (id_a, id_b) with id_a < id_b that collide in at
    least one band. Verify with ``ngram_jaccard_pairs`` (or directly
    threshold on signature agreement) downstream.

    Bucket-explode formulation (same pattern as ngram_jaccard_pairs): an
    aliased self-join would compute the whole signature pipeline TWICE
    (exchange reuse doesn't fire across join aliases); grouping member
    ids per (band, band_hash) and chaining two explodes generates the
    same within-bucket pairs from a single signature scan.

    ``max_band_freq`` caps bucket size: a degenerate band value (e.g.
    empty-text documents hashing identically) would otherwise produce a
    quadratic hot bucket; buckets above the cap are dropped (their
    members are near-identical junk better handled by exact dedup).
    Set None to disable (oracle/parity runs).
    """
    sig = _minhash_band_rows(df, text, id_col, num_perm, bands, shingle_n)
    buckets = (
        sig.groupBy("band", "band_hash")
        .agg(F.collect_list("id").alias("members"))
        .filter(F.size("members") > 1)
    )
    if max_band_freq is not None:
        buckets = _capped(buckets, F.size("members"), max_band_freq, "minhash_lsh")
    return (
        buckets.select(F.explode("members").alias("id_a"), "members")
        .select("id_a", F.explode("members").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def fuzzy_decon_pairs(
    df: DataFrame,
    bench_df: DataFrame,
    text: str,
    id_col: str,
    bench_id_col: str | None = None,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Fuzzy decontamination: corpus documents NEAR-duplicating a
    benchmark document, found by cross-corpus MinHash-LSH band
    collision (the GPT-3-style fuzzy dedup of eval data from training
    corpora — `benchmark_ngram_overlap` is the exact-n-gram complement;
    this catches paraphrased or lightly-edited contamination that exact
    gram overlap underestimates).

    Returns distinct ``(id_col, bench_id)`` pairs that agree on at least
    one band — verify downstream with ``ngram_jaccard_pairs``-style
    exact Jaccard on the candidates, or drop all flagged docs outright
    (the conservative posture for eval hygiene).

    Scale: benchmark suites are tiny relative to the corpus, so the
    bench band rows broadcast (map-side hash join — the corpus side is
    scanned once, no shuffle beyond its own signature aggregation).
    For an unusually large bench set pass ``broadcast_bench=False`` and
    let AQE plan a shuffled join on (band, band_hash).
    """
    bench_id_col = bench_id_col or id_col
    corpus_bands = _minhash_band_rows(df, text, id_col, num_perm, bands, shingle_n)
    bench_bands = (
        _minhash_band_rows(bench_df, text, bench_id_col, num_perm, bands, shingle_n)
        .select(F.col("id").alias("bench_id"), "band", "band_hash")
        .distinct()
    )
    if broadcast_bench:
        bench_bands = F.broadcast(bench_bands)
    return (
        corpus_bands.join(bench_bands, ["band", "band_hash"])
        .select(F.col("id").alias(id_col), "bench_id")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    Inverted-index self-join; ``max_shingle_freq`` drops ultra-common
    shingles (skew cap) — at 100 TB a stopword shingle would otherwise
    create a quadratic hot bucket. The cap is ON by default (matching
    ``minhash_lsh_pairs``); pass ``None`` explicitly for an exact
    all-pairs run (the DuckDB oracle comparison does).
    """
    sh = shingle_rows(df, text, id_col, shingle_n).select(
        F.col(id_col).alias("id"), "sh"
    ).distinct()
    if max_shingle_freq is not None:
        freq = _capped(
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f")),
            F.col("f"), max_shingle_freq, "ngram_jaccard",
        )
        sh = sh.join(F.broadcast(freq.select("sh")), "sh", "inner")
    # carry the per-doc shingle count on every row via a window — it
    # reuses the partition-by-id shuffle the shingle window already did,
    # so the two extra "sizes" joins (and their full shingle-pipeline
    # recomputations) disappear from the plan
    sh = sh.withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy("id")))
    # bucket-explode instead of a self-join: the self-join form computes
    # the whole shingle pipeline TWICE (Spark's exchange reuse does not
    # fire across the join aliases); grouping members per shingle and
    # chaining two explodes generates the same within-bucket pairs from a
    # single scan, entirely in codegen
    buckets = (
        sh.groupBy("sh")
        .agg(F.collect_list(F.struct("id", "n_sh")).alias("members"))
        .filter(F.size("members") > 1)
    )
    pairs = (
        buckets.select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
    )
    out = (
        pairs.groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
        .withColumn("jaccard", F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_band_freq: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: any pair with Hamming distance
    < ``bands`` over the 32-bit fingerprint shares an identical 8-bit band
    (pigeonhole), so candidates come from cheap equi-joins; the exact
    Hamming filter runs only on candidates.

    Bucket-explode formulation (single fingerprint scan — see
    minhash_lsh_pairs) with a ``max_band_freq`` hot-bucket cap: a band
    value shared by a huge cohort (near-constant documents) would
    otherwise go quadratic. Set None to disable.
    """
    from ncbi_analysis_spark.functions.text import hamming32

    bits_per = 32 // bands
    fp = simhash_fingerprints(df, text, id_col).select(
        F.col(id_col).alias("id"), F.col("simhash").alias("fp")
    )
    banded = fp.select(
        "id", "fp",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("fp"), i * bits_per).bitwiseAND(F.lit((1 << bits_per) - 1)).alias("key"),
            )
            for i in range(bands)
        ])).alias("b"),
    ).select("id", "fp", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.collect_list(F.struct("id", "fp")).alias("members"))
        .filter(F.size("members") > 1)
    )
    if max_band_freq is not None:
        buckets = _capped(buckets, F.size("members"), max_band_freq, "simhash")
    cand = (
        buckets.select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming32(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_dup_pairs(
    df: DataFrame,
    vec: str,
    id_col: str,
    threshold: float = 0.95,
    bucket_planes: int = 0,
    max_exact_rows: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold).

    ``bucket_planes`` = 0 -> exact all-pairs (oracle-checkable; O(n^2),
    fine <= ~10^5 rows). > 0 -> random-hyperplane LSH buckets first: only
    pairs agreeing on all plane signs are compared (recall < 1, the scale
    path; planes derived deterministically from md5 so runs reproduce).

    The exact mode fails fast past ``max_exact_rows`` rather than
    silently launching a quadratic join (the same guard shape as
    ``locate_matches(bounded=True)``'s ``max_bounded_records``).
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec).alias("v"))
    if bucket_planes <= 0:
        # limit(n+1).count() short-circuits: reads at most max_exact_rows+1
        # rows even on a 100 TB input, unlike a full count()
        over = base.select("id").limit(max_exact_rows + 1).count()
        if over > max_exact_rows:
            raise ValueError(
                f"embedding_dup_pairs(bucket_planes=0) is the exact all-pairs "
                f"oracle path and got > max_exact_rows={max_exact_rows} rows; "
                "pass bucket_planes>0 for the LSH scale path (or raise "
                "max_exact_rows explicitly)"
            )
    if bucket_planes > 0:
        dim = len(base.first()["v"])
        import hashlib

        def plane(p: int) -> list[float]:
            vals = []
            for d in range(dim):
                h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
                vals.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
            return vals

        sign_cols = []
        for p in range(bucket_planes):
            pv = F.lit(plane(p))  # one Literal, not dim CreateArray children
            s = F.aggregate(
                F.zip_with(F.col("v"), pv, lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            sign_cols.append(F.when(s >= 0, F.lit(1)).otherwise(F.lit(0)))
        base = base.withColumn("bucket", F.concat_ws("", *[c.cast("string") for c in sign_cols]))
    else:
        base = base.withColumn("bucket", F.lit("all"))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("cos", cosine(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cos") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round("cos", 6).alias("cos_sim"))
    )


def _semantic_pairs_np(side: DataFrame, threshold: float) -> DataFrame:
    """Within-cluster cosine pairs, BLAS form: one ``applyInPandas``
    group per cluster, rows sorted by id, unit-normalized matrix, and a
    BLOCKED gram product (block x full — peak extra memory is
    ``block_rows x n_cluster`` doubles, not ``n^2``) emitting upper-
    triangle hits. Zero vectors normalize to zero rows, so their cosine
    is 0 against everything — identical to ``functions.vectors.cosine``
    for any threshold > 0."""

    def gen(key, pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("id")
        ids = pdf["id"]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        n = np.linalg.norm(M, axis=1)
        nz = n > 0
        M[nz] = M[nz] / n[nz, None]
        out_a: list = []
        out_b: list = []
        B = 1024
        for i0 in range(0, len(ids), B):
            S = M[i0:i0 + B] @ M.T
            ii, jj = np.nonzero(S >= threshold)
            gi = ii + i0
            m = jj > gi  # strict upper triangle, ids ascend with position
            out_a.append(ids.iloc[gi[m]].reset_index(drop=True))
            out_b.append(ids.iloc[jj[m]].reset_index(drop=True))
        return pd.DataFrame({
            "id_a": pd.concat(out_a, ignore_index=True) if out_a else ids[:0],
            "id_b": pd.concat(out_b, ignore_index=True) if out_b else ids[:0],
        })

    # the pair schema inherits the caller's id type (string doc ids work
    # the same as longs — ordering and components only compare/min them)
    id_t = dict(zip(side.schema.names, (f.dataType.simpleString()
                                        for f in side.schema.fields)))["id"]
    return side.groupBy("c_id").applyInPandas(gen, f"id_a {id_t}, id_b {id_t}")


def semantic_dedup(
    df: DataFrame,
    vec: str,
    id_col: str,
    centroids: DataFrame,
    threshold: float = 0.95,
    max_cluster_rows: int | None = 100_000,
    pair_method: str = "auto",
    max_expr_rows: int = 1000,
    assign_method: str = "auto",
    persist_handle: list | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pruning over an embedding column, bucketed by a
    trained k-means quantizer so the pairwise step never goes all-pairs.

    Steps (all composition of existing primitives):

    1. nearest-centroid assignment (``similarity_search.ivf_assign`` — a
       pure map, no shuffle);
    2. cosine pairs ``>= threshold`` WITHIN each cluster only (one
       shuffle keyed by ``c_id``; k clusters of ~n/k rows make this
       tractable where corpus-wide all-pairs is not);
    3. connected components over those edges
       (``components.connected_components``, pointer-jump min-label);
    4. per component keep the member LEAST similar to its centroid (the
       paper's keep-the-outlier rule — survivors preserve diversity),
       ties broken by smallest id.

    Returns every input row labeled:
    ``(id_col, c_id, cent_sim, component, keep)`` — ``component`` is
    NULL for rows with no near-duplicate (which are always kept),
    ``cent_sim`` is rounded to 6 places for display while the keep
    decision orders on the exact double.

    Scale posture: assignment is map-only; the pair stage is one c_id
    shuffle; ``max_cluster_rows`` observably drops degenerate clusters
    (``_capped`` — same knob family as ``max_band_freq``) so a
    mega-cluster can't go quadratic; rows of capped-out clusters are
    still labeled (kept, component NULL). Components is O(log D) rounds
    of keyed joins.

    ``pair_method`` picks the pair stage's physical form (the
    ``ivf_assign`` expr/np pattern):

    - ``'expr'``: self-join + sequential-left-fold cosine with
      PRE-COMPUTED per-row norms (same doubles as folding per pair —
      ``norm(a)`` is one value however often it's evaluated), bit-
      identical to the DuckDB oracle's ``list_reduce`` (see
      ``plans.driver_queries_r7``). The oracle form.
    - ``'np'``: per-cluster blocked BLAS gram matrix in
      ``applyInPandas`` — two orders of magnitude faster on wide
      clusters; edge membership can differ from expr only for pairs
      whose cosine sits within float-summation-order distance of the
      threshold (the ``brute_force_topk_np`` caveat). The scale form.
    - ``'auto'`` (default): expr up to ``max_expr_rows`` input rows (one
      extra bounded ``limit().count()`` scan to decide), np past it —
      oracle-sized runs stay bit-reproducible, big runs get BLAS.

    ``assign_method`` forwards to ``ivf_assign`` (same expr/np choice
    for the ASSIGNMENT stage; its auto threshold is centroid count —
    pass ``'np'`` explicitly for wide-k production runs near the
    ``max_expr_centroids`` boundary, where the interpreted fold is the
    bottleneck).
    """
    from ncbi_analysis_spark.operators.components import connected_components
    from ncbi_analysis_spark.operators.similarity_search import ivf_assign

    assigned = ivf_assign(
        df, centroids, vec=vec, id_col=id_col, method=assign_method
    )
    cents = centroids.select(F.col("c_id"), F.col(vec).alias("__cent"))
    # persist: the assignment fold (k dots per row, the stage's entire
    # cost) feeds FOUR consumers — the pair_method probe, both sides of
    # the pair self-join, and the final label join — and ReusedExchange
    # never spans self-join aliases or the probe's separate job, so
    # without it the fold re-executes per consumer (measured r15:
    # semantic_dedup_prune ran the 32-task assign scan 3x). Values are
    # plan-deterministic, so caching cannot move a bit; MEMORY_AND_DISK
    # spills instead of OOM at corpus scale, and blocks are LRU-evicted
    # with the session (the curation_v4 lifecycle note).
    labeled = assigned.join(F.broadcast(cents), "c_id").withColumn(
        "__cent_sim", cosine(F.col("__cv"), F.col("__cent"))
    ).persist()
    if persist_handle is not None:
        # callers that fully materialize the result within a scope (the
        # streaming gate: one write per micro-batch) unpersist through
        # this handle — disk-tier blocks are not LRU-evicted, so a
        # long-running stream would otherwise accrete one per batch
        persist_handle.append(labeled)

    side = labeled.select(
        "c_id", F.col(id_col).alias("id"), F.col("__cv").alias("v")
    )
    if max_cluster_rows is not None:
        sizes = side.groupBy("c_id").agg(F.count("*").alias("__n"))
        ok = _capped(sizes, F.col("__n"), max_cluster_rows, "semdedup")
        # k clusters at most -> the surviving-cluster list broadcasts
        side = side.join(F.broadcast(ok.select("c_id")), "c_id")

    if pair_method == "auto":
        over = side.select("id").limit(max_expr_rows + 1).count()
        pair_method = "expr" if over <= max_expr_rows else "np"
    if pair_method == "np":
        pairs = _semantic_pairs_np(side, float(threshold))
    elif pair_method == "expr":
        from ncbi_analysis_spark.functions.vectors import dot, norm

        # norms once per ROW, not once per pair — same doubles either way
        s = side.withColumn("nrm", norm(F.col("v")))
        a, b = s.alias("a"), s.alias("b")
        cos = F.when(
            (F.col("a.nrm") == 0) | (F.col("b.nrm") == 0), F.lit(0.0)
        ).otherwise(
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
        )
        pairs = (
            a.join(b, (F.col("a.c_id") == F.col("b.c_id")) & (F.col("a.id") < F.col("b.id")))
            .withColumn("__cos", cos)
            .filter(F.col("__cos") >= F.lit(float(threshold)))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
    else:
        raise ValueError(f"unknown pair_method: {pair_method!r}")

    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    out = labeled.join(comp, id_col, "left")
    # COALESCE(component, id) gives every no-dup row its own singleton
    # window partition instead of one giant NULL partition (a component
    # id is the min MEMBER id of a multi-row component, so it can never
    # collide with a singleton's own id — ids are unique)
    w = Window.partitionBy(
        F.coalesce(F.col("component"), F.col(id_col))
    ).orderBy(F.col("__cent_sim").asc(), F.col(id_col).asc())
    return out.withColumn("keep", F.row_number().over(w) == 1).select(
        id_col,
        "c_id",
        F.round("__cent_sim", 6).alias("cent_sim"),
        "component",
        "keep",
    )


def benchmark_ngram_overlap(
    df: DataFrame,
    bench_df: DataFrame,
    text: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Training-data decontamination: per document, how many of its
    distinct token n-grams appear in ANY benchmark document.

    Returns ``(id_col, n_grams, n_shared, contamination)`` where
    ``contamination = n_shared / n_grams``.

    Scale: benchmark suites are tiny relative to a 100 TB corpus (millions
    of n-grams at most), so the distinct benchmark-gram set is broadcast —
    the corpus side is a map-only semi join plus one aggregation keyed by
    document id (shared with the totals count, same partitioning). For a
    benchmark set too large to broadcast, drop the hint and let AQE pick a
    shuffled semi join on the gram key.
    """
    doc_sh = shingle_rows(df, text, id_col, n).distinct()
    bench_sh = (
        shingle_rows(bench_df, text, id_col, n)
        .select("sh").distinct()
        .withColumn("__hit", F.lit(1))
    )
    # single corpus pass: mark each distinct gram against the broadcast
    # benchmark set, then count totals and hits in ONE aggregation that
    # reuses the shingle stage's doc-id partitioning (no second scan, no
    # extra shuffle)
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_shared"),
        )
        .withColumn("contamination", F.col("n_shared") / F.col("n_grams"))
    )


def _bloom_positions(sh_col: Column, n_bits: int, n_hashes: int) -> Column:
    """k bit positions per gram: xxhash64 with k salt prefixes, mod the
    filter size. Computed with the SAME Spark expression on the build and
    probe sides, so hash consistency is by construction (no Python
    reimplementation of xxhash64 to drift)."""
    return F.array(*[
        F.pmod(F.xxhash64(F.concat(F.lit(f"{h}|"), sh_col)), F.lit(n_bits))
        for h in range(n_hashes)
    ])


def build_ngram_bloom(
    bench_df: DataFrame,
    text: str,
    id_col: str,
    n: int = 3,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
):
    """Distributed Bloom-filter build over the benchmark set's distinct
    token n-grams — the decontamination path for benchmark suites too
    large to broadcast exactly (benchmark_ngram_overlap's broadcast set).

    Build is fully distributed: grams explode to (word, bitmask) rows and
    a bit_or hash aggregate (map-side combined) produces at most
    n_bits/64 longs — the only driver-side data is the finished filter
    (n_bits/8 bytes; 128 KiB for the default 2^20 bits), which then
    broadcasts to every probe task.

    Returns ``(words ndarray[int64], n_bits, n_hashes)``.
    """
    import numpy as np

    sh = shingle_rows(bench_df, text, id_col, n).select("sh").distinct()
    words = (
        sh.select(F.explode(_bloom_positions(F.col("sh"), n_bits, n_hashes)).alias("pos"))
        .select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("m"))
        .collect()
    )
    arr = np.zeros(n_bits // 64, dtype=np.int64)
    for r in words:
        arr[r["w"]] = r["m"]
    return arr, n_bits, n_hashes


def bloom_ngram_overlap(
    df: DataFrame,
    bloom,
    text: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Bloom-probed twin of benchmark_ngram_overlap: same output columns
    ``(id_col, n_grams, n_shared, contamination)``, with ``n_shared``
    counting grams the filter REPORTS as benchmark members — an upper
    bound on the true count (no false negatives; FPR set by n_bits/
    n_hashes vs benchmark cardinality).

    Probe stays almost entirely in codegen: shingles and their k bit
    positions are Spark expressions; Python is only the membership test —
    a vectorized numpy gather against the broadcast 128 KiB word array
    per Arrow batch — then the totals aggregation is the same one-shuffle
    groupBy as the exact operator.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    arr, n_bits, n_hashes = bloom
    bc = df.sparkSession.sparkContext.broadcast(arr)

    doc_sh = shingle_rows(df, text, id_col, n).distinct()
    pos_df = doc_sh.select(
        F.col(id_col), _bloom_positions(F.col("sh"), n_bits, n_hashes).alias("positions")
    )
    id_type = {f.name: f for f in df.schema.fields}[id_col].dataType
    schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("hit", T.IntegerType()),
    ])

    def gen(batches):
        words = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            P = np.array(list(pdf["positions"]), dtype=np.int64)  # (rows, k)
            hits = ((words[P >> 6] >> (P & 63)) & 1).all(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "hit": hits.astype(np.int32)})

    return (
        pos_df.mapInPandas(gen, schema)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("hit").cast("long").alias("n_shared"),
        )
        .withColumn("contamination", F.col("n_shared") / F.col("n_grams"))
    )


def repetition_signals(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``n_tokens`` — whitespace token count
    - ``distinct_frac`` — distinct tokens / tokens
    - ``top_token_frac`` — occurrences of the most frequent token / tokens
    - ``dup_2gram_frac`` — 1 - distinct 2-grams / total 2-grams

    Repetitious machine-generated text scores low distinct_frac / high
    top_token_frac / high dup_2gram_frac; used as filter predicates in
    LLM-corpus curation.

    Scale: explode + two aggregations, both keyed by document id (one
    shuffle, reused); no Python. All ratios are exact integer divisions in
    double, so the DuckDB oracle matches bit-for-bit.
    """
    from ncbi_analysis_spark.functions.text import tokens

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text))).alias("tok"))
    per_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    tok_stats = per_tok.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_c"),
    )
    grams = shingle_rows(df, text, id_col, 2)
    gram_stats = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_2grams"),
        F.count_distinct(F.col("sh")).cast("long").alias("n_2distinct"),
    )
    return (
        tok_stats.join(gram_stats, id_col, "inner")
        .select(
            id_col,
            "n_tokens",
            (F.col("n_distinct") / F.col("n_tokens")).alias("distinct_frac"),
            (F.col("top_c") / F.col("n_tokens")).alias("top_token_frac"),
            (F.lit(1.0) - F.col("n_2distinct") / F.col("n_2grams")).alias("dup_2gram_frac"),
        )
    )


def char_window_dup_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    window: int = 32,
    stride: int = 16,
    max_window_freq: int | None = None,
) -> DataFrame:
    """Exact-substring duplicate detection: document pairs sharing at
    least one exact ``window``-char substring sampled every ``stride``
    chars — catches partial copies (quoted passages, boilerplate blocks)
    that whole-document similarity misses.

    Returns ``(id_a, id_b, n_shared_windows)``.

    Scale: shuffle carries (md5 digest, id) per window — ~len/stride
    rows per document, independent of window size. ``max_window_freq``
    caps ultra-common windows (boilerplate headers) exactly like the
    Jaccard shingle cap — the skew guard for the self-join.
    """
    from ncbi_analysis_spark.functions.text import ascii_fast_grams

    t = F.col(text)

    def n_wins(length_col):
        return ((length_col - window) / stride).cast("int") + 1

    # md5 over the raw UTF-8 bytes equals md5 over the string, so the
    # ASCII byte fast path (linear; see ascii_fast_grams) needs no
    # decode step here
    hashes = ascii_fast_grams(
        t,
        F.transform(
            F.sequence(F.lit(0), n_wins(F.length(t)) - 1),
            lambda i: F.md5(t.substr(i * stride + 1, F.lit(window))),
        ),
        lambda tb: F.transform(
            F.sequence(F.lit(0), n_wins(F.octet_length(t)) - 1),
            lambda i: F.md5(tb.substr(i * stride + 1, F.lit(window))),
        ),
    )
    wins = (
        df.filter(F.length(t) >= window)
        .select(F.col(id_col).alias("id"), F.explode(hashes).alias("wh"))
        .distinct()
    )
    # bucket-explode (single window scan; see minhash_lsh_pairs) — the
    # frequency cap becomes a plain size filter on the bucket, replacing
    # the extra aggregation + broadcast-join-back the self-join form needed
    buckets = (
        wins.groupBy("wh")
        .agg(F.collect_list("id").alias("members"))
        .filter(F.size("members") > 1)
    )
    if max_window_freq is not None:
        buckets = _capped(buckets, F.size("members"), max_window_freq, "char_window")
    return (
        buckets.select(F.explode("members").alias("id_a"), "members")
        .select("id_a", F.explode("members").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_windows"))
    )


def boilerplate_lines(
    df: DataFrame,
    text: str,
    id_col: str,
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate detection: every distinct line occurring
    in at least ``min_docs`` distinct documents, with its spread.

    Returns ``(line, n_docs)``.

    Scale: explode lines -> two-phase distinct count keyed by line (one
    shuffle; map-side partial aggregation collapses each document's
    repeats of a line before the exchange). The output is tiny relative
    to the corpus — it is the *repeated* subset.
    """
    import re

    lines = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text), re.escape(sep), -1)).alias("line"),
    )
    return (
        lines.groupBy("line")
        .agg(F.count_distinct("__id").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_repeated_lines(
    df: DataFrame,
    text: str,
    id_col: str,
    sep: str = "\n",
    min_docs: int = 2,
    protect_empty: bool = True,
) -> DataFrame:
    """CCNet/Gopher-style line-level boilerplate removal: drop every line
    that appears in >= ``min_docs`` distinct documents anywhere in the
    corpus, and reassemble each document from its surviving lines in
    original order. The classic pre-training cleanup for navigation
    chrome, cookie banners and license headers (no reference analog —
    LLM-pipeline extension; the reference's nearest idea is the
    ignore-flag row filter, src/analysis/gene_location_analysis.py).

    Returns ``(id_col, text, n_lines, n_removed)`` — one row per input
    document; a fully-boilerplate document survives with ``text = ''``.

    ``protect_empty`` (default on) exempts the empty line from removal:
    in any realistic corpus the blank line trivially clears ``min_docs``
    and removing it would collapse EVERY paragraph boundary corpus-wide
    ('para1\\n\\npara2' -> 'para1\\npara2'), breaking downstream
    paragraph-aware chunkers. Pass ``protect_empty=False`` to treat
    blank lines like any other line.

    Scale: three shuffles, all on bounded-width keys — (1) line-keyed
    count-distinct (map-side combined), (2) the lines←boilerplate join is
    keyed by the line itself; hot lines are exactly the boilerplate being
    dropped, so the skewed rows exit before the rebuild, (3) doc-keyed
    rebuild via sort_array(collect_list) — per-document state only, no
    global sort, no window. Line values shuffle at most twice; use
    ``boilerplate_lines`` + a broadcast anti-join instead when the
    boilerplate set is known-small.
    """
    import re

    pat = re.escape(sep)
    # NULL text behaves as the empty document (chunk_documents' posture);
    # without the coalesce, size(split(NULL)) = -1 produces a junk
    # n_lines=-1 / n_removed=-1 row
    txt = F.coalesce(F.col(text), F.lit(""))
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(txt, pat, -1)).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.count_distinct("__id").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line")
    )
    if protect_empty:
        boiler = boiler.filter(F.col("line") != "")
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("__clean"),
        F.count(F.lit(1)).cast("long").alias("__n_kept"),
    )
    return (
        df.select(
            F.col(id_col),
            (F.size(F.split(txt, pat, -1))).cast("long").alias("__n_lines"),
        )
        .join(rebuilt, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("__clean"), F.lit("")).alias(text),
            F.col("__n_lines").alias("n_lines"),
            (F.col("__n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def _anchored_windows(
    df: DataFrame,
    text: str,
    id_col: str,
    window: int,
    anchor_k: int,
    anchor_bits: int,
    anchor_method: str,
    max_nonascii_probe: int = 32_768,
) -> DataFrame:
    """Content-defined anchored window rows
    ``(id_col, span_start, span_end, wh)`` — the shared front half of
    ``dup_span_windows`` (within-corpus) and ``remove_bench_spans``
    (cross-corpus). See ``dup_span_windows`` for the anchoring model
    and scale notes.

    Returns one row per anchored window occurrence, 0-based char
    offsets ``[span_start, span_end)``, ``wh`` the window md5.

    ``max_nonascii_probe`` bounds the one remaining quadratic corner
    (SCALING.md trade-off note): non-ASCII rows can't take the
    byte-sliced O(1)-offset fast path, and char ``substr`` at offset i
    is O(i), so probing every position of an L-char non-ASCII document
    costs O(L²). Positions past the cap are not probed in such rows —
    duplicated passages that START beyond it are missed (ones straddling
    it are still caught up to ``window`` chars before it) — bounding the
    per-document worst case at O(cap²) regardless of corpus content.
    The truncation is observable, not silent (the ``_capped`` metric
    pattern): an ``observe()`` metric reports how many documents were
    truncated and how many probe positions were skipped. ASCII rows are
    never truncated (their probe is linear). Raise the cap — or 0 to
    disable — for corpora where long non-ASCII documents dominate and
    the quadratic cost is acceptable.
    """
    if anchor_bits % 4 != 0:
        raise ValueError(f"anchor_bits must be a multiple of 4 (hex-digit "
                         f"granularity for the cross-engine rule), got {anchor_bits}")
    if anchor_method not in ("md5", "xxhash64"):
        raise ValueError(f"anchor_method must be 'md5' or 'xxhash64', "
                         f"got {anchor_method!r}")
    from ncbi_analysis_spark.functions.text import ascii_fast_grams
    from ncbi_analysis_spark.operators.spread import spread_narrow

    # the per-position md5 probe is ~100x CPU per input byte, so a
    # byte-narrow input (single scan split, broadcast-join output on
    # the scan's tasks) serializes the stage on 1-2 cores (profiled
    # r15: a 4.1s two-task span probe inside curation_v6 on an idle
    # 32-core box) — guarded round-robin, no-op at corpus scale
    df = spread_narrow(df)

    zeros = "0" * (anchor_bits // 4)
    t = F.coalesce(F.col(text), F.lit(""))

    def seed_pred(gram: Column) -> Column:
        if anchor_bits == 0:
            # EXACT mode: every position is an anchor, so every
            # duplicated `window`-char substring is found — Lee et
            # al.'s suffix-array exact tier, at ~L window rows per
            # document instead of ~L/2^anchor_bits (span_recall_audit's
            # truth leg; first-class via dup_span_removal_exact)
            return F.lit(True)
        if anchor_method == "md5":
            # cross-engine reproducible (DuckDB oracle); ~2x the cost of
            # the xxhash64 form on the anchor probe
            return F.md5(gram).substr(1, anchor_bits // 4) == F.lit(zeros)
        # production fast path: same density, same offset-independence,
        # JVM xxhash64 instead of md5+hex — NOT oracle-reproducible
        return F.pmod(F.xxhash64(gram), F.lit(1 << anchor_bits)) == 0

    def win_structs(src, length_col):
        # the anchor probe touches EVERY position, so it must slice at
        # O(1) offsets — the every-offset substr-on-string form is the
        # O(L²) trap ascii_fast_grams exists for (SCALING.md, dedup
        # family); md5 over the raw UTF-8 bytes equals md5 of the string
        anchors = F.filter(
            F.sequence(F.lit(0), length_col - window),
            lambda i: seed_pred(src.substr(i + 1, F.lit(anchor_k))),
        )
        return F.transform(
            anchors,
            lambda i: F.struct(
                i.alias("span_start"),
                F.md5(src.substr(i + 1, F.lit(window))).alias("wh"),
            ),
        )

    char_len = (
        F.least(F.length(t), F.lit(max_nonascii_probe))
        if max_nonascii_probe > 0
        else F.length(t)
    )
    structs = ascii_fast_grams(
        t,
        win_structs(t, char_len),
        lambda tb: win_structs(tb, F.octet_length(t)),
    )
    src = df.filter(F.length(t) >= window)
    if max_nonascii_probe > 0:
        truncated = (
            (F.octet_length(t) != F.length(t))
            & (F.length(t) > max_nonascii_probe)
        )
        src = src.observe(
            f"anchored_probe_cap_{next(_cap_seq)}",
            F.coalesce(F.sum(truncated.cast("long")), F.lit(0))
            .alias("truncated_docs"),
            F.coalesce(
                F.sum(F.when(truncated,
                             (F.length(t) - max_nonascii_probe).cast("long"))),
                F.lit(0),
            ).alias("skipped_positions"),
        )
    return (
        src.select(F.col(id_col), F.explode(structs).alias("w"))
        .select(
            id_col,
            F.col("w.span_start").alias("span_start"),
            (F.col("w.span_start") + window).alias("span_end"),
            F.col("w.wh").alias("wh"),
        )
    )


def dup_span_windows(
    df: DataFrame,
    text: str,
    id_col: str,
    window: int = 32,
    anchor_k: int = 8,
    anchor_bits: int = 4,
    min_docs: int = 2,
    anchor_method: str = "md5",
    max_nonascii_probe: int = 32_768,
) -> DataFrame:
    """Cross-document duplicated char-window spans with a deterministic
    keeper: ``window``-char substrings starting at CONTENT-DEFINED
    anchor positions whose md5 occurs in >= ``min_docs`` distinct
    documents, one row per occurrence, tagged with the corpus-wide
    keeper (the minimum ``id_col`` holding that window — that document
    keeps its copy; every other occurrence is a removal candidate for
    ``remove_dup_spans``).

    Anchoring is the load-bearing choice (winnowing / content-defined
    chunking): a position ``i`` is an anchor iff the md5 of the
    ``anchor_k``-char seed gram at ``i`` starts with ``anchor_bits``
    zero bits (expected anchor density 2^-anchor_bits, i.e. one window
    per ~16 chars at the default). Because the anchor rule looks only at
    *content*, two occurrences of a duplicated passage anchor at the
    SAME relative positions whatever their absolute offsets — a
    fixed-stride sample (``char_window_dup_pairs``'s geometry) only
    collides when the copies happen to align modulo the stride, which
    pastes into different surrounding text almost never do.

    Returns ``(id_col, span_start, span_end, wh, keeper)`` with 0-based
    ``[span_start, span_end)`` char offsets.

    Char-based (``substring``/``md5``) so offsets line up with the
    rebuild step; md5 of a substring hashes its UTF-8 encoding on both
    Spark and DuckDB, so the digests are cross-engine stable even for
    non-ASCII text.

    Scale: the per-position anchor test is one md5 over ``anchor_k``
    chars — linear in corpus size, map-only, inside codegen
    (byte-sliced via ascii_fast_grams); the shuffle then carries
    (digest, id, start) — ~len·2^-anchor_bits rows per document; the
    per-digest aggregate is two pure aggregates (count_distinct, min),
    no member list, so a corpus-wide boilerplate window costs one agg
    row, not a collected bucket; the join back is keyed by digest with
    no row explosion (each occurrence matches exactly one digest row).
    """
    wins = _anchored_windows(df, text, id_col, window, anchor_k,
                             anchor_bits, anchor_method, max_nonascii_probe)
    dups = (
        wins.groupBy("wh")
        .agg(
            F.count_distinct(id_col).alias("__n_docs"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("__n_docs") >= min_docs)
        .select("wh", "keeper")
    )
    return wins.join(dups, "wh").select(
        id_col, "span_start", "span_end", "wh", "keeper"
    )


def remove_dup_spans(
    df: DataFrame,
    text: str,
    id_col: str,
    window: int = 32,
    anchor_k: int = 8,
    anchor_bits: int = 4,
    min_docs: int = 2,
    anchor_method: str = "md5",
    max_nonascii_probe: int = 32_768,
) -> DataFrame:
    """Span-level exact-substring deduplication (Lee et al. 2022,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better"): instead of dropping whole documents that share a passage
    (over-deletion) or keeping both (under-deletion), cut the duplicated
    span itself out of every document except the corpus-wide keeper (the
    minimum ``id_col`` holding that window) and reassemble the rest.
    The passage-granularity sibling of ``remove_repeated_lines``; span
    detection is ``dup_span_windows``'s content-defined anchor model
    (offset-independent, see its docstring), so the removed region is
    the union of duplicated ``window``-char anchored windows, which
    converges on the true duplicated passage as ``anchor_bits`` shrinks
    (denser anchors).

    Returns ``(id_col, text, n_spans_removed, n_chars_removed)`` — one
    row per input document (untouched documents come back verbatim with
    zero counts); ``n_spans_removed`` counts merged maximal spans,
    ``n_chars_removed`` their total char length.

    Scale: ``dup_span_windows``'s bounded shuffles, then one doc-keyed
    aggregation collects each document's own removal spans (bounded by
    ~len·2^-anchor_bits struct rows per doc — per-document state only),
    and the overlap-merge + complement-rebuild run as codegen'd array
    folds over that per-row array; no window function, no global sort,
    no Python.

    ``anchor_bits=0`` is EXACT mode: every position anchors, so every
    duplicated ``window``-char substring in the corpus is found and
    removed — the guarantee of Lee et al.'s suffix-array exact tier
    (recall 1.0 by construction, measured rather than assumed by
    ``span_recall_audit``'s truth leg) at ~L window rows per document
    through the digest shuffle instead of ~L/2^anchor_bits. Use it when
    the corpus budget allows one window-sized digest row per char;
    anchored mode is the same pipeline at a fraction of the shuffle.
    """
    spans = dup_span_windows(df, text, id_col, window, anchor_k,
                             anchor_bits, min_docs, anchor_method,
                             max_nonascii_probe)
    return _remove_spans(
        df, spans.filter(F.col(id_col) != F.col("keeper")), text, id_col)


def _remove_spans(df: DataFrame, spans: DataFrame, text: str,
                  id_col: str) -> DataFrame:
    """Shared back half of the span-removal family: given removal rows
    ``(id_col, span_start, span_end)``, merge overlaps and rebuild each
    document's complement. One doc-keyed aggregation collects each
    document's own spans (bounded per-document state), then the
    overlap-merge + complement-rebuild run as codegen'd array folds —
    no window function, no global sort, no Python.

    Returns ``(id_col, text, n_spans_removed, n_chars_removed)`` — one
    row per ``df`` document; documents with no spans come back verbatim
    with zero counts.
    """
    from ncbi_analysis_spark.operators.spread import spread_narrow

    # the complement-rebuild folds (per-span substr+concat chains) are
    # CPU-dense per row; with per_doc broadcast the join runs on the
    # byte-narrow doc scan's 1-2 tasks — guarded spread, no-op at scale
    df = spread_narrow(df)
    per_doc = (
        spans
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_set(F.struct("span_start", "span_end"))
            ).alias("__sp")
        )
    )
    # fold 1: union overlapping/adjacent sampled windows into maximal
    # removal spans (sorted input -> compare against the last merged)
    merged = F.aggregate(
        F.col("__sp"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
        lambda acc, x: F.when(
            F.size(acc) > 0,
            F.when(
                F.element_at(acc, -1)["span_end"] >= x["span_start"],
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["span_start"].alias("span_start"),
                            F.greatest(
                                F.element_at(acc, -1)["span_end"], x["span_end"]
                            ).alias("span_end"),
                        )
                    ),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ).otherwise(F.array(x)),
    )
    t = F.coalesce(F.col(text), F.lit(""))
    # fold 2: complement rebuild — walk the merged spans left to right,
    # keeping [pos, span_start) each step, then the tail after the last
    rebuilt = F.aggregate(
        F.col("__merged"),
        F.struct(F.lit(0).alias("pos"), F.lit("").alias("txt")),
        lambda acc, sp: F.struct(
            sp["span_end"].alias("pos"),
            F.concat(
                acc["txt"],
                t.substr(acc["pos"] + 1, sp["span_start"] - acc["pos"]),
            ).alias("txt"),
        ),
        lambda acc: F.concat(
            acc["txt"], t.substr(acc["pos"] + 1, F.length(t) - acc["pos"])
        ),
    )
    removed_chars = F.aggregate(
        F.col("__merged"),
        F.lit(0),
        lambda acc, sp: acc + (sp["span_end"] - sp["span_start"]),
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("__merged", merged)
        .select(
            id_col,
            F.when(F.col("__merged").isNull(), t)
            .otherwise(rebuilt)
            .alias(text),
            F.coalesce(F.size("__merged"), F.lit(0))
            .cast("long")
            .alias("n_spans_removed"),
            F.coalesce(removed_chars, F.lit(0))
            .cast("long")
            .alias("n_chars_removed"),
        )
    )


def span_dup_stats(
    df: DataFrame,
    text: str,
    id_col: str,
    window: int = 32,
    anchor_k: int = 8,
    anchor_bits: int = 4,
    min_docs: int = 2,
    anchor_method: str = "md5",
    max_nonascii_probe: int = 32_768,
) -> DataFrame:
    """Per-document duplication mass: what fraction of each document's
    chars is covered by a ``window``-char substring that also occurs in
    >= ``min_docs`` distinct documents (keeper-INCLUSIVE — both copies
    of a duplicated passage count as duplicated content; this measures
    mass, it does not pick survivors). The doc-level signal behind the
    "drop documents that are mostly boilerplate/duplication" rule of
    the RefinedWeb/Gopher-style cleaning recipes — span REMOVAL
    (``remove_dup_spans``) edits documents; this gate drops the ones
    not worth editing.

    Returns ``(id_col, n_chars, dup_chars, dup_ratio_ppm)`` — one row
    per input document; ``dup_ratio_ppm`` is integer parts-per-million
    (floor), exact across engines (no float division on the oracle
    path). Empty/NULL docs report 0 ppm.

    Scale: the window pipeline is ``dup_span_windows``'s (anchored by
    default — ``anchor_bits=0`` for the exact tier); coverage reuses
    the span-removal overlap-merge fold, and Catalyst prunes the
    unused text-rebuild expression from the plan (counts only).
    """
    wins = _anchored_windows(df, text, id_col, window, anchor_k,
                             anchor_bits, anchor_method,
                             max_nonascii_probe)
    dups = (
        wins.groupBy("wh")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("wh")
    )
    spans = wins.join(dups, "wh").select(id_col, "span_start", "span_end")
    cov = _remove_spans(df, spans, text, id_col)
    # _remove_spans returns the REBUILT text: original length =
    # complement + removed (no join back to df needed)
    n_chars = (F.length(F.coalesce(F.col(text), F.lit("")))
               + F.col("n_chars_removed"))
    return cov.select(
        id_col,
        n_chars.cast("long").alias("n_chars"),
        F.col("n_chars_removed").alias("dup_chars"),
    ).select(
        id_col,
        "n_chars",
        "dup_chars",
        # integer floor division end-to-end (Spark `div` on bigints ==
        # DuckDB `//` for non-negative operands): double division +
        # cast('long') could round across an integer boundary for docs
        # beyond ~9e9 chars, breaking the exact-match oracle contract
        F.when(F.col("n_chars") > 0,
               F.expr("(dup_chars * CAST(1000000 AS BIGINT)) div n_chars"))
        .otherwise(F.lit(0)).cast("long").alias("dup_ratio_ppm"),
    )


def drop_high_dup_docs(
    df: DataFrame,
    text: str,
    id_col: str,
    max_dup_ratio_ppm: int = 500_000,
    **span_kwargs,
) -> DataFrame:
    """Keep only documents whose duplication mass is UNDER the
    threshold (default: drop docs that are >= 50% duplicated windows).
    The whole-document sibling of ``remove_dup_spans`` — use this
    first to discard documents not worth span-editing, then
    span-remove what survives. Returns surviving rows of ``df``
    unchanged (the gate is a semi-join on the stats, broadcast-sized
    per partition of ids)."""
    stats = span_dup_stats(df, text, id_col, **span_kwargs)
    keep = stats.filter(
        F.col("dup_ratio_ppm") < max_dup_ratio_ppm).select(id_col)
    return df.join(keep, id_col, "left_semi")


def remove_bench_spans(
    df: DataFrame,
    bench_df: DataFrame,
    text: str,
    id_col: str,
    bench_text: str | None = None,
    window: int = 32,
    anchor_k: int = 8,
    anchor_bits: int = 4,
    anchor_method: str = "md5",
    broadcast_bench: bool = True,
    max_nonascii_probe: int = 32_768,
) -> DataFrame:
    """Span-level decontamination — the cross-corpus sibling of
    ``remove_dup_spans`` (Lee et al. 2022 applied to eval hygiene): cut
    every anchored window whose content also appears in the held-out
    benchmark set OUT of the corpus document, keeping the rest. Dropping
    whole documents for one shared paragraph over-deletes (the
    ``fuzzy_decon_pairs`` / ``benchmark_ngram_overlap`` drop posture);
    keeping them under-deletes; this removes exactly the contaminated
    passages. The benchmark side is by definition the keeper — run this
    on the corpus side only.

    Returns ``(id_col, text, n_spans_removed, n_chars_removed)``.

    Scale: both sides anchor with the same content-defined rule
    (``_anchored_windows`` — no keeper aggregate needed on either
    side); the bench side reduces to its DISTINCT window digests —
    benchmark suites are small, so the digest set broadcasts into a
    map-side semi join (``broadcast_bench=False`` for an unusually
    large one lets AQE plan it shuffled); then the shared merge+rebuild
    folds. The corpus is scanned once.
    """
    wins = _anchored_windows(df, text, id_col, window, anchor_k,
                             anchor_bits, anchor_method, max_nonascii_probe)
    if bench_text is None:
        bench_text = text
    bench_id = bench_df.columns[0]
    bwins = _anchored_windows(
        bench_df, bench_text, bench_id,
        window, anchor_k, anchor_bits, anchor_method, max_nonascii_probe,
    ).select("wh").distinct()
    if broadcast_bench:
        bwins = F.broadcast(bwins)
    hits = wins.join(bwins, "wh", "left_semi").select(
        id_col, "span_start", "span_end")
    return _remove_spans(df, hits, text, id_col)


# ---------------------------------------------------------------------------
# Persisted, appendable MinHash-LSH index — incremental crawl dedup
# ---------------------------------------------------------------------------

_LSH_PARAMS_FILE = "_lsh_params.json"


def _lsh_params_guard(spark, path: str, num_perm: int, bands: int,
                      shingle_n: int, write: bool) -> None:
    """Band digests are only comparable under identical (num_perm,
    bands, shingle_n); a parameter drift between index builds and later
    appends/probes silently finds zero collisions. The index directory
    carries its parameters and every append/probe validates them.

    Marker I/O goes through the Hadoop FileSystem API
    (``sources.fsutil``) so the marker lands beside the parquet
    partitions on ANY scheme (s3a/abfs/hdfs/file) — driver-local
    ``open`` would write to the wrong filesystem on an object store."""
    import json

    from ncbi_analysis_spark.sources import fsutil

    params = {"num_perm": num_perm, "bands": bands, "shingle_n": shingle_n}
    marker = path.rstrip("/") + "/" + _LSH_PARAMS_FILE
    if write:
        fsutil.write_text(spark, marker, json.dumps(params))
        return
    if not fsutil.exists(spark, marker):
        raise ValueError(
            f"{path!r} is not a write_lsh_index directory (missing "
            f"{_LSH_PARAMS_FILE}); build it with write_lsh_index first"
        )
    stored = json.loads(fsutil.read_text(spark, marker))
    if stored != params:
        raise ValueError(
            f"LSH index at {path!r} was built with {stored}, got {params}; "
            "band digests are not comparable across parameter changes — "
            "rebuild the index or match its parameters"
        )


def read_lsh_params(spark, path: str) -> dict:
    """The (num_perm, bands, shingle_n) a ``write_lsh_index`` directory
    was built with — for callers that must match the index rather than
    dictate to it (the streaming gate probes with whatever the index
    uses). Raises on a non-index directory."""
    import json

    from ncbi_analysis_spark.sources import fsutil

    marker = path.rstrip("/") + "/" + _LSH_PARAMS_FILE
    if not fsutil.exists(spark, marker):
        raise ValueError(
            f"{path!r} is not a write_lsh_index directory (missing "
            f"{_LSH_PARAMS_FILE}); build it with write_lsh_index first"
        )
    return json.loads(fsutil.read_text(spark, marker))


def write_lsh_index(
    df: DataFrame,
    text: str,
    id_col: str,
    path: str,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> None:
    """Persist the corpus's LSH band rows ``(id, band, band_hash)`` as
    a parquet index partitioned by band — the crawl-dedup counterpart
    of ``write_ivf_index``: build once over the ingested corpus, then
    each new crawl batch probes it (``lsh_index_collisions``) and
    appends its own survivors (``append_to_lsh_index``) without ever
    recomputing old signatures. The directory records its
    (num_perm, bands, shingle_n) so a parameter drift fails loudly
    instead of silently matching nothing."""
    rows = _minhash_band_rows(df, text, id_col, num_perm, bands, shingle_n)
    # overwrite first (it clears the directory), THEN record the params.
    # REBALANCE(band) clusters the write so file count tracks per-band
    # data size, not upstream task count (tasks × bands tiny files
    # otherwise; AQE still splits a hot band across writers at scale)
    rows = rows.hint("rebalance", F.col("band"))
    rows.write.mode("overwrite").partitionBy("band").parquet(path)
    _lsh_params_guard(df.sparkSession, path, num_perm, bands, shingle_n,
                      write=True)


def read_lsh_index(spark, path: str) -> DataFrame:
    """Open a ``write_lsh_index`` directory for probing — the LIVE
    view: if ``delete_from_lsh_index`` has tombstoned any ids, they are
    anti-joined out here (broadcast small side), so every probe built
    on this reader honors deletes without a rebuild. Never-deleted
    indexes get the bare scan, zero plan overhead."""
    from ncbi_analysis_spark.operators import tombstones as ts

    return ts.apply_tombstones(spark.read.parquet(path), path, "id")


def delete_from_lsh_index(ids: DataFrame, path: str,
                          id_col: str = "id") -> int:
    """Remove documents from a persisted LSH index without rewriting
    it: append the ids to the index's tombstone table
    (``operators/tombstones.py``). ``read_lsh_index`` then serves
    exactly the index a rebuild without those docs would produce (the
    staged ``lsh_delete_probe`` oracle pins this end-to-end); run
    ``compact_lsh_index`` periodically to fold tombstones into the data
    files. Idempotent — re-deletes and never-indexed ids are no-ops.
    Returns the batch's distinct-id count."""
    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.sources import fsutil

    spark = ids.sparkSession
    if not fsutil.exists(spark, path.rstrip("/") + "/" + _LSH_PARAMS_FILE):
        raise ValueError(
            f"{path!r} is not a write_lsh_index directory (missing "
            f"{_LSH_PARAMS_FILE}); nothing to delete from"
        )
    with ts.maintenance_lock(spark, path, "delete_from_lsh_index") as lk:
        lk.assert_owned()  # fence before the tombstone-append commit
        n = ts.append_tombstones(ids.select(F.col(id_col).alias("id")),
                                 path, "id")
    ts.warn_if_tombstones_large(spark, path)
    return n


def compact_lsh_index(spark, path: str) -> None:
    """Fold accumulated tombstones into the index's data files and
    coalesce each band to one file: rewrite the live view into a
    hidden tmp dir (one shuffle keyed on band — probes reading the old
    files never race a half-written swap), swap the band directories
    in, clear the tombstones. Search results are identical before and
    after (tests/test_index_delete.py); append/delete afterwards as
    normal. Idempotent on crash — see ``tombstones.swap_partition_dirs``."""
    from ncbi_analysis_spark.operators import tombstones as ts

    with ts.maintenance_lock(spark, path, "compact_lsh_index") as lk:
        ts.resume_pending_swap(spark, path)
        live = ts.apply_tombstones(spark.read.parquet(path), path, "id")
        tmp = "_compact_tmp"
        # hash-repartition on the partition column: each band lands
        # whole in one task, so the rewrite emits exactly one file per
        # band
        live.repartition("band").write.mode("overwrite").partitionBy(
            "band").parquet(path.rstrip("/") + "/" + tmp)
        lk.assert_owned()  # fence before the swap commit
        ts.swap_partition_dirs(spark, path, tmp)


def append_to_lsh_index(
    new_df: DataFrame,
    text: str,
    id_col: str,
    path: str,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental index maintenance: compute the new batch's band rows
    under the INDEX's parameters (validated) and parquet-partition-
    append them — per-band directories gain files, nothing is
    rewritten, ingest I/O scales with the batch. Appending band rows is
    associative, so any split of the corpus across write/append calls
    yields the same index contents (the ann_index_append property,
    asserted by the staged oracle). Returns per-band appended counts
    (bounded by ``bands``)."""
    from ncbi_analysis_spark.operators import tombstones as _ts

    spark = new_df.sparkSession
    _lsh_params_guard(spark, path, num_perm, bands,
                      shingle_n, write=False)
    with _ts.maintenance_lock(spark, path, "append_to_lsh_index") as lk:
        # the tombstone check lives INSIDE the lock: a concurrent
        # delete landing between check and append would silently mask
        # the re-appended ids
        tomb = _ts.read_tombstones(spark, path)
        if tomb is not None:
            # a tombstoned id re-appended would be silently masked by
            # the read_lsh_index anti-join until compaction — refuse
            n_bad = new_df.select(F.col(id_col).alias("id")).join(
                F.broadcast(tomb), "id", "left_semi").count()
            if n_bad:
                raise ValueError(
                    f"append batch contains {n_bad} id(s) tombstoned in "
                    f"{path!r}; run compact_lsh_index first, then append"
                )
        rows = _minhash_band_rows(new_df, text, id_col, num_perm, bands,
                                  shingle_n).persist()
        try:
            lk.assert_owned()  # fence before the parquet-append commit
            # rebalance: the cached partitioning would fan out
            # cached-partitions × bands tiny files per append
            rows.hint("rebalance", F.col("band")) \
                .write.mode("append").partitionBy("band").parquet(path)
            counts = rows.groupBy("band").agg(
                F.count(F.lit(1)).alias("n_appended")).collect()
        finally:
            rows.unpersist()
    return new_df.sparkSession.createDataFrame(
        [(int(r["band"]), int(r["n_appended"])) for r in counts],
        "band long, n_appended long",
    )


def verify_lsh_index(spark, path: str) -> list[dict]:
    """Integrity audit (fsck) of a ``write_lsh_index`` directory — the
    read-only check you run after a restore, migration, or suspicious
    crash, before trusting probes again. Returns
    ``[{check, ok, detail}, ...]`` (driver-sized); raises only when the
    directory is not an LSH index at all. Checks: parameter marker
    parseable and well-formed; data schema is exactly
    ``(id, band_hash) partitioned by band``; every band id within
    ``[0, bands)`` (an out-of-range band means the dir was appended to
    under different parameters despite the guard — e.g. hand-copied
    files); plus the shared maintenance-state legs (no crashed swap
    residue, no stale lock, tombstone schema). Never repairs —
    ``compact_lsh_index`` resumes crashed swaps,
    ``tombstones.break_maintenance_lock`` clears dead locks."""
    from ncbi_analysis_spark.operators import tombstones as ts

    params = read_lsh_params(spark, path)  # raises on non-index dirs
    out = [{
        "check": "params_marker",
        "ok": set(params) == {"num_perm", "bands", "shingle_n"},
        "detail": f"marker: {params}",
    }]
    # maintenance-state legs FIRST: a half-swapped root is exactly when
    # fsck runs, and there the data scan below fails loudly by design
    out.extend(ts.shared_integrity_checks(spark, path, "id"))
    try:
        rows = spark.read.parquet(path)
        cols = sorted(rows.columns)
    except Exception as exc:  # noqa: BLE001 — report, never crash fsck
        out.append({"check": "readable", "ok": False,
                    "detail": str(exc).split("\n")[0][:200]})
        return out
    out.append({"check": "readable", "ok": True, "detail": ""})
    out.append({
        "check": "schema",
        "ok": cols == ["band", "band_hash", "id"],
        "detail": ("" if cols == ["band", "band_hash", "id"]
                   else f"columns {cols}, expected [band, band_hash, id]"),
    })
    if cols == ["band", "band_hash", "id"]:
        bad = rows.filter(
            (F.col("band") < 0) | (F.col("band") >= params["bands"])
            | F.col("band_hash").isNull() | F.col("id").isNull()
        ).count()
        out.append({
            "check": "band_range",
            "ok": bad == 0,
            "detail": "" if bad == 0 else
                      f"{bad} rows out of band range / null-keyed",
        })
    return out


def lsh_index_collisions(
    new_df: DataFrame,
    index: DataFrame,
    text: str,
    id_col: str,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    broadcast_new: bool = True,
) -> DataFrame:
    """Probe a persisted LSH index with a new crawl batch: distinct
    ``(doc_id, indexed_id)`` pairs whose band digests collide — the
    incremental twin of ``fuzzy_decon_pairs`` where the reference side
    is the PERSISTED index instead of a recomputed corpus. Drop (or
    flag) the colliding new docs, then ``append_to_lsh_index`` the
    survivors: the standing crawl-ingest loop.

    Scale: the new batch is one crawl increment — bounded — so its band
    rows BROADCAST into the index join (``broadcast_new``) and the
    corpus-sized index is never shuffled; with ``broadcast_new=False``
    the join shuffles both sides on (band, band_hash) for unusually
    large batches (AQE handles skewed hot bands)."""
    probe = _minhash_band_rows(new_df, text, id_col, num_perm, bands,
                               shingle_n).withColumnRenamed("id", "__new_id")
    if broadcast_new:
        probe = F.broadcast(probe)
    hits = index.join(
        probe, on=["band", "band_hash"], how="inner"
    ).select(
        F.col("__new_id").alias(id_col),
        F.col("id").alias("indexed_id"),
    ).distinct()
    return hits


def lsh_recall_audit(
    df: DataFrame,
    text: str,
    id_col: str,
    threshold: float = 0.5,
    num_perm: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    sample_mod: int = 10,
    salt: str = "audit",
) -> DataFrame:
    """Measured recall/precision of MinHash-LSH banding against exact
    n-gram Jaccard, on a deterministic hash-sample of the corpus — the
    "measure, don't guess" audit for the (num_perm, bands) s-curve.
    Tuning LSH parameters by formula alone is how silent under-dedup
    ships: the s-curve says what SHOULD collide, this operator reports
    what DID, on your actual shingle distribution.

    One row: ``n_sample`` sampled docs, ``n_true`` pairs with exact
    Jaccard >= threshold, ``n_cand`` LSH band-collision candidate
    pairs, ``n_hit`` candidates that are true pairs, ``recall`` =
    n_hit/n_true, ``precision`` = n_hit/n_cand (NULL when the
    denominator is 0; both rounded to 6dp).

    Scale shape: the audit runs on the md5(salt|id) % sample_mod == 0
    sample, so its exact all-pairs leg costs O((corpus/sample_mod)²)
    worst-case and is tunable to any budget; both legs are the standing
    bucketed operators (shingle inverted index, band buckets), uncapped
    within the sample so the measurement is exact. The final report is
    three ONE-ROW aggregates cross-joined (the contamination_report
    scalar-small-side class).
    """
    from ncbi_analysis_spark.functions.text import _hash32

    sample = df.filter(
        _hash32(F.col(id_col).cast("string"), f"{salt}|") % sample_mod == 0
    )
    truth = ngram_jaccard_pairs(
        sample, text, id_col, shingle_n=shingle_n, threshold=threshold,
        max_shingle_freq=None,
    ).select("id_a", "id_b", F.lit(1).alias("in_truth"))
    cand = minhash_lsh_pairs(
        sample, text, id_col, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n, max_band_freq=None,
    ).select("id_a", "id_b", F.lit(1).alias("in_cand"))
    pairs = truth.join(cand, ["id_a", "id_b"], "full_outer").agg(
        F.coalesce(F.sum("in_truth"), F.lit(0)).cast("long").alias("n_true"),
        F.coalesce(F.sum("in_cand"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(F.sum(F.col("in_truth") * F.col("in_cand")), F.lit(0))
        .cast("long").alias("n_hit"),
    )
    n_sample = sample.agg(F.count(F.lit(1)).cast("long").alias("n_sample"))
    return n_sample.crossJoin(pairs).select(
        "n_sample", "n_true", "n_cand", "n_hit",
        F.when(F.col("n_true") > 0,
               F.round(F.col("n_hit") / F.col("n_true"), 6)).alias("recall"),
        F.when(F.col("n_cand") > 0,
               F.round(F.col("n_hit") / F.col("n_cand"), 6)).alias("precision"),
    )


def span_recall_audit(
    df: DataFrame,
    text: str,
    id_col: str,
    window: int = 32,
    anchor_k: int = 8,
    anchor_bits: int = 4,
    min_docs: int = 2,
    sample_mod: int = 1,
    salt: str = "audit",
    max_nonascii_probe: int = 32_768,
) -> DataFrame:
    """Measured span recall of the content-defined anchoring behind
    ``dup_span_windows`` / ``remove_dup_spans`` against a brute-force
    every-position exact-substring oracle, on a deterministic
    hash-sample — the ``lsh_recall_audit`` posture for the
    exact-substring tier (round-12 verdict gap: LSH and ANN bucketing
    got measured recall, the anchor approximation of Lee et al.'s
    suffix-array exact mode did not).

    Truth = char positions covered by ANY duplicated ``window``-char
    substring (every start position probed — ``anchor_bits=0`` makes
    every position an anchor, so both legs share ``_anchored_windows``
    and the cross-engine md5 rule). Candidate = positions covered by
    the ANCHORED duplicated windows. Every anchored dup window is by
    definition a truth window, so precision is 1 by construction and
    the informative number is ``recall`` — what fraction of truly
    duplicated chars the anchor density 2^-anchor_bits actually
    reaches. ``n_hit`` is still measured via the join rather than
    assumed equal to ``n_cand`` (measure, don't guess).

    One row: ``(n_sample, truth_chars, anchored_chars, hit_chars,
    recall)``; recall rounded 6dp, NULL when nothing is duplicated.

    Scale shape: the truth leg probes every position — ~L windows per
    document, the deliberate brute-force cost — so it runs on the
    md5(salt|id) % sample_mod sample, tunable to any budget (the
    lsh_recall_audit contract); coverage is counted by exploding span
    ranges to distinct (doc, pos) rows, bounded by sample chars ×
    window. The production operators never pay any of this.
    """
    from ncbi_analysis_spark.functions.text import _hash32

    sample = df
    if sample_mod > 1:
        sample = df.filter(
            _hash32(F.col(id_col).cast("string"), f"{salt}|")
            % sample_mod == 0
        )

    def dup_positions(bits: int) -> DataFrame:
        wins = _anchored_windows(sample, text, id_col, window, anchor_k,
                                 bits, "md5", max_nonascii_probe)
        dups = (
            wins.groupBy("wh")
            .agg(F.count_distinct(id_col).alias("__nd"))
            .filter(F.col("__nd") >= min_docs)
            .select("wh")
        )
        return (
            wins.join(dups, "wh")
            .select(
                F.col(id_col).alias("__id"),
                F.explode(
                    F.sequence(F.col("span_start"), F.col("span_end") - 1)
                ).alias("pos"),
            )
            .distinct()
        )

    truth = dup_positions(0).withColumn("in_truth", F.lit(1))
    cand = dup_positions(anchor_bits).withColumn("in_cand", F.lit(1))
    pairs = truth.join(cand, ["__id", "pos"], "full_outer").agg(
        F.coalesce(F.sum("in_truth"), F.lit(0)).cast("long")
        .alias("truth_chars"),
        F.coalesce(F.sum("in_cand"), F.lit(0)).cast("long")
        .alias("anchored_chars"),
        F.coalesce(F.sum(F.col("in_truth") * F.col("in_cand")), F.lit(0))
        .cast("long").alias("hit_chars"),
    )
    n_sample = sample.agg(F.count(F.lit(1)).cast("long").alias("n_sample"))
    return n_sample.crossJoin(pairs).select(
        "n_sample", "truth_chars", "anchored_chars", "hit_chars",
        F.when(F.col("truth_chars") > 0,
               F.round(F.col("hit_chars") / F.col("truth_chars"), 6))
        .alias("recall"),
    )
