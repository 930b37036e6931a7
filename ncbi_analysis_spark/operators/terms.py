"""Corpus term statistics: TF-IDF top terms per document.

Classic text-analysis operator over the ``documents`` table (the
"characteristic terms" report a curation pipeline uses to inspect what a
source/domain is about).

Scoring: ``tf × (n_docs + 1) / (df + 1)`` — a smoothed *rational* idf
weight rather than the conventional ``log`` form. Rationale: the score
must hash-match a DuckDB oracle bit-for-bit, and ``ln`` is not guaranteed
identically rounded across engines; the rational weight is a product and
one division of exact integers, which IEEE-754 rounds identically
everywhere. (Per-document top-k ranking differs from the log variant
only when two terms' tf ratio exactly offsets their df ratio — ties are
broken by term text anyway.)

Scale: explode → one shuffle on (doc, term) for tf; df comes from a
second aggregation keyed by term (vocabulary-sized, ≪ corpus) joined
back; top-k is a window on doc. At 100 TB the (doc, term) aggregation
dominates and is a plain map-side-combined hash agg; the df table is
vocabulary-sized and AQE will broadcast it when small enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed rational TF-IDF.

    Returns ``(doc_id, term, tf, df, score, rk)``; ``rk`` ranks score
    descending with term-text tiebreak, so output is fully deterministic.
    Tokenization is lowercased whitespace splitting (the corpus
    convention of functions/text.py).
    """
    from ncbi_analysis_spark.functions.text import tokens

    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("long").alias("__n")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * (F.col("__n") + 1)).cast("double")
            / (F.col("df") + 1).cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


def token_rarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token-rarity quality signals from corpus-wide
    document frequencies — integer-exact (no log), so the DuckDB oracle
    matches bit-for-bit:

    - ``n_tok``       distinct lowercased tokens in the document
    - ``sum_df``      sum of each distinct token's corpus df
    - ``mean_df``     sum_df / n_tok (double; one exact int division)
    - ``hapax_frac``  fraction of the doc's distinct tokens that occur
                      in no other document (df == 1)

    Low mean_df / high hapax_frac flags gibberish or OCR noise; high
    mean_df flags boilerplate. Scale: one (doc, token)-distinct shuffle
    + a vocabulary-sized df aggregation joined back (AQE broadcasts it
    when small), then one doc-keyed aggregation.
    """
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("tdf"))
    return (
        toks.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("tdf").cast("long").alias("sum_df"),
            F.sum((F.col("tdf") == 1).cast("long")).cast("long").alias("n_hapax"),
        )
        .select(
            id_col, "n_tok", "sum_df",
            (F.col("sum_df") / F.col("n_tok")).alias("mean_df"),
            (F.col("n_hapax") / F.col("n_tok")).alias("hapax_frac"),
        )
    )


def char_ngrams(df: DataFrame, n: int = 3, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ngram) — every lowercased char n-gram occurrence
    (with multiplicity) of each document, as a pure Column-expression
    explode (sequence of start positions -> substr), no Python UDF.
    Documents shorter than ``n`` contribute no rows."""
    from ncbi_analysis_spark.functions.text import ascii_fast_grams

    t = F.lower(F.col(text_col))

    def starts(length_col):
        return F.when(
            length_col >= n, F.sequence(F.lit(1), length_col - (n - 1))
        ).otherwise(F.array().cast("array<int>"))

    # slice INSIDE the transform so the explode emits n-char grams, not
    # rows that each drag the whole document text to the substr
    # (measured 2.6x on the sf0.1 self-train+score query); byte-sliced
    # on ASCII rows so gram extraction is linear, not O(L²) per doc
    grams = ascii_fast_grams(
        t,
        F.transform(starts(F.length(t)), lambda i: t.substr(i, F.lit(n))),
        lambda tb: F.transform(
            starts(F.octet_length(t)),
            lambda i: F.decode(tb.substr(i, F.lit(n)), "UTF-8"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(grams).alias("ngram"),
    )


def char_ngram_lm(df: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", min_count: int = 1) -> DataFrame:
    """Char-n-gram language model as a count table (ngram, cnt) over the
    corpus — the CCNet-style quality-model shape (train on a reference
    corpus, score candidate documents). ``min_count`` drops rare grams
    so scoring treats them as out-of-vocabulary. Vocabulary is bounded
    by alphabet^n (tiny next to the corpus), so the model broadcasts.

    Scale: one explode + one map-side-combined hash agg keyed by ngram."""
    return (
        char_ngrams(df, n, text_col, id_col)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def ngram_lm_score(df: DataFrame, lm: DataFrame, n: int = 3,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document LM quality signals against a trained char-n-gram
    model: ``n_grams`` (total n-gram occurrences), ``oov`` (occurrences
    of grams absent from the model), ``sum_prob`` (sum of each in-vocab
    gram's corpus probability cnt/total) and ``mean_prob``. Low
    mean_prob / high oov flags text unlike the training corpus
    (gibberish, wrong language, OCR noise); anomalously high mean_prob
    flags boilerplate.

    Determinism (oracle-gate contract): every gram probability shares
    the one denominator ``total``, so the per-doc probability mass is
    summed as the exact INTEGER numerator and divided once —
    sum(cnt_i/total) == sum(cnt_i)/total with zero float aggregation
    (stronger than the decimal trick; no rounding anywhere until the
    final correctly-rounded IEEE divisions, identical in any engine).
    ``ln`` is never computed (same rational-not-log stance as
    tfidf_top_terms). Scale: docs-side explode joins a BROADCAST model
    (alphabet^n rows); one doc-keyed aggregation."""
    total_df = lm.agg(F.sum("cnt").cast("long").alias("__total"))
    grams = char_ngrams(df, n, text_col, id_col)
    return (
        grams
        .join(F.broadcast(lm), "ngram", "left")
        .crossJoin(F.broadcast(total_df))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.col("cnt").isNull().cast("long")).cast("long").alias("oov"),
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("__num"),
            F.first("__total").alias("__tot"),
        )
        .select(
            "doc_id", "n_grams", "oov",
            (F.col("__num").cast("double") / F.col("__tot").cast("double"))
            .alias("sum_prob"),
            (F.col("__num").cast("double") / F.col("__tot").cast("double")
             / F.col("n_grams")).alias("mean_prob"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance scoring (data selection for language models)
# ---------------------------------------------------------------------------


def _dsir_features(df: DataFrame, text: str, id_col: str,
                   n_buckets: int, ngram_max: int) -> DataFrame:
    """Hashed word-n-gram feature rows ``(id_col, bucket)`` — one row per
    n-gram occurrence for every n in 1..ngram_max, bucketed by the
    cross-engine md5 hash. Inherits ``shingle_rows`` partial-shingle
    semantics: a doc with fewer than n tokens contributes its full token
    run once per n (so a 1-token doc counts that token at every n)."""
    from ncbi_analysis_spark.functions.text import _hash32
    from ncbi_analysis_spark.operators.dedup import shingle_rows

    parts = [shingle_rows(df, text, id_col, n) for n in range(1, ngram_max + 1)]
    feats = parts[0]
    for p in parts[1:]:
        feats = feats.unionByName(p)
    return feats.select(
        id_col, F.pmod(_hash32(F.col("sh")), F.lit(n_buckets)).alias("bucket")
    )


def dsir_logratios(
    target_df: DataFrame,
    raw_df: DataFrame,
    text: str,
    id_col: str,
    n_buckets: int = 8192,
    ngram_max: int = 2,
) -> DataFrame:
    """DSIR bucket log-ratio weights (Xie et al. 2023, arXiv:2302.03169:
    Data Selection for Language Models via Importance Resampling).

    Hashed-n-gram bag models for the target and raw corpora; per bucket,
    ``w = ln((t_b + 1)/(T + B)) - ln((r_b + 1)/(R + B))`` (add-one
    smoothing). A document's importance is then the sum of ``count * w``
    over its feature buckets (``dsir_score``) — high for documents whose
    n-gram distribution looks like the target, low for raw-typical ones;
    resample the corpus by these weights to shift it toward the target.

    Scale: the two count aggregations are map-side-combined hash aggs
    keyed by bucket (≤ ``n_buckets`` groups), so only two bounded
    ``n_buckets``-row vectors ever reach the driver (the
    ``train_ivf_centroids`` bounded-collect pattern). The log-ratio math
    runs ONCE, in driver CPython — which is what lets the oracle twin
    (`dsir_logratios_local`) re-derive bit-identical weight literals.
    Returns all ``n_buckets`` rows ``(bucket, w)`` (never-seen buckets
    get the pure-smoothing weight) so scoring never drops a feature.

    When the target is a predicate over the raw corpus (the standard
    shape), ``dsir_logratios_pred`` computes the same weights in ONE
    fused pass.
    """

    def counts(d: DataFrame) -> tuple[dict, int]:
        rows = (
            _dsir_features(d, text, id_col, n_buckets, ngram_max)
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        per = {r["bucket"]: r["c"] for r in rows}
        return per, sum(per.values())

    t, T = counts(target_df)
    r, R = counts(raw_df)
    return _logratio_table(target_df.sparkSession, t, T, r, R, n_buckets)


def dsir_logratios_pred(
    raw_df: DataFrame,
    target_pred,
    text: str,
    id_col: str,
    n_buckets: int = 8192,
    ngram_max: int = 2,
) -> DataFrame:
    """``dsir_logratios`` for the standard case where the target IS a
    predicate over the raw corpus (``target = raw.filter(pred)``) —
    fused into ONE pass: every document's features count toward the raw
    bag, and the predicate tag (riding in a composite string id, the
    ``quality_classifier_weights`` trick — per-document shingle windows
    unchanged) marks which also count toward the target bag. Identical
    integer counts, bit-identical weights to the two-frame form; one
    corpus scan + one aggregation instead of two sequential jobs that
    re-tokenized the target subset.

    ``target_pred`` is a boolean Column; NULL evaluates as
    non-target (matching ``filter``'s semantics on the target side).
    """
    tagged = raw_df.select(
        F.concat(
            F.when(target_pred, F.lit("1")).otherwise(F.lit("0")),
            F.lit("|"),
            F.col(id_col).cast("string"),
        ).alias("__tid"),
        F.col(text).alias("__text"),
    )
    rows = (
        _dsir_features(tagged, "__text", "__tid", n_buckets, ngram_max)
        .groupBy(F.substring("__tid", 1, 1).alias("__t"), "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    t: dict = {}
    r: dict = {}
    for row in rows:
        r[row["bucket"]] = r.get(row["bucket"], 0) + row["c"]
        if row["__t"] == "1":
            t[row["bucket"]] = t.get(row["bucket"], 0) + row["c"]
    return _logratio_table(
        raw_df.sparkSession, t, sum(t.values()), r, sum(r.values()), n_buckets
    )


def _logratio_table(spark, t: dict, T: int, r: dict, R: int,
                    n_buckets: int) -> DataFrame:
    """Shared add-one log-ratio weight table — ONE definition so the
    two-frame and fused-predicate fits can never diverge."""
    import math

    B = n_buckets
    out = [
        (b, math.log((t.get(b, 0) + 1) / (T + B)) - math.log((r.get(b, 0) + 1) / (R + B)))
        for b in range(B)
    ]
    return spark.createDataFrame(out, schema="bucket bigint, w double")


def _np_bucket_fold(t: str, w_map: dict, n_buckets: int,
                    ngram_max: int) -> tuple[int, float]:
    """Arrow-side replica of the batch scorer's per-document kernel:
    ``_dsir_features`` counts (``_java_tokens`` + partial-shingle
    n-grams, md5-prefix buckets — the ``_np_band_keys`` parity pattern),
    then the ascending-bucket-order fold ``acc += c * w`` that
    ``dsir_score``/``quality_probability`` express as
    sort_array + F.aggregate. Buckets absent from ``w_map`` are skipped
    entirely (the expr form's INNER join on bucket); Python float ops
    are IEEE doubles in the same order as the JVM fold, so ``(n_feats,
    sum)`` is bit-identical."""
    import hashlib

    from ncbi_analysis_spark.functions.text import _java_tokens
    from ncbi_analysis_spark.streaming.events import _np_shingles

    ws = _java_tokens(t)
    counts: dict = {}
    for n in range(1, ngram_max + 1):
        for sh in _np_shingles(ws, n):
            b = int(hashlib.md5(sh.encode()).hexdigest()[:8], 16) % n_buckets
            counts[b] = counts.get(b, 0) + 1
    nf = 0
    acc = 0.0
    for b in sorted(counts):
        w = w_map.get(b)
        if w is None:
            continue
        c = counts[b]
        nf += c
        acc += c * w
    return nf, acc


def _score_fold_np(df: DataFrame, text: str, id_col: str, w_map: dict,
                   n_buckets: int, ngram_max: int) -> DataFrame:
    """One Arrow-batched map-only pass producing the scorer's
    ``(id_col, n_feats, __sum)`` aggregate per document — row- and
    bit-identical to the expr pipeline (explode → (id, bucket) hash agg
    → broadcast weight join → per-id fold) but with ZERO shuffles: the
    feature rows never materialize, so at corpus scale the two
    gram-count-sized exchanges disappear (guide §2.2/§4). NULL-text
    documents produce no row (explode semantics); a document none of
    whose buckets appear in ``w_map`` likewise vanishes (inner-join
    semantics — unreachable with the complete weight tables the
    trainers emit)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType([
        df.schema[id_col],
        StructField("n_feats", LongType()),
        StructField("__sum", DoubleType()),
    ])

    def gen(batches):
        for pdf in batches:
            ids, nfs, sums = [], [], []
            for i, t in zip(pdf[id_col], pdf[text]):
                if t is None:
                    continue
                nf, acc = _np_bucket_fold(t, w_map, n_buckets, ngram_max)
                if nf == 0:
                    continue
                ids.append(i)
                nfs.append(nf)
                sums.append(acc)
            yield pd.DataFrame(
                {id_col: ids, "n_feats": nfs, "__sum": sums})

    from ncbi_analysis_spark.operators.spread import spread_narrow_est

    # the per-doc md5 fold is CPU-dense per byte; when the input is a
    # post-shuffle frame AQE coalesces the Arrow stage onto 1-2 tasks
    # at small sizes (profiled r15 inside curation_v2) — size-estimate-
    # guarded spread, identity at corpus scale
    return spread_narrow_est(
        df.select(id_col, text)).mapInPandas(gen, schema)


def dsir_score(
    df: DataFrame,
    text: str,
    id_col: str,
    weights: DataFrame,
    n_buckets: int = 8192,
    ngram_max: int = 2,
    engine: str = "hybrid",
) -> DataFrame:
    """Per-document DSIR importance: ``logw = Σ_b count_b · w_b`` over
    the document's hashed-n-gram buckets. Returns
    ``(id_col, n_feats, logw)`` with ``logw`` rounded to 6 for display —
    the sum itself folds the per-bucket terms in ASCENDING bucket order
    (sort_array + sequential aggregate), so the double is deterministic
    and a DuckDB oracle (list_sort + list_reduce with the same weight
    literals) reproduces it bit-exactly.

    Scale (``engine='expr'``): one (id, bucket) hash agg, a broadcast
    join against the ``n_buckets``-row weight table, one agg back to id.
    Everything map-side-combinable; no driver data beyond the weight
    table. ``engine='hybrid'`` (default since r15) computes the same
    per-document aggregate in ONE Arrow map-only pass — zero shuffles,
    bit-identical ``logw`` (see ``_score_fold_np``); the final round
    stays a JVM expression either way.
    """
    if engine == "hybrid":
        w_map = {r["bucket"]: r["w"] for r in weights.collect()}
        folded = _score_fold_np(df, text, id_col, w_map, n_buckets,
                                ngram_max)
    else:
        feats = _dsir_features(df, text, id_col, n_buckets, ngram_max)
        per = feats.groupBy(id_col, "bucket").agg(
            F.count(F.lit(1)).alias("c"))
        j = per.join(F.broadcast(weights), "bucket").select(
            id_col, "bucket", "c", (F.col("c") * F.col("w")).alias("term")
        )
        folded = j.groupBy(id_col).agg(
            F.sum("c").alias("n_feats"),
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("bucket", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__sum"),
        )
    return folded.select(id_col, "n_feats", F.round("__sum", 6).alias("logw"))


def dsir_logratios_local(
    parquet_path: str,
    text: str = "text",
    target_pred=None,
    n_buckets: int = 8192,
    ngram_max: int = 2,
):
    """Spark-free twin of ``dsir_logratios`` for oracle-literal
    generation (the ``train_ivf_centroids_local`` pattern): pyarrow
    read, pure-Python tokenization mirroring ``functions.text.tokens``
    (trim + split on ``\\s+``; empty text yields the single empty
    token, exactly like Spark's and DuckDB's regex split), md5-prefix
    bucketing, and the SAME CPython ``math.log`` the operator runs on
    the driver — identical integer counts in, bit-identical weight
    doubles out. ``target_pred(row_dict) -> bool`` selects the target
    subset; raw is the whole table."""
    import hashlib
    import math
    import re

    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path).to_pylist()

    def grams(s: str) -> list[str]:
        toks = re.split(r"\s+", s.strip())
        out = []
        for n in range(1, ngram_max + 1):
            if len(toks) >= n:
                out += [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            else:
                out.append(" ".join(toks))
        return out

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    def counts(rows) -> tuple[dict, int]:
        per: dict = {}
        tot = 0
        for row in rows:
            if row[text] is None:
                # the Spark path (_dsir_features via shingle_rows) drops
                # NULL-text docs entirely (posexplode of a NULL token
                # array emits nothing) — mirror that, or the weight
                # literals diverge on any corpus with NULL text
                continue
            for g in grams(row[text]):
                b = bucket(g)
                per[b] = per.get(b, 0) + 1
                tot += 1
        return per, tot

    t, T = counts([r for r in tbl if target_pred is None or target_pred(r)])
    r, R = counts(tbl)
    B = n_buckets
    return [
        (b, math.log((t.get(b, 0) + 1) / (T + B)) - math.log((r.get(b, 0) + 1) / (R + B)))
        for b in range(B)
    ]


# ---------------------------------------------------------------------------
# Trained quality classifier (fastText-style hashed linear model)
# ---------------------------------------------------------------------------


def _logistic_fit(t, m, iters: int = 200, lr: float = 0.5, l2: float = 1e-6):
    """Deterministic full-batch logistic regression on grouped
    per-bucket occurrence counts: ``t[b]`` positive (target) and
    ``m[b]`` negative (non-target) one-hot examples for bucket ``b``.
    With one weight per bucket plus a shared bias this grouped form IS
    exact logistic regression on the per-occurrence examples — the
    gradient of bucket ``b`` only touches ``w[b]`` and the bias.

    The per-bucket updates are diagonally preconditioned (scaled by
    ``N / (t_b + m_b)``, each bucket's own example count): with one-hot
    features the loss separates per bucket, so this is plain gradient
    descent on each bucket's OWN logistic subproblem — without it the
    1/N global scale moves rare-bucket weights ~0 per step and 200
    iterations leave the model at the class prior (measured: every
    document scored within ±0.001 of sigmoid-of-bias). The bias keeps
    the global 1/N gradient (it sees every example).

    Fixed float64 numpy ops, zero init, fixed iteration count — the same
    count vectors in always produce bit-identical ``(w, bias)`` out,
    which is what lets the Spark-free oracle twin re-derive the weight
    literals exactly (the ``dsir_logratios_local`` pattern).
    """
    import numpy as np

    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    n = float(t.sum() + m.sum())
    if n == 0.0:
        return np.zeros(len(t)), 0.0
    w = np.zeros(len(t), dtype=np.float64)
    scale = n / np.maximum(t + m, 1.0)
    b0 = 0.0
    for _ in range(iters):
        z = w + b0
        p = 1.0 / (1.0 + np.exp(-z))
        g = (-t * (1.0 - p) + m * p) / n
        w = w - lr * (g * scale + l2 * w)
        b0 = b0 - lr * float(g.sum())
    return w, b0


def quality_classifier_weights(
    target_df: DataFrame,
    nontarget_df: DataFrame,
    text: str,
    id_col: str,
    n_buckets: int = 1024,
    ngram_max: int = 2,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-6,
) -> tuple[DataFrame, float]:
    """Train a fastText-style hashed linear quality classifier
    (Joulin et al. 2016, arXiv:1607.01759; the CCNet/GPT-3 curation
    stack's "looks like the target corpus?" scorer): logistic regression
    over hashed word-n-gram buckets, target-vs-nontarget. The
    discriminative, calibrated-probability sibling of ``dsir_logratios``
    (generative log-ratios) — same feature plumbing, a trained model on
    top.

    Returns ``(weights_df, bias)``: an ``n_buckets``-row
    ``(bucket, w)`` table (never-seen buckets get weight 0, so scoring
    never drops a feature) and the scalar intercept.

    Scale: two map-side-combined bucket aggregations (≤ ``n_buckets``
    rows each reach the driver — the DSIR bounded-collect pattern); the
    numpy fit runs ONCE on those two vectors in driver CPython, which is
    what lets ``quality_classifier_local`` re-derive bit-identical
    weight literals for the oracle.
    """

    # ONE fused pass over both classes: the class tag rides in a
    # composite string id ("t|<id>" / "m|<id>"), so the shingle window
    # still partitions per document (identical per-doc semantics and
    # counts) while one scan + one aggregation replaces two sequential
    # jobs that each re-read and re-tokenized their half of the corpus
    def tag(d: DataFrame, cls: str) -> DataFrame:
        return d.select(
            F.concat(F.lit(cls + "|"), F.col(id_col).cast("string")).alias("__cid"),
            F.col(text).alias("__text"),
        )

    both = tag(target_df, "t").unionByName(tag(nontarget_df, "m"))
    rows = (
        _dsir_features(both, "__text", "__cid", n_buckets, ngram_max)
        .groupBy(F.substring("__cid", 1, 1).alias("__cls"), "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    tc = {r["bucket"]: r["c"] for r in rows if r["__cls"] == "t"}
    mc = {r["bucket"]: r["c"] for r in rows if r["__cls"] == "m"}
    t = [tc.get(b, 0) for b in range(n_buckets)]
    m = [mc.get(b, 0) for b in range(n_buckets)]
    w, bias = _logistic_fit(t, m, iters=iters, lr=lr, l2=l2)
    out = [(b, float(w[b])) for b in range(n_buckets)]
    wdf = target_df.sparkSession.createDataFrame(
        out, schema="bucket bigint, w double")
    return wdf, float(bias)


def quality_probability(
    df: DataFrame,
    text: str,
    id_col: str,
    weights: DataFrame,
    bias: float,
    n_buckets: int = 1024,
    ngram_max: int = 2,
    engine: str = "hybrid",
) -> DataFrame:
    """Score documents with a trained quality classifier: mean-pooled
    per-occurrence log-odds (the fastText average-of-embeddings rule)
    calibrated through a sigmoid. Returns
    ``(id_col, n_feats, logit, prob)`` — ``logit = bias +
    (Σ_b count_b · w_b) / n_feats`` folded in ASCENDING bucket order
    (``dsir_score``'s deterministic fold), ``prob = σ(logit)``; both
    rounded to 6 for the oracle hash. Filter ``prob >= τ`` to keep
    target-like documents.

    Scale: identical to ``dsir_score`` — ``engine='hybrid'`` (default
    since r15) is one Arrow map-only pass with zero shuffles,
    ``engine='expr'`` the original hash-agg/broadcast-join/fold
    pipeline; the sigmoid (JVM ``exp``) and rounds are per-row
    expressions under both, so ``prob`` bits never depend on the engine.
    """
    if engine == "hybrid":
        w_map = {r["bucket"]: r["w"] for r in weights.collect()}
        folded = _score_fold_np(df, text, id_col, w_map, n_buckets,
                                ngram_max)
    else:
        feats = _dsir_features(df, text, id_col, n_buckets, ngram_max)
        per = feats.groupBy(id_col, "bucket").agg(
            F.count(F.lit(1)).alias("c"))
        j = per.join(F.broadcast(weights), "bucket").select(
            id_col, "bucket", "c", (F.col("c") * F.col("w")).alias("term")
        )
        folded = j.groupBy(id_col).agg(
            F.sum("c").alias("n_feats"),
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("bucket", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__sum"),
        )
    logit = F.lit(float(bias)) + F.col("__sum") / F.col("n_feats")
    return folded.select(
        id_col,
        "n_feats",
        F.round(logit, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("prob"),
    )


def quality_classifier_local(
    parquet_path: str,
    text: str = "text",
    target_pred=None,
    n_buckets: int = 1024,
    ngram_max: int = 2,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-6,
):
    """Spark-free twin of ``quality_classifier_weights`` for
    oracle-literal generation (the ``dsir_logratios_local`` pattern):
    pyarrow read, the same tokenization/bucketing, and the SAME
    ``_logistic_fit`` numpy call — identical integer counts in,
    bit-identical ``([(bucket, w)], bias)`` out. ``target_pred`` selects
    the target class; everything else is the non-target class. NULL-text
    rows are skipped, matching the Spark path (see
    ``dsir_logratios_local``)."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path).to_pylist()

    def grams(s: str) -> list[str]:
        toks = re.split(r"\s+", s.strip())
        out = []
        for n in range(1, ngram_max + 1):
            if len(toks) >= n:
                out += [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            else:
                out.append(" ".join(toks))
        return out

    def counts(rows) -> dict:
        per: dict = {}
        for row in rows:
            if row[text] is None:
                continue
            for g in grams(row[text]):
                b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
                per[b] = per.get(b, 0) + 1
        return per

    tc = counts([r for r in tbl if target_pred is None or target_pred(r)])
    mc = counts([r for r in tbl if not (target_pred is None or target_pred(r))])
    t = [tc.get(b, 0) for b in range(n_buckets)]
    m = [mc.get(b, 0) for b in range(n_buckets)]
    w, bias = _logistic_fit(t, m, iters=iters, lr=lr, l2=l2)
    return [(b, float(w[b])) for b in range(n_buckets)], float(bias)
