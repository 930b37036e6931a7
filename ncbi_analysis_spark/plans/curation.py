"""End-to-end training-corpus curation pipeline (the LLM-data-pipeline
composition the BASELINE.json north star asks for): exact dedup ->
MinHash-LSH near-dup removal -> repetition-quality filter -> benchmark
decontamination -> deterministic split assignment.

Every stage is one of the engine's oracled operators, so the WHOLE
pipeline is independently re-derivable in SQL and hash-checked
(driver query ``curation_pipeline``).

Scale: stage order is chosen so the expensive stages see the fewest
rows — exact dedup (digest groupBy) first, then LSH (bounded bucket
pairs), then the per-doc token statistics, then the broadcast
decontamination semi-join; the final split is a pure map. No stage
collects to the driver; docs flow as one DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import dedup as dd
from ncbi_analysis_spark.operators import scale


def curate_corpus(
    docs: DataFrame,
    bench_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 4,
    bands: int = 2,
    shingle_n: int = 3,
    min_distinct_frac: float = 0.35,
    max_top_token_frac: float = 0.15,
    decon_n: int = 3,
    max_contamination: float = 0.2,
    split_weights: dict[str, float] | None = None,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Returns the surviving documents as ``(id_col, split)``.

    Near-dup removal keeps the smaller id of each LSH-colliding pair
    (deterministic; pairwise drop is the streaming-friendly rule). The
    offline-batch alternative — cluster the pair edges into connected
    components and keep one representative per cluster — is
    :func:`ncbi_analysis_spark.operators.components.component_dups`
    (oracle-checked as ``dedup_dup_clusters``); swap it in for ``dups``
    below when chains a-b-c should keep a single survivor.

    ``max_band_freq`` is passed straight to
    :func:`~ncbi_analysis_spark.operators.dedup.minhash_lsh_pairs`. The
    default is None (no hot-bucket cap) because the pipeline's SQL oracle
    (driver query ``curation_pipeline``) generates pairs from ALL band
    buckets — a cap would silently keep near-dups the oracle drops on a
    corpus with a degenerate bucket. Set it (e.g. 1000) on real 100 TB
    runs, where a quadratic hot bucket matters more than oracle parity;
    capped runs emit observe() metrics counting what was dropped.
    """
    # 1. exact dedup (min id per normalized-text hash). The survivors
    # feed FOUR consumers (LSH pairs, repetition signals,
    # decontamination, and the final assembly). Because every consumer
    # sees the IDENTICAL subtree (see the stage-3+4 note below), Spark's
    # AQE inserts ReusedExchange at the dedup shuffle at runtime (3
    # reuses in the final plan): the corpus is scanned and deduped once
    # and the shuffle output fans out to the consumers. The sequential
    # form this replaces had a different subtree per stage (13 static
    # FileScans of the corpus, zero reuse — 13 full passes at 100 TB;
    # restructured: 6 static scans, 5.0s -> 3.5s min-of-3 at sf0.1). An
    # explicit persist()/checkpoint is the heavier alternative; measured
    # here it LOSES (7.6s) because materializing the text column costs
    # more than re-reading a pruned columnar scan.
    ex = dd.exact_dedup(docs, text_col, id_col)

    # 2. near-dup: drop the larger id of every LSH band collision
    pairs = dd.minhash_lsh_pairs(
        ex, text_col, id_col, num_perm, bands, shingle_n,
        max_band_freq=max_band_freq,
    )
    dups = pairs.select(F.col("id_b").alias(id_col)).distinct()

    # 3+4. repetition-quality and decontamination keep-sets. Both
    # signals are row-local (a doc's stats depend only on its own text
    # plus the broadcast benchmark set), so they are computed on the
    # SAME exact-dedup survivors instead of sequentially on each
    # stage's output — identical final intersection (the keep-sets just
    # intersect), but every stage shares one reusable subtree instead
    # of a re-derived join chain per stage.
    rep = dd.repetition_signals(ex, text_col, id_col)
    keep = rep.filter(
        (F.col("distinct_frac") >= min_distinct_frac)
        & (F.col("top_token_frac") <= max_top_token_frac)
    ).select(id_col)

    decon = dd.benchmark_ngram_overlap(ex, bench_docs, text_col, id_col, decon_n)
    clean = decon.filter(F.col("contamination") <= max_contamination).select(id_col)

    survivors = (
        ex.join(dups, id_col, "left_anti")
        .join(keep, id_col, "left_semi")
        .join(clean, id_col, "left_semi")
    )

    # 5. deterministic split assignment (pure map)
    return scale.hash_split(
        survivors.select(id_col), id_col, split_weights
    ).select(id_col, "split")
