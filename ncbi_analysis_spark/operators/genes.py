"""Gene-position operators: cover-preference join, promoter selection,
presentation glyphs (SURVEY.md §2.3 J7, §2.7 F13/F16/F17).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions.sequence import overlap_size


def cover_preference_join(
    ranges: DataFrame,
    genes: DataFrame,
    on: list[str],
    r_left: str = "left", r_right: str = "right",
    g_left: str = "left", g_right: str = "right",
) -> DataFrame:
    """J7: join each range to overlapping genes; if any single gene covers
    the whole range, keep only covering gene(s); else keep all overlaps
    (reference src/utils/gene_position_helper.py:18-43,61-66).

    Implemented as a range join + a per-range window preferring
    ``covers`` rows (rank over covers desc).
    """
    g = genes
    for c in (g_left, g_right):
        g = g.withColumnRenamed(c, f"g_{c}")
    cond = (F.col(r_left) <= F.col(f"g_{g_right}")) & (F.col(r_right) >= F.col(f"g_{g_left}"))
    for k in on:
        g = g.withColumnRenamed(k, f"g_{k}")
        cond = cond & (F.col(k) == F.col(f"g_{k}"))
    joined = ranges.join(F.broadcast(g), cond, "inner").drop(*[f"g_{k}" for k in on])
    covers = (
        (F.col(f"g_{g_left}") <= F.col(r_left)) & (F.col(f"g_{g_right}") >= F.col(r_right))
    ).cast("int")
    w = Window.partitionBy(*on, r_left, r_right)
    return (
        joined.withColumn("__covers", covers)
        .withColumn("__max_covers", F.max("__covers").over(w))
        .filter(F.col("__covers") == F.col("__max_covers"))
        .drop("__covers", "__max_covers")
    )


def select_promoter(genes_tu: DataFrame, promoters: DataFrame, on: list[str]) -> DataFrame:
    """F16: direction-aware promoter selection — for each gene, the
    nearest promoter at or before its start on the same strand (reverse
    strand: at or after), via the as-of pattern
    (reference get_target_promoter, src/utils/gene_promoter_util.py:89-167).
    """
    from ncbi_analysis_spark.operators.asof import asof_join

    fwd = asof_join(
        genes_tu.filter(F.col("strand") == "+"),
        promoters.filter(F.col("strand") == "+")
        .select(*on, F.col("pos").alias("p_pos"), F.col("promoter").alias("p_name")),
        on, "start", "p_pos", ["p_name"], direction="backward",
    )
    rev = asof_join(
        genes_tu.filter(F.col("strand") == "-"),
        promoters.filter(F.col("strand") == "-")
        .select(*on, F.col("pos").alias("p_pos"), F.col("promoter").alias("p_name")),
        on, "start", "p_pos", ["p_name"], direction="forward",
    )
    return fwd.unionByName(rev).withColumnRenamed("asof_p_name", "promoter") \
        .withColumnRenamed("asof_ts", "promoter_pos")


def direction_glyphs(m_left: Column, m_right: Column, g_left: Column, g_right: Column,
                     strand: Column) -> Column:
    """F13 presentation: gene drawn as 10 direction chars; deciles with
    >50% overlap by the match interval replaced by '*'
    (reference src/analysis/gene_location_analysis.py:213-240)."""
    glen = (g_right - g_left + 1).cast("double")
    arrow = F.when(strand == "+", F.lit(">")).otherwise(F.lit("<"))

    def decile(i: int) -> Column:
        d_left = (g_left + (glen * i / 10)).cast("long")
        d_right = (g_left + (glen * (i + 1) / 10)).cast("long") - 1
        ov = overlap_size(m_left, m_right, d_left, d_right).cast("double")
        dlen = (d_right - d_left + 1).cast("double")
        return F.when(ov * 2 > dlen, F.lit("*")).otherwise(arrow)

    return F.concat(*[decile(i) for i in range(10)])


def random_split_triples(targets: DataFrame, value_col: str, seed: int = 42,
                         jitter: float = 0.025) -> DataFrame:
    """F17: per target x, two uniform draws in [(1-jitter)x, (1+jitter)x],
    third = 3x - sum, so the triple averages exactly x
    (reference src/run_random_generate.py:16-25)."""
    x = F.col(value_col).cast("double")
    lo, hi = 1.0 - jitter, 1.0 + jitter
    a = x * (F.lit(lo) + (F.lit(hi) - F.lit(lo)) * F.rand(seed))
    b = x * (F.lit(lo) + (F.lit(hi) - F.lit(lo)) * F.rand(seed + 1))
    return targets.withColumn("v1", a).withColumn("v2", b) \
        .withColumn("v3", 3 * x - F.col("v1") - F.col("v2"))


def hash_split_triples(targets: DataFrame, value_col: str, id_col: str,
                       jitter: float = 0.025, salt: str = "split3") -> DataFrame:
    """F17, deterministic form: the uniforms come from an md5 hash of the
    row id instead of ``rand`` — identical semantics (two draws in
    [(1-j)x, (1+j)x], third = 3x - sum), but rerun-stable under task
    retries/speculation and bit-reproducible in a DuckDB oracle (the same
    determinism argument as operators.scale.hash_split vs ``df.sample``).
    Reference semantics: src/run_random_generate.py:16-25."""
    from ncbi_analysis_spark.functions.text import _hash32

    x = F.col(value_col).cast("double")
    lo, hi = 1.0 - jitter, 1.0 + jitter

    def u(i: int) -> Column:
        return _hash32(F.col(id_col).cast("string"), f"{salt}{i}") / F.lit(4294967296.0)

    a = x * (F.lit(lo) + (F.lit(hi) - F.lit(lo)) * u(1))
    b = x * (F.lit(lo) + (F.lit(hi) - F.lit(lo)) * u(2))
    return targets.withColumn("v1", a).withColumn("v2", b) \
        .withColumn("v3", F.lit(3.0) * x - F.col("v1") - F.col("v2"))


def nearby_genes_by_range(
    ranges: DataFrame,
    genes: DataFrame,
    r_id: str = "range_id",
    r_left: str = "left",
    r_right: str = "right",
    direction: str = "direction",
) -> DataFrame:
    """Range-to-nearby-gene expansion with cover preference — the
    position helper behind the gentamycin (ATCC mode) and
    found-gene-near-a-range drivers (reference
    ``get_nearby_gene_based_by_range``,
    src/utils/gene_position_helper.py:18-43).

    ``genes`` is a bounded annotation dim ``(gene, gene_left,
    gene_right, sequence)``; ``ranges`` carries ``r_id``/``r_left``/
    ``r_right``/``direction`` plus any payload columns (all preserved).
    ``r_id`` must be unique per range row — exact duplicate rows
    collapse to one through the bounds aggregation (the reference,
    a per-row loop, would emit each duplicate's expansion twice).
    Per range, with genes indexed by start position:

    * ``lg`` = first index with ``gene_left >= left``, ``rl`` = last
      index with ``gene_left < right``;
    * candidates = indexes ``least(lg, rl) .. greatest(lg, rl)`` — one
      gene starting inside the range (lg == rl), several (lg < rl), or
      the two flanking neighbors when none does (lg == rl + 1);
    * if any CANDIDATE covers the range (``gene_left <= left`` and
      ``gene_right >= right``) only the first such gene is kept, else
      all candidates are (the cover check scans candidates only, per
      the reference — a long earlier gene covering the range is NOT
      found, by parity);
    * output rows add ``type`` (:func:`...sequence.gene_range_type`),
      ``gene``/``gene_left``/``gene_right`` and ``sequence`` —
      complemented WITHOUT reversal on ``'-'`` ranges, the reference's
      ``generate_result`` quirk (``get_opposite_dna(sequence)``, no
      ``[::-1]`` — unlike every similarity caller; also by parity the
      complement here assumes the acgt alphabet: the reference DROPS
      other characters, we map them through unchanged).

    Divergence (documented): ranges falling outside the gene span
    would make the reference IndexError (past the end) or silently
    wrap to the LAST gene (Python ``[-1]``); here candidate indexes
    clamp to the dim, so edge ranges get their nearest real neighbor.

    Divergence (documented, ADVICE r14): when two genes share the same
    ``gene_left``, the index orders them by NAME (a deterministic total
    order), while the reference's binary search operates on the dim's
    INSERTION order — candidate windows, and thus which of the tied
    genes becomes the flanking neighbor, can differ from the reference
    on such ties. Real annotation tables carry distinct starts per
    strandful locus, and a nondeterministic-input-order dependence is
    exactly what a distributed engine must not replicate; callers that
    need reference-order parity on ties should pre-disambiguate
    ``gene_left`` (e.g. add an ordinal epsilon) before calling.

    Scale shape: the dim broadcasts; bounds come from a conditional
    aggregation over the broadcast cross join (map-side partial, the
    only shuffle is |ranges| aggregated rows), candidates from a second
    broadcast range join, and the cover preference is one window over
    candidate rows keyed by ``r_id`` (output-sized shuffle). Nothing
    moves the range side more than once at full width.
    """
    from ncbi_analysis_spark.functions.sequence import gene_range_type

    payload = list(ranges.columns)
    # Spark resolves names case-insensitively by default, so a payload
    # column named 'Gene' (the reference's ATCC header) would make every
    # reference to the output's 'gene' ambiguous mid-plan — fail with
    # the fix instead of an AMBIGUOUS_REFERENCE five operators deep
    clash = {"gene", "gene_left", "gene_right", "sequence", "type",
             "idx"} & {c.lower() for c in payload}
    if clash:
        raise ValueError(
            "nearby_genes_by_range: range column(s) "
            f"{sorted(clash)} collide (case-insensitively) with the "
            "expansion's output columns; rename them before the call "
            "and restore after (sequence payloads: note the output "
            "'sequence' is the GENE's, complemented on '-')"
        )
    g = (
        genes.select("gene", "gene_left", "gene_right", "sequence")
        # dim-sized single-partition window by contract (annotation
        # tables are thousands of rows); ties on gene_left break by name
        .withColumn(
            "idx",
            F.row_number().over(Window.orderBy("gene_left", "gene")),
        )
    )
    bounds = (
        ranges.crossJoin(F.broadcast(g.select("idx", "gene_left")))
        .groupBy(*payload)
        .agg(
            F.min(
                F.when(F.col("gene_left") >= F.col(r_left), F.col("idx"))
            ).alias("__lg_raw"),
            F.min(
                F.when(F.col("gene_left") >= F.col(r_right), F.col("idx"))
            ).alias("__rge_raw"),
            F.max("idx").alias("__n"),
        )
        .withColumn("__lg", F.coalesce("__lg_raw", F.col("__n") + 1))
        .withColumn(
            "__rl", F.coalesce("__rge_raw", F.col("__n") + 1) - F.lit(1)
        )
    )
    lo = F.greatest(F.least(F.col("__lg"), F.col("__rl")), F.lit(1))
    hi = F.least(F.greatest(F.col("__lg"), F.col("__rl")), F.col("__n"))
    cand = bounds.join(
        F.broadcast(g), (F.col("idx") >= lo) & (F.col("idx") <= hi)
    )
    covers = (F.col("gene_left") <= F.col(r_left)) & (
        F.col("gene_right") >= F.col(r_right)
    )
    cov_idx = F.min(F.when(covers, F.col("idx"))).over(
        Window.partitionBy(r_id)
    )
    seq = F.when(
        F.col(direction) == "-", F.translate("sequence", "atcg", "tagc")
    ).otherwise(F.col("sequence"))
    return (
        cand.withColumn("__cov", cov_idx)
        .filter(F.col("__cov").isNull() | (F.col("idx") == F.col("__cov")))
        .select(
            *payload,
            gene_range_type(
                F.col(r_left), F.col(r_right),
                F.col("gene_left"), F.col("gene_right"),
            ).alias("type"),
            "gene",
            "gene_left",
            "gene_right",
            seq.alias("sequence"),
        )
    )
