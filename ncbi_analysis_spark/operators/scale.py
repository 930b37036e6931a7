"""Scale techniques as reusable operators: skew salting and bucketed
co-located joins (SURVEY.md §4 — the physical tricks a 100 TB deployment
needs; the reference has no equivalents because it never distributes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed keys.

    The left (large, skewed) side gets a random salt in [0, salt);
    the right side is exploded ``salt`` x with every salt value, so each
    (key, salt) bucket joins independently — a hot key spreads over
    ``salt`` reducers instead of melting one. Result set is identical to
    the plain join (verified by the driver oracle).

    Use when AQE's skew-join splitting isn't enough (e.g. one key is
    >50% of the data) and the right side is small enough to replicate
    ``salt`` x. Salt uses ``rand`` — for deterministic task retries Spark
    re-seeds per task attempt, which is safe because any salt value joins
    correctly.

    Only ``inner`` and ``left`` joins are supported: the right side is
    exploded ``salt`` x, so an outer join would emit every unmatched
    right row once per salt value. Those joins don't suffer left-side
    key skew in the same way — use a plain join (with AQE skew handling)
    instead.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the exploded right side would duplicate unmatched rows "
            "under right/full outer joins"
        )
    lsalt = left.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    rsalt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalt.join(rsalt, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort: bool = True) -> None:
    """Persist a table bucketed (and sorted) by its join key.

    Two tables bucketed by the same key with the same bucket count join
    with NO exchange and (if sorted) no sort — the co-located join that
    replaces the reference's in-memory index lookups at cluster scale.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, on: str,
                  how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables (see write_bucketed) — the physical
    plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    granularity: int = 1_000_000,
) -> DataFrame:
    """Deterministic, rerun-stable train/val/test assignment: each row's
    md5 bucket of its id decides its named split, so the same row lands
    in the same split on every run, on any cluster, regardless of
    partitioning — the property random() sampling loses under retries
    and speculative execution.

    Scale: pure map (no shuffle, no state); the split column is a
    partition-pruning key when written with ``partitionBy('split')``.
    """
    from ncbi_analysis_spark.functions.text import _hash32

    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    bucket = _hash32(F.col(id_col).cast("string"), salt) % granularity
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(acc * granularity)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Reproducible global training order (the "baked shuffle" of an LLM
    data pipeline): ``shard`` = md5 bucket of the id, ``pos`` = md5
    order within the shard. Readers consume shards in index order and
    rows in ``pos`` order, giving a well-mixed global order that is
    IDENTICAL on every run, cluster layout, and engine — the property
    ``orderBy(rand())`` loses under retries, and a global
    ``row_number()`` cannot provide without a single-partition sort.

    Scale: one shuffle on the shard key + a keyed window sort; no
    global sort anywhere. Write with ``partitionBy('shard')`` sorted by
    ``pos`` for sequential training reads.
    """
    from pyspark.sql import Window

    from ncbi_analysis_spark.functions.text import _hash32

    shard = (_hash32(F.col(id_col).cast("string"), salt) % n_shards).cast("int")
    ordc = F.md5(F.concat(F.lit(salt + "#"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy(ordc, F.col(id_col))
    return (
        df.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def quota_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    quota: int,
    salt: str = "quota",
) -> DataFrame:
    """Deterministic per-group quota cap: keep at most ``quota`` rows per
    group, chosen by md5 order of the id (rerun-stable, cluster-layout
    independent — the domain-balancing step of a corpus mixer, e.g. "at
    most N pages per registered domain").

    One shuffle on the group key + a bounded sorted pass. Hot groups are
    the point (that's what the cap is for); the window sort is spill-safe
    and AQE splits skewed partitions. For quotas ≪ group size a
    pre-aggregated threshold sketch could cut shuffle volume — not
    needed until profile says so.
    """
    return (
        df.withColumn("__qrk", _md5_keep_rank(group_cols, id_col, salt))
        .filter(F.col("__qrk") <= quota)
        .drop("__qrk")
    )


def _md5_keep_rank(group_cols: list[str], id_col: str, salt: str):
    """The shared per-group keep order of ``quota_sample`` and
    ``apply_quotas``: rank by md5(salt|id) then id — rerun-stable and
    cluster-layout independent. ONE definition so the two operators can
    never silently diverge (their orders are relied on by oracles)."""
    from pyspark.sql import Window

    ordc = F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(ordc, F.col(id_col))
    return F.row_number().over(w)


def sample_by_hash(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "sample",
    granularity: int = 1_000_000,
) -> DataFrame:
    """Deterministic content-stable sampling: keep rows whose md5 bucket
    of the id falls below ``rate`` — reproducible across runs and
    engines (unlike ``df.sample``, which depends on partition layout)."""
    from ncbi_analysis_spark.functions.text import _hash32

    bucket = _hash32(F.col(id_col).cast("string"), salt) % granularity
    return df.filter(bucket < int(rate * granularity))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    salt: str = "mix",
    granularity: int = 1_000_000,
) -> DataFrame:
    """Per-group deterministic sampling — the corpus-mixer primitive
    ("keep 100% of wiki, 30% of web, 5% of common-crawl"): each row's
    md5 bucket of its id is compared against its GROUP's rate. Same
    rerun/retry stability as sample_by_hash; pure map, no shuffle;
    groups absent from ``rates`` get ``default_rate``.
    """
    from ncbi_analysis_spark.functions.text import _hash32

    bucket = _hash32(F.col(id_col).cast("string"), salt) % granularity
    expr = None
    for g, r in rates.items():
        thr = F.lit(int(r * granularity))
        cond = F.col(group_col) == g
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = (
        F.lit(int(default_rate * granularity)) if expr is None
        else expr.otherwise(F.lit(int(default_rate * granularity)))
    )
    return df.filter(bucket < thr_col)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    components: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    granularity: int = 1_000_000,
) -> DataFrame:
    """Train/val/test split keyed by the near-duplicate CLUSTER, not the
    row: every member of a dup cluster hashes on its component
    representative, so paraphrases/near-copies can never straddle the
    train/test boundary (the leakage a row-keyed split permits — a test
    document whose near-duplicate sits in train is a contaminated eval).

    ``components`` is a ``(id, component)`` frame (the
    operators.components.connected_components output over any pair
    generator's edges); rows absent from it are singletons and hash on
    their own id. Adds ``rep`` (the split key used) and ``split``.

    Scale: one left equi-join against the components table (tiny next to
    the corpus — only docs that appear in some near-dup pair) + the same
    pure-map md5 assignment as hash_split; deterministic and
    retry-stable for the same reasons.
    """
    comp = components.select(
        F.col("id").alias(id_col), F.col("component").alias("__rep")
    )
    with_rep = (
        df.join(comp, id_col, "left")
        .withColumn("rep", F.coalesce(F.col("__rep"), F.col(id_col)))
        .drop("__rep")
    )
    return hash_split(with_rep, "rep", weights, salt, granularity)


def temperature_quotas(
    df: DataFrame,
    group_cols: list[str],
    total: int,
    alpha: float = 0.5,
    max_groups: int = 100_000,
    cap_at_group_size: bool = True,
) -> DataFrame:
    """Temperature-based mixture allocation (the multilingual sampling
    rule of XLM-R/mT5: sample group g with probability ∝ c_g^α, α < 1
    upweighting low-resource groups). Returns one row per group:
    ``(group_cols..., n_rows, quota)`` — integer quotas by
    largest-remainder apportionment, never exceeding the group's row
    count. Quotas sum to exactly ``total`` when no per-group cap binds
    (the common case: total ≪ every group); the top-up is a SINGLE round
    of at most +1 per uncapped group, so when caps do bind, seats the
    capped groups can't absorb may go unallocated rather than cascading
    (bounded by the capped groups' deficit — re-run on the shortfall if
    exact totals matter under binding caps). Feed the result to
    ``apply_quotas`` to materialize the mixture.

    ``cap_at_group_size=False`` drops the per-group ceiling: quotas are
    the pure ∝ c_g^α apportionment and may EXCEED a group's row count —
    the sampling-with-replacement target of the mT5 rule, where a
    low-resource group is seen for multiple epochs. Quotas then sum to
    exactly ``total`` unconditionally (every group can absorb its +1
    top-up seat). Feed the result to ``epoch_materialize`` instead of
    ``apply_quotas`` to materialize repeats.

    Exactness: α ∈ {1, 0.5, 0.25} uses sqrt chains (IEEE sqrt is
    correctly rounded on every engine, so the weights — and therefore
    the oracle hash — are bit-stable); any other α falls back to
    ``pow``, whose rounding is NOT guaranteed identical across engines
    (fine for production, not for an exact-match oracle). The weight
    normalizer folds the per-group weights in group-key order (one
    sorted pass over ≤ n_groups rows), so every derived double is
    deterministic under any partition layout.

    Scale: one count aggregation (n_groups rows ≪ corpus), then
    driver-free window math over the group table itself — the corpus is
    touched once. The apportionment windows run single-partition, which
    is safe ONLY because the group table is vocabulary-sized
    (languages/sources); ``max_groups`` fails loudly at execution time
    if a caller groups by a high-cardinality key (e.g. domain or URL),
    where this would silently serialize one executor. The guard is a
    plan-embedded ``assert_true`` on the group array the normalizer
    already collects — a driver-side pre-count would re-materialize the
    whole upstream pipeline as an extra job (measured 9.6s -> 18.6s on
    the curation_v2 composition), the exact ``locate_matches``
    extra-``count()`` cost this module avoids.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    c = F.col("n_rows").cast("double")
    if alpha == 1.0:
        wcol = c
    elif alpha == 0.5:
        wcol = F.sqrt(c)
    elif alpha == 0.25:
        wcol = F.sqrt(F.sqrt(c))
    else:
        wcol = F.pow(c, F.lit(float(alpha)))
    g = counts.withColumn("__w", wcol)
    # deterministic normalizer: fold weights in group-key order
    allw = Window.orderBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # a single-partition window over n_groups rows is fine — this table
    # is vocabulary-sized (languages/sources), never corpus-sized; the
    # assert turns a high-cardinality misuse into a loud failure instead
    # of a silent one-executor serialization (and costs no extra job)
    collected = F.collect_list(F.struct(*group_cols, "__w")).over(allw)
    guarded = F.when(
        F.assert_true(
            F.size(collected) <= max_groups,
            F.concat(
                F.lit(
                    f"temperature_quotas: group count exceeds "
                    f"max_groups={max_groups} for {group_cols} — the "
                    "apportionment windows run single-partition; aggregate "
                    "to a coarser key or raise max_groups explicitly "
                    "(got "
                ),
                F.size(collected).cast("string"),
                F.lit(" groups)"),
            ),
        ).isNull(),
        F.array_sort(collected),
    )
    tot_w = F.aggregate(
        guarded,
        F.lit(0.0),
        lambda acc, s: acc + s["__w"],
    )
    g = g.withColumn("__share", F.col("__w") / tot_w * F.lit(float(total)))
    floor_raw = F.floor("__share").cast("long")
    g = g.withColumn(
        "__floor",
        F.least(floor_raw, F.col("n_rows")) if cap_at_group_size else floor_raw,
    )
    # largest-remainder top-up: hand the leftover seats to the groups
    # with the biggest fractional part (capped groups excluded), ties by
    # group key for determinism
    g = g.withColumn("__frac", F.col("__share") - F.col("__floor"))
    spent = F.aggregate(
        F.array_sort(F.collect_list(F.struct(*group_cols, "__floor")).over(allw)),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["__floor"],
    )
    g = g.withColumn("__left", F.lit(total) - spent)
    if cap_at_group_size:
        rk = Window.orderBy(
            F.when(F.col("__floor") >= F.col("n_rows"), F.lit(-1.0)).otherwise(F.col("__frac")).desc(),
            *group_cols,
        )
        bump_ok = (F.col("__rk") <= F.col("__left")) & (F.col("__floor") < F.col("n_rows"))
    else:
        rk = Window.orderBy(F.col("__frac").desc(), *group_cols)
        bump_ok = F.col("__rk") <= F.col("__left")
    g = g.withColumn("__rk", F.row_number().over(rk))
    quota = (
        F.col("__floor")
        + F.when(bump_ok, F.lit(1)).otherwise(F.lit(0)).cast("long")
    )
    if cap_at_group_size:
        quota = F.least(quota, F.col("n_rows"))
    return g.select(*group_cols, "n_rows", quota.alias("quota"))


def apply_quotas(
    df: DataFrame,
    quotas: DataFrame,
    group_cols: list[str],
    id_col: str,
    quota_col: str = "quota",
    salt: str = "quota",
) -> DataFrame:
    """Materialize per-group quotas (e.g. from ``temperature_quotas``):
    keep the first ``quota`` rows of each group in md5(id) order — the
    same rerun-stable, layout-independent order ``quota_sample`` uses,
    but with a PER-GROUP allowance joined in instead of one global cap.

    Scale: one shuffle on the group key (the window) plus a broadcast of
    the vocabulary-sized quota table."""
    q = F.broadcast(quotas.select(*group_cols, quota_col))
    return (
        df.join(q, group_cols)
        .withColumn("__qrk", _md5_keep_rank(group_cols, id_col, salt))
        .filter(F.col("__qrk") <= F.col(quota_col))
        .drop("__qrk", quota_col)
    )


def epoch_materialize(
    df: DataFrame,
    targets: DataFrame,
    group_cols: list[str],
    id_col: str,
    target_col: str = "quota",
    salt: str = "quota",
    max_epochs: int = 1_000,
) -> DataFrame:
    """Materialize per-group row targets that may EXCEED the group's row
    count — the sampling-with-replacement half of mixture construction
    (``apply_quotas`` is the without-replacement half): each group's
    rows are emitted ``floor(target/n)`` times, and the first
    ``target % n`` rows in md5(id) order once more, with an ``epoch``
    column (1-based repeat index). Exactly ``target`` output rows per
    group; a target below ``n`` degenerates to ``apply_quotas``'s
    keep-set with ``epoch = 1`` — same ``_md5_keep_rank`` order, so the
    two materializers can never diverge on which rows survive.

    Deterministic under any cluster layout: the repeat count per row
    depends only on (target, group size, md5 rank). Downstream shard
    assignment should hash (id, epoch) so repeats of a document spread
    across shards (``deterministic_shuffle``'s salt argument).

    Scale: one broadcast join (targets is vocabulary-sized), ONE shuffle
    on the group key shared by the size and rank windows, and a map-side
    explode. The blow-up factor is explicit: ``max_epochs`` fails loudly
    in-plan when any group would repeat more than that (a mis-set total
    on a tiny group is a corpus-sized output bug, not a warning).
    ``target``/``n`` enter double division for the per-row repeat count
    — exact below 2^53, far past any real row target.
    """
    from pyspark.sql import Window

    # duplicate group keys in the target table would silently multiply
    # every row of the group through the join — fail loudly in-plan
    # instead (the table is vocabulary-sized, so the window is cheap)
    tdup = F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    guarded_target = F.when(
        F.assert_true(
            tdup == 1,
            F.concat(
                F.lit(
                    f"epoch_materialize: duplicate target rows for "
                    f"{group_cols} — every duplicate would multiply the "
                    "whole group through the join; deduplicate the "
                    "target table (got "
                ),
                tdup.cast("string"),
                F.lit(" rows for one group)"),
            ),
        ).isNull(),
        F.col(target_col),
    )
    t = F.broadcast(
        targets.select(*group_cols, target_col)
        .select(*group_cols, guarded_target.alias(target_col))
    )
    # window results land in their own projections (__n, __erk) first —
    # a window expression inside the explode projection is unresolvable
    n = F.col("__n")
    base = F.floor(F.col(target_col) / n).cast("long")
    extra = F.pmod(F.col(target_col), n).cast("long")
    epochs = base + F.when(
        F.col("__erk") <= extra, F.lit(1)
    ).otherwise(F.lit(0)).cast("long")
    guarded = F.when(
        F.assert_true(
            epochs <= F.lit(max_epochs),
            F.concat(
                F.lit(
                    f"epoch_materialize: a group's target implies more than "
                    f"max_epochs={max_epochs} repeats for {group_cols} — "
                    "check the mixture total, or raise max_epochs "
                    "explicitly (got "
                ),
                epochs.cast("string"),
                F.lit(" epochs)"),
            ),
        ).isNull(),
        epochs,
    )
    return (
        df.join(t, group_cols)
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        )
        .withColumn("__erk", _md5_keep_rank(group_cols, id_col, salt))
        .withColumn(
            "epoch",
            F.explode(
                F.when(
                    guarded >= 1,
                    F.sequence(F.lit(1).cast("long"), guarded),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )
        .drop("__n", "__erk", target_col)
    )


def _distinct_overflow(
    df: DataFrame,
    score_col: str,
    group_cols: list[str],
    max_distinct: int,
) -> bool:
    """Probe whether any scope's distinct-score count approaches
    ``max_distinct`` — the ``on_overflow='approx'`` switch test.

    One HyperLogLog aggregation job (``approx_count_distinct``,
    map-side mergeable sketch — no distinct-value shuffle, so probing a
    100 TB continuous score costs one scan, not the corpus-sized
    groupBy the exact path would choke on). The driver materializes a
    single scalar (or one row per group reduced to a max) — a bounded
    collect by construction. The 0.9 comparison margin absorbs the
    sketch's ~2% rsd: a scope whose estimate lands within 10% of the
    cap is treated as overflowing, so the exact path is only chosen
    with comfortable headroom and its in-plan assert cannot fire."""
    probe = df.filter(F.col(score_col).isNotNull())
    nd = F.approx_count_distinct(score_col, 0.02).alias("__nd")
    if group_cols:
        row = probe.groupBy(*group_cols).agg(nd).agg(
            F.max("__nd").alias("__nd")
        ).collect()
    else:
        row = probe.agg(nd).collect()
    est = row[0]["__nd"] if row else 0
    return (est or 0) > 0.9 * max_distinct


def quantile_threshold(
    df: DataFrame,
    score_col: str,
    q: float,
    max_distinct: int = 1_000_000,
) -> DataFrame:
    """Exact discrete corpus ``q``-quantile of a score column as a
    single-row DataFrame ``(threshold)`` — the value at row
    ``ceil(q * n)`` of the sorted score distribution (corpus_profile's
    integer-index convention: no interpolation floats, so the oracle is
    bit-exact).

    Scale: the heavy work is a distributed count-per-DISTINCT-score
    aggregation (map-side combined); only the distinct-score table —
    bounded for any sanely rounded score (round to 6 decimals ->
    <= 2e6 values in [0, 1], usually far fewer) — flows into the
    single-partition cumulative scan, guarded by ``max_distinct`` with
    a loud in-plan failure (the ``temperature_quotas`` pattern). An
    unrounded continuous score makes the distinct table corpus-sized;
    round first, or use ``F.approx_percentile`` where a ulp-exact
    threshold doesn't matter.

    If ``q * n`` lands past the last row (q=1 exactly) the threshold is
    the maximum score. NULL scores are EXCLUDED from the distribution —
    Spark orders NULLs first and DuckDB last, so letting them into the
    cumulative scan would shift the threshold differently per engine;
    excluded, both agree (and ``filter_by_quantile`` drops NULL-score
    rows in both keep modes anyway, NULL comparisons being false).
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"quantile_threshold: q must be in (0, 1], got {q}")
    return _quantile_thresholds(df, score_col, q, [], max_distinct).select(
        "threshold"
    )


def group_quantile_thresholds(
    df: DataFrame,
    score_col: str,
    q: float,
    group_cols: list[str],
    max_distinct: int = 1_000_000,
) -> DataFrame:
    """Per-group exact discrete ``q``-quantiles: one row
    ``(group_cols..., threshold)`` per group — per-language /
    per-source quality thresholds, so a quality cut doesn't let one
    high-scoring language swallow the whole budget. Same discrete
    convention and NULL-score exclusion as ``quantile_threshold``.

    Scale: the cumulative scan is PARTITIONED by the group key (one
    ordered pass per group, parallel across groups); ``max_distinct``
    guards each group's distinct-score count, not the corpus.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(
            f"group_quantile_thresholds: q must be in (0, 1], got {q}"
        )
    if not group_cols:
        raise ValueError(
            "group_quantile_thresholds: group_cols is empty — use "
            "quantile_threshold for the corpus-wide form"
        )
    return _quantile_thresholds(df, score_col, q, group_cols, max_distinct)


def _score_cum(
    df: DataFrame,
    score_col: str,
    group_cols: list[str],
    max_distinct: int,
) -> DataFrame:
    """Shared distinct-score cumulative table of the quantile family:
    ``(group_cols..., score_col, __cum, __n)`` — NULL scores excluded,
    ``__cum`` already wrapped in the ``max_distinct`` in-plan guard so
    every consumer inherits the loud failure."""
    from pyspark.sql import Window

    counts = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(*group_cols, score_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wcum = Window.partitionBy(*group_cols).orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        counts.withColumn("__rawcum", F.sum("__c").over(wcum))
        .withColumn("__n", F.sum("__c").over(wall))
        .withColumn("__nd", F.count(F.lit(1)).over(wall))
    )
    scope = "group" if group_cols else "corpus"
    guarded_cum = F.when(
        F.assert_true(
            F.col("__nd") <= F.lit(max_distinct),
            F.concat(
                F.lit(
                    f"quantile threshold: more than max_distinct="
                    f"{max_distinct} distinct {score_col} values in a "
                    f"{scope} — the cumulative scan runs one ordered pass "
                    "per group; round the score or raise max_distinct "
                    "explicitly (got "
                ),
                F.col("__nd").cast("string"),
                F.lit(" distinct values)"),
            ),
        ).isNull(),
        F.col("__rawcum"),
    )
    return cum.select(
        *group_cols, score_col, guarded_cum.alias("__cum"), "__n"
    )


def _quantile_thresholds(
    df: DataFrame,
    score_col: str,
    q: float,
    group_cols: list[str],
    max_distinct: int,
) -> DataFrame:
    cum = _score_cum(df, score_col, group_cols, max_distinct)
    target = F.ceil(F.col("__n").cast("double") * F.lit(float(q)))
    return (
        cum.filter(F.col("__cum") >= target)
        .groupBy(*group_cols)
        .agg(F.min(score_col).alias("threshold"))
    )


def filter_by_quantile(
    df: DataFrame,
    score_col: str,
    q: float,
    keep: str = "at_or_above",
    max_distinct: int = 1_000_000,
    group_cols: list[str] | None = None,
    on_overflow: str = "raise",
) -> DataFrame:
    """Quantile gate: keep the rows whose score is at or above
    (default) — or strictly below — the exact discrete ``q``-quantile
    of ``score_col``. The "keep the top (1-q) of the corpus by quality
    score" curation primitive; ties at the threshold all survive
    (deterministic, layout-independent — no tie-broken rank order to
    disagree about across engines). NULL-score rows are dropped in both
    modes (NULL comparisons are false in both engines).

    With ``group_cols``, the threshold is PER GROUP
    (``group_quantile_thresholds``) — per-language quality cuts, so one
    high-scoring language can't swallow the budget.

    One aggregation to find the threshold(s) plus one broadcast of the
    vocabulary-sized result into a map-side filter — the corpus is
    never shuffled.

    ``on_overflow`` controls what happens when the distinct-score
    cardinality exceeds ``max_distinct`` (an unrounded continuous score
    at 100 TB makes the exact path unusable BY DESIGN — its cumulative
    scan needs the distinct-score table):

    - ``'raise'`` (default): the exact path's in-plan assert fires with
      the round-the-score guidance — the oracle-exact contract.
    - ``'approx'``: a one-scan HyperLogLog probe (``_distinct_overflow``)
      chooses the path up front — exact when the largest scope has
      comfortable headroom under ``max_distinct`` (in-plan guard
      retained, probe margin guarantees it cannot fire), else
      ``quantile_threshold_approx`` (rank-error ≤ 1/accuracy, no
      distinct table at all). The switch is observable: the returned
      DataFrame carries an ``observe('filter_by_quantile', ...)``
      metric ``approx_threshold_used`` (1/0) — the ``_capped`` pattern,
      so a degraded run is auditable, not silent.
    """
    if keep not in ("at_or_above", "below"):
        raise ValueError(
            f"keep must be 'at_or_above' or 'below', got {keep!r}"
        )
    if on_overflow not in ("raise", "approx"):
        raise ValueError(
            f"on_overflow must be 'raise' or 'approx', got {on_overflow!r}"
        )
    cond = (
        F.col(score_col) >= F.col("threshold")
        if keep == "at_or_above"
        else F.col(score_col) < F.col("threshold")
    )
    use_approx = on_overflow == "approx" and _distinct_overflow(
        df, score_col, group_cols or [], max_distinct
    )
    if group_cols:
        thr = (
            quantile_threshold_approx(df, score_col, q,
                                      group_cols=group_cols)
            if use_approx
            else group_quantile_thresholds(df, score_col, q, group_cols,
                                           max_distinct)
        )
        joined = df.join(F.broadcast(thr), group_cols)
    else:
        thr = (
            quantile_threshold_approx(df, score_col, q)
            if use_approx
            else quantile_threshold(df, score_col, q, max_distinct)
        )
        joined = df.join(F.broadcast(thr), how="cross")
    out = joined.filter(cond).drop("threshold")
    if on_overflow == "approx":
        out = out.observe(
            "filter_by_quantile",
            F.max(F.lit(1 if use_approx else 0)).alias(
                "approx_threshold_used"
            ),
        )
    return out


def curriculum_shards(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_shards: int,
    salt: str = "curriculum",
    max_distinct: int = 1_000_000,
) -> DataFrame:
    """Curriculum-ordered training layout: assign each row a difficulty
    ``shard`` (1..``n_shards``, ascending ``score_col`` — readers
    consume shards in index order for an easy-to-hard schedule) and a
    deterministic ``pos`` within the shard (md5 order — shuffled within
    the difficulty band, the standard curriculum construction). The
    value-based counterpart of ``deterministic_shuffle``: identical
    output on every run, cluster layout, and engine.

    Shard boundaries are value-based on the distinct-score cumulative
    table: every row of a tied score lands in the SAME shard
    (``shard = ceil(cum * n_shards / n)``, pure integer arithmetic —
    no rank tie-breaks, no interpolation floats, so the oracle is
    bit-exact; heavy ties make shard sizes uneven by exactly the tie
    mass). NULL scores are dropped — order them explicitly first if
    they belong in the schedule.

    Scale: the ``_score_cum`` distinct-score scan (bounded,
    ``max_distinct``-guarded) broadcast-joins back as a score→shard
    map; ``pos`` is one shard-keyed window. Write with
    ``partitionBy('shard')`` sorted by ``pos`` for sequential reads.
    """
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"curriculum_shards: n_shards must be >= 1, got {n_shards}")
    cum = _score_cum(df, score_col, [], max_distinct)
    # ceil(cum * n_shards / n) in pure integer math: (a + b - 1) div b
    shard = (
        (F.col("__cum") * n_shards + F.col("__n") - 1) / F.col("__n")
    ).cast("long")
    mapping = cum.select(
        score_col, F.least(shard, F.lit(n_shards).cast("long")).alias("shard")
    )
    ordc = F.md5(F.concat(F.lit(salt + "#"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy(ordc, F.col(id_col))
    return (
        df.join(F.broadcast(mapping), score_col)
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def quantile_threshold_approx(
    df: DataFrame,
    score_col: str,
    q: float,
    accuracy: int = 10_000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Production twin of ``quantile_threshold`` for UNBOUNDED score
    cardinality (unrounded continuous scores, where the exact form's
    distinct-score table would be corpus-sized): Spark's
    ``percentile_approx`` (Greenwald-Khanna sketch, mergeable map-side —
    one aggregation, no distinct-score table, no cumulative scan).
    Error is bounded by ``1/accuracy`` in RANK (not value) terms; NULL
    scores are ignored, matching the exact form.

    Not oracle-exact by design — the sketch's answer depends on merge
    order; the exact form remains the oracle twin (the
    ``ann_brute_force`` / ``ann_brute_force_np`` dual-form pattern).
    Returns ``(group_cols..., threshold)``.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(
            f"quantile_threshold_approx: q must be in (0, 1], got {q}"
        )
    agg = F.percentile_approx(score_col, F.lit(float(q)),
                              F.lit(int(accuracy))).alias("threshold")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def cluster_balanced_sample(
    df: DataFrame,
    centroids: DataFrame,
    per_cluster: int,
    vec: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "diversity",
    method: str = "auto",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling for training-data
    selection — the D4/SemDeDup-style density flattener: assign every
    row to its nearest centroid in embedding space, then keep at most
    ``per_cluster`` rows per cluster. Over-dense regions (boilerplate
    clusters, template spam — which dominate a uniform sample of any
    web corpus) contribute no more than sparse ones, so the kept subset
    is diverse by construction.

    Within a cluster rows are kept in md5(salt|id) order (id
    tie-break) — the ``_md5_keep_rank`` order shared with the quota
    operators: pseudo-random but rerun-stable and partition-layout
    independent, which is what makes the selection oracle-checkable.
    To keep the BEST-scored exemplars per cluster instead, compose the
    assignment with ``operators.topk.topk_per_group`` on your score.

    Output: (id_col, c_id, rk). Join back on ``id_col`` to materialize
    the subset.

    Scale shape: assignment is ``ivf_assign`` — a pure map (centroid
    literals or broadcast matrix, no join/shuffle); the per-cluster cap
    is one shuffle on ``c_id``, and Spark's rank-limit pushdown inserts
    a partial WindowGroupLimit before the exchange so at most
    ``per_cluster`` rows per cluster per map partition move. With k
    clusters the output is <= k * per_cluster rows however large the
    corpus — the caller picks k to match the target subset size.
    """
    from ncbi_analysis_spark.operators.similarity_search import ivf_assign

    assigned = ivf_assign(
        df, centroids, vec=vec, id_col=id_col, method=method
    ).select(id_col, "c_id")
    rk = _md5_keep_rank(["c_id"], id_col, salt)
    return (
        assigned.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= per_cluster)
        .select(id_col, "c_id", "rk")
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "psample",
    group_by: list[str] | None = None,
) -> DataFrame:
    """Weighted-without-replacement sample of ``k`` rows (per group):
    priority sampling (Duffield, Lund & Thorup 2007) — the
    probability-proportional-to-weight mixture materializer the DSIR
    importance weights feed (today they feed a deterministic top-k
    cut, which over-selects the head; a weighted SAMPLE is the
    statistically right way to hit a target mixture).

    Each row gets priority ``q = w / u`` with ``u`` the row's pinned
    md5-uniform: ``u = (h52 + 1) / 2^52`` ∈ (2^-52, 1] from the
    52-bit md5 hash of (salt | id). The k highest-priority rows are
    the sample; the (k+1)-th priority is the threshold ``tau``, and
    each kept row's Horvitz-Thompson estimation weight is
    ``max(w, tau)`` — sums of est_weight over any subset S of the
    sample unbiasedly estimate the true total weight of S's population
    (near-optimal variance; Szegedy 2006). Groups with <= k rows keep
    everything with tau = 0 and est_weight = w (exact).

    Why priority sampling and not A-ES (key = u^(1/w)): identical
    sampling design family, but A-ES's key needs a per-row ``pow`` —
    a libm transcendental whose last ulp differs between the JVM and
    DuckDB, breaking the repo's bit-pinned oracle contract. The
    priority key is ONE exact IEEE division (u is a dyadic rational —
    (h+1) <= 2^52 divided by a power of two is EXACT), so sample
    membership, tau, and est_weight are bit-reproducible cross-engine
    and layout-independent (rerun-stable under retries/speculation,
    the hash_split property).

    No reference analog (the reference's only sampling is the seeded
    random split-triple generator, src/run_random_generate.py:16-25 —
    covered by F17); LLM-pipeline extension.

    Output: the sampled rows with ``__priority`` dropped, plus
    ``est_weight`` (double) and ``tau`` (double, the group's
    threshold). Requires ``weight_col`` > 0 (validated in-plan: a
    non-positive weight raises at execution). NULL weights are
    excluded (COUNT semantics).

    Scale: ungrouped -> the corpus reduces by TakeOrderedAndProject
    (partial per-partition top-(k+1), no global sort, no corpus-wide
    single partition) before a window over the BOUNDED k+1-row
    survivor set assigns ranks; grouped -> one rank window on the
    group key (the topk_per_group shuffle), tau by a bounded per-group
    max over the held-out (k+1)-th row.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"priority_sample: k={k} must be >= 1")
    gb = list(group_by or [])
    h52 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
            1, 13,
        ), 16, 10,
    ).cast("long")
    u = (h52 + F.lit(1)).cast("double") / F.lit(float(1 << 52))
    w = F.col(weight_col).cast("double")
    guarded_w = F.when(w > 0.0, w).otherwise(
        F.raise_error(F.concat(
            F.lit("priority_sample: non-positive weight for id "),
            F.col(id_col).cast("string"),
        ))
    )
    d = df.filter(F.col(weight_col).isNotNull()).withColumn(
        "__priority", guarded_w / u
    )
    order = [F.desc("__priority"), F.asc(id_col)]
    if not gb:
        # distributed partial top-(k+1) FIRST; the single-partition
        # window below sees only those <= k+1 rows (bounded by design)
        d = d.orderBy(*order).limit(k + 1)
    win = Window.partitionBy(
        *[F.col(c) for c in gb]
    ) if gb else Window.partitionBy(F.lit(1))
    ranked = d.withColumn(
        "__rk", F.row_number().over(win.orderBy(*order))
    ).filter(F.col("__rk") <= k + 1)
    # tau = the (k+1)-th priority per group (0.0 when the group ran out)
    tau = ranked.groupBy(*gb).agg(
        F.max(F.when(F.col("__rk") == k + 1, F.col("__priority"))
              ).alias("__tau")
    ).select(*gb, F.coalesce(F.col("__tau"), F.lit(0.0)).alias("tau"))
    kept = ranked.filter(F.col("__rk") <= k)
    joined = kept.join(F.broadcast(tau), gb) if gb else kept.crossJoin(
        F.broadcast(tau))
    return (
        joined.withColumn(
            "est_weight",
            F.greatest(F.col(weight_col).cast("double"), F.col("tau")),
        )
        .drop("__priority", "__rk")
    )


def key_skew_report(
    df: DataFrame,
    keys: list[str],
    top_n: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Pre-join skew diagnostic: the ``top_n`` heaviest key groups with
    exact counts, integer-ppm share of the table, and the salt factor
    that spreads each key to ~``target_rows_per_task`` rows per task —
    feed the max into :func:`salted_join`'s ``salt`` (or confirm AQE's
    skew split suffices). The missing step BEFORE the salting knob:
    whether a join needs salting, and how much, should be measured,
    not guessed.

    Output ``(*keys, n_rows, share_ppm, recommended_salt)`` ordered
    heaviest first (key-asc tiebreak). All-integer arithmetic
    (``div``), so the report is exact cross-engine.

    Scale shape: one map-side-combined groupBy over the raw table;
    everything after operates on the aggregated key table — the total
    is a one-row aggregate OF THE COUNTS broadcast back (never a
    second raw scan), and the report is a bounded
    TakeOrderedAndProject.
    """
    t = int(target_rows_per_task)
    if t <= 0:
        raise ValueError(f"target_rows_per_task must be > 0, got {t}")
    counts = df.groupBy(*keys).agg(F.count("*").cast("long").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").cast("long").alias("__total"))
    return (
        counts.join(F.broadcast(total))
        .orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
        .limit(top_n)
        .select(
            *keys,
            "n_rows",
            F.expr("(n_rows * CAST(1000000 AS BIGINT)) div __total")
            .alias("share_ppm"),
            F.expr(f"(n_rows + CAST({t - 1} AS BIGINT)) "
                   f"div CAST({t} AS BIGINT)")
            .cast("long").alias("recommended_salt"),
        )
    )
