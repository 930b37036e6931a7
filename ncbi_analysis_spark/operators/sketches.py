"""Mergeable cardinality sketches — incremental distinct-count tracking
for corpus bookkeeping at 100 TB.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) answers the
one-shot question, but its sketch state is opaque: it can't be persisted
as data, merged across independently-computed snapshots, or re-checked
by another engine. This module implements classic HyperLogLog (Flajolet
et al. 2007) as PLAIN DATAFRAMES of ``(register, max_rho)`` rows —

- **mergeable**: ``hll_merge`` of two register tables equals the sketch
  of the unioned inputs EXACTLY (max is associative/commutative/
  idempotent), so each crawl snapshot publishes its 2^p-row sketch once
  and corpus-lifetime cardinality is a max-groupBy over sketch tables —
  no re-scan of old data, the incremental posture of
  ``exact_dedup_against`` / ``append_to_ifv_index``;
- **engine-checkable**: register assignment and rho are md5/substring/
  bin() string arithmetic, integer-exact and identical in DuckDB, and
  the estimator folds ``2^-rho`` in pinned register order, so the
  staged driver query hash-matches the oracle bit-for-bit (only +,*,/
  and exact powers of two — no transcendentals on the oracled path).

No reference analog (the reference counts distinct values by exact
set/dict — e.g. the cluster membership maps in
src/analysis/cluster_sequence_analysis.py); LLM-pipeline extension.

Scale shape: one map projection (md5 + substring per row), one groupBy
on ``(group, register)`` with map-side partial max — shuffle rows
bounded by ``n_groups * 2^p`` regardless of corpus size; the estimate
step reduces 2^p rows per group to one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# w-bits taken from the md5 tail for the rho count: 13 hex chars = 52
# bits, the largest multiple of 4 that stays exactly representable (and
# positive) in a BIGINT->DOUBLE world
_W_HEX = 13
_W_BITS = 4 * _W_HEX


def _alpha(m: int) -> float:
    """Bias constant alpha_m from the HLL paper (m >= 128 form)."""
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    if m == 16:
        return 0.673
    raise ValueError(f"unsupported register count m={m}")


def _check_p(p: int) -> int:
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(
            f"p={p}: register bits must be a multiple of 4 in [4, 16] "
            "(register ids are carved from md5 hex digits)"
        )
    return 1 << p


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 8,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Build the HLL register table for ``col`` (optionally per group).

    Register id = first ``p`` bits of ``md5(value)`` (hex-digit carve);
    rho = 1 + leading-zero count of the next 52 bits. NULL values are
    skipped (COUNT DISTINCT semantics). Output:
    ``(*group_by, register, max_rho)`` — at most ``n_groups * 2^p``
    rows, integer-exact, persistable and mergeable.
    """
    _check_p(p)
    gb = list(group_by or [])
    h = F.md5(F.col(col).cast("string"))
    reg = F.conv(F.substring(h, 1, p // 4), 16, 10).cast("int")
    w = F.conv(
        F.substring(h, p // 4 + 1, _W_HEX), 16, 10
    ).cast("long")
    # bin() drops leading zeros in both engines; bin(0) = '0' needs the
    # explicit branch (rho = W + 1 when every w-bit is zero)
    rho = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS) - F.length(F.bin(w)) + 1
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(*gb, reg.alias("register"), rho.cast("int").alias("rho"))
        .groupBy(*gb, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(
    a: DataFrame,
    b: DataFrame,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Merge two register tables: the sketch of the UNION of the inputs,
    exactly (register-wise max). Both must share ``p`` — same register
    space — which the caller guarantees (register tables carry no
    parameter marker; persist them beside a params file, the
    write_ivf_index posture)."""
    gb = list(group_by or [])
    return (
        a.select(*gb, "register", "max_rho")
        .unionByName(b.select(*gb, "register", "max_rho"))
        .groupBy(*gb, "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    group_by: list[str] | None = None,
    correct: bool = True,
) -> DataFrame:
    """Cardinality estimate from a register table.

    Output per group: ``(*group_by, n_present, n_zero, est_raw[, est])``
    — ``est_raw`` is the uncorrected HLL estimator
    ``alpha_m * m^2 / (sum_j 2^-rho_j)`` (absent registers contribute
    ``2^0``), folded in REGISTER ORDER via a sorted collect_list — 2^p
    elements per group, bounded driver-free state — so the float
    accumulation order is pinned and a DuckDB ``list_reduce`` over the
    same order reproduces it bit-for-bit.

    ``correct=True`` adds ``est`` with the paper's small-range linear
    counting (``m * ln(m / n_zero)`` when est_raw <= 2.5m and zeros
    remain). ``ln`` is a libm call whose last ulp differs across
    engines — oracled queries select the transcendental-free columns
    and pin ``est`` accuracy in pytest instead.
    """
    m = _check_p(p)
    gb = list(group_by or [])
    alpha = _alpha(m)
    # fold 2^-rho in register order: sort_array over the collected
    # (register, max_rho) structs, then a sequential sum — every term is
    # an exact power of two; only the ADD order needs pinning
    pairs = F.array_sort(
        F.collect_list(F.struct("register", "max_rho"))
    )
    s_present = F.aggregate(
        pairs,
        F.lit(0.0),
        lambda acc, s: acc + F.pow(F.lit(2.0), -s["max_rho"].cast("double")),
    )
    n_present = F.size(pairs)
    agg = registers.groupBy(*gb).agg(
        n_present.cast("long").alias("n_present"),
        s_present.alias("__s_present"),
    )
    n_zero = F.lit(m) - F.col("n_present")
    s_total = F.col("__s_present") + n_zero.cast("double")
    est_raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) / s_total
    out = agg.select(
        *gb,
        "n_present",
        n_zero.cast("long").alias("n_zero"),
        est_raw.alias("est_raw"),
    )
    if correct:
        est = F.when(
            (F.col("est_raw") <= 2.5 * m) & (F.col("n_zero") > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
        ).otherwise(F.col("est_raw"))
        out = out.withColumn("est", est)
    return out


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 8,
    group_by: list[str] | None = None,
    correct: bool = True,
) -> DataFrame:
    """One-shot convenience: ``hll_estimate(hll_registers(...))``."""
    return hll_estimate(
        hll_registers(df, col, p, group_by), p, group_by, correct
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches — the overlap/Jaccard companion to the
# HLL register tables above. HLL answers "how many distinct" but cannot
# estimate INTERSECTIONS between snapshots; a KMV sketch (Bar-Yossef et
# al. 2002; Beyer et al. 2007 "distinct sampling") is a uniform hash
# sample of the distinct-value space, so two snapshots' sketches support
# overlap estimation: merge to the union's sketch, count members present
# in both sides' sketches, and the ratio estimates Jaccard — the "how
# much does this crawl overlap the last one" question, answered from two
# k-row published tables with no re-scan of either corpus.
#
# Same postures as the HLL table: plain DataFrames of hash rows,
# mergeable (k-smallest of a union of k-smallest sets = k-smallest of
# the union, exactly), engine-checkable (md5 carve to a 52-bit integer;
# estimator = one exact-integer division), incremental-crawl
# bookkeeping. No reference analog; LLM-pipeline extension.
#
# Scale shape: one map projection per row, a (group, h) groupBy whose
# map-side partial aggregation dedups before the shuffle, then the
# topk_per_group rank window (shuffle keyed by group). Published
# sketches are <= k rows per group regardless of corpus size.
# ---------------------------------------------------------------------------

# 13 hex chars = 52 bits: the largest md5 carve that stays exact in a
# DOUBLE (the _W_HEX rationale), so the estimator's division is the
# same IEEE operation in every engine
_KMV_SPACE = float(1 << 52)


def _kmv_h52(col: str):
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 13), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    group_by: list[str] | None = None,
) -> DataFrame:
    """The ``k`` smallest distinct 52-bit hash values of ``col`` per
    group — a mergeable distinct-value sample. NULLs are skipped (COUNT
    DISTINCT semantics). Output ``(*group_by, h)``, <= k rows per group
    (fewer when the group has fewer distinct values — there the sketch
    IS the exact distinct hash set and the estimator returns it).
    """
    from ncbi_analysis_spark.operators.topk import topk_per_group

    if k < 2:
        raise ValueError(f"kmv_sketch: k={k} must be >= 2")
    gb = list(group_by or [])
    hashes = (
        df.filter(F.col(col).isNotNull())
        .select(*gb, _kmv_h52(col).alias("h"))
        .groupBy(*gb, "h")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    if gb:
        return topk_per_group(
            hashes, gb, [F.col("h")], k, keep_rank=False
        )
    return hashes.orderBy("h").limit(k)


def kmv_merge(
    a: DataFrame,
    b: DataFrame,
    k: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Merge two KMV sketches: the k smallest of the distinct union —
    EXACTLY the sketch of the unioned inputs (min-k is associative/
    commutative/idempotent over sets, the hll_merge posture). Both
    sides must share the hash space and ``k`` (caller-guaranteed, the
    register-table contract)."""
    from ncbi_analysis_spark.operators.topk import topk_per_group

    gb = list(group_by or [])
    u = (
        a.select(*gb, "h")
        .unionByName(b.select(*gb, "h"))
        .groupBy(*gb, "h")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    if gb:
        return topk_per_group(u, gb, [F.col("h")], k, keep_rank=False)
    return u.orderBy("h").limit(k)


def kmv_estimate(
    sketch: DataFrame,
    k: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch.

    Per group: ``n_hashes`` (sketch size) and ``est_distinct`` — the
    exact ``n_hashes`` when the sketch is unsaturated (every distinct
    hash is present), else the classic ``(k-1) / U_(k)`` with
    ``U_(k) = kth_smallest / 2^52``. ``(k-1) * 2^52`` is exactly
    representable in a DOUBLE for any sane k, so the whole estimator is
    ONE IEEE division — bit-identical cross-engine."""
    gb = list(group_by or [])
    agg = sketch.groupBy(*gb).agg(
        F.count("h").cast("long").alias("n_hashes"),
        F.max("h").alias("__kth"),
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.lit(float(k - 1) * _KMV_SPACE) / F.col("__kth").cast("double")
    )
    return agg.select(*gb, "n_hashes", est.alias("est_distinct"))


def kmv_jaccard(
    a: DataFrame,
    b: DataFrame,
    k: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Jaccard-overlap estimate between two sketched value sets.

    Per group: merge to the union's sketch X (k smallest of the union),
    count the members of X present in BOTH input sketches (for
    unsaturated sketches X ∩ A ∩ B is literally the intersection's
    hash set), and estimate ``J = |X ∩ A ∩ B| / |X|`` — integer counts
    and one exact division. Output ``(*group_by, n_union_sketch,
    n_inter, jaccard_est)``.

    Scale: the joins are sketch-vs-sketch (<= k rows per group per
    side) — broadcastable by construction regardless of corpus size.
    """
    gb = list(group_by or [])
    u = kmv_merge(a, b, k, group_by=gb)
    keys = gb + ["h"]
    in_both = (
        u.join(a.select(*keys), keys, "left_semi")
        .join(b.select(*keys), keys, "left_semi")
    )
    n_u = u.groupBy(*gb).agg(
        F.count("h").cast("long").alias("n_union_sketch")
    )
    n_i = in_both.groupBy(*gb).agg(
        F.count("h").cast("long").alias("n_inter")
    )
    if gb:
        joined = n_u.join(n_i, gb, "left")
    else:
        joined = n_u.crossJoin(n_i)
    return joined.select(
        *gb,
        "n_union_sketch",
        F.coalesce(F.col("n_inter"), F.lit(0)).alias("n_inter"),
        (
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
            / F.col("n_union_sketch").cast("double")
        ).alias("jaccard_est"),
    )


def kmv_diff(
    a: DataFrame,
    b: DataFrame,
    k: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Set-DIFFERENCE cardinality estimates between two sketched value
    sets — "how many values are new this crawl / gone since last
    crawl", the question HLL cannot answer (no register subtraction)
    and KMV can: within the union's sketch X (the k smallest of the
    union — a uniform sample of A ∪ B's distinct values), count the
    members seen only in A's sketch, only in B's, and in both; each
    fraction of |X| times the union-cardinality estimate is the
    standard bottom-k subset estimator.

    Output ``(*group_by, n_union_sketch, n_only_a, n_only_b, n_both,
    est_union, est_only_a, est_only_b, est_inter)``. Arithmetic is
    pinned: integer memberships, the one-division union estimator
    (``kmv_estimate``'s (k-1) * 2^52 / kth), and one
    multiply-of-a-ratio per subset — bit-reproducible cross-engine.
    Unsaturated unions (< k hashes) are exact: X IS the union and the
    subset counts are the true distinct counts.

    Scale: sketch-vs-sketch joins (<= k rows per group per side),
    broadcastable by construction — crawl-ledger arithmetic from
    published artifacts, no corpus re-scan (the hll_merge_snapshots
    posture)."""
    gb = list(group_by or [])
    u = kmv_merge(a, b, k, group_by=gb)
    keys = gb + ["h"]
    in_a = a.select(*keys).withColumn("__in_a", F.lit(1))
    in_b = b.select(*keys).withColumn("__in_b", F.lit(1))
    tagged = (
        u.join(in_a, keys, "left")
        .join(in_b, keys, "left")
        .select(
            *gb,
            "h",
            F.coalesce("__in_a", F.lit(0)).alias("ia"),
            F.coalesce("__in_b", F.lit(0)).alias("ib"),
        )
    )
    agg = tagged.groupBy(*gb).agg(
        F.count("h").cast("long").alias("n_union_sketch"),
        F.max("h").alias("__kth"),
        F.sum(F.col("ia") * (1 - F.col("ib"))).cast("long").alias("n_only_a"),
        F.sum(F.col("ib") * (1 - F.col("ia"))).cast("long").alias("n_only_b"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("n_both"),
    )
    est_union = F.when(
        F.col("n_union_sketch") < k,
        F.col("n_union_sketch").cast("double"),
    ).otherwise(
        F.lit(float(k - 1) * _KMV_SPACE) / F.col("__kth").cast("double")
    )
    ratio = lambda c: (  # noqa: E731 — one pinned multiply per subset
        F.col(c).cast("double") / F.col("n_union_sketch").cast("double")
    ) * F.col("est_union")
    return (
        agg.withColumn("est_union", est_union)
        .select(
            *gb,
            "n_union_sketch",
            "n_only_a",
            "n_only_b",
            "n_both",
            "est_union",
            ratio("n_only_a").alias("est_only_a"),
            ratio("n_only_b").alias("est_only_b"),
            ratio("n_both").alias("est_inter"),
        )
    )


# ---------------------------------------------------------------------------
# Published-sketch persistence with parameter markers. hll_merge /
# kmv_merge are only sound when both sides share the hash space and
# parameters (p / k); the in-memory API documents that as a caller
# contract, but PUBLISHED sketches — the whole point of mergeable
# register tables — outlive the code that wrote them. The persisted
# form therefore carries a parameter marker beside the parquet (the
# write_ivf_index centroid-digest posture, via the scheme-safe Hadoop
# FS helpers in sources.fsutil), and reads validate instead of trusting
# the caller: merging a p=8 sketch into a p=12 corpus ledger fails
# loudly at read time, not silently at estimate time.
# ---------------------------------------------------------------------------

_SKETCH_PARAMS_FILE = "_SKETCH_PARAMS.json"


def _sketch_marker_io(spark, path: str, params: dict, write: bool) -> None:
    import json

    from ncbi_analysis_spark.sources import fsutil

    marker = path.rstrip("/") + "/" + _SKETCH_PARAMS_FILE
    if write:
        fsutil.write_text(spark, marker, json.dumps(params, sort_keys=True))
        return
    if not fsutil.exists(spark, marker):
        # pre-guard directory: by-contract mode (the IVF posture)
        return
    stored = json.loads(fsutil.read_text(spark, marker))
    if stored != params:
        raise ValueError(
            f"sketch at {path!r} was published with params {stored}, "
            f"reader expects {params}: registers/hashes from different "
            "parameter spaces must never merge — re-sketch one side"
        )


def write_hll_sketch(
    registers: DataFrame,
    path: str,
    p: int,
    group_by: list[str] | None = None,
) -> None:
    """Publish an HLL register table with its ``p``/grouping marker."""
    registers.write.mode("overwrite").parquet(path)
    _sketch_marker_io(
        registers.sparkSession, path,
        {"kind": "hll", "p": p, "group_by": list(group_by or [])},
        write=True,
    )


def read_hll_sketch(
    spark,
    path: str,
    p: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Open a published HLL sketch, failing loudly when the reader's
    expected parameters disagree with the published marker."""
    _sketch_marker_io(
        spark, path,
        {"kind": "hll", "p": p, "group_by": list(group_by or [])},
        write=False,
    )
    return spark.read.parquet(path)


def write_kmv_sketch(
    sketch: DataFrame,
    path: str,
    k: int,
    group_by: list[str] | None = None,
) -> None:
    """Publish a KMV sketch with its ``k``/grouping marker."""
    sketch.write.mode("overwrite").parquet(path)
    _sketch_marker_io(
        sketch.sparkSession, path,
        {"kind": "kmv", "k": k, "group_by": list(group_by or [])},
        write=True,
    )


def read_kmv_sketch(
    spark,
    path: str,
    k: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Open a published KMV sketch, validating the parameter marker."""
    _sketch_marker_io(
        spark, path,
        {"kind": "kmv", "k": k, "group_by": list(group_by or [])},
        write=False,
    )
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# HLL cube: every grouping-set's distinct-count sketch from ONE corpus
# scan. Register tables merge by max over ANY partition of the input,
# so a coarser grouping's sketch is a max-groupBy over the finest
# grain's register table — the corpus is scanned once at the finest
# grain and the whole cube (2^d grouping sets) derives from that
# bounded table. The classic "distinct users by (type, day), by type,
# by day, overall" dashboard cube without 2^d corpus scans — and the
# same rollup works INCREMENTALLY: append tomorrow's fine-grain
# sketch, re-run the rollup over register tables only.
# ---------------------------------------------------------------------------


def hll_rollup(
    registers: DataFrame,
    keep_dims: list[str],
) -> DataFrame:
    """Coarsen a register table to ``keep_dims`` by register-wise max —
    EXACTLY the sketch of the union of the collapsed subgroups (the
    hll_merge property over an arbitrary partition of the input)."""
    return registers.groupBy(*keep_dims, "register").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_cube(
    df: DataFrame,
    col: str,
    dims: list[str],
    p: int = 8,
) -> DataFrame:
    """All 2^len(dims) grouping sets' register tables from one corpus
    pass: sketch at the finest grain, then derive every coarser set
    with ``hll_rollup``. Output ``(*dims, grouping_id, register,
    max_rho)`` — rolled-up dims are NULL in their rows and flagged in
    ``grouping_id`` (bit semantics of SQL ``GROUPING``: dims[0] is the
    most significant bit; bit set = dim aggregated away).

    Persist the finest grain (`write_hll_sketch`) and the cube — and
    any future coarsening — never needs the corpus again.
    """
    if not dims:
        raise ValueError("hll_cube: need at least one dim")
    fine = hll_registers(df, col, p, group_by=list(dims))
    types = {f.name: f.dataType for f in fine.schema.fields}
    d = len(dims)
    out = None
    for mask in range(1 << d):
        kept = [dims[i] for i in range(d) if not (mask >> (d - 1 - i)) & 1]
        t = hll_rollup(fine, kept) if kept != list(dims) else fine
        cols = [
            (F.col(dim) if dim in kept else F.lit(None).cast(types[dim])
             ).alias(dim)
            for dim in dims
        ]
        sel = t.select(
            *cols,
            F.lit(mask).cast("int").alias("grouping_id"),
            "register",
            "max_rho",
        )
        out = sel if out is None else out.unionByName(sel)
    return out


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: a bottom-k-by-hash VALUE sample.
#
# Per-group score quantiles today need a corpus pass
# (scale.py::quantile_threshold); a published quantile sketch lets the
# gate run incrementally over sketch artifacts instead — the HLL/KMV
# posture extended to order statistics.
#
# Design choice (why not KLL / t-digest): both have better error at
# equal state, but neither fits this engine's two standing contracts.
# Their compaction decisions are (a) randomized (KLL coin flips,
# t-digest centroid seeding) and (b) ORDER-SENSITIVE — merging the same
# data under a different partition layout or merge-tree shape yields a
# different sketch, so a distributed build is not rerun-stable and can
# never hash-match an independent oracle. A bottom-k sample (Cohen &
# Kaplan 2007) is a pure SET operation: keep the k (hash, value) pairs
# with the smallest md5-52bit hash of the row id. It is exactly
# mergeable (min-k over set union — associative, commutative,
# idempotent), layout-independent, deterministic, and cross-engine
# reproducible in DuckDB. Error is that of a uniform k-sample:
# |q_est - q| = O(sqrt(q(1-q)/k)) rank error — k=4096 gives ~0.8%
# worst-case rank error, adequate for curation gates whose thresholds
# are themselves heuristic. Callers needing tighter tails raise k (state
# is k rows per group; the shuffle stays bounded by groups * k).
#
# No reference analog; LLM-pipeline extension (the quantile member of
# the sketch family).
# ---------------------------------------------------------------------------


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 4096,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Bottom-k value sample per group: the ``(h, v)`` pairs with the
    ``k`` smallest 52-bit md5 hashes of ``id_col``. NULL values are
    excluded (the quantile_threshold convention — engines disagree on
    NULL order). ``id_col`` must be unique per row (the dedup/index
    contract); duplicate ids would collapse to one sample slot.

    The cut orders by ``(h, v)`` — the value as secondary key makes
    membership at the k-boundary a total-order function of the row set
    even under a (measure-zero but possible) hash tie between different
    rows, so sketch contents never depend on partition layout and the
    DuckDB oracle's identical ``ORDER BY h, v`` window always agrees
    (the repo's append-a-tiebreaker convention).

    Output ``(*group_by, h, v)``, <= k rows per group. When a group has
    fewer than k rows the sketch IS the group's full value multiset and
    estimates become exact.

    Accuracy (measured — SCALING.md round 13): the retained rows are a
    uniform sample, so a q-quantile estimate's true rank deviates from
    ``q`` with std ≈ ``sqrt(q*(1-q)/k)`` (empirical max over trials
    lands at 1–4σ). Rule of thumb from the measured table: k=1024 is
    comfortable for medians/p90 gates; for TAIL gates (p99.9, the
    max-sequence-length question) use k >= 4096 — at k=1024 the worst
    observed p99.9 rank error is 4× the tail mass itself. Raising k is
    the intended tail path: it keeps merge(A,B) ≡ sketch(A∪B) exact,
    which a KLL/t-digest compaction tier would give up.
    """
    from ncbi_analysis_spark.operators.topk import topk_per_group

    if k < 2:
        raise ValueError(f"quantile_sketch: k={k} must be >= 2")
    gb = list(group_by or [])
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *gb,
        _kmv_h52(id_col).alias("h"),
        F.col(value_col).alias("v"),
    )
    if gb:
        return topk_per_group(rows, gb, [F.col("h"), F.col("v")], k,
                              keep_rank=False)
    return rows.orderBy("h", "v").limit(k)


def quantile_sketch_merge(
    a: DataFrame,
    b: DataFrame,
    k: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Merge two quantile sketches: the k smallest-hash samples of the
    union — EXACTLY ``quantile_sketch`` of the unioned inputs (min-k
    over sets; both sides must share the hash space and k, and row ids
    must be unique ACROSS the inputs — the append-batch contract)."""
    from ncbi_analysis_spark.operators.topk import topk_per_group

    gb = list(group_by or [])
    u = a.select(*gb, "h", "v").unionByName(b.select(*gb, "h", "v"))
    if gb:
        return topk_per_group(u, gb, [F.col("h"), F.col("v")], k,
                              keep_rank=False)
    return u.orderBy("h", "v").limit(k)


def quantile_sketch_estimate(
    sketch: DataFrame,
    qs: list[float],
    group_by: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a (possibly merged) sketch.

    Per group and per requested ``q``: ``est_v`` = the value at row
    ``ceil(q * n)`` (1-based) of the retained values sorted ascending —
    quantile_threshold's exact discrete-index convention (no
    interpolation floats, so the oracle is bit-exact; q = 0 < q <= 1
    validated). Ties sort by ``(v, h)`` so the picked row is unique in
    both engines. Output ``(*group_by, q_ppm, n_sample, est_v)`` with
    ``q_ppm = round(q * 1e6)`` (integer key, no float group column).
    Scale: the sketch is <= k rows per group; the rank window shuffles
    only sketch rows.
    """
    from pyspark.sql.window import Window

    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(
                f"quantile_sketch_estimate: q must be in (0, 1], got {q}"
            )
    if not qs:
        raise ValueError("quantile_sketch_estimate: no quantiles requested")
    gb = list(group_by or [])
    w = Window.partitionBy(*[F.col(c) for c in gb]) if gb else Window.partitionBy(F.lit(1))
    ranked = sketch.select(
        *gb,
        "h",
        "v",
        F.row_number().over(w.orderBy(F.asc("v"), F.asc("h"))).alias("__rk"),
        F.count("*").over(w).alias("__n"),
    )
    out = None
    for q in qs:
        q_ppm = int(round(q * 1_000_000))
        # ceil(q * n) via integer arithmetic on ppm: no float rounding
        # drift between engines — ceil(a/b) = floor((a + b - 1)/b)
        idx = F.floor(
            (F.lit(q_ppm) * F.col("__n") + F.lit(999_999)) / F.lit(1_000_000)
        ).cast("long")
        sel = (
            ranked.filter(F.col("__rk") == idx)
            .select(
                *gb,
                F.lit(q_ppm).cast("long").alias("q_ppm"),
                F.col("__n").cast("long").alias("n_sample"),
                F.col("v").alias("est_v"),
            )
        )
        out = sel if out is None else out.unionByName(sel)
    return out


def quantile_sketch_threshold(
    sketch: DataFrame,
    q: float,
) -> DataFrame:
    """Single-row ``(threshold)`` frame from an UNGROUPED sketch — the
    drop-in sketch-backed twin of ``scale.quantile_threshold``, so
    ``filter_by_quantile``-style gates can run from a published
    artifact without re-scanning the corpus (join/cross-join it exactly
    like the corpus-pass threshold)."""
    est = quantile_sketch_estimate(sketch, [q])
    return est.select(F.col("est_v").alias("threshold"))


def write_quantile_sketch(
    sketch: DataFrame,
    path: str,
    k: int,
    group_by: list[str] | None = None,
) -> None:
    """Publish a quantile sketch with its ``k``/grouping marker (hash
    space is pinned by construction: md5-52bit of the row id)."""
    sketch.write.mode("overwrite").parquet(path)
    _sketch_marker_io(
        sketch.sparkSession, path,
        {"kind": "quantile_bottomk", "k": k,
         "group_by": list(group_by or [])},
        write=True,
    )


def read_quantile_sketch(
    spark,
    path: str,
    k: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Open a published quantile sketch, validating the marker."""
    _sketch_marker_io(
        spark, path,
        {"kind": "quantile_bottomk", "k": k,
         "group_by": list(group_by or [])},
        write=False,
    )
    return spark.read.parquet(path)
