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
