"""Nearest-neighbor / as-of joins (SURVEY.md §2.3 J4/J5).

Reference: for an interval, find the nearest gene entirely to the left
(max(right) where right <= left), nearest entirely right (min(left) where
left >= right), plus overlaps (src/analysis/neighbor_analysis.py:171-199;
src/utils/gene_position_helper.py:18-43). The directional variant keeps
the next gene after the 3' end, strand-aware
(src/analysis/neighbor_analysis.py:201-214).

Spark-first: the **union-and-window** as-of join — tag probe and build
rows, union, then ``last(payload) IGNORE NULLS OVER (PARTITION BY key
ORDER BY pos, is_probe ROWS UNBOUNDED PRECEDING)`` and keep probe rows.
One shuffle, no per-row binary search, scales to arbitrarily large sides
on both ends (a broadcast or sort-merge range join would be quadratic or
single-node). DuckDB's native ``ASOF JOIN`` is the correctness oracle.

Tie semantics: build rows sort before probe rows at equal position, i.e.
the join is *inclusive* (probe at t matches build at t) — matching the
reference's ``right <= left`` comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    payload: list[str],
    direction: str = "backward",
    allow_single_partition: bool = False,
) -> DataFrame:
    """For each probe row, attach the payload of the nearest build row with
    ``build_ts <= probe_ts`` (backward) or ``build_ts >= probe_ts``
    (forward), equal keys ``on``. Emits ``asof_<payload>`` + ``asof_ts``
    (null when no such build row exists).

    ``on`` must be non-empty: with no partition keys the window runs the
    entire union through ONE task — a silent scale-killer at cluster
    sizes. Pass ``allow_single_partition=True`` to opt in explicitly for
    known-small inputs (e.g. a single time series).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if not on and not allow_single_partition:
        raise ValueError(
            "asof_join with on=[] degenerates to a single-partition window "
            "(the whole union sorts in one task); pass partition keys, or "
            "allow_single_partition=True for known-small inputs"
        )

    p_cols = probe.columns
    pay_aliases = [f"asof_{c}" for c in payload]

    def pos(df: DataFrame, c: str):
        col = F.col(c)
        if df.schema[c].dataType.typeName().startswith("timestamp"):
            col = col.cast("timestamp")  # TIMESTAMP_NTZ has no direct double cast
        return col.cast("double")

    p_side = probe.select(
        *p_cols,
        pos(probe, probe_ts).alias("__pos"),
        F.lit(1).alias("__is_probe"),
        F.lit(None).cast(build.schema[build_ts].dataType).alias("asof_ts"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(a) for c, a in zip(payload, pay_aliases)],
    )
    b_side = build.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in p_cols
        ],
        pos(build, build_ts).alias("__pos"),
        F.lit(0).alias("__is_probe"),
        F.col(build_ts).alias("asof_ts"),
        *[F.col(c).alias(a) for c, a in zip(payload, pay_aliases)],
    )

    order = F.col("__pos").asc() if direction == "backward" else F.col("__pos").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(order, F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    return (
        p_side.unionByName(b_side)
        .select(
            *p_cols,
            F.col("__is_probe"),
            F.last("asof_ts", ignorenulls=True).over(w).alias("__asof_ts"),
            *[F.last(a, ignorenulls=True).over(w).alias(f"__{a}") for a in pay_aliases],
        )
        .filter(F.col("__is_probe") == 1)
        .select(
            *p_cols,
            F.col("__asof_ts").alias("asof_ts"),
            *[F.col(f"__{a}").alias(a) for a in pay_aliases],
        )
    )


def nearest_neighbors(
    probe: DataFrame,
    genes: DataFrame,
    on: list[str],
    p_left: str = "left",
    p_right: str = "right",
    g_left: str = "left",
    g_right: str = "right",
    g_name: str = "gene",
) -> DataFrame:
    """Reference J4: per probe interval, the nearest gene wholly to the left
    (max gene.right <= probe.left) and wholly to the right
    (min gene.left >= probe.right). Overlapping genes are a separate
    interval join (operators.intervals).
    """
    left_b = genes.select(*on, F.col(g_right).alias("__gpos"), F.col(g_name).alias("__g"))
    right_b = genes.select(*on, F.col(g_left).alias("__gpos"), F.col(g_name).alias("__g"))
    bwd = (
        asof_join(probe, left_b, on, p_left, "__gpos", ["__g"], "backward")
        .withColumnRenamed("asof___g", "left_gene")
        .withColumnRenamed("asof_ts", "left_gene_pos")
    )
    fwd = (
        asof_join(bwd, right_b, on, p_right, "__gpos", ["__g"], "forward")
        .withColumnRenamed("asof___g", "right_gene")
        .withColumnRenamed("asof_ts", "right_gene_pos")
    )
    return fwd
