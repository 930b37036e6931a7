"""Z-order (Morton-curve) layout — multi-column data-skipping for
100 TB scans.

A parquet scan prunes row groups by min/max statistics. Sorting by ONE
column makes its stats tight and every other column's stats useless; a
Z-order layout interleaves the bits of several columns so that range
partitions are small hyper-rectangles in the combined key space — every
participating column gets usable min/max locality, and selective filters
on ANY of them skip most of the files (the Delta Lake / Databricks
OPTIMIZE ZORDER idea, public since the Morton 1966 curve).

No reference analog (the reference reads flat files front to back);
LLM-pipeline extension: curated-corpus output laid out by
(source, quality_bucket) or (lang, length) serves the downstream
"give me high-quality German documents" scan without a full pass.

Everything is built from bit-exact integer/double arithmetic shared
with DuckDB (the staged-query oracle recomputes the same bins and the
same interleave), and the layout itself is one ``repartitionByRange``
on the computed key — a single skew-free shuffle (range boundaries from
Spark's reservoir sampling over a near-uniform space-filling key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bin_column(
    col: Column,
    mn: float,
    mx: float,
    bits: int,
) -> Column:
    """Map a numeric column to an integer bin in ``[0, 2^bits)`` by
    linear min/max scaling: ``floor(((v - mn) / (mx - mn)) * (2^bits
    - 1))`` evaluated in float64 in exactly this operation order (the
    DuckDB oracle mirrors it literally; IEEE doubles make the result
    engine-independent). NULL and degenerate (mn == mx) inputs bin to 0.
    """
    m = (1 << bits) - 1
    v = col.cast("double")
    if mx <= mn:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (v - F.lit(float(mn))) / F.lit(float(mx) - float(mn)) * F.lit(float(m))
    )
    return F.coalesce(scaled, F.lit(0)).cast("long")


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave of pre-binned integer columns: bit ``t`` of
    column ``j`` lands at position ``t * n_cols + j`` of the key.
    Pure integer shift/mask arithmetic (stays in whole-stage codegen;
    DuckDB evaluates the identical expression). ``bits * n_cols`` must
    fit a signed BIGINT (<= 62)."""
    c = len(cols)
    if c < 1:
        raise ValueError("interleave_bits: need at least one column")
    if bits * c > 62:
        raise ValueError(
            f"interleave_bits: bits={bits} x {c} cols = {bits * c} key "
            "bits; must be <= 62 to fit a signed BIGINT"
        )
    terms = []
    for j, col in enumerate(cols):
        for t in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(col, t).bitwiseAND(F.lit(1)),
                    t * c + j,
                )
            )
    out = terms[0]
    for term in terms[1:]:
        out = out + term
    return out.cast("long")


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """Exact per-column min/max in ONE tiny aggregate job (2 x n_cols
    scalars collected — bounded). Exact extremes are engine-independent,
    which keeps downstream bins oracle-checkable; at 100 TB this is a
    cheap statistics scan (parquet footers already hold the per-file
    extremes Spark aggregates)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def add_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    ranges: dict[str, tuple] | None = None,
    key_col: str = "zvalue",
) -> DataFrame:
    """Attach the Z-order key column: min/max-bin each input column to
    ``bits`` bits, Morton-interleave. ``ranges`` overrides the computed
    extremes (pass persisted stats to keep keys stable across
    incremental writes — else a new out-of-range row silently re-bins
    the whole corpus differently)."""
    if ranges is None:
        ranges = column_ranges(df, cols)
    binned = [
        bin_column(F.col(c), ranges[c][0], ranges[c][1], bits) for c in cols
    ]
    return df.withColumn(key_col, interleave_bits(binned, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_partitions: int | None = None,
    ranges: dict[str, tuple] | None = None,
) -> DataFrame:
    """Lay the DataFrame out along the Morton curve: compute the key,
    range-partition on it, sort within partitions. Writing the result
    produces files whose per-file min/max stats are tight on EVERY
    participating column — the multi-dim data-skipping layout.

    One shuffle (the range exchange); the key is dropped before return
    feeds a writer, keep it with ``add_zorder_key`` if needed.
    """
    keyed = add_zorder_key(df, cols, bits, ranges)
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, "zvalue")
    else:
        keyed = keyed.repartitionByRange("zvalue")
    return keyed.sortWithinPartitions("zvalue").drop("zvalue")


def skipping_stats(path: str, col: str, lo, hi) -> dict:
    """Data-skipping audit for a written parquet directory: how many
    row groups would a ``col BETWEEN lo AND hi`` scan touch, by footer
    min/max? Driver-side footer read (KBs per file), the measurement
    half of the zorder story — returns ``{'total': n, 'overlapping':
    k}``."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = overlapping = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            stats = None
            for i in range(g.num_columns):
                c = g.column(i)
                if c.path_in_schema == col:
                    stats = c.statistics
                    break
            total += 1
            if stats is None or not stats.has_min_max:
                overlapping += 1  # no stats: cannot skip
            elif not (stats.max < lo or stats.min > hi):
                overlapping += 1
    return {"total": total, "overlapping": overlapping}
