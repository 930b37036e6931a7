"""Heavy hitters: Count-Min register tables + top-N without a
vocabulary-sized shuffle.

Two complementary pieces, both bounded-state:

- **Count-Min sketch** (Cormode & Muthukrishnan 2005) as a PLAIN
  DATAFRAME of ``(row, bucket, cnt)`` registers — the HLL posture for
  counts: mergeable EXACTLY (elementwise integer add is associative/
  commutative), publishable as data, engine-checkable (bucket
  assignment is the repo's md5-32bit hash, identical in DuckDB; counts
  are exact integers — no floats anywhere). ``cm_estimate`` answers
  "how often does item x occur" within +eps*N overcount (never under),
  from depth*width integers regardless of vocabulary size.

- **Two-pass exact top-N** (``heavy_hitters_topn``): pass 1 generates
  a bounded candidate set — each partition's exact top-``m`` tokens
  (Arrow-batched pandas ``value_counts``), which carries the
  Misra-Gries guarantee: any token with global count > N/(m+1) MUST be
  in some partition's top-m (if it missed a partition's top-m, that
  partition had m tokens each outnumbering it, bounding its share
  there below n_p/(m+1); summing over partitions caps its global share
  below N/(m+1) — contradiction). Pass 2 exactly recounts ONLY the
  candidates (semi-join prunes the token explode before the shuffle)
  and keeps the top-N. The shuffle is bounded by the candidate set
  (<= m * partitions), never the vocabulary. Every returned row
  carries ``guaranteed`` — its exact count clears the N/(m+1) bound,
  so the row is provably in the true top-N independent of partition
  layout; rows below the bound are correct for THIS layout but a
  pathological layout could in principle hide a competitor (raise m).

The production pairing: ``heavy_hitters_topn`` names drift/skew
offenders (the drift.py::top_drifted_tokens ask — actual top-N tokens,
not one witness per bucket); ``cm_sketch`` snapshots publish mergeable
count state so later rounds estimate candidate frequencies without
touching old corpora.

No reference analog (the reference's frequency maps are exact Python
dicts, e.g. the cluster membership counters); LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ncbi_analysis_spark.functions.text import _hash32


def _cm_bucket(col: str, row: int, width: int):
    """Row ``row``'s bucket for value ``col`` — md5-32bit of the
    row-salted value, mod width. DuckDB twin:
    ``('0x'||substr(md5('cm{row}|'||x),1,8))::BIGINT % width``."""
    return F.pmod(_hash32(F.col(col).cast("string"), f"cm{row}|"),
                  F.lit(width)).cast("long")


def _check_cm(width: int, depth: int) -> None:
    if width < 2 or depth < 1:
        raise ValueError(
            f"count-min: width={width} must be >= 2 and depth={depth} "
            ">= 1 (eps ~ e/width, delta ~ e^-depth)"
        )


def cm_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min register table ``(row, bucket, cnt)`` for the values
    of ``col`` (NULLs skipped — COUNT semantics). ``weight_col`` counts
    each occurrence by an integer weight instead of 1.

    Scale: one map projection fans each value into ``depth`` (row,
    bucket) pairs; the groupBy's map-side partial aggregation bounds
    the shuffle at depth*width rows per task regardless of input size
    or vocabulary. Only registers that were HIT appear (absent =>
    cnt 0, the readers' convention — keeps tiny sketches tiny).
    """
    _check_cm(width, depth)
    d = df.filter(F.col(col).isNotNull())
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    pairs = F.array(*[
        F.struct(
            F.lit(i).cast("long").alias("row"),
            _cm_bucket(col, i, width).alias("bucket"),
        )
        for i in range(depth)
    ])
    return (
        d.select(F.explode(pairs).alias("p"), w.alias("__w"))
        .groupBy(F.col("p.row").alias("row"),
                 F.col("p.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two Count-Min register tables built with the SAME
    (width, depth): elementwise add — EXACTLY the sketch of the
    concatenated inputs (integer + is associative/commutative), the
    hll_merge contract for counts."""
    merged = (
        a.select("row", "bucket", "cnt")
        .unionByName(b.select("row", "bucket", "cnt"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # canonical form: absent == 0 (all-positive merges never hit this;
    # a cm_subtract re-add can cancel a register to exactly zero)
    return merged.filter(F.col("cnt") != 0)


def cm_subtract(a: DataFrame, b: DataFrame) -> DataFrame:
    """Remove one batch's contribution from a Count-Min register table
    (same (width, depth)): elementwise integer subtract, zero rows
    dropped to preserve the absent=0 convention. Count-Min is a
    TURNSTILE sketch — counts are exact integers, so
    ``cm_subtract(cm_merge(A, B), B) ≡ A`` exactly (pytest-pinned):
    the takedown path for published count state, which the max-merged
    HLL registers fundamentally cannot offer (max is not invertible).
    By contract ``b`` must be (a sketch of) data previously merged into
    ``a`` — subtracting unmerged data drives registers negative, which
    is kept (not clamped) so a later re-add still cancels exactly."""
    diff = (
        a.select("row", "bucket", "cnt")
        .unionByName(
            b.select("row", "bucket",
                     (-F.col("cnt")).cast("long").alias("cnt"))
        )
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return diff.filter(F.col("cnt") != 0)


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int,
    depth: int,
) -> DataFrame:
    """Point-frequency estimates for ``items[col]`` from a (possibly
    merged) sketch: per item, ``est_cnt`` = min over the depth rows of
    the item's register (absent register = 0). Count-Min's one-sided
    error: ``est_cnt >= true count`` always; overcount <= e/width * N
    with prob 1 - e^-depth.

    Scale: ``items`` is a bounded candidate table by contract — its
    (item, row, bucket) probe rows broadcast into the register join;
    the depth*width sketch never shuffles more than itself.
    """
    _check_cm(width, depth)
    probes = None
    for i in range(depth):
        p = items.filter(F.col(col).isNotNull()).select(
            F.col(col).alias("item"),
            F.lit(i).cast("long").alias("row"),
            _cm_bucket(col, i, width).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    joined = F.broadcast(probes).join(
        sketch, on=["row", "bucket"], how="left"
    ).select("item", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    return joined.groupBy("item").agg(
        F.min("cnt").cast("long").alias("est_cnt")
    )


def write_cm_sketch(
    sketch: DataFrame,
    path: str,
    width: int,
    depth: int,
) -> None:
    """Publish a Count-Min register table with its (width, depth)
    marker — the ``write_hll_sketch`` contract for counts. Overwrite
    mode: re-publishing the same logical sketch replaces it, which is
    what makes the streaming publisher's per-batch directories
    re-delivery-safe (CM merge is ADD, not max — a duplicated register
    table would double-count, so idempotence must come from the
    overwrite, not the merge)."""
    from ncbi_analysis_spark.operators.sketches import _sketch_marker_io

    sketch.write.mode("overwrite").parquet(path)
    _sketch_marker_io(
        sketch.sparkSession, path,
        {"kind": "cm", "width": width, "depth": depth},
        write=True,
    )


def read_cm_sketch(
    spark,
    path: str,
    width: int,
    depth: int,
) -> DataFrame:
    """Open a published Count-Min register table, failing loudly when
    the reader's (width, depth) disagree with the marker — registers
    from different parameter spaces must never be added."""
    from ncbi_analysis_spark.operators.sketches import _sketch_marker_io

    _sketch_marker_io(
        spark, path,
        {"kind": "cm", "width": width, "depth": depth},
        write=False,
    )
    return spark.read.parquet(path)


def partition_top_tokens(
    df: DataFrame,
    col: str,
    m: int,
) -> DataFrame:
    """Candidate pass: each partition's exact top-``m`` values of
    ``col`` by in-partition count (ties: value asc) — Arrow-batched
    pandas ``value_counts`` accumulated across the partition's batches,
    O(distinct-values-in-partition) memory, emitting <= m rows per
    partition. Output ``(token, part_cnt)`` NOT deduplicated across
    partitions (callers distinct() or recount)."""
    import pandas as pd

    if m < 1:
        raise ValueError(f"partition_top_tokens: m={m} must be >= 1")

    src = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("token"))

    def _top(batches):
        acc: dict = {}
        for pdf in batches:
            vc = pdf["token"].value_counts()
            for tok, cnt in vc.items():
                acc[tok] = acc.get(tok, 0) + int(cnt)
        if not acc:
            return
        s = pd.Series(acc)
        # exact top-m with value-asc tiebreak: sort by (-cnt, token)
        top = s.reset_index()
        top.columns = ["token", "part_cnt"]
        top = top.sort_values(
            ["part_cnt", "token"], ascending=[False, True]
        ).head(m)
        yield pd.DataFrame(
            {"token": top["token"], "part_cnt": top["part_cnt"]}
        )

    return src.mapInPandas(_top, "token string, part_cnt long")


def heavy_hitters_topn(
    df: DataFrame,
    col: str,
    n: int = 20,
    m: int = 256,
) -> DataFrame:
    """Exact top-``n`` values of ``col`` by count, without shuffling
    the vocabulary: partition-top-``m`` candidates (Misra-Gries
    coverage — see module docs), then an exact recount of ONLY the
    candidate set, then the global top-n.

    Output ``(token, cnt, guaranteed)`` ordered (cnt desc, token asc);
    ``guaranteed`` = cnt * (m+1) > N_total, i.e. the Misra-Gries bound
    certifies this row is in the true top-n for ANY partition layout.
    Scale: ONE recount pass serves both the candidate counts and
    N_total — non-candidate occurrences fold into a single NULL-key
    group (map-side combine collapses them per task), so the shuffle
    carries candidate occurrences plus one row per task; N_total is an
    all-rows window sum over that BOUNDED counted table (a deliberate
    single-partition pass over <= m*partitions+tasks rows — the
    scalar-small-side class), so the corpus is never scanned a second
    time. Top-n is TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"heavy_hitters_topn: n={n} must be >= 1")
    src = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("token"))
    cands = partition_top_tokens(df, col, m).select("token").distinct()
    marked = F.broadcast(cands.withColumn("__cand", F.lit(1)))
    counted = (
        src.join(marked, "token", "left")
        .select(F.when(F.col("__cand").isNotNull(), F.col("token"))
                .alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        counted.withColumn(
            "__N", F.sum("cnt").over(Window.partitionBy(F.lit(1))))
        .filter(F.col("tk").isNotNull())
        .select(F.col("tk").alias("token"), "cnt", "__N")
    )
    out = exact.orderBy(F.desc("cnt"), F.asc("token")).limit(n)
    return out.select(
        "token",
        "cnt",
        (F.col("cnt") * F.lit(m + 1) > F.col("__N")).alias("guaranteed"),
    )


def partition_top_tokens_grouped(
    df: DataFrame,
    col: str,
    group_col: str,
    m: int,
) -> DataFrame:
    """Grouped candidate pass: each partition's exact top-``m`` values
    of ``col`` PER ``group_col`` value (ties: value asc) — the
    ``partition_top_tokens`` sweep with a per-group accumulator, so the
    Misra-Gries coverage argument holds within every group: any token
    with group-share > 1/(m+1) must appear in some partition's
    per-group top-m. Emits <= m rows per (partition, group);
    per-partition memory is O(distinct (group, token) pairs in the
    partition). NULL groups are skipped (grouped-aggregate semantics)."""
    import pandas as pd

    if m < 1:
        raise ValueError(f"partition_top_tokens_grouped: m={m} must be >= 1")

    src = df.filter(
        F.col(col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(col).cast("string").alias("token"),
    )

    def _top(batches):
        acc: dict = {}
        for pdf in batches:
            vc = pdf.groupby(["grp", "token"], sort=False).size()
            for (g, tok), cnt in vc.items():
                key = (g, tok)
                acc[key] = acc.get(key, 0) + int(cnt)
        if not acc:
            return
        t = pd.DataFrame(
            [(g, tok, c) for (g, tok), c in acc.items()],
            columns=["grp", "token", "part_cnt"],
        )
        top = (
            t.sort_values(["grp", "part_cnt", "token"],
                          ascending=[True, False, True])
            .groupby("grp", sort=False)
            .head(m)
        )
        yield top

    return src.mapInPandas(_top, "grp string, token string, part_cnt long")


def heavy_hitters_topn_grouped(
    df: DataFrame,
    col: str,
    group_col: str,
    n: int = 20,
    m: int = 256,
) -> DataFrame:
    """Exact top-``n`` values of ``col`` by count PER GROUP, without
    shuffling any group's vocabulary — ``heavy_hitters_topn``'s grouped
    form (per-language / per-domain offender tokens, the curation
    question "what is the spam token in THIS slice"). Same two-pass
    shape: per-(partition, group) candidates, then ONE recount pass
    whose shuffle carries candidate occurrences plus one NULL-key fold
    row per (task, group); per-group totals are a window sum over the
    bounded counted table.

    Output ``(grp, token, cnt, guaranteed)`` ordered within each group
    (cnt desc, token asc); ``guaranteed`` = cnt*(m+1) > N_group — the
    per-group Misra-Gries certificate."""
    from pyspark.sql import Window

    from ncbi_analysis_spark.operators.topk import topk_per_group

    if n < 1:
        raise ValueError(f"heavy_hitters_topn_grouped: n={n} must be >= 1")
    src = df.filter(
        F.col(col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(col).cast("string").alias("token"),
    )
    cands = (
        partition_top_tokens_grouped(df, col, group_col, m)
        .select("grp", "token").distinct()
    )
    marked = F.broadcast(cands.withColumn("__cand", F.lit(1)))
    counted = (
        src.join(marked, ["grp", "token"], "left")
        .select(
            "grp",
            F.when(F.col("__cand").isNotNull(), F.col("token")).alias("tk"),
        )
        .groupBy("grp", "tk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        counted.withColumn(
            "__N", F.sum("cnt").over(Window.partitionBy("grp")))
        .filter(F.col("tk").isNotNull())
        .select("grp", F.col("tk").alias("token"), "cnt", "__N")
    )
    out = topk_per_group(
        exact, ["grp"], [F.desc("cnt"), F.asc("token")], n,
        keep_rank=False,
    )
    return out.select(
        "grp",
        "token",
        "cnt",
        (F.col("cnt") * F.lit(m + 1) > F.col("__N")).alias("guaranteed"),
    )
