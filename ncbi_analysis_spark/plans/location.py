"""Gene-location analysis (SURVEY.md §2.3 J3 tail, §3.1 step 6).

Reference: per match interval, a binary-search probe into the sorted
annotation intervals (window idx-2 .. idx+3), 8-way interval relation,
strand-aware 5'/3'/cds/cover labels, inter-genic fallback naming the
nearest genes, optional remain-gene semi-filter, and consistency-run
sub-location extraction with a direction-aware span filter
(src/analysis/gene_location_analysis.py:84-304,421-437).

Two modes:

- ``bounded=False`` (the 100 TB design): full interval join for labeled
  overlaps + as-of joins for the inter-genic nearest names. Unbounded,
  shuffle-based, scales with data.
- ``bounded=True`` (reference parity): reproduces the probe window —
  candidates are the <= 5 records around the insertion point of
  ``match.start`` in the records' ``start`` order, which silently bounds
  results exactly like the reference (SURVEY §7.5 risk note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_status(rec_left: Column, rec_right: Column, left: Column, right: Column) -> Column:
    """The reference's 8-way ``interval_check`` in its exact evaluation
    order (gene_location_analysis.py:278-304). ``left/right`` is the
    match interval, ``rec_*`` the annotation interval."""
    return (
        F.when(right < rec_left, "TotallyLeft")
        .when((left < rec_left) & (rec_left <= right) & (right < rec_right), "IntersectLeft")
        .when((left < rec_left) & (rec_left <= rec_right) & (rec_right <= right), "CoverLeft")
        .when((rec_left <= left) & (left <= right) & (right <= rec_right), "Inner")
        .when((left <= rec_left) & (rec_left <= rec_right) & (rec_right < right), "CoverRight")
        .when((rec_left < left) & (left <= rec_right) & (rec_right < right), "IntersectRight")
        .when(rec_right < left, "TotallyRight")
        .otherwise("Cover")
    )


def location_label(status: Column, direction: Column) -> Column:
    """Strand-aware 5'/3'/cds/cover/inter-genic label
    (gene_location_analysis.py:170-189)."""
    fwd = direction == ">"
    return (
        F.when(status.isin("IntersectLeft", "CoverLeft"),
               F.when(fwd, "5'").otherwise("3'"))
        .when(status.isin("IntersectRight", "CoverRight"),
              F.when(fwd, "3'").otherwise("5'"))
        .when(status == "Inner", F.lit("cds"))
        .when(status == "Cover", F.lit("cover"))
        .otherwise(F.lit("inter-genic"))
    )


def locate_matches(
    matches: DataFrame,
    inter_records: DataFrame,
    bounded: bool = False,
    probe_before: int = 2,
    probe_after: int = 3,
    remain_genes: DataFrame | None = None,
    max_bounded_records: int = 100_000,
    on: list[str] | None = None,
    annotation_mode: str = "auto",
    broadcast_threshold: int = 2_000_000,
    bin_size: int = 10_000,
) -> DataFrame:
    """Annotate match intervals against annotation intervals.

    ``matches``: (match_id, start, end) — start > end encodes reverse.
    ``inter_records``: (name, direction, left, right, start) as produced
    by sources.ecocyc.explode_inter_records.

    Output: one row per (match, labeled record) with ``label`` in
    {5', 3', cds, cover}; matches with no labeled record get a single
    ``inter-genic`` row naming the nearest genes left/right.

    ``remain_genes`` (P5): if given, a match survives only when some
    overlapped cds gene is in the set (gene_location_analysis.py:32-37,
    195-197) — applied as a semi-join at the end.

    ``on``: equality partition keys present in BOTH inputs (e.g.
    ``["accession"]`` — one genome per key). At scale these keys are what
    make the unbounded mode distributed: the nearest-gene as-of windows
    partition by them and the binned overlap join hashes on them.
    Omitting ``on`` collapses the as-of windows to a single partition —
    fine for one genome / parity runs, wrong for a 100 TB corpus.

    ``annotation_mode``: ``"broadcast"`` joins matches against a
    broadcast annotation table (the common ~4.5k-genes-per-genome case);
    ``"binned"`` uses the coordinate-binned equi-join
    (operators.intervals.interval_join_binned) for annotation tables too
    big to broadcast; ``"auto"`` counts the annotation table and picks
    (<= ``broadcast_threshold`` rows -> broadcast).
    """
    keys = list(on) if on else []
    m = matches.withColumn("m_left", F.least("start", "end")) \
               .withColumn("m_right", F.greatest("start", "end"))

    recs = inter_records.select(
        *keys,
        F.col("name").alias("rec_name"), F.col("direction").alias("rec_dir"),
        F.col("left").alias("rec_left"), F.col("right").alias("rec_right"),
        F.col("start").alias("rec_start"),
    )

    if bounded and keys:
        raise ValueError(
            "locate_matches(bounded=True) is the single-genome parity mode "
            "and does not take partition keys; use bounded=False with on=..."
        )
    if bounded:
        # parity: rank records by start; probe window around the insertion
        # point of match.start. The annotation table is small (genomic
        # case ~4.5k rows) -> global rank + broadcast is fine; the
        # unbounded mode is the scale path.
        ranked = recs.withColumn(
            "__rec_rk", F.row_number().over(Window.orderBy("rec_start")) - 1
        )
        n_recs = ranked.count()
        if n_recs > max_bounded_records:
            # the parity mode global-ranks and broadcasts the annotation
            # table — fail fast instead of silently degrading past
            # broadcast size (the reference's own table is ~4.5k rows)
            raise ValueError(
                f"locate_matches(bounded=True) got {n_recs} annotation rows "
                f"(> max_bounded_records={max_bounded_records}); use the "
                "unbounded scale mode (bounded=False) for large tables"
            )
        # idx = first rank with rec_start >= match.start (reference
        # binary_search_first_le, clamped to len-1)
        idx = (
            m.join(F.broadcast(ranked), F.col("rec_start") >= F.col("start"), "left")
            .groupBy(*m.columns)
            .agg(F.coalesce(F.min("__rec_rk"), F.lit(n_recs - 1)).alias("__idx"))
        )
        cand = idx.join(
            F.broadcast(ranked),
            (F.col("__rec_rk") >= F.greatest(F.col("__idx") - probe_before, F.lit(0)))
            & (F.col("__rec_rk") < F.least(F.col("__idx") + probe_after, F.lit(n_recs))),
            "inner",
        ).drop("__rec_rk", "__idx")
        classified = cand.withColumn(
            "status",
            interval_status(F.col("rec_left"), F.col("rec_right"),
                            F.col("m_left"), F.col("m_right")),
        )
        labeled = classified.withColumn("label", location_label(F.col("status"), F.col("rec_dir")))
        overlaps = labeled.filter(F.col("label") != "inter-genic")
        # nearest names from within the probe window (reference semantics)
        nearest = (
            labeled.filter(F.col("label") == "inter-genic")
            .groupBy(*m.columns)
            .agg(
                F.max(F.when(F.col("status") == "TotallyRight", F.col("rec_right"))).alias("__lpos"),
                F.max_by(
                    F.when(F.col("status") == "TotallyRight", F.col("rec_name")),
                    F.when(F.col("status") == "TotallyRight", F.col("rec_right")),
                ).alias("left_name"),
                F.min(F.when(F.col("status") == "TotallyLeft", F.col("rec_left"))).alias("__rpos"),
                F.min_by(
                    F.when(F.col("status") == "TotallyLeft", F.col("rec_name")),
                    F.when(F.col("status") == "TotallyLeft", F.col("rec_left")),
                ).alias("right_name"),
            )
            .drop("__lpos", "__rpos")
        )
    else:
        # scale path: unbounded overlap join + true nearest via as-of
        if annotation_mode not in ("auto", "broadcast", "binned"):
            raise ValueError(f"annotation_mode must be auto|broadcast|binned, got {annotation_mode}")
        mode = annotation_mode
        if mode == "auto":
            # auto spends one count() job to pick broadcast-vs-binned;
            # memoize it ON the annotation DataFrame so a pipeline that
            # calls locate_matches many times with the same table pays
            # once (review note r6). Callers in hot loops can skip even
            # the first scan by passing annotation_mode explicitly.
            n = getattr(inter_records, "_loc_count_hint", None)
            if n is None:
                n = inter_records.count()
                try:
                    inter_records._loc_count_hint = n
                except AttributeError:
                    pass
            mode = "broadcast" if n <= broadcast_threshold else "binned"

        if mode == "broadcast":
            rb_recs = recs
            for k in keys:
                rb_recs = rb_recs.withColumnRenamed(k, f"__rk_{k}")
            cond = (F.col("m_left") <= F.col("rec_right")) & (F.col("m_right") >= F.col("rec_left"))
            for k in keys:
                cond = cond & (F.col(k) == F.col(f"__rk_{k}"))
            cand = m.join(F.broadcast(rb_recs), cond, "inner") \
                    .drop(*[f"__rk_{k}" for k in keys])
        else:
            # annotation table too big to broadcast: coordinate-binned
            # equi-join — a hash shuffle join on (keys, bin), never a
            # BroadcastNestedLoopJoin (operators/intervals.py module doc)
            from ncbi_analysis_spark.operators.intervals import interval_join_binned

            cand = interval_join_binned(
                m, recs, "m_left", "m_right", "rec_left", "rec_right",
                bin_size=bin_size, partition_keys=keys,
            )
        classified = cand.withColumn(
            "status",
            interval_status(F.col("rec_left"), F.col("rec_right"),
                            F.col("m_left"), F.col("m_right")),
        )
        overlaps = classified.withColumn(
            "label", location_label(F.col("status"), F.col("rec_dir"))
        ).filter(F.col("label") != "inter-genic")

        from ncbi_analysis_spark.operators.asof import asof_join

        left_b = recs.select(*keys, F.col("rec_right").alias("__pos"), F.col("rec_name").alias("__nm"))
        right_b = recs.select(*keys, F.col("rec_left").alias("__pos"), F.col("rec_name").alias("__nm"))
        if keys:
            # real partition keys: the union-and-window as-of shuffles on
            # them — one window partition per genome, fully distributed
            n_left = asof_join(m, left_b, keys, "m_left", "__pos", ["__nm"], "backward") \
                .withColumnRenamed("asof___nm", "left_name").drop("asof_ts")
            nearest = asof_join(n_left, right_b, keys, "m_right", "__pos", ["__nm"], "forward") \
                .withColumnRenamed("asof___nm", "right_name").drop("asof_ts")
        else:
            # no key: single window partition — parity/small-data only
            with_key = m.withColumn("__all", F.lit(1))
            lb = left_b.withColumn("__all", F.lit(1))
            rb = right_b.withColumn("__all", F.lit(1))
            n_left = asof_join(with_key, lb, ["__all"], "m_left", "__pos", ["__nm"], "backward") \
                .withColumnRenamed("asof___nm", "left_name").drop("asof_ts")
            nearest = asof_join(n_left, rb, ["__all"], "m_right", "__pos", ["__nm"], "forward") \
                .withColumnRenamed("asof___nm", "right_name").drop("asof_ts", "__all")

    # matches with no labeled overlap -> one inter-genic row
    covered = overlaps.select(*m.columns).distinct()
    inter_genic = (
        nearest.join(covered, on=[c for c in m.columns], how="left_anti")
        .withColumn("label", F.lit("inter-genic"))
        .withColumn("rec_name", F.format_string(
            "inter-genic of %s, %s",
            F.coalesce(F.col("left_name"), F.lit("None")),
            F.coalesce(F.col("right_name"), F.lit("None")),
        ))
        .withColumn("rec_dir", F.lit(None).cast("string"))
        .withColumn("rec_left", F.lit(None).cast("long"))
        .withColumn("rec_right", F.lit(None).cast("long"))
        .withColumn("rec_start", F.lit(None).cast("long"))
        .withColumn("status", F.lit(None).cast("string"))
    )
    # rec_start rides along for consumers that need the reference's
    # probe-window processing order (annotation rows sorted by START,
    # not left — a reverse-strand record's start is its right edge);
    # the location_report formatter orders output rows by it
    out_cols = [*m.columns, "rec_name", "rec_dir", "rec_left", "rec_right",
                "rec_start", "status", "label"]
    out = overlaps.select(*out_cols).unionByName(inter_genic.select(*out_cols))

    if remain_genes is not None:
        # P5 semi-filter: keep matches whose cds genes intersect the set
        keep = (
            out.filter(F.col("label") == "cds")
            .join(
                F.broadcast(remain_genes.select(F.lower("gene").alias("__g"))),
                F.lower(F.col("rec_name")) == F.col("__g"), "left_semi",
            )
            .select(*m.columns).distinct()
        )
        out = out.join(keep, on=[c for c in m.columns], how="left_semi")
    return out


def sub_span_filter(sub: DataFrame, span_before: int, span_after: int) -> DataFrame:
    """P6 direction-aware sub-span predicate: keep sub-locations within
    (gene_start - before, gene_start + after), orientation-flipped for
    reverse genes (gene_location_analysis.py:84-102).

    ``sub`` columns: start, end (sub-location, direction-encoded),
    gene_start, gene_end (the 5' gene interval, direction-encoded)."""
    fwd = F.col("gene_start") < F.col("gene_end")
    ok_fwd = (
        (F.col("gene_start") - span_before <= F.col("start"))
        & (F.col("start") <= F.col("end"))
        & (F.col("end") <= F.col("gene_start") + span_after)
    )
    ok_rev = (
        (F.col("gene_start") + span_before >= F.col("start"))
        & (F.col("start") >= F.col("end"))
        & (F.col("end") >= F.col("gene_start") - span_after)
    )
    return sub.filter(F.when(fwd, ok_fwd).otherwise(ok_rev))


def consistency_sub_locations(df: DataFrame, format_col: str, best_col: str,
                              start_col: str, end_col: str) -> DataFrame:
    """Explode each match into its best consistency runs: every maximal
    '*'-run of length == best count yields a sub-location with genome
    coordinates walked in strand direction; original columns pass through
    (reference extract_sub_data, gene_location_analysis.py:104-147).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sub_left", T.IntegerType()),
            T.StructField("sub_right", T.IntegerType()),
            T.StructField("sub_start", T.LongType()),
            T.StructField("sub_end", T.LongType()),
        ]
    )
    names = [f.name for f in out_schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                fmt, b = rec[format_col], int(rec[best_col])
                s, e = int(rec[start_col]), int(rec[end_col])
                step = 1 if s < e else -1
                cur = 0
                run_start = None
                for pos, ch in enumerate(fmt):
                    if ch == "*":
                        if cur == 0:
                            run_start = pos
                        cur += 1
                    else:
                        cur = 0
                    if cur == b and b > 0:
                        rows.append({
                            **rec,
                            "sub_left": run_start + 1, "sub_right": pos + 1,
                            "sub_start": s + step * run_start,
                            "sub_end": s + step * pos,
                        })
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(gen, out_schema)
