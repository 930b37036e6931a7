"""Round-7 driver-contract queries — STAGED, not yet wired into
``driver_queries._queries_in_build_order``.

Why staged: the driver's correctness gate records the first 50 registry
entries per round, and round 6's 50 slots are exactly filled (8
never-recorded round-6 queries + the 42 round-4-stale rows the round-5
verdict asked to re-green). Registering another never-recorded query now
would bump a stale row out of the round-6 gate. Wire ``queries_r7()`` /
``oracle_sql_r7()`` into the build order at the start of round 7.

Until then the entries below are held to the same bar out-of-band:
``tests/test_boilerplate.py`` replays each query against its DuckDB
oracle at sf0.001 with the driver's own canonicalization (sorted
columns, sorted rows, exact values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the documents fixture has no newlines, so the driver query derives a
# lined corpus by turning two mid-frequency filler words into line
# breaks — same regex on both engines (plain alternation, no engine-
# specific syntax); at sf0.01 this yields ~2.1k lines, ~120 of which
# repeat across documents
_LINE_BREAK_PATTERN = " table | data "


def boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal end-to-end
    (operators/dedup.py::remove_repeated_lines): every line occurring in
    >= 2 distinct documents is dropped corpus-wide, documents are
    reassembled from the surviving lines in order, and per-document
    removal counts come back for curation thresholds."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import remove_repeated_lines

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.regexp_replace("text", _LINE_BREAK_PATTERN, "\n").alias("text"),
    )
    return remove_repeated_lines(d, "text", "doc_id", sep="\n", min_docs=2)


BOILERPLATE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(text, '{_LINE_BREAK_PATTERN}', chr(10), 'g') AS tx
  FROM documents),
l AS (
  SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS line
  FROM (SELECT doc_id, string_split(tx, chr(10)) AS arr FROM d)),
b AS (SELECT line FROM l GROUP BY line
      HAVING COUNT(DISTINCT doc_id) >= 2 AND line != ''),
k AS (SELECT doc_id, pos, line FROM l ANTI JOIN b USING (line)),
r AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
         COUNT(*)::BIGINT AS n_kept
  FROM k GROUP BY doc_id),
n AS (SELECT doc_id, len(string_split(tx, chr(10)))::BIGINT AS n_lines FROM d)
SELECT n.doc_id, COALESCE(r.clean, '') AS text, n.n_lines,
       (n.n_lines - COALESCE(r.n_kept, 0))::BIGINT AS n_removed
FROM n LEFT JOIN r USING (doc_id)
"""


def multimodal_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media rollup (operators/multimodal.py::media_stats)
    through the gate: per-kind counts, payload bytes, and typed-meta
    averages WITHOUT decoding — the layout claim being checked is that
    cheap stats never touch the binary column (column pruning drops it
    at the scan). Exactness: counts and byte totals are integer sums;
    the averages are an exact long sum over ints with one final IEEE
    division on both engines."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import multimodal as mm

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    is_img = F.col("kind") == "image"
    media = d.select(
        F.col("doc_id").alias("media_id"), kind.alias("kind"),
        F.encode("text", "utf-8").alias("data"), "n_chars",
    ).select(
        "media_id", "kind", "data",
        F.struct(
            F.when(is_img, (F.col("n_chars") % 640 + 1).cast("int"))
            .alias("width"),
            F.when(is_img, (F.col("n_chars") % 480 + 1).cast("int"))
            .alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.when(~is_img, (F.col("n_chars").cast("long") * 37))
            .alias("duration_ms"),
            F.lit("mixed").alias("format"),
        ).alias("meta"),
    )
    return mm.media_stats(media)


MEDIA_STATS_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(text))::BIGINT AS nbytes,
         CASE WHEN doc_id % 3 = 0 THEN (n_chars % 640 + 1)::INT END AS width,
         CASE WHEN doc_id % 3 != 0 THEN (n_chars::BIGINT * 37) END AS duration_ms
  FROM documents)
SELECT kind, COUNT(*)::BIGINT AS n, SUM(nbytes)::BIGINT AS total_bytes,
       (SUM(width)::BIGINT::DOUBLE / COUNT(width)) AS avg_width,
       (SUM(duration_ms)::BIGINT::DOUBLE / COUNT(duration_ms)) AS avg_duration_ms
FROM m GROUP BY kind
"""


def queries_r7() -> dict:
    return {
        "boilerplate_scrub": boilerplate_scrub,
        "multimodal_media_stats": multimodal_media_stats,
    }


def oracle_sql_r7() -> dict[str, str]:
    return {
        "boilerplate_scrub": BOILERPLATE_SQL,
        "multimodal_media_stats": MEDIA_STATS_SQL,
    }
