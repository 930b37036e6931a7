"""SparkSession factory with scale-oriented defaults.

The reference parallelizes with ad-hoc ``multiprocessing.Pool`` /
``ThreadPoolExecutor`` (reference: src/analysis/gene_similarity_match.py:78,
98-104). Here the equivalent knob is simply the Spark master / executor
topology; everything else is expressed declaratively and AQE re-plans at
runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ncbi-analysis-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults are chosen for local testing but every setting is the one we
    would also ship on a real cluster:

    - AQE on (runtime coalescing, skew-join splitting) so a plan written
      at sf0.01 survives a 100x scale-up without retuning.
    - Arrow enabled — all pandas UDF traffic is Arrow-batched.
    - session timezone pinned to UTC so timestamp semantics are identical
      across engines (matters for the DuckDB correctness oracle).
    - a modest autoBroadcastJoinThreshold; dimension tables (nation,
      region, query-gene sets) broadcast automatically.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # explicit scan-split size: with ~4-8 concurrent tasks per
        # executor core and wide text/media columns, 128 MiB splits keep
        # a partition's decompressed batch well inside executor memory
        # at 100 TB; raise only for narrow all-numeric scans
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/ncbi-analysis-warehouse"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None):
    """Load the driver testdata parquet tables as a dict of DataFrames."""
    tables = tables or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) for t in tables}
