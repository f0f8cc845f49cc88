"""SparkSession factory tuned for this engine.

Local test runs use ``local[N]``; the same configuration (AQE, UTC
session timezone, Arrow transfer, explicit shuffle parallelism) is what
we would ship to a multi-executor cluster — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "census_asc5_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    - AQE on: runtime partition coalescing + skew-join splitting, which
      is the 100 TB safety net for skewed keys.
    - UTC session timezone: deterministic event-time semantics and
      bit-exact parity with the DuckDB oracle.
    - Arrow enabled: pandas UDF exchange is columnar, not pickled rows.
    - shuffle.partitions pinned (default: cpu count) — Spark's default
      200 is wrong in both directions; at cluster scale this is set to
      ~2-3x total cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects; read as int64 nanos and convert in the
        # catalog (timestamp_micros(ns DIV 1000)).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
