"""Catalog: map a testdata scale-factor directory to named DataFrames.

Mirrors the reference's Athena external-table layer (report.md:368-435):
schema-on-read over files in an object-store prefix, one logical table
per dataset directory. Here the storage format is parquet, so schema,
column pruning and predicate pushdown come from the footer for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table, normalizing storage quirks.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as int64 nanos
    and is converted here to a microsecond timestamp (``DIV`` keeps the
    arithmetic in exact integer space — ns magnitudes exceed double's
    53-bit mantissa).
    """
    # Defensive: the caller may hand us a session built without our
    # tuned configs (e.g. the verification driver). Both knobs are
    # runtime-settable and required for correct reads: nanosAsLong to
    # read TIMESTAMP(NANOS) parquet at all, UTC so epoch extraction of
    # NTZ timestamps is engine-portable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Tz-naive parquet timestamps arrive as TIMESTAMP_NTZ (Spark 4
    # infers NTZ by default). Normalize to TIMESTAMP: the session zone
    # is pinned UTC above, so wall-clock values are preserved and
    # unix_millis/window/watermark all work without per-call casts —
    # same naive-as-UTC semantics DuckDB applies to the identical file.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, df[col].cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every parquet table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = read_table(spark, sf_dir, name)
    return out


class Catalog:
    """Named-table access plus temp-view registration for the SQL API."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = load_tables(spark, sf_dir)

    def __getitem__(self, name: str) -> DataFrame:
        return self.tables[name]

    def register_views(self, suffix: str = "") -> None:
        for name, df in self.tables.items():
            df.createOrReplaceTempView(f"{name}{suffix}")
