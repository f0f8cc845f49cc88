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
    # infers NTZ by default). Normalize to TIMESTAMP with a plain CAST:
    # the session zone is pinned UTC above, so wall-clock values are
    # preserved — same naive-as-UTC semantics DuckDB applies to the
    # identical file. CAST (not to_utc_timestamp) is deliberate:
    # Catalyst's UnwrapCastInBinaryComparison rewrites
    # `cast(col) <= lit` into a parquet-pushable filter on the raw
    # column, while a to_utc_timestamp wrapper blocks predicate
    # pushdown entirely (measured: q1's shipdate range filter fell off
    # PushedFilters). The session-zone dependency this leaves behind is
    # guarded by ``assert_utc`` — callers that compare epochs
    # (oracle harness, bench) assert the zone right before acting.
    # One select pass (not withColumn-per-column, which grows the
    # analysis plan linearly) with backtick quoting so column names
    # containing dots resolve as top-level columns.
    from pyspark.sql import functions as F

    ntz = {c for c, t in df.dtypes if t == "timestamp_ntz"}
    if ntz:
        df = df.select(
            *[
                F.col(f"`{c}`").cast("timestamp").alias(c)
                if c in ntz
                else F.col(f"`{c}`")
                for c in df.columns
            ]
        )
    return df


def assert_utc(spark: SparkSession) -> None:
    """Loudly fail if the session zone drifted from UTC (ADVICE r3):
    NTZ->TIMESTAMP casts resolve the zone at execution, so a non-UTC
    session would silently shift epochs instead of erroring."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise AssertionError(
            f"session timeZone is {tz!r}, not 'UTC' — NTZ casts would "
            "shift epochs; call read_table (which pins UTC) or reset it"
        )


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
