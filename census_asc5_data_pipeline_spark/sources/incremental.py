"""Incremental ingest — process only files not yet seen.

The reference re-extracts whole years on every run; at 100 TB a
pipeline must be incremental instead. This is the batch counterpart of
Structured Streaming's file tracking: a processed-files ledger (itself
parquet) is anti-joined against the source listing, only the delta is
read, and the ledger is extended afterwards. Idempotent under re-runs
and crash-restarts (the ledger append happens after the delta's
consumers succeed — callers control the commit point).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = "file STRING"


def _list_source_files(spark: SparkSession, source_dir: str) -> DataFrame:
    files = [
        os.path.join(source_dir, f)
        for f in sorted(os.listdir(source_dir))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    return spark.createDataFrame([(f,) for f in files], LEDGER_SCHEMA)


def new_files(spark: SparkSession, source_dir: str, ledger_dir: str) -> list[str]:
    """Source files absent from the ledger (deterministic order)."""
    listing = _list_source_files(spark, source_dir)
    if os.path.isdir(ledger_dir):
        # any OTHER read failure (corrupt ledger, IO error) must raise:
        # treating it as "no ledger" would silently reprocess history
        seen = spark.read.schema(LEDGER_SCHEMA).parquet(ledger_dir)
    else:
        seen = spark.createDataFrame([], LEDGER_SCHEMA)
    delta = listing.join(seen, "file", "left_anti")
    return sorted(r.file for r in delta.collect())


def read_increment(
    spark: SparkSession, source_dir: str, ledger_dir: str
) -> tuple[DataFrame | None, list[str]]:
    """(delta DataFrame | None, file list). Reads ONLY the new files —
    the scan is bounded by the delta, not the table's history."""
    files = new_files(spark, source_dir, ledger_dir)
    if not files:
        return None, []
    return spark.read.parquet(*files), files


def commit_increment(
    spark: SparkSession, ledger_dir: str, files: list[str]
) -> None:
    """Extend the ledger AFTER downstream writes succeed."""
    if files:
        spark.createDataFrame([(f,) for f in files], LEDGER_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(ledger_dir)
