"""File-level zone-map index: per-file column min/max stats, used to
prune the FILE LIST before Spark ever plans the scan.

Parquet already prunes row groups from footer stats — but at 100 TB the
cost that kills you is upstream of that: a table of millions of files
means millions of footer reads just to plan. A zone-map manifest (one
tiny parquet of ``file, n_rows, min, max`` rows, built once per ingest)
lets the driver select the matching file subset with one small read and
hand Spark an explicit file list — planning cost proportional to the
MATCHING files, not the table. This is the core of what table formats
(Iceberg/Delta manifests) do; here it is expressed engine-side over
plain parquet directories.

The index build is itself distributed: one pass over the table grouped
by ``input_file_name()`` (map-side combinable min/max per file, shuffle
keyed on the file path — O(files) rows out).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def index_path(table_path: str) -> str:
    return os.path.join(table_path, "_zone_index")


def build_stats_index(
    spark: SparkSession, table_path: str, col: str
) -> DataFrame:
    """Build/refresh the per-file min/max index for ``col``.

    Reads the data files (one distributed pass), never the index dir.
    """
    df = spark.read.parquet(table_path)
    idx = (
        df.select(F.input_file_name().alias("file"), F.col(col).alias("c"))
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c").alias("min_v"),
            F.max("c").alias("max_v"),
        )
    )
    idx.write.mode("overwrite").parquet(index_path(table_path))
    return spark.read.parquet(index_path(table_path))


def pruned_read(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Read only files whose [min, max] zone overlaps [lo, hi], then
    apply the exact predicate. Returns (frame, n_files_selected,
    n_files_total). Zone overlap can only over-select (never skips a
    file containing matches), so the result equals the full-scan
    filter — the exact filter still runs on the survivors.

    The index read is driver-side metadata scale (O(files) tiny rows);
    the file list goes back to Spark as an explicit multi-path load, so
    task planning touches only the selected files.
    """
    idx = spark.read.parquet(index_path(table_path)).collect()
    total = len(idx)
    files = [
        r["file"]
        for r in idx
        if r["max_v"] is not None and r["max_v"] >= lo and r["min_v"] <= hi
    ]
    if not files:
        empty = spark.read.parquet(table_path).filter(F.lit(False))
        return empty, 0, total
    out = spark.read.parquet(*files).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
    return out, len(files), total
