"""Sinks — the engine's analog of the reference's ``s3_load``
(extractCensusACS5.py:47-63): serialize a dataset under a storage
prefix. Spark writes directly to object stores via the Hadoop
filesystem connectors (``s3a://``), partitioned and parallel, instead
of buffering one CSV string on a single node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
    partition_by: list[str] | None = None,
) -> None:
    """Header CSV write. ``single_file`` coalesces to one part — only
    for small exports (the reference's 104-row datasets); large data
    must stay multi-part or the write serializes on one task."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode).option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar sink of choice: footer stats enable pushdown on re-read;
    ``partition_by`` low-cardinality keys gives partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (built into Spark — no extra jars): same columnar
    pushdown/pruning properties as parquet, for ecosystems standardized
    on ORC (Hive warehouses). Read back with ``spark.read.orc``."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 512,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ~``target_file_mb`` files (the silent killer at 100 TB is a
    million 1 MB files — every scan pays open/footer cost per file).

    File count is derived from the dataset's on-disk bytes; the rewrite
    round-trips through a temp dir and swaps via two renames (old aside
    → tmp in → delete old) so a crash at any point leaves either the
    old or the new dataset fully present, never neither. Returns the
    new file count.
    """
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
