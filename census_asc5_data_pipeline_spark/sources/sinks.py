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
