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


def schema_diff(spark, old_path: str, new_path: str) -> list[dict]:
    """Schema drift report between two parquet datasets: added /
    removed / retyped columns — the guardrail an append-only ingest
    runs before ``read_parquet_evolving`` merges a new batch (silent
    retypes are the case mergeSchema cannot reconcile; catching them
    at ingest beats a mid-query AnalysisException at 100 TB).

    Footer-only: reads both schemas (no data I/O), so it is metadata
    cost regardless of table size.
    """
    old_s = {f.name: f.dataType.simpleString() for f in spark.read.parquet(old_path).schema}
    new_s = {f.name: f.dataType.simpleString() for f in spark.read.parquet(new_path).schema}
    out: list[dict] = []
    for name in sorted(set(old_s) | set(new_s)):
        if name not in old_s:
            out.append({"column": name, "status": "added", "type": new_s[name]})
        elif name not in new_s:
            out.append({"column": name, "status": "removed", "type": old_s[name]})
        elif old_s[name] != new_s[name]:
            out.append(
                {
                    "column": name,
                    "status": "retyped",
                    "type": f"{old_s[name]} -> {new_s[name]}",
                }
            )
    return out


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leave every other partition untouched — the idempotent
    re-run primitive for partitioned ingest (re-processing one day must
    not wipe the year; plain ``overwrite`` + ``partitionBy`` truncates
    the whole table root).

    Spark's STATIC overwrite mode (the default) deletes all matching
    top-level partitions first; ``partitionOverwriteMode=dynamic``
    defers the delete to commit time and scopes it to partitions the
    job actually wrote. The option is set per-write (not on the
    session) so concurrent writers with different semantics don't
    interfere.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_parquet_evolving(spark, path: str) -> "DataFrame":
    """Schema-evolution read: union the footer schemas of every file
    under ``path`` (``mergeSchema``) so batches written before a column
    was added read alongside batches written after — old rows surface
    the new column as NULL, the standard append-only-ingest evolution
    contract (an ingest pipeline adds fields over time; readers must
    not break on either side of the change).

    Spark's default reads ONE file's footer for the schema, so
    whichever batch happens to be listed first silently decides the
    visible columns — this forces the merge. Cost note: mergeSchema
    reads every footer at planning time (footers only, not data); on
    very large file counts prefer a declared schema via
    ``spark.read.schema(...)``, which this helper intentionally does
    not hide.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 512,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ~``target_file_mb`` files (the silent killer at 100 TB is a
    million 1 MB files — every scan pays open/footer cost per file).

    File count is derived from the dataset's on-disk bytes; the
    rewrite is committed as a new immutable snapshot version via
    ``sources.versioned.commit_version`` (atomic pointer-file commit,
    previous versions retained) — a crash at any point leaves the
    prior version fully readable, and concurrent readers that already
    resolved the old version keep a live directory (round-4 advice
    replaced the two-rename swap). Returns the new file count.
    """
    import math
    import os

    from census_asc5_data_pipeline_spark.sources import versioned as V

    # recover() adopts a plain parquet dir as version 0, so src is
    # always an immutable version dir from here on.
    src = V.current_version_dir(path)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    V.commit_version(spark.read.parquet(src).repartition(n_files), path)
    return n_files
