"""JSONL (newline-delimited JSON) ingest/egress — the de-facto exchange
format of LLM training corpora (one document object per line).

Always pass an explicit schema at scale: like CSV, ``spark.read.json``
without a schema runs a full inference pass first — a second 100 TB
scan. Malformed lines are captured, not fatal: PERMISSIVE mode routes
them to ``_corrupt_record`` so a single bad line in a 10k-file crawl
drop doesn't kill the job (FAILFAST is opt-in for validated stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    keep_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """Schema-first JSONL read.

    With ``keep_corrupt`` the corrupt-record column is retained for a
    quarantine sink; otherwise bad lines are dropped (count them from
    the quarantine side, never by re-scanning).
    """
    # Spark refuses plans whose only referenced column is the internal
    # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the
    # drop path uses DROPMALFORMED natively instead of a filter.
    if keep_corrupt:
        reader = spark.read.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
        if schema is not None:
            if isinstance(schema, str):
                schema = T.StructType.fromDDL(schema)
            # never StructType.add on the caller's object — it mutates in
            # place, so a reused module-level schema would accumulate
            # duplicate corrupt columns across calls
            schema = T.StructType(
                list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
            )
            reader = reader.schema(schema)
    else:
        reader = spark.read.option("mode", "DROPMALFORMED")
        if schema is not None:
            reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """JSONL write; ``compression='gzip'|'zstd'`` for wire formats.
    Stays multi-part — JSONL shards are the unit of downstream
    shuffling, so never coalesce a corpus to one file."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
