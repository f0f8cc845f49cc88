"""Raw media-file ingestion via Spark's built-in ``binaryFile`` source.

The on-ramp for the multimodal pipeline (operators/multimodal.py): one
row per file with the payload as a ``binary`` column, normalized to the
same (doc_id, payload, media_type) contract ``attach_binary`` produces,
so the downstream decode / feature / resize kernels run unchanged on
real files.

Scale notes: ``pathGlobFilter`` prunes at LISTING time (files that do
not match are never opened), ``recursiveFileLookup`` walks nested
prefixes without a driver-side glob expansion, and each file's bytes
are read inside the task that owns the row — the driver never touches
payloads. Files larger than ``spark.sql.sources.binaryFile.maxLength``
fail loudly rather than silently truncating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Load files under ``path`` as (doc_id, path, n_bytes, payload,
    media_type) rows.

    ``doc_id`` is the xxhash64 of the file path — stable across runs
    and collision-safe at any realistic corpus size (same 2⁻⁶⁴
    argument as the dedup shingle keys). ``media_type`` comes from the
    lowercased extension (``bin/<ext>``; ``bin/``-less names map to
    ``bin/raw``).
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    # extension = non-empty suffix after a non-leading dot; dotfiles
    # (".env"), trailing dots ("archive.") and extension-less names all
    # fall back to "raw" (code-review r5 finding)
    ext = F.when(
        base.rlike(r".\.[^.]+$"),
        F.lower(F.regexp_extract(base, r"\.([^.]+)$", 1)),
    ).otherwise(F.lit("raw"))
    return df.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        "path",
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
        F.concat(F.lit("bin/"), ext).alias("media_type"),
    )
