"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, with decode / feature-extract / resize / frame-sample staged
as Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes (clearly marked); the Spark-side contract — schema,
batch shape, partitioning, UDF signatures — is real and tested. At 100
TB the payload column stays columnar (parquet binary), is never
collected, and each decode batch is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a binary payload column (UTF-8 bytes of the text —
    a deterministic stand-in for real image/audio blobs)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("fake/image").alias("media_type"),
    )


def _fake_decode(payload: bytes | None) -> tuple[int, int, int, int]:
    """STUB codec: real decode (PIL/ffmpeg) is unavailable in this
    container. Dimensions are a deterministic function of byte length so
    the pipeline is testable; swap this body for the real codec call."""
    if payload is None:
        return 0, 0, 0, 0
    n = len(payload)
    return n, 64 + n % 577, 64 + n % 479, 1 + n % 31


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(decoded, columns=["n_bytes", "width", "height", "n_frames"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(batches, DECODED_SCHEMA)


def frame_sample(df: DataFrame, every: int = 7) -> DataFrame:
    """Frame-sampling plan: explode a frame index per decoded video and
    keep every ``every``-th frame — pure JVM explode, no codec."""
    return (
        df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .filter(F.col("frame_idx") % every == 0)
        .select("doc_id", "frame_idx", "width", "height")
    )
