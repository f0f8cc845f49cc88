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


try:  # optional real codec (round-4 verdict item 7): absent in the
    # build container, used automatically by tests when importable
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None
    HAS_PIL = False


def _fake_decode(payload: bytes | None) -> tuple[int, int, int, int]:
    """STUB codec: dimensions are a deterministic function of byte
    length so the pipeline is testable without image libraries; the
    registered `multimodal_meta` query pins THIS codec so its DuckDB
    oracle stays engine-independent."""
    if payload is None:
        return 0, 0, 0, 0
    n = len(payload)
    return n, 64 + n % 577, 64 + n % 479, 1 + n % 31


def _pil_decode(payload: bytes | None) -> tuple[int, int, int, int]:
    """Real codec path (requires pillow): actual width/height/frames
    from the byte stream; undecodable payloads yield zero dims — the
    downstream schema and batch shape are identical to the stub's."""
    if payload is None:
        return 0, 0, 0, 0
    import io

    if _PILImage is None:
        # pillow importable on the driver but not this executor —
        # fail LOUDLY (task error) instead of reporting every image
        # as zero-dim undecodable (code-review r5 finding)
        raise ImportError("pillow missing on executor for codec='pil'")
    try:
        with _PILImage.open(io.BytesIO(payload)) as img:
            return len(payload), img.width, img.height, getattr(img, "n_frames", 1)
    except Exception:
        return len(payload), 0, 0, 0


def _resolve_kernel(codec: str):
    """Shared codec policy for the mapInPandas/mapInArrow twins — one
    place for the auto fallback, the unknown-codec error and the
    missing-pillow error, so the twins can never drift apart."""
    if codec == "auto":
        codec = "pil" if HAS_PIL else "stub"
    if codec not in ("stub", "pil"):
        raise ValueError(f"unknown codec {codec!r}: expected stub|pil|auto")
    if codec == "pil" and not HAS_PIL:
        raise ImportError("codec='pil' requires pillow, which is not installed")
    return _pil_decode if codec == "pil" else _fake_decode


def decode_media(df: DataFrame, codec: str = "stub") -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas.

    ``codec="stub"`` (default) is the deterministic fake; ``"pil"``
    decodes real bytes with pillow when importable (raises otherwise);
    ``"auto"`` picks pil if available else stub. Either path emits
    DECODED_SCHEMA — swapping codecs never changes the plan shape,
    only the kernel body (tests/test_multimodal.py parametrizes over
    whichever paths the environment supports)."""
    kernel = _resolve_kernel(codec)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [kernel(p) for p in pdf["payload"]]
            out = pd.DataFrame(decoded, columns=["n_bytes", "width", "height", "n_frames"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(batches, DECODED_SCHEMA)


def decode_media_arrow(df: DataFrame, codec: str = "stub") -> DataFrame:
    """``mapInArrow`` twin of :func:`decode_media`: the kernel receives
    raw ``pyarrow.RecordBatch`` objects, skipping the Arrow→pandas→
    Arrow conversion layer mapInPandas pays on every batch (pandas
    Series construction + block consolidation — pure overhead when the
    kernel only touches the binary payload buffer). Same codecs, same
    DECODED_SCHEMA, bit-identical output (pinned in
    tests/test_multimodal.py) — use this form when the per-batch
    Python work is small relative to the conversion cost."""
    import pyarrow as pa

    kernel = _resolve_kernel(codec)

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in it:
            payloads = rb.column(rb.schema.get_field_index("payload")).to_pylist()
            decoded = [kernel(p) for p in payloads]
            cols = list(zip(*decoded)) if decoded else [[], [], [], []]
            yield pa.RecordBatch.from_arrays(
                [
                    # explicit int64: the pandas twin silently coerces a
                    # narrower doc_id, the Arrow passthrough must too
                    rb.column(rb.schema.get_field_index("doc_id")).cast(
                        pa.int64()
                    ),
                    pa.array(cols[0], type=pa.int64()),
                    pa.array(cols[1], type=pa.int64()),
                    pa.array(cols[2], type=pa.int64()),
                    pa.array(cols[3], type=pa.int64()),
                ],
                names=["doc_id", "n_bytes", "width", "height", "n_frames"],
            )

    return df.mapInArrow(batches, DECODED_SCHEMA)


def resize_meta(
    df: DataFrame, max_w: int = 224, max_h: int = 224
) -> DataFrame:
    """Resize planning: fit-within target dims preserving aspect ratio —
    pure integer column math (the actual pixel work belongs in the
    decode kernel; the plan stage only needs the geometry)."""
    scale_num = F.least(
        F.lit(max_w) * F.col("height"), F.lit(max_h) * F.col("width")
    )
    denom = F.col("width") * F.col("height")
    new_w = F.floor(F.col("width") * scale_num / denom).cast("bigint")
    new_h = F.floor(F.col("height") * scale_num / denom).cast("bigint")
    no_up = F.col("width") <= F.lit(max_w)
    no_up_h = F.col("height") <= F.lit(max_h)
    return df.select(
        "doc_id",
        "width",
        "height",
        F.when(no_up & no_up_h, F.col("width")).otherwise(new_w).alias("out_w"),
        F.when(no_up & no_up_h, F.col("height")).otherwise(new_h).alias("out_h"),
    )


FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage as Arrow-batched mapInPandas.

    STUB kernel: a real model (CLIP/ViT) is unavailable here, so the
    vector is a deterministic byte-histogram projection — the contract
    (binary in, fixed-dim double array out, bounded Arrow batches) is
    the real thing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                buckets = [0] * FEATURE_DIM
                for b in p:
                    buckets[b % FEATURE_DIM] += 1
                total = max(1, len(p))
                feats.append([b / total for b in buckets])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "features": feats}
            )

    return df.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every: int = 7) -> DataFrame:
    """Frame-sampling plan: explode a frame index per decoded video and
    keep every ``every``-th frame — pure JVM explode, no codec."""
    # guard n_frames >= 1: sequence(0, -1) runs DESCENDING in Spark and
    # would fabricate frames for zero-frame media
    return (
        df.filter(F.col("n_frames") >= 1)
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .filter(F.col("frame_idx") % every == 0)
        .select("doc_id", "frame_idx", "width", "height")
    )
