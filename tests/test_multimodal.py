from __future__ import annotations

from census_asc5_data_pipeline_spark.operators.multimodal import (
    attach_binary,
    decode_media,
    frame_sample,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 100), (3, "")], ["doc_id", "text"]
    )


def test_attach_binary_schema(spark):
    media = attach_binary(_docs(spark))
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
    }
    row = media.filter("doc_id = 1").collect()[0]
    assert bytes(row.payload) == b"hello world"


def test_decode_media_deterministic(spark):
    out = {r.doc_id: r for r in decode_media(attach_binary(_docs(spark))).collect()}
    assert out[1].n_bytes == 11
    assert out[1].width == 64 + 11 % 577
    assert out[1].height == 64 + 11 % 479
    assert out[1].n_frames == 1 + 11 % 31
    assert out[3].n_bytes == 0


def test_frame_sample(spark):
    decoded = decode_media(attach_binary(_docs(spark)))
    frames = frame_sample(decoded, every=5)
    rows = frames.filter("doc_id = 2").collect()
    n_frames = 1 + 100 % 31  # =8
    expected = [i for i in range(n_frames) if i % 5 == 0]
    assert sorted(r.frame_idx for r in rows) == expected
