from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_binary,
    decode_media,
    extract_features,
    frame_sample,
    resize_meta,
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


def test_resize_fit_within_preserves_aspect(spark):
    decoded = spark.createDataFrame(
        [(1, 448, 224), (2, 100, 200), (3, 224, 224)],
        ["doc_id", "width", "height"],
    )
    out = {r.doc_id: (r.out_w, r.out_h) for r in resize_meta(decoded).collect()}
    assert out[1] == (224, 112)  # 2:1 landscape halves
    assert out[2] == (100, 200)  # already fits — no upscale
    assert out[3] == (224, 224)


def test_extract_features_deterministic_unit_mass(spark):
    media = attach_binary(_docs(spark))
    out = {r.doc_id: list(r.features) for r in extract_features(media).collect()}
    assert len(out[1]) == FEATURE_DIM
    assert abs(sum(out[1]) - 1.0) < 1e-9  # histogram normalizes to 1
    assert out[3] == [0.0] * FEATURE_DIM  # empty payload
    again = {r.doc_id: list(r.features) for r in extract_features(media).collect()}
    assert out == again


def test_frame_sample(spark):
    decoded = decode_media(attach_binary(_docs(spark)))
    frames = frame_sample(decoded, every=5)
    rows = frames.filter("doc_id = 2").collect()
    n_frames = 1 + 100 % 31  # =8
    expected = [i for i in range(n_frames) if i % 5 == 0]
    assert sorted(r.frame_idx for r in rows) == expected


def test_frame_sample_skips_zero_frame_media(spark):
    decoded = spark.createDataFrame(
        [(1, 10, 10, 0), (2, 10, 10, 2)],
        ["doc_id", "width", "height", "n_frames"],
    )
    rows = frame_sample(decoded, every=1).collect()
    assert {r.doc_id for r in rows} == {2}
    assert sorted(r.frame_idx for r in rows) == [0, 1]


def _codecs():
    import census_asc5_data_pipeline_spark.operators.multimodal as M

    return ["stub"] + (["pil"] if M.HAS_PIL else [])


@pytest.mark.parametrize("codec", _codecs())
def test_decode_media_codec_paths_share_schema(spark, codec):
    """Stub and real codec must be plan-compatible: same schema, same
    row set, non-null metadata for every non-null payload. With
    pillow installed the pil path decodes REAL bytes (a generated
    1-bit BMP); without it the stub path still pins the contract."""
    import census_asc5_data_pipeline_spark.operators.multimodal as M

    if codec == "pil":
        # a real 2x3 image, round-tripped through an actual encoder
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (2, 3)).save(buf, format="BMP")
        payload = buf.getvalue()
        df = spark.createDataFrame(
            [(1, payload, "image/bmp"), (2, b"not an image", "image/bmp"), (3, None, None)],
            M.MEDIA_SCHEMA,
        )
        out = {r.doc_id: r for r in M.decode_media(df, codec="pil").collect()}
        assert (out[1].width, out[1].height, out[1].n_frames) == (2, 3, 1)
        assert (out[2].width, out[2].height) == (0, 0)  # undecodable
        assert out[3].n_bytes == 0
    else:
        df = M.attach_binary(_docs(spark))
        out = M.decode_media(df, codec="stub")
        assert out.schema == M.DECODED_SCHEMA
        rows = out.collect()
        assert len(rows) == df.count()
        assert all(r.width > 0 for r in rows)


def test_decode_media_pil_codec_raises_cleanly_when_absent(spark):
    import census_asc5_data_pipeline_spark.operators.multimodal as M

    if M.HAS_PIL:
        pytest.skip("pillow installed — covered by the pil param case")
    df = M.attach_binary(_docs(spark))
    with pytest.raises(ImportError):
        M.decode_media(df, codec="pil")
    # auto falls back to the stub silently
    assert M.decode_media(df, codec="auto").count() == df.count()


def test_decode_media_arrow_matches_pandas_path(spark):
    """mapInArrow twin must emit bit-identical rows to the mapInPandas
    decode for the same codec (only the batch transport differs)."""
    from census_asc5_data_pipeline_spark.operators.multimodal import (
        attach_binary,
        decode_media,
        decode_media_arrow,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, None)], ["doc_id", "text"]
    )
    media = attach_binary(docs)
    a = sorted(tuple(r) for r in decode_media(media).collect())
    b = sorted(tuple(r) for r in decode_media_arrow(media).collect())
    assert a == b and a
    # narrower doc_id (int32): the pandas twin coerces silently, the
    # Arrow passthrough must cast too (review finding)
    narrow = attach_binary(
        docs.withColumn("doc_id", docs.doc_id.cast("int"))
    )
    c = sorted(tuple(r) for r in decode_media_arrow(narrow).collect())
    assert c == a
