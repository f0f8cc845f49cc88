"""Puffin statistics READ (r15 verdict #3): the spec-level codec, the
``statistics`` table-metadata field, and ndv feeding the CBO
pre-flight (join_size_estimate)."""
from __future__ import annotations

import json
import os

import pytest
import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
from census_asc5_data_pipeline_spark.sources import puffin


def test_puffin_round_trip(tmp_path):
    p = str(tmp_path / "stats.puffin")
    blobs = [
        (
            b"\x01\x02\x03sketch-bytes",
            {
                "type": "apache-datasketches-theta-v1",
                "fields": [1],
                "snapshot-id": 7,
                "sequence-number": 7,
                "properties": {"ndv": "123"},
            },
        ),
        (
            b"other-blob",
            {
                "type": "some-future-stat",
                "fields": [2],
                "snapshot-id": 7,
                "sequence-number": 7,
                "properties": {},
            },
        ),
    ]
    meta = puffin.write_puffin(p, blobs, properties={"created-by": "t"})
    footer = puffin.read_puffin_footer(p)
    assert footer["properties"] == {"created-by": "t"}
    assert [b["type"] for b in footer["blobs"]] == [
        "apache-datasketches-theta-v1",
        "some-future-stat",
    ]
    assert puffin.read_puffin_blob(p, meta[0]) == b"\x01\x02\x03sketch-bytes"
    assert puffin.read_puffin_blob(p, meta[1]) == b"other-blob"
    assert puffin.puffin_ndv(p) == {1: 123}


def test_puffin_bad_magic_and_compressed_refuse(tmp_path):
    p = str(tmp_path / "bad.puffin")
    with open(p, "wb") as fh:
        fh.write(b"NOPE" + b"\x00" * 40)
    with pytest.raises(ValueError, match="magic"):
        puffin.read_puffin_footer(p)
    # compressed-footer flag set -> loud refusal, not a mis-parse
    import struct

    p2 = str(tmp_path / "cmp.puffin")
    payload = json.dumps({"blobs": []}).encode()
    with open(p2, "wb") as fh:
        fh.write(puffin.MAGIC + puffin.MAGIC + payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(struct.pack("<I", 1))
        fh.write(puffin.MAGIC)
    with pytest.raises(NotImplementedError, match="lz4"):
        puffin.read_puffin_footer(p2)


def _mk_table(spark, path: str, n: int = 100):
    ice.write_iceberg(
        spark.range(n)
        .coalesce(1)
        .select(F.col("id"), (F.col("id") % 10).alias("k")),
        path,
    )


def _field_ids(path: str) -> dict[str, int]:
    _v, meta = ice._current_metadata(path)
    _s, fields = ice._schema_of(meta)
    return {f["name"]: int(f["id"]) for f in fields}


def test_iceberg_ndv_from_statistics_field(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_table(spark, t, n=100)
    ids = _field_ids(t)
    sp = str(tmp_path / "t-stats.puffin")
    puffin.write_puffin(
        sp,
        [
            (
                b"sketch",
                {
                    "type": "apache-datasketches-theta-v1",
                    "fields": [ids["k"]],
                    "snapshot-id": 1,
                    "sequence-number": 1,
                    "properties": {"ndv": "10"},
                },
            ),
            (
                b"sketch2",
                {
                    "type": "apache-datasketches-theta-v1",
                    "fields": [ids["id"]],
                    "snapshot-id": 1,
                    "sequence-number": 1,
                    "properties": {"ndv": "100"},
                },
            ),
        ],
    )
    ice.attach_statistics(t, sp)
    assert ice.iceberg_ndv(t) == {"id": 100, "k": 10}
    # no statistics for a snapshot with no analyzed ancestor
    assert ice.iceberg_ndv(str(tmp_path / "t"), snapshot_id=999) == {}


def test_iceberg_ndv_ancestor_fallback(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_table(spark, t, n=50)
    ids = _field_ids(t)
    sp = str(tmp_path / "s.puffin")
    puffin.write_puffin(
        sp,
        [
            (
                b"s",
                {
                    "type": "apache-datasketches-theta-v1",
                    "fields": [ids["k"]],
                    "snapshot-id": 1,
                    "sequence-number": 1,
                    "properties": {"ndv": "10"},
                },
            )
        ],
    )
    ice.attach_statistics(t, sp)
    # a later un-analyzed append: the analyzed ancestor's ndv still
    # serves (stale beats absent for a CBO)
    ice.write_iceberg(
        spark.range(50, 60)
        .coalesce(1)
        .select(F.col("id"), (F.col("id") % 10).alias("k")),
        t,
    )
    assert ice.iceberg_ndv(t) == {"k": 10}


def test_iceberg_ndv_footer_fallback(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_table(spark, t, n=30)
    ids = _field_ids(t)
    sp = str(tmp_path / "s.puffin")
    puffin.write_puffin(
        sp,
        [
            (
                b"s",
                {
                    "type": "apache-datasketches-theta-v1",
                    "fields": [ids["k"]],
                    "snapshot-id": 1,
                    "sequence-number": 1,
                    "properties": {"ndv": "10"},
                },
            )
        ],
    )
    # a foreign writer that embedded blob-metadata WITHOUT the ndv
    # property: the reader opens the Puffin footer instead
    ice.attach_statistics(
        t,
        sp,
        blob_metadata=[
            {
                "type": "apache-datasketches-theta-v1",
                "fields": [ids["k"]],
                "snapshot-id": 1,
                "sequence-number": 1,
            }
        ],
    )
    assert ice.iceberg_ndv(t) == {"k": 10}


def test_join_size_estimate_uses_catalog_ndv(spark, tmp_path):
    from census_asc5_data_pipeline_spark.operators.relational import (
        join_size_estimate,
    )

    t = str(tmp_path / "t")
    _mk_table(spark, t, n=200)
    ids = _field_ids(t)
    sp = str(tmp_path / "s.puffin")
    puffin.write_puffin(
        sp,
        [
            (
                b"s",
                {
                    "type": "apache-datasketches-theta-v1",
                    "fields": [ids["k"]],
                    "snapshot-id": 1,
                    "sequence-number": 1,
                    "properties": {"ndv": "10"},
                },
            )
        ],
    )
    ice.attach_statistics(t, sp)
    ndv = ice.iceberg_ndv(t)
    a = ice.read_iceberg(spark, t)
    b = spark.range(40).select((F.col("id") % 10).alias("k"))
    # the catalog ndv REPLACES the computed distinct for that side
    est = join_size_estimate(a, b, "k", ndv_a=ndv["k"], top_k=4)
    base = join_size_estimate(a, b, "k", exact_distinct=True, top_k=4)
    assert est["d_a"] == 10 == base["d_a"]
    assert est["n_a"] == base["n_a"] == 200
    assert est["est_rows"] == base["est_rows"]  # same arithmetic
    # a deliberately wrong catalog ndv visibly changes the estimate —
    # proof the provided value is what the estimator consumed
    skew = join_size_estimate(a, b, "k", ndv_a=1000, top_k=0)
    assert skew["d_a"] == 1000
    assert skew["est_rows"] < base["est_rows"]


def test_analyze_iceberg_ndv_closes_the_loop(spark, tmp_path):
    """r15 ANALYZE (the WRITE half): one distributed aggregate →
    Puffin file under metadata/ → statistics entry → iceberg_ndv
    reads back the exact distinct counts — and the estimator
    consumes them without its own distinct pass."""
    from census_asc5_data_pipeline_spark.operators.relational import (
        join_size_estimate,
    )

    t = str(tmp_path / "t")
    _mk_table(spark, t, n=200)  # k has 10 distincts, id 200
    ice.analyze_iceberg_ndv(spark, t, exact=True)
    ndv = ice.iceberg_ndv(t)
    assert ndv == {"id": 200, "k": 10}
    # the stats file lives under metadata/ and is a valid Puffin
    _v, meta = ice._current_metadata(t)
    sp = meta["statistics"][0]["statistics-path"]
    assert os.path.dirname(sp).endswith("metadata")
    ids = _field_ids(t)
    assert puffin.puffin_ndv(sp) == {ids["id"]: 200, ids["k"]: 10}
    b = spark.range(40).select((F.col("id") % 10).alias("k"))
    est = join_size_estimate(
        ice.read_iceberg(spark, t), b, "k", ndv_a=ndv["k"], top_k=4
    )
    assert est["d_a"] == 10
    # column subset + approx path still lands in sane bounds
    ice.write_iceberg(
        spark.range(200, 210)
        .coalesce(1)
        .select(F.col("id"), (F.col("id") % 10).alias("k")),
        t,
    )
    ice.analyze_iceberg_ndv(spark, t, columns=["k"])
    ndv2 = ice.iceberg_ndv(t)
    assert set(ndv2) == {"k"}  # fresh entry replaces; only k analyzed
    assert 9 <= ndv2["k"] <= 11  # HLL++ rsd 0.02 on 10 distincts


def test_analyze_unknown_column_refuses(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_table(spark, t, n=10)
    with pytest.raises(ValueError, match="not in the table schema"):
        ice.analyze_iceberg_ndv(spark, t, columns=["nope"])


def test_call_compute_table_stats_sql(spark, tmp_path):
    """The Spark-Iceberg procedure spelling routes analyze (r15)."""
    from census_asc5_data_pipeline_spark.sources.merge import dml_sql

    t = str(tmp_path / "t")
    _mk_table(spark, t, n=60)
    cat = {"it": ("iceberg", t)}
    dml_sql(spark, "CALL system.compute_table_stats(it, 'k')", cat)
    ndv = ice.iceberg_ndv(t)
    assert set(ndv) == {"k"}
    assert 9 <= ndv["k"] <= 11


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _blob = st.tuples(
        st.binary(min_size=0, max_size=64),
        st.fixed_dictionaries(
            {
                "type": st.sampled_from(
                    [
                        "apache-datasketches-theta-v1",
                        "census-asc5-ndv-v1",
                        "some-unknown-stat",
                    ]
                ),
                "fields": st.lists(
                    st.integers(min_value=1, max_value=50),
                    min_size=1,
                    max_size=3,
                ),
                "snapshot-id": st.integers(min_value=1, max_value=99),
                "sequence-number": st.integers(min_value=1, max_value=99),
                "properties": st.one_of(
                    st.just({}),
                    st.fixed_dictionaries(
                        {
                            "ndv": st.integers(
                                min_value=0, max_value=10**12
                            ).map(str)
                        }
                    ),
                ),
            }
        ),
    )

    @settings(max_examples=200, deadline=None)
    @given(blobs=st.lists(_blob, min_size=0, max_size=6))
    def test_puffin_codec_round_trip_property(blobs, tmp_path_factory):
        """Property (r15): write_puffin → read_puffin_footer /
        read_puffin_blob is the identity on arbitrary blob payloads +
        metadata, and puffin_ndv returns exactly the single-field ndv
        blobs of the consumable types."""
        import uuid as _uuid

        p = str(
            tmp_path_factory.mktemp("puffin") / f"{_uuid.uuid4().hex}.puf"
        )
        meta = puffin.write_puffin(p, blobs, properties={"p": "1"})
        footer = puffin.read_puffin_footer(p)
        assert footer["properties"] == {"p": "1"}
        assert len(footer["blobs"]) == len(blobs)
        for (payload, bm), out in zip(blobs, footer["blobs"]):
            for k, v in bm.items():
                assert out[k] == v, k
            assert out["length"] == len(payload)
        for (payload, _bm), m in zip(blobs, meta):
            assert puffin.read_puffin_blob(p, m) == payload
        want = {
            int(bm["fields"][0]): int(bm["properties"]["ndv"])
            for _pl, bm in blobs
            if bm["type"] in puffin.NDV_BLOB_TYPES
            and len(bm["fields"]) == 1
            and bm["properties"].get("ndv") is not None
        }
        # duplicate field ids: the LAST blob wins, in both the
        # expectation comprehension and puffin_ndv's fold
        assert puffin.puffin_ndv(p) == want


def test_puffin_footer_size_and_statistics_stamp(spark, tmp_path):
    """r15 ADVICE: the statistics entry carries the spec-required
    file-footer-size-in-bytes, derived from the Puffin framing."""
    p = str(tmp_path / "stats.puffin")
    puffin.write_puffin(
        p,
        [
            (
                b"sk",
                {
                    "type": "census-asc5-ndv-v1",
                    "fields": [1],
                    "snapshot-id": 1,
                    "sequence-number": 1,
                    "properties": {"ndv": "9"},
                },
            )
        ],
    )
    fsz = puffin.puffin_footer_size(p)
    # footer = magic(4) + payload + size(4) + flags(4) + magic(4):
    # reading the last fsz bytes must start exactly at the footer magic
    total = os.path.getsize(p)
    with open(p, "rb") as fh:
        fh.seek(total - fsz)
        assert fh.read(4) == puffin.MAGIC
    t = str(tmp_path / "t")
    ice.write_iceberg(
        spark.range(3).select(F.col("id"), (F.col("id") % 2).alias("k")),
        t,
    )
    ice.attach_statistics(t, p)
    _v, meta = ice._current_metadata(t)
    entry = meta["statistics"][0]
    assert entry["file-footer-size-in-bytes"] == fsz
    assert entry["file-size-in-bytes"] == total


def test_puffin_payload_size_cannot_alias_head_magic(tmp_path):
    """r15 ADVICE: payload_size == size-16 used to pass the bounds
    check and read the HEAD magic as the footer magic; now the full
    20 framing bytes are required, refusing before json.loads."""
    import struct

    p = str(tmp_path / "evil.puffin")
    # size = payload_size + 16 exactly: head magic + payload + 12-byte
    # tail, NO footer magic — the footer-magic seek lands at offset 0
    # where the HEAD magic sits, so the old <= size-16 bound accepted
    # this malformed file (valid JSON would even parse silently)
    payload = b'{"blobs": []}'
    with open(p, "wb") as fh:
        fh.write(puffin.MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(struct.pack("<I", 0))
        fh.write(puffin.MAGIC)
    assert os.path.getsize(p) == len(payload) + 16
    with pytest.raises(ValueError, match="inconsistent"):
        puffin.read_puffin_footer(p)


def _theta_blob(
    pre_longs: int,
    flags: int,
    cur_count: int = 0,
    theta_frac: float = 1.0,
    n_hashes: int = 0,
) -> bytes:
    """Spec-conformant compact theta sketch bytes (serial version 3,
    family 3, little-endian) — what a foreign DataSketches ANALYZE
    serializes."""
    import struct as _st

    out = bytes([pre_longs, 3, 3, 12, 13, flags]) + _st.pack(
        "<H", 0x93CC
    )
    if pre_longs >= 2:
        out += _st.pack("<i", cur_count) + _st.pack("<f", 1.0)
    if pre_longs >= 3:
        out += _st.pack("<q", int(((1 << 63) - 1) * theta_frac))
    for i in range(n_hashes):
        out += _st.pack("<q", 1000 + i)
    return out


def test_theta_sketch_decode(spark):
    """r16 (r15 verdict #6): real theta decode — empty, single-item,
    exact and estimation layouts; loud refusal on foreign framing."""
    # READ_ONLY|COMPACT|ORDERED = 0x1A; +EMPTY = 0x1E
    assert puffin.theta_ndv(_theta_blob(1, 0x1E)) == 0
    assert puffin.theta_ndv(_theta_blob(1, 0x1A, n_hashes=1)) == 1
    assert puffin.theta_ndv(_theta_blob(2, 0x1A, cur_count=42)) == 42
    est = puffin.theta_ndv(
        _theta_blob(3, 0x1A, cur_count=500, theta_frac=0.5, n_hashes=500)
    )
    assert est == 1000
    with pytest.raises(ValueError, match="serial version"):
        puffin.theta_ndv(bytes([3, 2, 3, 0, 0, 0x1A, 0, 0]))
    with pytest.raises(ValueError, match="family"):
        puffin.theta_ndv(bytes([3, 3, 5, 0, 0, 0x1A, 0, 0]))
    with pytest.raises(ValueError, match="big-endian"):
        puffin.theta_ndv(bytes([3, 3, 3, 0, 0, 0x1B, 0, 0]))


def test_puffin_ndv_decodes_theta_without_property(spark, tmp_path):
    """A foreign statistics file whose theta blob OMITS the ndv
    property still yields an estimate — decoded from the sketch
    bytes — and join_preflight's catalog consumes it."""
    p = str(tmp_path / "stats.puffin")
    payload = _theta_blob(
        3, 0x1A, cur_count=250, theta_frac=0.25, n_hashes=250
    )
    puffin.write_puffin(
        p,
        [
            (
                payload,
                {
                    "type": "apache-datasketches-theta-v1",
                    "fields": [1],
                    "snapshot-id": 1,
                    "sequence-number": 1,
                    # NO ndv property — the spec requires it, but
                    # the decode covers writers that skip it
                    "properties": {},
                },
            )
        ],
    )
    assert puffin.puffin_ndv(p) == {1: 1000}
    t = str(tmp_path / "t")
    ice.write_iceberg(
        spark.range(5).coalesce(1).select(F.col("id"),
                                          (F.col("id") % 2).alias("k")),
        t,
    )
    ice.attach_statistics(t, p)
    assert ice.iceberg_ndv(t) == {"id": 1000}
