"""Iceberg manifest column metrics + bounds-based scan pruning
(r13 — iceberg_bounds, the delta_stats twin).

Writers stamp value_counts / null_value_counts / lower_bounds /
upper_bounds (Appendix-D binary, keyed by field id, k/v-array avro
map form) on every data_file entry; ``read_iceberg(predicate=)``
prunes files whose bounds prove no match and still applies the full
predicate row-wise."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.sources import delta_stats as dsk
from census_asc5_data_pipeline_spark.sources import iceberg_bounds as ib
from census_asc5_data_pipeline_spark.sources import iceberg_io as ice

SF_SMALL = "/root/testdata/sf0.001"


def _files(spark, path, **kw):
    _v, meta = ice._current_metadata(path)
    data, dels = ice._snapshot_files(path, meta, None, spark=spark)
    _s, fields = ice._schema_of(meta)
    return meta, fields, data, dels


@pytest.fixture()
def orders_table(spark, tmp_path):
    path = str(tmp_path / "orders_ice")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    ice.write_iceberg(orders.repartition(8, "o_orderkey"), path)
    return path, orders


def test_roundtrip_every_bound_type():
    cases = [
        ("boolean", True),
        ("boolean", False),
        ("int", -42),
        ("long", 1 << 40),
        ("float", 1.5),
        ("double", -2.25),
        ("date", dt.date(2020, 2, 29)),
        ("timestamp", dt.datetime(2021, 4, 8, 9, 34, 9, 123456)),
        ("string", "héllo"),
    ]
    for t, v in cases:
        b = ib.encode_bound(t, v)
        assert b is not None, t
        assert ib.decode_bound(t, b) == v, t
    # fixed widths per Appendix D
    assert len(ib.encode_bound("int", 7)) == 4
    assert len(ib.encode_bound("long", 7)) == 8
    assert len(ib.encode_bound("date", dt.date(1970, 1, 2))) == 4
    # tz-aware timestamps normalize to UTC
    aware = dt.datetime(2021, 1, 1, 12, tzinfo=dt.timezone.utc)
    assert ib.decode_bound(
        "timestamptz", ib.encode_bound("timestamptz", aware)
    ) == dt.datetime(2021, 1, 1, 12)
    # unsupported types stay unbounded, never raise
    assert ib.encode_bound("decimal(10,2)", 1) is None


def test_writer_stamps_metrics(spark, orders_table):
    path, _orders = orders_table
    _meta, fields, data, _dels = _files(spark, path)
    assert len(data) == 8
    for d in data:
        iv = ib.file_intervals(d, fields)
        lo, hi, nc, vc = iv["o_orderkey"]
        assert lo <= hi and nc == 0 and vc == d["record_count"]
        assert isinstance(iv["o_orderstatus"][0], str)


def test_point_lookup_prunes_and_matches(spark, orders_table):
    path, orders = orders_table
    meta, fields, data, _dels = _files(spark, path)
    key = orders.select(F.max("o_orderkey")).first()[0]
    pred = f"o_orderkey = {key}"
    kept = ice._skip_by_bounds(
        data, dsk.parse_skip_predicate(pred), fields, meta
    )
    assert 1 <= len(kept) < len(data)
    assert (
        ice.read_iceberg(spark, path, predicate=pred).count()
        == orders.filter(pred).count()
        == 1
    )


@pytest.mark.parametrize(
    "pred",
    [
        "o_totalprice BETWEEN 1000 AND 2000",
        "o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey < 500",
        "o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'",
        "o_orderkey < 0",
    ],
)
def test_predicates_exact(spark, orders_table, pred):
    path, orders = orders_table
    got = ice.read_iceberg(spark, path, predicate=pred).count()
    assert got == orders.filter(pred).count()


def test_identity_partition_folds_into_same_predicate(spark, tmp_path):
    path = str(tmp_path / "parted")
    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("long").alias("g"),
    )
    ice.write_iceberg(df, path, partition_by=["g"])
    meta, fields, data, _dels = _files(spark, path)
    assert len(data) >= 3
    kept = ice._skip_by_bounds(
        data, dsk.parse_skip_predicate("g = 1 AND k <= 10"), fields, meta
    )
    assert all(d["partition"]["g"] == 1 for d in kept)
    got = ice.read_iceberg(spark, path, predicate="g = 1 AND k <= 10")
    assert sorted(r["k"] for r in got.collect()) == [1, 4, 7, 10]


def test_null_counts_prune(spark, tmp_path):
    path = str(tmp_path / "nulls")
    full = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, v string"
    ).coalesce(1)
    ice.write_iceberg(full, path)
    allnull = spark.createDataFrame(
        [(i, None) for i in range(10, 20)], "k long, v string"
    ).coalesce(1)
    ice.write_iceberg(allnull, path, mode="append")
    meta, fields, data, _dels = _files(spark, path)
    assert len(data) == 2
    kept = ice._skip_by_bounds(
        data, dsk.parse_skip_predicate("v IS NULL"), fields, meta
    )
    assert len(kept) == 1
    kept = ice._skip_by_bounds(
        data, dsk.parse_skip_predicate("v = 'v3'"), fields, meta
    )
    assert len(kept) == 1
    assert ice.read_iceberg(spark, path, predicate="v IS NULL").count() == 10


def test_rewrite_preserves_and_stamps_bounds(spark, tmp_path):
    path = str(tmp_path / "compact")
    for lo in (0, 100, 200):
        ice.write_iceberg(
            spark.range(lo, lo + 100)
            .select(F.col("id").alias("k"))
            .coalesce(1),
            path,
            mode="append" if lo else "append",
        )
    res = ice.rewrite_data_files(spark, path, target_file_bytes=1 << 30)
    assert res["snapshot_id"] is not None
    meta, fields, data, _dels = _files(spark, path)
    for d in data:
        iv = ib.file_intervals(d, fields)
        assert "k" in iv and iv["k"][0] is not None
    kept = ice._skip_by_bounds(
        data, dsk.parse_skip_predicate("k = 5"), fields, meta
    )
    # post-compaction there may be a single file; pruning must still
    # evaluate (and the read must stay exact)
    assert len(kept) >= 1
    assert ice.read_iceberg(spark, path, predicate="k = 5").count() == 1


def test_mor_merge_files_carry_bounds(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.merge import merge_into

    path = str(tmp_path / "mor")
    ice.write_iceberg(
        spark.createDataFrame(
            [(i, 0) for i in range(100)], "k long, v int"
        ).coalesce(1),
        path,
    )
    src = spark.createDataFrame(
        [(5, 99), (200, 1)], "k long, v int"
    )
    merge_into(
        spark,
        "iceberg",
        path,
        src,
        on="t.k = s.k",
        matched=[("update", None, {"v": "s.v"})],
        not_matched={"k": "s.k", "v": "s.v"},
    )
    meta, fields, data, dels = _files(spark, path)
    # every content=0 data file written by the merge carries bounds
    for d in data:
        assert d.get("lower_bounds"), d["file_path"]
    # skipping composes with merge-on-read deletes: the stale k=5 row
    # is anti-joined out, the updated one survives
    got = ice.read_iceberg(spark, path, predicate="k = 5")
    assert [(r["k"], r["v"]) for r in got.collect()] == [(5, 99)]
    got = ice.read_iceberg(spark, path, predicate="k = 200")
    assert [(r["k"], r["v"]) for r in got.collect()] == [(200, 1)]


def test_update_where_prunes_candidates(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.merge import update_where

    path = str(tmp_path / "upd")
    ice.write_iceberg(
        spark.createDataFrame(
            [(i, 0) for i in range(1000)], "k long, v int"
        ).repartition(10, "k"),
        path,
    )
    # provably-matchless UPDATE: no snapshot committed
    v0 = ice._current_metadata(path)[0]
    assert update_where(spark, "iceberg", path, "k = -1", {"v": "1"}) is None
    assert ice._current_metadata(path)[0] == v0
    v = update_where(spark, "iceberg", path, "k = 17", {"v": "99"})
    assert v is not None
    out = ice.read_iceberg(spark, path)
    assert out.filter("v = 99").count() == 1
    assert out.count() == 1000


def test_kv_map_accepts_foreign_shapes():
    assert ib.kv_map([{"key": 1, "value": b"x"}]) == {1: b"x"}
    assert ib.kv_map({1: b"x"}) == {1: b"x"}
    assert ib.kv_map({"2": b"y"}) == {2: b"y"}
    assert ib.kv_map(None) == {}
    assert ib.kv_map("garbage") == {}


def test_boundless_entries_never_skip(spark, orders_table):
    path, _orders = orders_table
    meta, fields, data, _dels = _files(spark, path)
    stripped = [
        {
            k: v
            for k, v in d.items()
            if k
            not in (
                "value_counts",
                "null_value_counts",
                "lower_bounds",
                "upper_bounds",
            )
        }
        for d in data
    ]
    kept = ice._skip_by_bounds(
        stripped, dsk.parse_skip_predicate("o_orderkey = 1"), fields, meta
    )
    assert len(kept) == len(stripped)


def test_manifest_avro_roundtrip_is_spec_shaped(spark, orders_table):
    """The k/v-array map encoding survives our own avro codec: read
    the manifest back generically and check the raw entry shape."""
    from census_asc5_data_pipeline_spark.sources.avro_io import (
        read_container_generic,
    )

    path, _orders = orders_table
    _v, meta = ice._current_metadata(path)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _s, manifests = read_container_generic(ice._local(snap["manifest-list"]))
    _s2, entries = read_container_generic(
        ice._local(manifests[0]["manifest_path"])
    )
    d = entries[0]["data_file"]
    lb = d["lower_bounds"]
    assert isinstance(lb, list) and {"key", "value"} <= set(lb[0])
    assert isinstance(lb[0]["value"], (bytes, bytearray))
