"""Delta CLONE (r13 — delta-spark's CREATE TABLE … [SHALLOW|DEEP]
CLONE): shallow = metadata-only v0 referencing the source's files by
ABSOLUTE path (the spec's other allowed add-path form), deep = file
copies with relative paths. Clones are independent tables: their DML
commits new files under the clone, the source never changes, and
vacuum on the clone cannot touch the source's files."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import dml_sql

SF_SMALL = "/root/testdata/sf0.001"


def _parquet_files(root):
    return [
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        if "_delta_log" not in p
    ]


@pytest.fixture()
def src_table(spark, tmp_path):
    src = str(tmp_path / "src")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").limit(500)
    d.write_delta(orders.repartition(4, "o_orderkey"), src)
    return src, orders


def test_shallow_clone_is_metadata_only(spark, tmp_path, src_table):
    src, _orders = src_table
    dst = str(tmp_path / "clone")
    assert d.clone_delta(spark, src, dst, shallow=True) == 0
    assert _parquet_files(dst) == []  # zero data bytes copied
    assert (
        d.read_delta(spark, dst).count()
        == d.read_delta(spark, src).count()
        == 500
    )
    # a NEW table id, same schema
    _p, smeta, _a, _t = d._replay(spark, src, None)
    _p, cmeta, adds, _t = d._replay(spark, dst, None)
    assert cmeta["id"] != smeta["id"]
    assert cmeta["schemaString"] == smeta["schemaString"]
    # add paths are absolute into the source
    assert all(
        os.path.isabs(
            __import__("urllib.parse", fromlist=["unquote"]).unquote(
                a["path"]
            )
        )
        for a in adds.values()
    )


def test_shallow_clone_writes_are_isolated(spark, tmp_path, src_table):
    src, orders = src_table
    dst = str(tmp_path / "clone")
    d.clone_delta(spark, src, dst)
    d.write_delta(orders.limit(10).coalesce(1), dst)
    d.delete_delta_where(spark, dst, "o_orderkey % 2 = 0")
    assert d.read_delta(spark, src).count() == 500  # source untouched
    # and source-side commits don't appear in the clone
    d.write_delta(orders.limit(5).coalesce(1), src)
    assert d.read_delta(spark, src).count() == 505
    assert d.read_delta(spark, dst).count() < 510


def test_shallow_clone_converts_dvs_to_absolute(spark, tmp_path, src_table):
    src, _orders = src_table
    d.delete_delta_where(spark, src, "o_orderkey % 7 = 0", mode="dv")
    expect = d.read_delta(spark, src).count()
    dst = str(tmp_path / "clone")
    d.clone_delta(spark, src, dst)
    _p, _m, adds, _t = d._replay(spark, dst, None)
    dvs = [a["deletionVector"] for a in adds.values() if a.get("deletionVector")]
    assert dvs and all(dv["storageType"] == "p" for dv in dvs)
    assert d.read_delta(spark, dst).count() == expect


def test_clone_keeps_stats_for_skipping(spark, tmp_path, src_table):
    from census_asc5_data_pipeline_spark.sources import delta_stats as ds
    from pyspark.sql import types as T

    src, orders = src_table
    dst = str(tmp_path / "clone")
    d.clone_delta(spark, src, dst)
    _p, meta, adds, _t = d._replay(spark, dst, None)
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    key = orders.agg(F.max("o_orderkey")).first()[0]
    kept = ds.skip_files(
        list(adds.values()),
        ds.parse_skip_predicate(f"o_orderkey = {key}"),
        schema,
        [],
        None,
    )
    assert 1 <= len(kept) < len(adds)


def test_vacuum_on_clone_spares_source(spark, tmp_path, src_table):
    src, orders = src_table
    dst = str(tmp_path / "clone")
    d.clone_delta(spark, src, dst)
    before = set(_parquet_files(src))
    # churn the clone so vacuum has something to consider
    d.write_delta(orders.limit(10).coalesce(1), dst, mode="overwrite")
    d.write_delta(orders.limit(10).coalesce(1), dst, mode="overwrite")
    d.write_delta(orders.limit(10).coalesce(1), dst, mode="overwrite")
    d.create_checkpoint(spark, dst)
    d.vacuum_delta(spark, dst, keep_versions=1)
    assert set(_parquet_files(src)) == before
    assert d.read_delta(spark, src).count() == 500


def test_deep_clone_is_self_contained(spark, tmp_path, src_table):
    src, _orders = src_table
    dst = str(tmp_path / "deep")
    d.clone_delta(spark, src, dst, shallow=False)
    assert len(_parquet_files(dst)) > 0
    shutil.rmtree(src)  # the source disappears entirely
    assert d.read_delta(spark, dst).count() == 500


def test_clone_as_of_version(spark, tmp_path, src_table):
    src, orders = src_table
    d.delete_delta_where(spark, src, "o_orderkey % 2 = 0")
    dst0 = str(tmp_path / "v0")
    dstN = str(tmp_path / "vN")
    d.clone_delta(spark, src, dst0, version=0)
    d.clone_delta(spark, src, dstN)
    assert d.read_delta(spark, dst0).count() == 500
    assert (
        d.read_delta(spark, dstN).count()
        == d.read_delta(spark, src).count()
    )


def test_clone_sql_surface(spark, tmp_path, src_table):
    src, _orders = src_table
    dst = str(tmp_path / "sqlclone")
    cat = {"s": ("delta", src)}
    v = dml_sql(
        spark, f"CREATE TABLE c SHALLOW CLONE s LOCATION '{dst}'", cat
    )
    assert v == 0 and cat["c"] == ("delta", dst)
    assert d.read_delta(spark, dst).count() == 500
    # existing target refuses without IF NOT EXISTS, no-ops with it
    with pytest.raises(ValueError, match="already exists"):
        dml_sql(
            spark,
            f"CREATE TABLE c2 SHALLOW CLONE s LOCATION '{dst}'",
            cat,
        )
    assert (
        dml_sql(
            spark,
            "CREATE TABLE IF NOT EXISTS c2 SHALLOW CLONE s "
            f"LOCATION '{dst}'",
            cat,
        )
        is None
    )
    assert cat["c2"] == ("delta", dst)
    deep = str(tmp_path / "sqldeep")
    dml_sql(
        spark,
        f"CREATE TABLE dc DEEP CLONE s VERSION AS OF 0 LOCATION '{deep}'",
        cat,
    )
    assert len(_parquet_files(deep)) > 0


def test_shallow_clone_streams_as_source(spark, tmp_path, src_table):
    """The absolute-path adds resolve in the streaming source too."""
    src, _orders = src_table
    dst = str(tmp_path / "streamclone")
    d.clone_delta(spark, src, dst)
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
    )

    delta_stream_source.register(spark)
    q = (
        spark.readStream.format("delta_tail")
        .option("path", dst)
        .load()
        .writeStream.format("memory")
        .queryName("clone_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT COUNT(*) c FROM clone_stream").first().c == 500


def test_deep_clone_disambiguates_basename_collisions(spark, tmp_path):
    """r13 ADVICE (low): two absolute-path adds sharing a basename
    (e.g. deep-cloning a table that shallow-cloned several sources)
    must not overwrite each other at the destination."""
    a_dir = str(tmp_path / "src_a")
    b_dir = str(tmp_path / "src_b")
    spark.createDataFrame([(1, "a")], "k long, v string").coalesce(
        1
    ).write.parquet(a_dir)
    spark.createDataFrame([(2, "b")], "k long, v string").coalesce(
        1
    ).write.parquet(b_dir)
    # same basename, different directories + contents
    fa = os.path.join(a_dir, "part-clash.parquet")
    fb = os.path.join(b_dir, "part-clash.parquet")
    os.rename(_parquet_files(a_dir)[0], fa)
    os.rename(_parquet_files(b_dir)[0], fb)
    # a table whose log references both by ABSOLUTE path
    t = str(tmp_path / "t")
    seed = spark.createDataFrame([(0, "z")], "k long, v string")
    d.write_delta(seed.coalesce(1), t)
    import time as _time
    import urllib.parse as _up

    lines = [
        {
            "commitInfo": {
                "timestamp": int(_time.time() * 1000),
                "operation": "WRITE",
            }
        },
    ]
    for fp in (fa, fb):
        lines.append(
            {
                "add": {
                    "path": _up.quote(os.path.abspath(fp)),
                    "partitionValues": {},
                    "size": os.path.getsize(fp),
                    "modificationTime": int(os.path.getmtime(fp) * 1000),
                    "dataChange": True,
                }
            }
        )
    d._put_if_absent_commit(t, 1, lines)
    assert sorted(r.k for r in d.read_delta(spark, t).collect()) == [0, 1, 2]
    dst = str(tmp_path / "deep")
    d.clone_delta(spark, t, dst, shallow=False)
    # every row survives the copy — no silent overwrite
    assert sorted(r.k for r in d.read_delta(spark, dst).collect()) == [
        0,
        1,
        2,
    ]
    assert len(_parquet_files(dst)) == 3
