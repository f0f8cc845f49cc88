"""Distributed checkpoint WRITE (r14 — the write half of the
metadata plane): above the threshold, ``create_checkpoint`` compacts
prior-checkpoint + JSON tail into a classic MULTIPART checkpoint
with the add rows streaming parquet→parquet (never driver dicts);
protocol/metaData/txn rows ride along. Equality is pinned against
the driver-written checkpoint on twin tables; stats, DVs and txn
fences survive; vacuum and chained checkpoints keep working."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d


@pytest.fixture()
def force(monkeypatch):
    monkeypatch.setattr(d, "_SPARK_PRUNE_THRESHOLD", 0)


def _build(spark, path):
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(400)],
        "k long, g int, v double",
    )
    d.write_delta(df.repartition(4, "k"), path)
    d.create_checkpoint(spark, path)  # prior checkpoint (classic)
    d.delete_delta_where(spark, path, "k BETWEEN 10 AND 20", mode="dv")
    d.write_delta(
        spark.createDataFrame([(1000, 9, 9.0)], "k long, g int, v double"),
        path,
        txn=("fence_app", 7),
    )


def test_multipart_checkpoint_equals_driver(spark, tmp_path, force):
    a = str(tmp_path / "a")  # distributed multipart
    b = str(tmp_path / "b")  # driver classic
    _build(spark, a)
    d.create_checkpoint(spark, a)
    va = max(d.delta_versions(a))
    kind, files = d._resolve_checkpoint(a, va)
    assert kind == "multipart" and len(files) >= 1
    d._SPARK_PRUNE_THRESHOLD = 1 << 60
    try:
        _build(spark, b)
        d.create_checkpoint(spark, b)
        assert d._resolve_checkpoint(b, max(d.delta_versions(b)))[0] == (
            "classic"
        )
    finally:
        d._SPARK_PRUNE_THRESHOLD = 0
    pa_, ma, adds_a, ta = d._replay(spark, a, None)
    pb_, mb, adds_b, tb = d._replay(spark, b, None)
    assert pa_ == pb_

    def _canon(adds):
        out = {}
        for p, x in adds.items():
            y = {k: v for k, v in x.items() if v is not None}
            y.pop("tags", None)
            out[p] = y
        return out

    # same live set, same stats, same DV descriptors (paths differ
    # only in the random part names each table minted)
    ka = {os.path.basename(p) for p in adds_a}
    kb = {os.path.basename(p) for p in adds_b}
    assert len(ka) == len(adds_a) == len(adds_b)
    assert sorted(
        map(tuple, d.read_delta(spark, a).collect())
    ) == sorted(map(tuple, d.read_delta(spark, b).collect()))
    # txn fence survived the multipart checkpoint
    assert ta.get("fence_app") == 7 == tb.get("fence_app")
    # _last_checkpoint carries parts
    lc = json.load(
        open(os.path.join(a, "_delta_log", "_last_checkpoint"))
    )
    assert lc["version"] == va and lc["parts"] == len(files)
    assert lc["size"] == len(adds_a) + 2 + len(ta)


def test_multipart_reads_after_log_prune(spark, tmp_path, force):
    """The whole point: the JSON below the multipart checkpoint can
    go away and the table still replays (stats intact — data
    skipping still prunes)."""
    path = str(tmp_path / "t")
    _build(spark, path)
    d.create_checkpoint(spark, path)
    vmax = max(d.delta_versions(path))
    for v in d.delta_versions(path):
        if v < vmax:
            os.remove(d._commit_file(path, v))
    got = d.read_delta(spark, path, predicate="k = 1000")
    assert [(r.k, r.g) for r in got.collect()] == [(1000, 9)]
    # DV still applies through the checkpoint round-trip
    assert (
        d.read_delta(spark, path, predicate="k BETWEEN 10 AND 20").count()
        == 0
    )


def test_chained_distributed_checkpoints(spark, tmp_path, force):
    """A second distributed checkpoint compacts FROM the multipart
    one (multipart → multipart)."""
    path = str(tmp_path / "chain")
    _build(spark, path)
    d.create_checkpoint(spark, path)
    assert (
        d._resolve_checkpoint(path, max(d.delta_versions(path)))[0]
        == "multipart"
    )
    d.write_delta(
        spark.createDataFrame([(2000, 1, 2.0)], "k long, g int, v double"),
        path,
    )
    d.delete_delta_where(spark, path, "k = 0", mode="cow")
    d.create_checkpoint(spark, path)
    v = max(d.delta_versions(path))
    assert d._resolve_checkpoint(path, v)[0] == "multipart"
    rows = d.read_delta(spark, path)
    assert rows.where("k = 2000").count() == 1
    assert rows.where("k = 0").count() == 0
    assert rows.count() == 400 - 11 - 1 + 2


def test_vacuum_over_multipart(spark, tmp_path, force):
    path = str(tmp_path / "vac")
    _build(spark, path)
    d.create_checkpoint(spark, path)
    import time

    time.sleep(1.1)
    res = d.vacuum_delta(spark, path, keep_versions=1)
    # dv-mode deletes rewrite nothing, so no data file is unreferenced;
    # the pre-checkpoint JSON prunes and the table stays exact
    assert res["log_files_removed"] >= 1
    assert d.read_delta(spark, path).count() == 400 - 11 + 1


def test_v2_policy_tables_keep_v2_form(spark, tmp_path, force):
    """A table whose checkpointPolicy is v2 must not silently get a
    classic multipart checkpoint from the distributed path."""
    path = str(tmp_path / "v2pol")
    _build(spark, path)
    from census_asc5_data_pipeline_spark.sources.merge import dml_sql

    dml_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES ('delta.checkpointPolicy'='v2')",
        {"t": ("delta", path)},
    )
    d.create_checkpoint(spark, path)
    v = max(d.delta_versions(path))
    assert d._resolve_checkpoint(path, v)[0] == "v2"
    assert d.read_delta(spark, path).count() == 400 - 11 + 1
