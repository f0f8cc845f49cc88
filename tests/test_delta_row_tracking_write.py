"""Delta ``rowTracking`` WRITE (r16, r15 verdict #2 — PROTOCOL.md
§Row Tracking writer requirements): creation-time enablement,
backfill of existing tables, fresh contiguous baseRowId assignment on
every add-creating verb with the ``delta.rowTracking`` high-water
mark advanced in the same commit, and STABLE-id preservation across
rewrites (OPTIMIZE / CoW DELETE / UPDATE / MERGE) through the
materialized row-id/commit-version columns. Foreign-log acceptance
pins live in test_delta_row_tracking.py."""
from __future__ import annotations

import json
import os

import pytest
import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import (
    merge_into,
    update_where,
)


def _mk(spark, path: str, n: int = 6):
    d.write_delta(
        spark.range(n)
        .coalesce(1)
        .select(F.col("id"), (F.col("id") * 10).alias("v")),
        path,
        configuration={"delta.enableRowTracking": "true"},
    )


def _ids(spark, path: str) -> dict:
    return {
        r.id: (r._row_id, r._row_commit_version)
        for r in d.read_delta(spark, path, row_tracking=True).collect()
    }


def test_creation_enables_and_assigns(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    proto, meta, adds, _tx = d._replay(spark, p, None)
    assert {"rowTracking", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    conf = meta["configuration"]
    assert conf["delta.rowTracking.materializedRowIdColumnName"]
    assert conf[
        "delta.rowTracking.materializedRowCommitVersionColumnName"
    ]
    assert all(a.get("baseRowId") is not None for a in adds.values())
    assert all(
        a.get("defaultRowCommitVersion") == 0 for a in adds.values()
    )
    got = _ids(spark, p)
    assert sorted(rid for rid, _cv in got.values()) == list(range(6))
    assert all(cv == 0 for _rid, cv in got.values())
    doms = d.replay_domains(spark, p)
    assert json.loads(doms["delta.rowTracking"]) == {
        "rowIdHighWaterMark": 5
    }


def test_append_and_overwrite_take_fresh_ids(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    d.write_delta(
        spark.range(100, 103)
        .coalesce(1)
        .select(F.col("id"), F.lit(0).cast("bigint").alias("v")),
        p,
    )
    got = _ids(spark, p)
    assert sorted(r for r, _ in got.values()) == list(range(9))
    assert {got[100][0], got[101][0], got[102][0]} == {6, 7, 8}
    assert got[100][1] == 1  # the append's commit version
    # overwrite: old rows retire, new rows get ids ABOVE the hwm —
    # a retired id is never reused (the spec's uniqueness guarantee)
    d.write_delta(
        spark.range(2)
        .coalesce(1)
        .select(F.col("id"), F.lit(1).cast("bigint").alias("v")),
        p,
        mode="overwrite",
    )
    got2 = _ids(spark, p)
    assert sorted(r for r, _ in got2.values()) == [9, 10]
    doms = d.replay_domains(spark, p)
    assert json.loads(doms["delta.rowTracking"]) == {
        "rowIdHighWaterMark": 10
    }


def test_backfill_enable_row_tracking(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(4).coalesce(1).select(F.col("id")), p
    )
    d.write_delta(
        spark.range(4, 6).coalesce(1).select(F.col("id")), p
    )
    # the property flip alone refuses — enablement is a backfill
    with pytest.raises(ValueError, match="enable_row_tracking"):
        d.set_delta_properties(
            spark, p, {"delta.enableRowTracking": "true"}
        )
    v = d.enable_row_tracking(spark, p)
    got = {
        r.id: r._row_id
        for r in d.read_delta(spark, p, row_tracking=True).collect()
    }
    assert sorted(got.values()) == list(range(6))
    # pure metadata assignment: the change feed is silent
    feed, _ = d.read_delta_changes(spark, p, since_version=v - 1)
    assert feed.filter(F.col("_commit_version") == v).count() == 0
    # idempotent
    assert d.enable_row_tracking(spark, p) == v
    # later appends continue above the backfilled hwm
    d.write_delta(spark.range(6, 7).coalesce(1).select(F.col("id")), p)
    got2 = {
        r.id: r._row_id
        for r in d.read_delta(spark, p, row_tracking=True).collect()
    }
    assert got2[6] == 6 and all(got2[k] == got[k] for k in got)


def test_optimize_preserves_stable_ids(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(8)
        .repartition(4)
        .select(F.col("id"), (F.col("id") % 2).alias("v")),
        p,
        configuration={"delta.enableRowTracking": "true"},
    )
    before = _ids(spark, p)
    res = d.optimize_delta(spark, p, target_file_bytes=1 << 30)
    assert res["version"] is not None and res["files_after"] == 1
    after = _ids(spark, p)
    assert after == before  # ids AND original commit versions
    # the rewritten file also carries a fresh baseRowId (spec: every
    # add gets one) and the hwm advanced past it
    _pr, _m, adds, _t = d._replay(spark, p, None)
    (a,) = adds.values()
    assert a["baseRowId"] == 8
    doms = d.replay_domains(spark, p)
    assert (
        json.loads(doms["delta.rowTracking"])["rowIdHighWaterMark"]
        == 15
    )
    # ZORDER recluster preserves too
    d.optimize_delta(spark, p, target_file_bytes=200, zorder_by=["id"])
    assert _ids(spark, p) == before


def test_cow_and_dv_delete_preserve_and_take_row_id_predicates(
    spark, tmp_path
):
    p = str(tmp_path / "t")
    _mk(spark, p, n=8)
    before = _ids(spark, p)
    target = before[3][0]
    d.delete_delta_where(spark, p, f"_row_id = {target}", mode="cow")
    after = _ids(spark, p)
    assert 3 not in after
    assert all(after[k] == before[k] for k in after)
    d.delete_delta_where(spark, p, "id = 4", mode="dv")
    after2 = _ids(spark, p)
    assert 4 not in after2
    assert all(after2[k] == before[k] for k in after2)


def test_update_preserves_ids_resets_cv_on_updated_only(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    before = _ids(spark, p)
    v = update_where(
        spark, "delta", p, "id >= 4", {"v": "v + 1"}, mode="cow"
    )
    after = _ids(spark, p)
    assert all(after[k][0] == before[k][0] for k in after)
    assert after[4][1] == v and after[5][1] == v
    assert after[0][1] == before[0][1]  # copied rows keep theirs
    # dv-mode UPDATE: post-images keep ids too
    v2 = update_where(
        spark, "delta", p, "id = 0", {"v": "v + 100"}, mode="dv"
    )
    after2 = _ids(spark, p)
    assert after2[0] == (before[0][0], v2)


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_merge_joins_on_row_id_and_preserves(spark, tmp_path, mode):
    p = str(tmp_path / "t")
    _mk(spark, p)
    before = _ids(spark, p)
    src = spark.createDataFrame(
        [(before[2][0], 999), (777, 555)], "rid long, nv long"
    )
    v = merge_into(
        spark,
        "delta",
        p,
        src,
        "t._row_id = s.rid",
        matched=[("update", None, {"v": "s.nv"})],
        not_matched={"id": "s.rid", "v": "s.nv"},
        mode=mode,
    )
    after = {
        r.id: (r.v, r._row_id, r._row_commit_version)
        for r in d.read_delta(spark, p, row_tracking=True).collect()
    }
    assert after[2] == (999, before[2][0], v)  # stable id, new cv
    assert after[0][1] == before[0][0]
    assert after[0][2] == before[0][1]  # copied rows keep their cv
    fresh = after[777][1]
    assert fresh not in {rid for rid, _cv in before.values()}
    assert after[777][2] == v


def test_checkpoint_round_trips_engine_tracking_state(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    d.write_delta(
        spark.range(100, 102)
        .coalesce(1)
        .select(F.col("id"), F.lit(0).cast("bigint").alias("v")),
        p,
    )
    before = _ids(spark, p)
    cv = d.create_checkpoint(spark, p)
    for v in range(cv + 1):
        f = os.path.join(p, "_delta_log", f"{v:020d}.json")
        if os.path.exists(f):
            os.remove(f)
    assert _ids(spark, p) == before
    doms = d.replay_domains(spark, p)
    assert (
        json.loads(doms["delta.rowTracking"])["rowIdHighWaterMark"]
        == 7
    )
    # and the chain continues above the checkpointed hwm
    d.write_delta(
        spark.range(200, 201)
        .coalesce(1)
        .select(F.col("id"), F.lit(0).cast("bigint").alias("v")),
        p,
    )
    got = _ids(spark, p)
    assert got[200][0] == 8
