"""Delta ``rowTracking`` READ-through (r15 verdict #4).

A hand-written FOREIGN log (the delta-spark 4.x shape: writer-7
feature list with rowTracking + domainMetadata,
delta.enableRowTracking=true, adds carrying baseRowId /
defaultRowCommitVersion, a materialized row-id column on rewritten
files) reads back with ``_row_id`` / ``_row_commit_version``
materialized per PROTOCOL.md §Row Tracking — materialized column
wins, else baseRowId + position. Since r16 foreign tracking logs
also ACCEPT DML (the engine-write pins live in
test_delta_row_tracking_write.py)."""
from __future__ import annotations

import json
import os

import pytest
import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d


def _write_part(spark, table: str, rel: str, df) -> int:
    """Plant df as ONE parquet file at table/rel; returns its size."""
    staging = os.path.join(table, ".stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    src = next(
        f
        for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    dst = os.path.join(table, rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.replace(os.path.join(staging, src), dst)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return os.path.getsize(dst)


_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {},
            },
            {
                "name": "v",
                "type": "string",
                "nullable": True,
                "metadata": {},
            },
        ],
    }
)


def _mk_foreign(spark, table: str, materialized: bool = False) -> None:
    """Two files: f1 (rows 0..4, baseRowId=0, commit 1), f2 (rows
    5..7, baseRowId=5, commit 2). With ``materialized``, f2 is a
    rewrite carrying the hidden ``_tracked_id_col`` giving its rows
    the STABLE ids 100,101,102 (and a null to prove coalesce)."""
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    f1 = spark.range(5).select(
        F.col("id"), F.concat(F.lit("a"), F.col("id")).alias("v")
    )
    sz1 = _write_part(spark, table, "part-f1.parquet", f1)
    f2 = spark.range(5, 8).select(
        F.col("id"), F.concat(F.lit("b"), F.col("id")).alias("v")
    )
    if materialized:
        f2 = f2.withColumn(
            "_tracked_id_col",
            F.when(F.col("id") < 7, F.col("id") + 95),  # 100,101; null@7
        ).withColumn(
            "_tracked_cv_col",
            F.when(F.col("id") < 7, F.lit(9)),
        )
    sz2 = _write_part(spark, table, "part-f2.parquet", f2)
    conf = {"delta.enableRowTracking": "true"}
    if materialized:
        conf["delta.rowTracking.materializedRowIdColumnName"] = (
            "_tracked_id_col"
        )
        conf["delta.rowTracking.materializedRowCommitVersionColumnName"] = (
            "_tracked_cv_col"
        )
    actions = [
        {
            "commitInfo": {
                "timestamp": 1000,
                "operation": "WRITE",
                "engineInfo": "foreign-writer/4.0",
            }
        },
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }
        },
        {
            "metaData": {
                "id": "foreign-rt-table",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _SCHEMA,
                "partitionColumns": [],
                "configuration": conf,
                "createdTime": 1000,
            }
        },
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": 7}),
                "removed": False,
            }
        },
        {
            "add": {
                "path": "part-f1.parquet",
                "partitionValues": {},
                "size": sz1,
                "modificationTime": 1000,
                "dataChange": True,
                "baseRowId": 0,
                "defaultRowCommitVersion": 1,
                "stats": json.dumps({"numRecords": 5}),
            }
        },
        {
            "add": {
                "path": "part-f2.parquet",
                "partitionValues": {},
                "size": sz2,
                "modificationTime": 1000,
                "dataChange": True,
                "baseRowId": 5,
                "defaultRowCommitVersion": 2,
                "stats": json.dumps({"numRecords": 3}),
            }
        },
    ]
    with open(
        os.path.join(table, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_row_ids_from_base_row_id(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_foreign(spark, t)
    out = d.read_delta(spark, t, row_tracking=True)
    rows = {r.id: (r._row_id, r._row_commit_version) for r in out.collect()}
    # f1: positions 0..4 on baseRowId 0; f2: positions 0..2 on 5
    assert rows == {i: (i, 1) for i in range(5)} | {
        i: (i, 2) for i in range(5, 8)
    }
    # plain read unaffected
    plain = d.read_delta(spark, t)
    assert plain.columns == ["id", "v"]
    assert plain.count() == 8


def test_materialized_row_id_wins(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_foreign(spark, t, materialized=True)
    out = d.read_delta(spark, t, row_tracking=True)
    rows = {r.id: (r._row_id, r._row_commit_version) for r in out.collect()}
    assert rows[5] == (100, 9)
    assert rows[6] == (101, 9)
    # null materialized value falls back to baseRowId + position
    assert rows[7] == (7, 2)
    # fresh-file rows untouched
    assert rows[0] == (0, 1)
    # the hidden physical column never leaks into the result
    assert "_tracked_id_col" not in out.columns


def test_foreign_tracking_table_accepts_dml(spark, tmp_path):
    """r16 (r15 verdict #2): rowTracking is a WRITABLE feature now —
    a foreign tracking log takes appends (fresh contiguous ids above
    the foreign high-water mark) and deletes (survivor ids stable)."""
    t = str(tmp_path / "t")
    _mk_foreign(spark, t)
    src = spark.range(100, 102).coalesce(1).select(
        F.col("id"), F.lit("x").alias("v")
    )
    d.write_delta(src, t)
    out = {
        r.id: r._row_id
        for r in d.read_delta(spark, t, row_tracking=True).collect()
    }
    # foreign hwm was 7: the two appended rows took 8 and 9
    assert sorted(out.values()) == list(range(10))
    assert {out[100], out[101]} == {8, 9}
    doms = d.replay_domains(spark, t)
    assert json.loads(doms["delta.rowTracking"]) == {
        "rowIdHighWaterMark": 9
    }
    d.delete_delta_where(spark, t, "id = 5", mode="cow")
    after = {
        r.id: r._row_id
        for r in d.read_delta(spark, t, row_tracking=True).collect()
    }
    assert 5 not in after
    assert all(after[k] == out[k] for k in after)


def test_requires_enablement_and_base_row_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_foreign(spark, t)
    # flip enablement off in the log
    log = os.path.join(t, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log) if x.strip()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"] = {}
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(ValueError, match="enableRowTracking"):
        d.read_delta(spark, t, row_tracking=True)
    # enabled but an add lacks baseRowId -> loud, not fabricated ids
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.enableRowTracking": "true"
            }
        if "add" in a and a["add"]["path"] == "part-f2.parquet":
            del a["add"]["baseRowId"]
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(ValueError, match="baseRowId"):
        d.read_delta(spark, t, row_tracking=True)


def test_row_ids_survive_engine_checkpoint(spark, tmp_path):
    """r15: the ENGINE may checkpoint a rowTracking table — a
    checkpoint assigns nothing, and the add struct + domainMetadata
    rows round-trip everything the feature needs (writes stay
    refused, see test_writes_stay_refused). After pruning the JSON
    history, ids AND the row-id high-water-mark domain survive."""
    t = str(tmp_path / "t")
    _mk_foreign(spark, t)
    cv = d.create_checkpoint(spark, t)
    log = os.path.join(t, "_delta_log", f"{cv:020d}.json")
    os.remove(log)  # checkpoint is now the only history
    out = d.read_delta(spark, t, row_tracking=True)
    got = {r.id: r._row_id for r in out.collect()}
    assert got == {i: i for i in range(8)}
    # the foreign writer's domain (rowIdHighWaterMark) survived
    doms = d.replay_domains(spark, t)
    assert json.loads(doms["delta.rowTracking"]) == {
        "rowIdHighWaterMark": 7
    }


def test_row_ids_survive_foreign_checkpoint(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_foreign(spark, t)
    # a FOREIGN tracking writer checkpoints it; replay then comes
    # from the checkpoint parquet — baseRowId/defaultRowCommitVersion
    # must survive (checkpoints don't retain commitInfo; the
    # foreign file's schema is whatever it embeds)
    log = os.path.join(t, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log) if x.strip()]
    rows = []
    for a in acts:
        if "commitInfo" in a:
            continue
        rows.append(a)
    spark.createDataFrame(rows, d._CKPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "ck"))
    src = next(
        f
        for f in os.listdir(str(tmp_path / "ck"))
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.replace(
        os.path.join(str(tmp_path / "ck"), src),
        os.path.join(t, "_delta_log", f"{0:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(t, "_delta_log", "_last_checkpoint"), "w") as fh:
        json.dump({"version": 0, "size": len(rows)}, fh)
    os.remove(log)  # checkpoint is now the only history
    out = d.read_delta(spark, t, row_tracking=True)
    got = {r.id: r._row_id for r in out.collect()}
    assert got == {i: i for i in range(8)}


def test_row_tracking_with_predicate_skipping(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_foreign(spark, t)
    out = d.read_delta(spark, t, predicate="id >= 5", row_tracking=True)
    rows = {r.id: r._row_id for r in out.collect()}
    assert rows == {5: 5, 6: 6, 7: 7}
