"""Delta V2 checkpoint READ (round-12 verdict #2 — PROTOCOL.md §V2
Checkpoint): foreign tables whose history is only reachable through a
UUID-named checkpoint manifest (json or parquet) with sidecar file
actions now open; the legacy multipart classic form too. Writes stay
classic. Every v2 log here is hand-constructed from a classic
checkpoint's rows — the shapes modern delta-spark produces."""

from __future__ import annotations

import json
import os
import uuid

import pyarrow.parquet as pq
import pytest


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _build_table(spark, path):
    """3-version table: v0 two rows, v1 append, v2 overwrite-free
    delete (cow) so the checkpoint at v1 carries a remove later."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        write_delta,
    )

    write_delta(
        _mk(spark, [(1, 1.0), (2, 2.0)], "id bigint, v double").coalesce(1),
        path,
    )
    write_delta(
        _mk(spark, [(3, 3.0)], "id bigint, v double").coalesce(1), path
    )
    delete_delta_where(spark, path, "id = 1")  # v2


def _classic_rows(spark, path, version):
    """Write the engine's classic checkpoint at ``version`` and return
    (its pyarrow table, its on-disk path)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        create_checkpoint,
    )

    create_checkpoint(spark, path, version=version)
    cp = os.path.join(
        path, "_delta_log", f"{version:020d}.checkpoint.parquet"
    )
    return pq.read_table(cp), cp


def _prune_pre_checkpoint(path, version):
    for v in range(version + 1):
        f = os.path.join(path, "_delta_log", f"{v:020d}.json")
        if os.path.exists(f):
            os.remove(f)


def test_v2_json_manifest_with_sidecars(spark, tmp_path):
    """The full v2 shape: UUID-named JSON manifest carrying
    checkpointMetadata + protocol + metaData + a sidecar pointer;
    add/remove actions live ONLY in _delta_log/_sidecars/. The
    sidecar read must equal the JSON-tail replay, before AND after
    the pre-checkpoint commits are vacuumed."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
    )

    path = str(tmp_path / "t")
    _build_table(spark, path)
    full = sorted(
        (r.id, r.v) for r in read_delta(spark, path).collect()
    )
    t, cp = _classic_rows(spark, path, 1)
    log = os.path.join(path, "_delta_log")

    # sidecar = the add/remove columns of the classic rows
    names = t.schema.names
    rows = t.to_pylist()
    file_rows = [
        {"add": r.get("add"), "remove": r.get("remove")}
        for r in rows
        if r.get("add") or r.get("remove")
    ]
    sc_name = f"{uuid.uuid4()}.parquet"
    os.makedirs(os.path.join(log, "_sidecars"))
    import pyarrow as pa

    sidecar_t = pa.table(
        {
            "add": pa.array(
                [r["add"] for r in file_rows], type=t.schema.field("add").type
            ),
            "remove": pa.array(
                [r["remove"] for r in file_rows],
                type=t.schema.field("remove").type,
            ),
        }
    )
    pq.write_table(sidecar_t, os.path.join(log, "_sidecars", sc_name))

    # manifest = everything else, as JSON lines
    manifest = [{"checkpointMetadata": {"version": 1}}]
    for r in rows:
        for k in ("protocol", "metaData", "txn"):
            if r.get(k):
                manifest.append({k: r[k]})
    manifest.append(
        {
            "sidecar": {
                "path": sc_name,
                "sizeInBytes": os.path.getsize(
                    os.path.join(log, "_sidecars", sc_name)
                ),
            }
        }
    )
    with open(
        os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4()}.json"), "w"
    ) as fh:
        for obj in manifest:
            fh.write(json.dumps(obj) + "\n")
    os.remove(cp)  # only the v2 form remains

    # sidecar read == JSON-tail replay (commits still present)
    assert sorted(
        (r.id, r.v) for r in read_delta(spark, path).collect()
    ) == full
    # vacuum past the checkpoint: v2 is now the ONLY route to history
    _prune_pre_checkpoint(path, 1)
    assert sorted(
        (r.id, r.v) for r in read_delta(spark, path).collect()
    ) == full
    assert sorted(
        (r.id, r.v) for r in read_delta(spark, path, version=1).collect()
    ) == [(1, 1.0), (2, 2.0), (3, 3.0)]
    with pytest.raises(FileNotFoundError):
        read_delta(spark, path, version=0)  # below the checkpoint

    # a missing sidecar raises loudly, never a silent partial read
    os.remove(os.path.join(log, "_sidecars", sc_name))
    with pytest.raises(FileNotFoundError, match="sidecar"):
        read_delta(spark, path)


def test_v2_uuid_parquet_manifest_inline(spark, tmp_path):
    """A UUID-named parquet manifest with ALL actions inline (no
    sidecars) is also a legal v2 checkpoint — byte-identical rows to
    the classic form under the v2 name."""
    import shutil

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
    )

    path = str(tmp_path / "t")
    _build_table(spark, path)
    full = sorted((r.id, r.v) for r in read_delta(spark, path).collect())
    _t, cp = _classic_rows(spark, path, 1)
    shutil.move(
        cp,
        os.path.join(
            path,
            "_delta_log",
            f"{1:020d}.checkpoint.{uuid.uuid4()}.parquet",
        ),
    )
    _prune_pre_checkpoint(path, 1)
    assert sorted(
        (r.id, r.v) for r in read_delta(spark, path).collect()
    ) == full


def test_multipart_classic_checkpoint(spark, tmp_path):
    """Legacy %020d.checkpoint.%010d.%010d.parquet multipart form:
    all parts are read; an incomplete part set raises instead of
    replaying half a history."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
    )

    path = str(tmp_path / "t")
    _build_table(spark, path)
    full = sorted((r.id, r.v) for r in read_delta(spark, path).collect())
    t, cp = _classic_rows(spark, path, 1)
    log = os.path.join(path, "_delta_log")
    k = max(1, t.num_rows // 2)
    p1 = os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet")
    p2 = os.path.join(log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet")
    pq.write_table(t.slice(0, k), p1)
    pq.write_table(t.slice(k), p2)
    os.remove(cp)
    _prune_pre_checkpoint(path, 1)
    assert sorted(
        (r.id, r.v) for r in read_delta(spark, path).collect()
    ) == full
    os.remove(p2)
    with pytest.raises(FileNotFoundError, match="incomplete"):
        read_delta(spark, path)
    # r12 ADVICE: a MIXED set whose parts declare different totals
    # (.0000000001.0000000002 + .0000000002.0000000003) has 2 files
    # with indices 1..2 but is two different incomplete checkpoints —
    # it must refuse, not silently replay a partial snapshot
    pq.write_table(
        t.slice(k),
        os.path.join(
            log, f"{1:020d}.checkpoint.{2:010d}.{3:010d}.parquet"
        ),
    )
    with pytest.raises(FileNotFoundError, match="inconsistent"):
        read_delta(spark, path)


def test_v2_checkpoint_reader_feature_passes_gate(spark, tmp_path):
    """A foreign protocol (3,7) listing v2Checkpoint in
    readerFeatures now passes the reader gate (it used to raise)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(1, 1.0)], "id bigint, v double"), path)
    # foreign protocol upgrade commit
    with open(
        os.path.join(path, "_delta_log", f"{1:020d}.json"), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["v2Checkpoint"],
                        "writerFeatures": ["v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    assert [r.id for r in read_delta(spark, path).collect()] == [1]
    # but WRITING stays refused: v2Checkpoint is not a writer feature
    # this engine implements (checkpoints written here are classic)
    with pytest.raises(NotImplementedError, match="v2Checkpoint"):
        write_delta(_mk(spark, [(2, 2.0)], "id bigint, v double"), path)
