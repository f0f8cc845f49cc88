"""Delta V2 checkpoints (round-12 verdict #2 READ + round-13 WRITE —
PROTOCOL.md §V2 Checkpoint): foreign tables whose history is only
reachable through a UUID-named checkpoint manifest (json or parquet)
with sidecar file actions open; the legacy multipart classic form
too; and since r13 the engine WRITES the v2 form itself
(delta.checkpointPolicy=v2 upgrades the protocol, create_checkpoint
emits manifest + _sidecars parquet). Foreign v2 logs here are
hand-constructed from a classic checkpoint's rows — the shapes modern
delta-spark produces."""

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
    # and WRITING passes too since r13 (v2 checkpoints are now a
    # writer capability — create_checkpoint(policy='v2')); a feature
    # this engine genuinely lacks still refuses (icebergCompatV2
    # here; typeWidening became SUPPORTED in r16)
    write_delta(_mk(spark, [(2, 2.0)], "id bigint, v double"), path)
    assert sorted(
        r.id for r in read_delta(spark, path).collect()
    ) == [1, 2]
    with open(
        os.path.join(path, "_delta_log", f"{3:020d}.json"), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": [],
                        "writerFeatures": ["icebergCompatV2"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="icebergCompatV2"):
        write_delta(_mk(spark, [(3, 3.0)], "id bigint, v double"), path)


def test_v2_checkpoint_write_roundtrip(spark, tmp_path):
    """r13: the WRITE half of v2 checkpoints. SET TBLPROPERTIES
    ('delta.checkpointPolicy'='v2') upgrades the protocol to (3,7)
    with v2Checkpoint in BOTH feature lists in the SAME commit;
    create_checkpoint then writes the UUID-named JSON manifest +
    _sidecars parquet this engine's own reader resolves — identical
    rows before and after the pre-checkpoint JSON tail is pruned."""
    import glob
    import json as _json

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        _replay,
        create_checkpoint,
        read_delta,
        set_delta_properties,
        write_delta,
    )

    path = str(tmp_path / "t")
    _build_table(spark, path)
    # policy v2 without the feature refuses (checkpoint is not a
    # commit — it cannot upgrade the protocol itself)
    with pytest.raises(ValueError, match="v2Checkpoint table feature"):
        create_checkpoint(spark, path, policy="v2")
    v_set = set_delta_properties(
        spark, path, {"delta.checkpointPolicy": "v2"}
    )
    protocol, meta, _adds, _tx = _replay(spark, path, None)
    assert protocol["minReaderVersion"] == 3
    assert "v2Checkpoint" in protocol["readerFeatures"]
    assert "v2Checkpoint" in protocol["writerFeatures"]
    full = sorted((r.id, r.v) for r in read_delta(spark, path).collect())
    cv = create_checkpoint(spark, path)  # policy from table conf
    manifests = glob.glob(
        os.path.join(path, "_delta_log", f"{cv:020d}.checkpoint.*.json")
    )
    assert len(manifests) == 1
    lines = [
        _json.loads(x) for x in open(manifests[0]) if x.strip()
    ]
    kinds = [next(iter(d)) for d in lines]
    assert kinds[0] == "checkpointMetadata"
    assert "sidecar" in kinds and "protocol" in kinds
    assert not any("add" in d for d in lines)  # files live in sidecars
    side = [d for d in lines if "sidecar" in d][0]["sidecar"]
    assert os.path.exists(
        os.path.join(path, "_delta_log", "_sidecars", side["path"])
    )
    _prune_pre_checkpoint(path, cv)
    assert sorted(
        (r.id, r.v) for r in read_delta(spark, path).collect()
    ) == full
    # and the table keeps working: append + auto re-replay through
    # the v2 checkpoint + a fresh v2 checkpoint over the new state
    write_delta(
        _mk(spark, [(9, 9.0)], "id bigint, v double").coalesce(1), path
    )
    assert (9, 9.0) in {
        (r.id, r.v) for r in read_delta(spark, path).collect()
    }
    cv2 = create_checkpoint(spark, path)
    assert cv2 > cv


def test_v2_checkpoint_auto_interval_and_txn_fence(spark, tmp_path):
    """delta.checkpointInterval auto-checkpoints honor the v2 policy,
    and txn fences survive a v2 checkpoint (they ride the manifest,
    not the sidecar)."""
    import glob

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        last_txn_version,
        read_delta,
        set_delta_properties,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(
        _mk(spark, [(1, 1.0)], "id bigint, v double").coalesce(1),
        path,
        txn=("appA", 7),
    )
    set_delta_properties(
        spark,
        path,
        {
            "delta.checkpointPolicy": "v2",
            "delta.checkpointInterval": "2",
        },
    )
    write_delta(
        _mk(spark, [(2, 2.0)], "id bigint, v double").coalesce(1), path
    )  # v2 commit -> auto v2 checkpoint at version 2
    manifests = glob.glob(
        os.path.join(path, "_delta_log", "*.checkpoint.*.json")
    )
    assert manifests, "auto-checkpoint did not fire in v2 form"
    _prune_pre_checkpoint(path, 2)
    assert last_txn_version(spark, path, "appA") == 7
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [1, 2]


def test_v2_sidecar_sharding_driver_path(spark, tmp_path, monkeypatch):
    """r15 verdict #5: above the per-part row threshold the V2
    sidecar splits into MULTIPLE parquets (one manifest, one sidecar
    action per shard) and the reader scans them as one load —
    identical rows after the JSON tail is pruned."""
    import glob
    import json as _json

    from census_asc5_data_pipeline_spark.sources import delta_io as d

    path = str(tmp_path / "t")
    # 8 separate single-file appends -> 8 live adds
    for i in range(8):
        d.write_delta(
            _mk(spark, [(i, float(i))], "id bigint, v double").coalesce(1),
            path,
        )
    d.set_delta_properties(spark, path, {"delta.checkpointPolicy": "v2"})
    full = sorted((r.id, r.v) for r in d.read_delta(spark, path).collect())
    monkeypatch.setattr(d, "_CKPT_PART_ROWS", 3)  # 8 adds -> 3 shards
    cv = d.create_checkpoint(spark, path)
    manifests = glob.glob(
        os.path.join(path, "_delta_log", f"{cv:020d}.checkpoint.*.json")
    )
    lines = [_json.loads(x) for x in open(manifests[0]) if x.strip()]
    sides = [d_["sidecar"] for d_ in lines if "sidecar" in d_]
    assert len(sides) == 3
    for s in sides:
        assert os.path.exists(
            os.path.join(path, "_delta_log", "_sidecars", s["path"])
        )
    # declared size = manifest lines + adds (the distributed-plane
    # threshold trigger reads this)
    lc = _json.load(
        open(os.path.join(path, "_delta_log", "_last_checkpoint"))
    )
    assert lc["size"] == len(lines) + 8
    _prune_pre_checkpoint(path, cv)
    assert (
        sorted((r.id, r.v) for r in d.read_delta(spark, path).collect())
        == full
    )


def test_v2_sharded_checkpoint_distributed_path(spark, tmp_path, monkeypatch):
    """The v2 WRITE rides the distributed plane (r15): with a prior
    checkpoint above the (forced) threshold, the next v2 checkpoint
    streams prior adds parquet→parquet into sharded sidecars — and
    replays identically."""
    import glob
    import json as _json

    from census_asc5_data_pipeline_spark.sources import delta_io as d

    path = str(tmp_path / "t")
    for i in range(6):
        d.write_delta(
            _mk(spark, [(i, float(i))], "id bigint, v double").coalesce(1),
            path,
        )
    d.set_delta_properties(spark, path, {"delta.checkpointPolicy": "v2"})
    cv1 = d.create_checkpoint(spark, path)  # prior checkpoint (driver)
    d.write_delta(
        _mk(spark, [(100, 100.0)], "id bigint, v double").coalesce(1),
        path,
    )
    full = sorted((r.id, r.v) for r in d.read_delta(spark, path).collect())
    monkeypatch.setattr(d, "_SPARK_PRUNE_THRESHOLD", 0)
    monkeypatch.setattr(d, "_CKPT_PART_ROWS", 3)
    cv2 = d.create_checkpoint(spark, path)
    assert cv2 > cv1
    manifests = glob.glob(
        os.path.join(path, "_delta_log", f"{cv2:020d}.checkpoint.*.json")
    )
    lines = [_json.loads(x) for x in open(manifests[0]) if x.strip()]
    sides = [d_["sidecar"] for d_ in lines if "sidecar" in d_]
    assert len(sides) >= 2  # 7 adds at 3 rows/part
    _prune_pre_checkpoint(path, cv2)
    assert (
        sorted((r.id, r.v) for r in d.read_delta(spark, path).collect())
        == full
    )
