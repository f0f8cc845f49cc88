"""Delta deletion vectors (round-8 verdict #2/#4/#5): the
deletion_vectors codec wired through delta_io — DV reads as position
anti-joins, row-level DELETE in both copy-on-write and DV modes,
checkpoint/vacuum/OPTIMIZE interplay, and the delta_tail stream's
survivor re-emission. Formats per delta-io PROTOCOL.md §Deletion
Vectors + the RoaringFormatSpec (see sources/deletion_vectors.py)."""

from __future__ import annotations

import json
import os
import time

import pytest


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _log_actions(path, version):
    log = os.path.join(path, "_delta_log", f"{version:020d}.json")
    return [json.loads(line) for line in open(log) if line.strip()]


def _data_basenames(path):
    out = set()
    for root, _d, files in os.walk(path):
        if "_delta_log" in root:
            continue
        out |= {f for f in files if f.endswith(".parquet")}
    return out


def test_delete_dv_mode_reads_survivors_and_time_travels(spark, tmp_path):
    """DV-mode DELETE: no data file is rewritten, the add re-commits
    with a deletionVector descriptor, reads apply it as a position
    anti-join, the protocol upgrades to (3,7)+deletionVectors, a
    second DELETE merges bitmaps, and v0 stays byte-identical AS OF."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(
        _mk(spark, [(i, i % 3) for i in range(100)], "id bigint, g bigint"),
        path,
    )
    files_v0 = _data_basenames(path)
    v1 = delete_delta_where(spark, path, "id % 10 = 0", mode="dv")
    assert v1 == 1
    assert _data_basenames(path) - files_v0 == set()  # no data rewrite
    got = sorted(r.id for r in read_delta(spark, path).collect())
    assert got == [i for i in range(100) if i % 10 != 0]
    # protocol upgraded in the same commit
    protos = [
        a["protocol"] for a in _log_actions(path, v1) if "protocol" in a
    ]
    assert protos and protos[0]["minReaderVersion"] == 3
    assert "deletionVectors" in protos[0]["readerFeatures"]
    # second delete merges with the existing DV
    delete_delta_where(spark, path, "id % 7 = 0", mode="dv")
    got2 = sorted(r.id for r in read_delta(spark, path).collect())
    assert got2 == [
        i for i in range(100) if i % 10 != 0 and i % 7 != 0
    ]
    # AS OF v0: the full data, DVs are version-scoped
    assert read_delta(spark, path, version=0).count() == 100
    assert read_delta(spark, path, version=1).count() == 90
    # nothing matched → no commit
    assert (
        delete_delta_where(spark, path, "id = 12345", mode="dv") is None
    )


def test_delete_cow_mode_rewrites_only_touched_partition(spark, tmp_path):
    """Copy-on-write DELETE on a partitioned table rewrites ONLY the
    files holding matches; the untouched partition's physical files
    survive by identity, and the change feed re-emits the touched
    files' survivors at the delete version."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        read_delta,
        read_delta_changes,
        write_delta,
    )

    path = str(tmp_path / "t")
    rows = [(i, "a" if i < 50 else "b") for i in range(100)]
    write_delta(
        _mk(spark, rows, "id bigint, p string").coalesce(1),
        path,
        partition_by=["p"],
    )
    before = {
        f
        for f in _data_basenames(path)
    }
    assert delete_delta_where(spark, path, "p = 'a' AND id < 10") == 1
    after_all = read_delta(spark, path)
    assert sorted(r.id for r in after_all.collect()) == list(range(10, 100))
    # partition b's file untouched (still the same physical file)
    import urllib.parse

    acts = _log_actions(path, 1)
    removed = [
        urllib.parse.unquote(a["remove"]["path"])
        for a in acts
        if "remove" in a
    ]
    assert removed and all("p=a" in p for p in removed)
    assert any(f in _data_basenames(path) for f in before)  # b's file kept
    # change feed: delete version re-emits partition a's survivors
    ch, _last = read_delta_changes(spark, path, since_version=0)
    got = sorted((r.id, r._commit_version) for r in ch.collect())
    assert got == [(i, 1) for i in range(10, 50)]
    # predicate over partition column only → whole-partition delete
    delete_delta_where(spark, path, "p = 'b'")
    assert sorted(
        r.id for r in read_delta(spark, path).collect()
    ) == list(range(10, 50))


def test_foreign_handwritten_dv_log_all_storage_types(spark, tmp_path):
    """The verdict's hand-written-DV-log check: a log authored
    byte-by-byte (not via delete_delta_where) with 'u' sidecar,
    inline 'i', and absolute-path 'p' descriptors reads the correct
    survivors — including two DVs packed into ONE sidecar at
    different offsets."""
    from census_asc5_data_pipeline_spark.sources import deletion_vectors as dvc
    from census_asc5_data_pipeline_spark.sources.delta_io import read_delta

    path = str(tmp_path / "t")
    os.makedirs(os.path.join(path, "_delta_log"))
    # three single-file parquets: f1 rows 0..9, f2 rows 10..19, f3 20..29
    fnames = []
    for lo in (0, 10, 20):
        df = _mk(spark, [(i,) for i in range(lo, lo + 10)], "id bigint")
        staging = str(tmp_path / f"stage{lo}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f
            for f in os.listdir(staging)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        dst = f"part-f{lo}.parquet"
        os.replace(os.path.join(staging, part), os.path.join(path, dst))
        fnames.append(dst)
    # one sidecar holding DVs for f1 (kill positions 0,1) and f2
    # (kill position 9) at distinct offsets
    descs = dvc.write_dv_file(path, {fnames[0]: [0, 1], fnames[1]: [9]})
    # f3 gets an inline DV killing positions 2..4
    inline = dvc.dv_descriptor_inline([2, 3, 4])
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {},
                }
            ],
        }
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "foreign-dv-table",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_str,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 1,
            }
        },
    ]
    for fn in fnames:
        add = {
            "path": fn,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(path, fn)),
            "modificationTime": 1,
            "dataChange": True,
        }
        if fn == fnames[0]:
            add["deletionVector"] = descs[fnames[0]]
        elif fn == fnames[1]:
            d = dict(descs[fnames[1]])
            # exercise storageType='p' via the same sidecar file
            rel = dvc.dv_relative_path(d["pathOrInlineDv"])
            d["storageType"] = "p"
            d["pathOrInlineDv"] = os.path.join(path, rel)
            add["deletionVector"] = d
        else:
            add["deletionVector"] = inline
        actions.append({"add": add})
    with open(
        os.path.join(path, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    got = sorted(r.id for r in read_delta(spark, path).collect())
    want = sorted(
        set(range(30)) - {0, 1} - {19} - {22, 23, 24}
    )
    assert got == want


def test_dv_checkpoint_preserves_deletion_state(spark, tmp_path):
    """A checkpoint written AFTER a DV delete must carry the DV
    descriptors and protocol feature lists — replay from the
    checkpoint alone (JSON tail pruned) still filters deleted rows."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        create_checkpoint,
        delete_delta_where,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(i,) for i in range(20)], "id bigint"), path)
    delete_delta_where(spark, path, "id >= 15", mode="dv")
    create_checkpoint(spark, path)
    # drop ALL commit JSONs: reader must reconstruct from checkpoint
    for f in os.listdir(os.path.join(path, "_delta_log")):
        if f.endswith(".json") and len(f) == 25:
            os.remove(os.path.join(path, "_delta_log", f))
    got = sorted(r.id for r in read_delta(spark, path).collect())
    assert got == list(range(15))


def test_dv_vacuum_keeps_live_sidecar_reclaims_superseded(
    spark, tmp_path
):
    """vacuum: the sidecar the retained head references survives; a
    superseded sidecar (first DV commit replaced by a merged one)
    is reclaimed once it falls out of retention."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        read_delta,
        vacuum_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(i,) for i in range(30)], "id bigint"), path)
    delete_delta_where(spark, path, "id = 0", mode="dv")
    delete_delta_where(spark, path, "id = 1", mode="dv")

    def _dvs():
        return {
            f
            for f in os.listdir(path)
            if f.startswith("deletion_vector_") and f.endswith(".bin")
        }

    assert len(_dvs()) == 2
    time.sleep(1.1)  # age past the newest retained commit's mtime
    os.utime(
        os.path.join(path, "_delta_log", f"{2:020d}.json"), None
    )
    stats = vacuum_delta(spark, path, keep_versions=1)
    assert stats["retained_versions"] == [2]
    assert len(_dvs()) == 1  # superseded sidecar reclaimed
    got = sorted(r.id for r in read_delta(spark, path).collect())
    assert got == list(range(2, 30))


def test_optimize_applies_and_retires_dvs(spark, tmp_path):
    """OPTIMIZE over a DV'd table is the maintenance loop: the
    rewrite physically drops DV'd rows, the new adds carry NO
    deletionVector, rows are unchanged, and the change feed stays
    silent (dataChange=false)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        optimize_delta,
        read_delta,
        read_delta_changes,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(i,) for i in range(40)], "id bigint"), path)
    for i in range(3):
        write_delta(
            _mk(spark, [(100 + i,)], "id bigint"), path, mode="append"
        )
    delete_delta_where(spark, path, "id < 5", mode="dv")
    before = sorted(r.id for r in read_delta(spark, path).collect())
    stats = optimize_delta(spark, path)
    assert stats["partitions_compacted"] == 1
    after = sorted(r.id for r in read_delta(spark, path).collect())
    assert after == before
    acts = _log_actions(path, stats["version"])
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all(not a.get("deletionVector") for a in adds)
    assert all(a["dataChange"] is False for a in adds)
    ch, _ = read_delta_changes(
        spark, path, since_version=stats["version"] - 1
    )
    assert ch.count() == 0


def test_read_delta_changes_emits_per_add_waves(spark, tmp_path):
    """A range spanning the original add AND its DV re-add emits the
    file once per add — full rows tagged v0, survivors tagged v1 —
    so 'latest version wins' folding reproduces the head state."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        read_delta_changes,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(
        _mk(spark, [(i,) for i in range(6)], "id bigint").coalesce(1),
        path,
    )
    delete_delta_where(spark, path, "id >= 4", mode="dv")
    ch, last = read_delta_changes(spark, path)
    assert last == 1
    got = sorted((r.id, r._commit_version) for r in ch.collect())
    assert got == sorted(
        [(i, 0) for i in range(6)] + [(i, 1) for i in range(4)]
    )


def test_delta_tail_stream_re_emits_survivors_after_dv_delete(
    spark, tmp_path
):
    """delta_tail executor-side DV masking: after a DV delete the
    stream re-emits the file's surviving rows at the delete version;
    folding per-id max version yields the post-delete state."""
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        write_delta,
    )

    delta_stream_source.register(spark)
    table = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    write_delta(
        _mk(spark, [(i,) for i in range(5)], "id bigint").coalesce(1),
        table,
    )
    delete_delta_where(spark, table, "id IN (1, 3)", mode="dv")
    out: list = []

    def sink(batch_df, _epoch):
        out.extend(
            (r.id, r._commit_version) for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("delta_tail")
        .option("path", table)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(out) == [
        (0, 0),
        (0, 1),
        (1, 0),
        (2, 0),
        (2, 1),
        (3, 0),
        (4, 0),
        (4, 1),
    ]
    # survivors-only at the head: fold latest version per id
    latest: dict = {}
    for i, v in sorted(out, key=lambda t: t[1]):
        latest[i] = v
    head = {i for i, v in latest.items() if v == 1}
    assert head == {0, 2, 4}


def test_dv_restore_resurrects_pre_delete_state(spark, tmp_path):
    """RESTORE to the pre-delete version re-adds the DV-less file:
    the deleted rows come back, and the restore itself is a new
    commit (history preserved)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        read_delta,
        restore_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(i,) for i in range(8)], "id bigint"), path)
    delete_delta_where(spark, path, "id < 3", mode="dv")
    assert read_delta(spark, path).count() == 5
    v = restore_delta(spark, path, 0)
    assert v == 2
    assert read_delta(spark, path).count() == 8


def test_remove_actions_carry_dv_state_spec_reconciliation(
    spark, tmp_path
):
    """Spec reconciliation keys logical files by (path, dv uniqueId):
    every remove this writer emits for a DV-carrying add copies that
    add's CURRENT deletionVector (plus size), restore removes the
    live (path, dv) before re-adding the target state, a foreign
    commit listing add(path, newDV) BEFORE remove(path, oldDV) is
    order-independent, and inline descriptors carry NO offset key."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        read_delta,
        restore_delta,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.deletion_vectors import (
        dv_descriptor_inline,
    )

    path = str(tmp_path / "t")
    write_delta(
        _mk(spark, [(i,) for i in range(20)], "id bigint"), path
    )  # v0
    v1 = delete_delta_where(spark, path, "id < 3", mode="dv")  # v1
    v2 = delete_delta_where(spark, path, "id >= 17", mode="dv")  # v2

    def _dv_of_adds(v):
        return {
            a["add"]["path"]: a["add"].get("deletionVector")
            for a in _log_actions(path, v)
            if "add" in a
        }

    def _removes(v):
        return [a["remove"] for a in _log_actions(path, v) if "remove" in a]

    def _live_dv_at(*versions):
        # fold adds in commit order: the live DV state per path
        out = {}
        for v in versions:
            out.update(_dv_of_adds(v))
        return out

    live_at_v1 = _live_dv_at(0, v1)
    # v2's removes retire the then-live logical files: each must carry
    # the file's CURRENT DV descriptor (None-free for DV-less files)
    # and the file size
    rms = _removes(v2)
    assert rms, "DV delete must remove the superseded logical file"
    for rm in rms:
        assert rm.get("deletionVector") == live_at_v1[rm["path"]]
        assert rm.get("size") is not None
    # no inline descriptor anywhere carries an offset key
    for v in (v1, v2):
        for a in _log_actions(path, v):
            desc = (a.get("add") or a.get("remove") or {}).get(
                "deletionVector"
            )
            if desc and desc["storageType"] == "i":
                assert "offset" not in desc
    # restore to v1: emits a remove of the LIVE (path, dv-at-v2)
    # before re-adding the v1 DV state
    v3 = restore_delta(spark, path, v1)
    rms3 = _removes(v3)
    live_at_v2 = _live_dv_at(0, v1, v2)
    assert rms3 and all(
        rm.get("deletionVector") == live_at_v2[rm["path"]] for rm in rms3
    )
    assert sorted(r.id for r in read_delta(spark, path).collect()) == list(
        range(3, 20)
    )
    # overwrite of a DV table: removes carry the live DV state
    live_dv = _live_dv_at(0, v1, v2, v3)  # v3 restored v1's state
    v4 = write_delta(
        _mk(spark, [(99,)], "id bigint"), path, mode="overwrite"
    )
    rms4 = {rm["path"]: rm for rm in _removes(v4)}
    for p, desc in live_dv.items():
        assert rms4[p].get("deletionVector") == desc
    # FOREIGN commit, adversarial order: add(path, newDV) listed
    # BEFORE remove(path, oldDV). A path-only order-dependent replay
    # would pop the fresh add and the rows would vanish.
    path2 = str(tmp_path / "t2")
    write_delta(_mk(spark, [(i,) for i in range(10)], "id bigint"), path2)
    v1b = delete_delta_where(spark, path2, "id = 0", mode="dv")
    acts = _log_actions(path2, v1b)
    old_add = next(a["add"] for a in acts if "add" in a)
    old_rm = next(a["remove"] for a in acts if "remove" in a)
    new_desc = dv_descriptor_inline([0, 1])  # deletes ids 0 and 1
    new_add = dict(old_add)
    new_add["deletionVector"] = new_desc
    rm_of_old = dict(old_rm)
    rm_of_old["deletionVector"] = old_add["deletionVector"]
    log2 = os.path.join(path2, "_delta_log", f"{v1b + 1:020d}.json")
    with open(log2, "w") as fh:
        fh.write(json.dumps({"add": new_add}) + "\n")  # add FIRST
        fh.write(json.dumps({"remove": rm_of_old}) + "\n")
    got = sorted(r.id for r in read_delta(spark, path2).collect())
    assert got == list(range(2, 10))


def test_delta_cdf_delete_images_and_derived_changes(spark, tmp_path):
    """read_delta_cdf (spec §Add CDC File + derivation rules): with
    delta.enableChangeDataFeed=true a DELETE commit stages a cdc
    change-data file and the feed emits EXACTLY the deleted rows'
    images (_change_type='delete', no survivor noise); without CDF the
    feed derives retract/re-insert from the remove/add pairs; OPTIMIZE
    emits nothing; vacuum keeps cdc files of retained commits."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        optimize_delta,
        read_delta_cdf,
        set_delta_properties,
        vacuum_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(
        _mk(spark, [(i, i % 2) for i in range(10)], "id bigint, g bigint"),
        path,
    )  # v0
    v1 = set_delta_properties(
        spark, path, {"delta.enableChangeDataFeed": "true"}
    )
    v2 = delete_delta_where(spark, path, "id < 3", mode="dv")
    # the commit carries cdc actions pointing under _change_data/
    cdcs = [a["cdc"] for a in _log_actions(path, v2) if "cdc" in a]
    assert cdcs and all(
        a["path"].startswith("_change_data/") and a["dataChange"] is False
        for a in cdcs
    )
    feed, last = read_delta_cdf(spark, path)
    assert last == v2
    assert feed.columns == ["id", "g", "_change_type", "_commit_version"]
    # v0 derives as inserts; v1 (metadata-only) emits nothing; v2
    # emits exactly the 3 deleted rows from the cdc file
    assert sorted(
        (r.id, r._change_type, r._commit_version) for r in feed.collect()
    ) == sorted(
        [(i, "insert", 0) for i in range(10)]
        + [(i, "delete", v2) for i in range(3)]
    )
    # cow DELETE also stages per-row images when CDF is on
    v3 = delete_delta_where(spark, path, "id = 9", mode="cow")
    tail, _ = read_delta_cdf(spark, path, since_version=v2)
    assert [(r.id, r._change_type) for r in tail.collect()] == [
        (9, "delete")
    ]
    # OPTIMIZE: dataChange=false, the feed stays silent
    res = optimize_delta(spark, path, target_file_bytes=1 << 30)
    if res["version"] is not None:
        tail2, _ = read_delta_cdf(spark, path, since_version=v3)
        assert tail2.count() == 0
    # vacuum with the delete commits retained keeps their cdc files
    vacuum_delta(spark, path, keep_versions=10)
    tail3, _ = read_delta_cdf(spark, path, since_version=v2 - 1)
    assert sorted(
        (r.id, r._change_type)
        for r in tail3.where(f"_commit_version = {v2}").collect()
    ) == [(0, "delete"), (1, "delete"), (2, "delete")]

    # CDF OFF: derivation — a cow delete retracts the touched file's
    # rows and re-inserts the survivors
    path2 = str(tmp_path / "t2")
    write_delta(_mk(spark, [(i,) for i in range(6)], "id bigint"), path2)
    delete_delta_where(spark, path2, "id = 0", mode="cow")
    feed2, _ = read_delta_cdf(spark, path2, since_version=0)
    rows = [(r.id, r._change_type) for r in feed2.collect()]
    dels = sorted(i for i, t in rows if t == "delete")
    ins = sorted(i for i, t in rows if t == "insert")
    assert 0 in dels and 0 not in ins
    # net effect: survivors of the touched file re-inserted
    assert sorted(set(dels) - set(ins)) == [0]


def test_delta_cdf_stream_source(spark, tmp_path):
    """readStream.format('delta_cdf') streams per-row change images:
    derived inserts for plain appends, cdc-file delete images for a
    CDF-enabled DV delete, and after a restart a MERGE's
    update_preimage/update_postimage/insert rows arrive with their
    commit version — the streaming twin of read_delta_cdf and the
    format-symmetry answer to iceberg_tail's retractions."""
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        set_delta_properties,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.merge import merge_into

    delta_stream_source.register(spark)
    table = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out: list = []

    def sink(batch_df, epoch_id):
        out.extend(
            (r.id, r.price, r._change_type, r._commit_version)
            for r in batch_df.collect()
        )

    write_delta(
        _mk(
            spark,
            [(i, float(i * 10)) for i in range(4)],
            "id bigint, price double",
        ),
        table,
    )  # v0
    set_delta_properties(
        spark, table, {"delta.enableChangeDataFeed": "true"}
    )  # v1
    v2 = delete_delta_where(spark, table, "id = 0", mode="dv")

    stream = (
        spark.readStream.format("delta_cdf").option("path", table).load()
    )
    assert stream.columns == [
        "id",
        "price",
        "_change_type",
        "_commit_version",
    ]
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(out, key=repr) == sorted(
        [(i, float(i * 10), "insert", 0) for i in range(4)]
        + [(0, 0.0, "delete", v2)],
        key=repr,
    )

    # while the stream is down: one MERGE (update + insert)
    src = _mk(
        spark, [(1, 99.0), (9, 90.0)], "id bigint, price double"
    )
    v3 = merge_into(
        spark,
        "delta",
        table,
        src,
        "t.id = s.id",
        matched=[("update", None, {"price": "s.price"})],
        not_matched={"id": "s.id", "price": "s.price"},
    )
    out.clear()
    q = (
        spark.readStream.format("delta_cdf")
        .option("path", table)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(out, key=repr) == sorted(
        [
            (1, 10.0, "update_preimage", v3),
            (1, 99.0, "update_postimage", v3),
            (9, 90.0, "insert", v3),
        ],
        key=repr,
    )


def test_cdf_partitioned_remove_without_pv_raises(spark, tmp_path):
    """r10 ADVICE (medium): deriving delete images from a dataChange
    remove that lacks partitionValues on a PARTITIONED table must
    raise loudly — attaching NULL partition columns silently corrupts
    the feed."""
    import pytest

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta_cdf,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(
        _mk(spark, [(1, "g1"), (2, "g2")], "id bigint, g string"),
        path,
        partition_by=["g"],
    )
    adds = [a["add"] for a in _log_actions(path, 0) if "add" in a]
    # a path-only remove (spec-optional partitionValues omitted)
    import json as _json
    import os as _os

    with open(
        _os.path.join(path, "_delta_log", f"{1:020d}.json"), "w"
    ) as fh:
        fh.write(
            _json.dumps(
                {
                    "remove": {
                        "path": adds[0]["path"],
                        "deletionTimestamp": 1,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="partitionValues"):
        read_delta_cdf(spark, path)


def test_cdf_schema_change_mid_range(spark, tmp_path):
    """r10 ADVICE (low): a CDF range spanning a schema change scans
    each version with the schema IN FORCE at that version — additive
    evolution aligns older rows with NULL new columns; a retyped
    column raises instead of misreading old files."""
    import pytest

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        read_delta_cdf,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(1, 10.0)], "id bigint, price double"), path)
    # v1: overwrite with an ADDED column (atomic metaData + rewrite)
    write_delta(
        _mk(
            spark,
            [(1, 10.0, "x"), (2, 20.0, "y")],
            "id bigint, price double, tag string",
        ),
        path,
        mode="overwrite",
        overwrite_schema=True,
    )
    feed, last = read_delta_cdf(spark, path)
    assert last == 1
    rows = sorted(
        (
            (r.id, r.price, r.tag, r._change_type, r._commit_version)
            for r in feed.collect()
        ),
        key=repr,
    )
    # v0's insert AND v1's derived delete of the v0 file both carry
    # tag=NULL (scanned with the schema in force / the old file), v1's
    # inserts carry the new column
    assert rows == sorted(
        [
            (1, 10.0, None, "delete", 1),
            (1, 10.0, None, "insert", 0),
            (1, 10.0, "x", "insert", 1),
            (2, 20.0, "y", "insert", 1),
        ],
        key=repr,
    )
    # a RETYPED column cannot align — loud gate
    path2 = str(tmp_path / "t2")
    write_delta(_mk(spark, [(1, 10.0)], "id bigint, price double"), path2)
    write_delta(
        _mk(spark, [(1, "ten")], "id bigint, price string"),
        path2,
        mode="overwrite",
        overwrite_schema=True,
    )
    assert read_delta(spark, path2).collect()[0].price == "ten"
    with pytest.raises(ValueError, match="incompatibly"):
        read_delta_cdf(spark, path2)


def test_optimize_zorder_by_improves_file_skipping(spark, tmp_path):
    """OPTIMIZE ZORDER BY (round-11 elective): re-clustering on the
    Morton interleave tightens per-file zone maps so a 2-D planted
    predicate overlaps FEWER files than before — with identical table
    content, dataChange=false rearrangement, and time travel intact."""
    import os as _os
    import urllib.parse as _up

    import pyarrow.parquet as _pq

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        optimize_delta,
        read_delta,
        read_delta_changes,
        write_delta,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    # x and y scattered so EVERY input file spans the full range of
    # both -> zone maps skip nothing
    n = 4096
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 64).alias("x"),
            ((F.col("id") * 7919) % 64).alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )
    write_delta(df, path)

    def _overlap_count(x_hi, y_hi):
        """Files whose (min,max) zone maps overlap x<x_hi AND y<y_hi."""
        from census_asc5_data_pipeline_spark.sources.delta_io import (
            _replay,
        )

        _p, _m, adds, _t = _replay(spark, path, None)
        hits = 0
        for a in adds.values():
            pf = _pq.ParquetFile(
                _os.path.join(path, _up.unquote(a["path"]))
            )
            mins = {"x": None, "y": None}
            maxs = {"x": None, "y": None}
            for rg in range(pf.metadata.num_row_groups):
                for ci in range(pf.metadata.num_columns):
                    col = pf.metadata.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        st = col.statistics
                        mins[name] = (
                            st.min
                            if mins[name] is None
                            else min(mins[name], st.min)
                        )
                        maxs[name] = (
                            st.max
                            if maxs[name] is None
                            else max(maxs[name], st.max)
                        )
            if mins["x"] is not None and mins["x"] < x_hi and (
                mins["y"] is not None and mins["y"] < y_hi
            ):
                hits += 1
        return hits

    before_files = _overlap_count(8, 8)
    assert before_files == 8  # scattered layout: every file overlaps
    pre = sorted(
        (r.x, r.y, r.payload) for r in read_delta(spark, path).collect()
    )
    res = optimize_delta(
        spark, path, target_file_bytes=5_000, zorder_by=["x", "y"]
    )
    assert res["version"] is not None and res["files_after"] >= 4
    after_files = _overlap_count(8, 8)
    # compact hyper-rectangles: the corner predicate touches a strict
    # minority of files now
    assert after_files < before_files
    assert after_files <= res["files_after"] // 2
    # content identical, rearrangement invisible to the change feed,
    # time travel intact
    post = sorted(
        (r.x, r.y, r.payload) for r in read_delta(spark, path).collect()
    )
    assert post == pre
    feed, _ = read_delta_changes(
        spark, path, since_version=res["version"] - 1
    )
    assert feed.count() == 0
    assert read_delta(spark, path, version=0).count() == n
    # unknown / non-numeric zorder columns gate loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zorder_by column"):
        optimize_delta(spark, path, zorder_by=["nope"])
