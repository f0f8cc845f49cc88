"""Spec-level Delta Lake log reader/writer (sources/delta_io.py):
protocol-faithful log JSON, checkpoint compaction, time travel,
partition re-attachment from the log, planning-time partition
pruning, optimistic-concurrency commits, and loud feature gates."""

from __future__ import annotations

import json
import os

import pytest


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_delta_roundtrip_and_log_shape(spark, tmp_path):
    """write→read round-trips values and schema, and the on-disk log
    is literal protocol JSON: %020d.json with protocol / metaData
    (schemaString = Spark StructType JSON) / add lines a foreign
    Delta reader would accept."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    df = _mk(
        spark,
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5)],
        "id bigint, s string, v double",
    )
    assert write_delta(df, path, mode="append") == 0
    back = read_delta(spark, path)
    assert back.schema == df.schema
    assert sorted(
        (r.id, r.s, r.v) for r in back.collect()
    ) == sorted((r.id, r.s, r.v) for r in df.collect())

    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    assert os.path.exists(log)
    actions = [json.loads(line) for line in open(log)]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert {"protocol", "metaData", "add"} <= set(kinds)
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 1
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert json.loads(meta["schemaString"])["type"] == "struct"
    add = next(a["add"] for a in actions if "add" in a)
    assert add["dataChange"] is True and add["size"] > 0
    # the add path points at a real file inside the table dir
    assert os.path.exists(os.path.join(path, add["path"]))


def test_delta_append_overwrite_and_time_travel(spark, tmp_path):
    """append stacks commits; overwrite tombstones every prior live
    file IN the commit; version= reads any historical state
    (time travel) and timestamp_ms resolves through commitInfo."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(1,)], "id bigint"), path)
    write_delta(_mk(spark, [(2,)], "id bigint"), path, mode="append")
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [1, 2]
    v2 = write_delta(_mk(spark, [(9,)], "id bigint"), path, mode="overwrite")
    assert v2 == 2
    assert [r.id for r in read_delta(spark, path).collect()] == [9]
    # time travel by version
    assert sorted(
        r.id for r in read_delta(spark, path, version=1).collect()
    ) == [1, 2]
    assert [r.id for r in read_delta(spark, path, version=0).collect()] == [1]
    # the overwrite commit tombstones EVERY previously-live file
    # (file count per commit varies with write parallelism)
    def _actions(v):
        return [
            json.loads(line)
            for line in open(
                os.path.join(path, "_delta_log", f"{v:020d}.json")
            )
        ]

    prior_adds = sum(
        1 for v in (0, 1) for a in _actions(v) if "add" in a
    )
    removed = {a["remove"]["path"] for a in _actions(2) if "remove" in a}
    assert len(removed) == prior_adds >= 2
    # timestamp travel: a far-future ts resolves to the latest commit
    assert [
        r.id
        for r in read_delta(
            spark, path, timestamp_ms=2**60
        ).collect()
    ] == [9]
    with pytest.raises(ValueError, match="no Delta commit"):
        read_delta(spark, path, timestamp_ms=0)


def test_delta_partitioned_write_read_and_pruning(spark, tmp_path):
    """Partition columns are NOT in the data files (per spec): they
    re-attach from the log's partitionValues via the broadcast
    file-basename join, cast to the schema type (nulls through the
    hive marker included); partition_filter prunes the FILE LIST
    before the scan plans."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "pt")
    df = _mk(
        spark,
        [(1, 2020, "x"), (2, 2020, "y"), (3, 2021, "z"), (4, None, "w")],
        "id bigint, year int, s string",
    )
    write_delta(df, path, partition_by=["year"])
    back = read_delta(spark, path)
    assert back.schema == df.select("id", "s", "year").schema or set(
        back.columns
    ) == {"id", "year", "s"}
    got = sorted(
        (r.id, r.year, r.s) for r in back.collect()
    )
    assert got == [(1, 2020, "x"), (2, 2020, "y"), (3, 2021, "z"),
                   (4, None, "w")]
    # year really is absent from the parquet files themselves
    import glob

    import pyarrow.parquet as pq

    part = glob.glob(os.path.join(path, "year=2020", "*.parquet"))[0]
    assert "year" not in pq.read_schema(part).names

    pruned = read_delta(spark, path, partition_filter={"year": "2020"})
    assert sorted(r.id for r in pruned.collect()) == [1, 2]
    # pruning happened at planning: only the matching files are inputs
    assert all("year=2020" in f for f in pruned.inputFiles())
    with pytest.raises(ValueError, match="not partition columns"):
        read_delta(spark, path, partition_filter={"id": "1"})


def test_delta_checkpoint_compaction_and_tail_replay(spark, tmp_path):
    """create_checkpoint writes the compacted parquet +
    _last_checkpoint; a reader then needs only the JSON tail — proven
    by deleting every pre-checkpoint commit (log vacuum) and still
    reading both the checkpointed state and a post-checkpoint
    append."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        create_checkpoint,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "ck")
    for i in range(3):
        write_delta(_mk(spark, [(i,)], "id bigint"), path, mode="append")
    v = create_checkpoint(spark, path)
    assert v == 2
    lc = json.load(
        open(os.path.join(path, "_delta_log", "_last_checkpoint"))
    )
    assert lc["version"] == 2
    # vacuum the pre-checkpoint log
    for i in range(3):
        os.remove(os.path.join(path, "_delta_log", f"{i:020d}.json"))
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [
        0,
        1,
        2,
    ]
    # tail commit after the checkpoint still replays on top of it
    write_delta(_mk(spark, [(7,)], "id bigint"), path, mode="append")
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [
        0,
        1,
        2,
        7,
    ]


def test_delta_feature_gates_refuse_unsupported_reader_features(
    spark, tmp_path
):
    """A table demanding reader v2 without column mapping, or a v3
    readerFeature beyond {columnMapping, deletionVectors}, must
    RAISE — mis-reading silently is the failure mode the gate exists
    for. (Deletion vectors themselves READ since round 9 —
    tests/test_delta_dv.py.)"""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(1,)], "id bigint"), path)
    # forge a v2 protocol bump (no columnMapping config → refuse)
    log = os.path.join(path, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 2,
                                          "minWriterVersion": 5}}) + "\n")
    with pytest.raises(NotImplementedError, match="reader version 2"):
        read_delta(spark, path)

    # forge a v3 feature this reader does not implement
    with open(log, "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["variantType"],
                        "writerFeatures": ["variantType"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="reader version 3"):
        read_delta(spark, path)
    os.remove(log)
    assert [r.id for r in read_delta(spark, path).collect()] == [1]


def test_delta_optimistic_commit_collision_retries(spark, tmp_path):
    """Two writers racing for the same version must serialize: the
    put-if-absent commit makes the loser re-replay and land at the
    next version — simulated by pre-claiming the version file."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(1,)], "id bigint"), path)
    # an interloper claims version 1 (an empty-but-valid commit)
    with open(
        os.path.join(path, "_delta_log", f"{1:020d}.json"), "w"
    ) as fh:
        fh.write(json.dumps({"commitInfo": {"timestamp": 1}}) + "\n")
    v = write_delta(_mk(spark, [(2,)], "id bigint"), path, mode="append")
    assert v == 2  # retried past the claimed version
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [1, 2]


def test_delta_empty_write_and_schema_only_read(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([], "id bigint, s string"), path
    )
    back = read_delta(spark, path)
    assert back.count() == 0
    assert back.columns == ["id", "s"]


def test_delta_changes_feed_attributes_versions(spark, tmp_path):
    """read_delta_changes emits each commit's inserted rows tagged
    with _commit_version; since_version slices the tail; an overwrite
    commit surfaces its new files as inserts without re-emitting
    history."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta_changes,
        write_delta,
    )

    path = str(tmp_path / "cf")
    write_delta(_mk(spark, [(1,), (2,)], "id bigint"), path)
    write_delta(_mk(spark, [(3,)], "id bigint"), path, mode="append")
    write_delta(_mk(spark, [(9,)], "id bigint"), path, mode="overwrite")
    full, last = read_delta_changes(spark, path)
    assert last == 2
    got = sorted((r.id, r._commit_version) for r in full.collect())
    assert got == [(1, 0), (2, 0), (3, 1), (9, 2)]
    tail, _ = read_delta_changes(spark, path, since_version=0)
    assert sorted((r.id, r._commit_version) for r in tail.collect()) == [
        (3, 1),
        (9, 2),
    ]
    empty, _ = read_delta_changes(spark, path, since_version=2)
    assert empty.count() == 0
    assert "_commit_version" in empty.columns


def test_delta_changes_partitioned_carries_partition_cols(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta_changes,
        write_delta,
    )

    path = str(tmp_path / "cfp")
    write_delta(
        _mk(spark, [(1, 2020), (2, 2021)], "id bigint, year int"),
        path,
        partition_by=["year"],
    )
    write_delta(
        _mk(spark, [(3, 2021)], "id bigint, year int"),
        path,
        mode="append",
    )
    ch, last = read_delta_changes(spark, path, since_version=0)
    assert last == 1
    assert [(r.id, r.year, r._commit_version) for r in ch.collect()] == [
        (3, 2021, 1)
    ]


def test_delta_tail_fold_exactly_once_cursor(spark, tmp_path):
    """The fold advances the cursor only after fn succeeds: a crash in
    fn leaves the cursor behind (replay = at-least-once into an
    idempotent consumer); a clean pass advances it and the next poll
    is a no-op."""
    import pytest as _pt

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delta_tail_fold,
        write_delta,
    )

    path = str(tmp_path / "tf")
    cursor = str(tmp_path / "cursor.json")
    write_delta(_mk(spark, [(1,)], "id bigint"), path)
    write_delta(_mk(spark, [(2,)], "id bigint"), path, mode="append")

    seen: list[list[tuple]] = []

    def boom(df):
        raise RuntimeError("consumer crash")

    with _pt.raises(RuntimeError):
        delta_tail_fold(spark, path, cursor, boom)
    assert not os.path.exists(cursor)  # cursor did NOT advance

    def consume(df):
        seen.append(sorted((r.id, r._commit_version) for r in df.collect()))

    n, v = delta_tail_fold(spark, path, cursor, consume)
    assert (n, v) == (2, 1)
    assert seen == [[(1, 0), (2, 1)]]
    n2, v2 = delta_tail_fold(spark, path, cursor, consume)
    assert (n2, v2) == (0, 1) and len(seen) == 1  # no-op poll
    # a new commit is picked up from the cursor, alone
    write_delta(_mk(spark, [(3,)], "id bigint"), path, mode="append")
    n3, v3 = delta_tail_fold(spark, path, cursor, consume)
    assert (n3, v3) == (1, 2)
    assert seen[-1] == [(3, 2)]


def test_delta_vacuum_reclaims_tombstoned_files(spark, tmp_path):
    """After an overwrite, the old files are logically dead but
    physically present; vacuum with retention must keep every
    retained version readable, delete files NO retained version
    references, and prune only checkpoint-compacted log JSONs."""
    import glob

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        create_checkpoint,
        read_delta,
        vacuum_delta,
        write_delta,
    )

    path = str(tmp_path / "v")
    write_delta(_mk(spark, [(1,)], "id bigint"), path)          # v0
    write_delta(_mk(spark, [(2,)], "id bigint"), path, "append")  # v1
    write_delta(_mk(spark, [(9,)], "id bigint"), path, "overwrite")  # v2
    write_delta(_mk(spark, [(10,)], "id bigint"), path, "append")  # v3
    n_before = len(glob.glob(path + "/*.parquet"))
    create_checkpoint(spark, path)
    rep = vacuum_delta(spark, path, keep_versions=2)
    # v2 and v3 stay readable (time travel within retention)
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [9, 10]
    assert [r.id for r in read_delta(spark, path, version=2).collect()] == [9]
    # v0/v1's files (tombstoned at v2) are physically gone
    assert rep["data_files_removed"] >= 2
    assert len(glob.glob(path + "/*.parquet")) < n_before
    assert rep["retained_versions"] == [2, 3]
    # pre-checkpoint, pre-retention log JSONs pruned; retained remain
    present = sorted(
        int(f[:20])
        for f in os.listdir(os.path.join(path, "_delta_log"))
        if f.endswith(".json") and len(f) == 25
    )
    assert present == [2, 3]
    # a version outside retention is gone from the log
    with pytest.raises(FileNotFoundError):
        read_delta(spark, path, version=1)


def test_delta_txn_fence_makes_sink_exactly_once(spark, tmp_path):
    """The txn action commits atomically with the adds, so a replayed
    micro-batch is fenced with no crash window; the fence survives
    checkpoint + log vacuum; independent app ids don't fence each
    other."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        create_checkpoint,
        last_txn_version,
        read_delta,
        vacuum_delta,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.streaming.pipeline import (
        delta_sink_fold,
    )

    path = str(tmp_path / "t")
    b0 = _mk(spark, [(1,), (2,)], "id bigint")
    b1 = _mk(spark, [(3,)], "id bigint")
    assert delta_sink_fold(b0, 0, path, "appA") == 2
    assert delta_sink_fold(b0, 0, path, "appA") == 0  # replay fenced
    assert delta_sink_fold(b1, 1, path, "appA") == 1
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [
        1,
        2,
        3,
    ]
    assert last_txn_version(spark, path, "appA") == 1
    assert last_txn_version(spark, path, "appB") is None
    # another app id at the same epoch is NOT fenced
    assert delta_sink_fold(_mk(spark, [(9,)], "id bigint"), 0, path,
                           "appB") == 1
    # fence survives checkpoint + vacuumed log
    write_delta(_mk(spark, [(10,)], "id bigint"), path, mode="append")
    create_checkpoint(spark, path)
    vacuum_delta(spark, path, keep_versions=1)
    assert last_txn_version(spark, path, "appA") == 1
    assert delta_sink_fold(b1, 1, path, "appA") == 0  # still fenced


def test_sink_fold_counts_from_commit_metrics(spark, tmp_path):
    """r16: delta_sink_fold derives rows-appended from the committed
    version's operationMetrics (footer-stat numRecords) instead of a
    second count() pass over the micro-batch — the returned count must
    stay exact, and commit_operation_metrics must read back exactly
    what the write stamped."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        commit_operation_metrics,
        delta_versions,
    )
    from census_asc5_data_pipeline_spark.streaming.pipeline import (
        delta_sink_fold,
    )

    path = str(tmp_path / "t")
    assert delta_sink_fold(
        _mk(spark, [(i,) for i in range(7)], "id bigint"), 0, path, "m"
    ) == 7
    v = max(delta_versions(path))
    m = commit_operation_metrics(path, v)
    assert m.get("numOutputRows") == "7"
    # absent commit → empty dict, never an exception
    assert commit_operation_metrics(path, 999) == {}
    # fenced replay returns 0 without a new commit
    assert delta_sink_fold(
        _mk(spark, [(1,)], "id bigint"), 0, path, "m"
    ) == 0
    assert max(delta_versions(path)) == v


def test_stream_to_delta_end_to_end(spark, tmp_path):
    """File-source micro-batches land as Delta commits; the table
    reads back complete and the change feed sees per-epoch commits."""
    import datetime as dt

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        read_delta_changes,
    )
    from census_asc5_data_pipeline_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        read_event_stream,
        stream_to_delta,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows1 = [(i, t0, i, "e", 1.0, "{}") for i in range(5)]
    rows2 = [(i, t0, i, "e", 1.0, "{}") for i in range(5, 8)]
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    table = str(tmp_path / "delta")
    q = stream_to_delta(
        read_event_stream(spark, src, max_files_per_trigger=1),
        table,
        str(tmp_path / "ck"),
    ).start()
    q.processAllAvailable()
    q.stop()
    got = sorted(r.event_id for r in read_delta(spark, table).collect())
    assert got == list(range(8))
    ch, last = read_delta_changes(spark, table)
    assert last >= 1  # one commit per non-empty micro-batch
    assert ch.count() == 8


def test_delta_optimize_compacts_without_changing_data_or_feed(
    spark, tmp_path
):
    """OPTIMIZE rewrites small files into few, in one dataChange=false
    commit: rows identical, file count down, older versions intact,
    and the change feed emits NOTHING for the rearrangement; vacuum
    afterwards reclaims the small files."""
    import glob

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        create_checkpoint,
        optimize_delta,
        read_delta,
        read_delta_changes,
        vacuum_delta,
        write_delta,
    )

    path = str(tmp_path / "o")
    for i in range(5):  # five tiny commits -> many small files
        write_delta(
            _mk(spark, [(i * 10 + j,) for j in range(3)], "id bigint"),
            path,
            mode="append",
        )
    before_rows = sorted(r.id for r in read_delta(spark, path).collect())
    ch_before, _ = read_delta_changes(spark, path)
    n_changes = ch_before.count()
    files_before = len(glob.glob(path + "/*.parquet"))

    rep = optimize_delta(spark, path, target_file_bytes=1 << 30)
    assert rep["partitions_compacted"] == 1
    assert rep["files_after"] < rep["files_before"] == files_before
    assert sorted(
        r.id for r in read_delta(spark, path).collect()
    ) == before_rows
    # time travel to the pre-OPTIMIZE version still works
    assert sorted(
        r.id
        for r in read_delta(spark, path, version=4).collect()
    ) == before_rows
    # the rearrangement emits nothing into the change feed
    ch_after, last = read_delta_changes(spark, path)
    assert last == rep["version"]
    assert ch_after.count() == n_changes
    # idempotent: a second optimize is a no-op
    rep2 = optimize_delta(spark, path, target_file_bytes=1 << 30)
    assert rep2["version"] is None
    # vacuum reclaims the superseded small files
    create_checkpoint(spark, path)
    vacuum_delta(spark, path, keep_versions=1)
    assert len(glob.glob(path + "/*.parquet")) == rep["files_after"] - (
        rep["files_before"] - files_before
    )
    assert sorted(
        r.id for r in read_delta(spark, path).collect()
    ) == before_rows


def test_delta_optimize_partitioned_keeps_partition_grouping(
    spark, tmp_path
):
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        optimize_delta,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "op")
    for i in range(3):
        write_delta(
            _mk(
                spark,
                [(i * 10, 2020), (i * 10 + 1, 2021)],
                "id bigint, year int",
            ),
            path,
            mode="append",
            partition_by=["year"] if i == 0 else None,
        )
    before = sorted(
        (r.id, r.year) for r in read_delta(spark, path).collect()
    )
    rep = optimize_delta(spark, path, target_file_bytes=1 << 30)
    assert rep["partitions_compacted"] == 2
    assert (
        sorted((r.id, r.year) for r in read_delta(spark, path).collect())
        == before
    )
    pruned = read_delta(spark, path, partition_filter={"year": "2020"})
    assert sorted(r.id for r in pruned.collect()) == [0, 10, 20]


def test_delta_tail_stream_source_reads_commits_and_resumes(
    spark, tmp_path
):
    """spark.readStream.format('delta_tail') tails the table: every
    committed row arrives tagged with its commit version; a restart
    from the same checkpoint resumes at the stored offset and emits
    ONLY commits made while the stream was down (exactly-once via
    Spark's offset log)."""
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        write_delta,
    )

    delta_stream_source.register(spark)
    table = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out: list = []

    def sink(batch_df, epoch_id):
        out.extend(
            (r.id, r._commit_version) for r in batch_df.collect()
        )

    write_delta(_mk(spark, [(1,), (2,)], "id bigint"), table)
    write_delta(_mk(spark, [(3,)], "id bigint"), table, mode="append")

    stream = (
        spark.readStream.format("delta_tail").option("path", table).load()
    )
    assert stream.columns == ["id", "_commit_version"]
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(out) == [(1, 0), (2, 0), (3, 1)]

    # commits while the stream is down; restart resumes from offset
    write_delta(_mk(spark, [(4,)], "id bigint"), table, mode="append")
    out.clear()
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
    assert sorted(out) == [(4, 2)]


def test_delta_tail_stream_source_partitioned_attach(spark, tmp_path):
    """Partition columns (absent from the data files per spec) are
    re-attached as constant Arrow arrays per file, typed from the
    table schema."""
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        write_delta,
    )

    delta_stream_source.register(spark)
    table = str(tmp_path / "pt")
    write_delta(
        _mk(spark, [(1, 2020), (2, 2021)], "id bigint, year int"),
        table,
        partition_by=["year"],
    )
    out: list = []

    def sink(batch_df, epoch_id):
        out.extend(
            (r.id, r.year, r._commit_version) for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("delta_tail")
        .option("path", table)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(out) == [(1, 2020, 0), (2, 2021, 0)]


def test_register_delta_and_iceberg_sql_views(spark, tmp_path):
    """Plain Spark SQL time-travels both table formats through
    registered views (the versioned-views contract on real logs)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        register_delta_views,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        register_iceberg_views,
        write_iceberg,
    )

    dp = str(tmp_path / "d")
    write_delta(_mk(spark, [(1,)], "id bigint"), dp)
    write_delta(_mk(spark, [(2,)], "id bigint"), dp, mode="append")
    names = register_delta_views(spark, "dtab", dp)
    assert names == ["dtab", "dtab__v0", "dtab__v1"]
    assert spark.sql("SELECT COUNT(*) n FROM dtab").first().n == 2
    assert spark.sql("SELECT COUNT(*) n FROM dtab__v0").first().n == 1

    ip = str(tmp_path / "i")
    write_iceberg(_mk(spark, [(1,)], "id bigint"), ip)
    write_iceberg(_mk(spark, [(2,)], "id bigint"), ip, mode="append")
    inames = register_iceberg_views(spark, "itab", ip)
    assert inames == ["itab", "itab__s1", "itab__s2"]
    assert spark.sql("SELECT COUNT(*) n FROM itab").first().n == 2
    assert spark.sql("SELECT COUNT(*) n FROM itab__s1").first().n == 1


def test_delta_write_schema_enforcement(spark, tmp_path):
    """Round-7 ADVICE: an append whose (name, type) signature drifts
    from the table's schemaString raises (real Delta's schema
    enforcement); overwrite only replaces the schema when
    overwrite_schema=True, and the commit's metaData keeps the same
    table id (it's the same table)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        _replay,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(1, "a")], "id bigint, s string"), path)
    _p, meta0, _a, _t = _replay(spark, path, None)

    drifted = _mk(spark, [(2, 9)], "id bigint, s bigint")  # retyped
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(drifted, path, mode="append")
    renamed = _mk(spark, [(2, "b")], "id bigint, t string")  # renamed
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(renamed, path, mode="append")
    with pytest.raises(ValueError, match="overwrite_schema"):
        write_delta(renamed, path, mode="overwrite")

    # matching append still fine; nullability difference is ignored
    write_delta(_mk(spark, [(3, "c")], "id bigint, s string"), path)
    assert read_delta(spark, path).count() == 2

    # sanctioned schema replace
    v = write_delta(
        renamed, path, mode="overwrite", overwrite_schema=True
    )
    back = read_delta(spark, path)
    assert [f.name for f in back.schema.fields] == ["id", "t"]
    assert back.collect()[0].t == "b"
    _p, meta2, _a, _t = _replay(spark, path, None)
    assert meta2["id"] == meta0["id"]  # table id stable
    assert v == 2
    # time travel to v1 still reads the OLD schema's data
    old = read_delta(spark, path, version=1)
    assert old.count() == 2 and "s" in old.columns


def test_delta_vacuum_age_guard_spares_inflight_files(spark, tmp_path):
    """Round-7 ADVICE: vacuum must not delete files newer than the
    newest retained commit — they may belong to an in-flight writer
    that has moved data into the table but not yet committed. Old
    debris (mtime before the cutoff) still goes."""
    import time as _time

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        _commit_file,
        read_delta,
        vacuum_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(1,)], "id bigint"), path)
    write_delta(_mk(spark, [(2,)], "id bigint"), path, mode="overwrite")
    write_delta(_mk(spark, [(3,)], "id bigint"), path, mode="overwrite")

    # old debris: staged tmp file whose mtime predates the last commit
    debris = os.path.join(path, ".tmp-old")
    open(debris, "w").write("x")
    past = os.path.getmtime(_commit_file(path, 2)) - 60
    os.utime(debris, (past, past))

    # in-flight writer: data file moved in AFTER the last commit
    inflight = os.path.join(path, "part-inflight.parquet")
    open(inflight, "wb").write(b"PAR1")
    stats = vacuum_delta(spark, path, keep_versions=2)

    assert not os.path.exists(debris)  # old debris removed
    assert os.path.exists(inflight)  # in-flight file spared
    assert stats["data_files_removed"] >= 2  # v0 file + debris
    assert read_delta(spark, path).count() == 1


def test_delta_tail_partition_value_types_and_gate():
    """Round-7 ADVICE: the Hive-string partition values decode to
    typed Arrow arrays (date/timestamp/decimal/short/byte included),
    and unsupported types raise at the codec, not as a miscast
    batch."""
    import datetime

    import pyarrow as pa

    from census_asc5_data_pipeline_spark.sources.delta_stream_source import (
        _pv_to_arrow,
    )

    a = _pv_to_arrow("date", "2024-03-01", 2)
    assert a.type == pa.date32()
    assert a[0].as_py() == datetime.date(2024, 3, 1)
    a = _pv_to_arrow("timestamp", "2024-03-01 12:30:45.5", 1)
    assert a.type == pa.timestamp("us")
    assert a[0].as_py() == datetime.datetime(2024, 3, 1, 12, 30, 45, 500000)
    a = _pv_to_arrow("decimal(10,2)", "12.50", 1)
    assert a.type == pa.decimal128(10, 2)
    assert str(a[0].as_py()) == "12.50"
    a = _pv_to_arrow("short", "7", 1)
    assert a.type == pa.int16() and a[0].as_py() == 7
    a = _pv_to_arrow("byte", None, 3)
    assert a.type == pa.int8() and a[0].as_py() is None
    a = _pv_to_arrow("boolean", "true", 1)
    assert a[0].as_py() is True
    with pytest.raises(NotImplementedError, match="partition-column"):
        _pv_to_arrow("interval", "x", 1)


def test_delta_tail_date_partitioned_stream(spark, tmp_path):
    """A delta_tail stream over a DATE-partitioned table yields typed
    date values (the round-7 ADVICE repro: previously a string array
    met a DateType schema and every batch failed)."""
    import datetime

    from census_asc5_data_pipeline_spark.sources import delta_stream_source
    from census_asc5_data_pipeline_spark.sources.delta_io import write_delta

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1)), (2, datetime.date(2024, 1, 2))],
        "id bigint, d date",
    )
    write_delta(df, path, partition_by=["d"])
    delta_stream_source.register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("delta_tail")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.id, r.d) for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, datetime.date(2024, 1, 1)),
        (2, datetime.date(2024, 1, 2)),
    ]


def test_delta_column_mapping_read(spark, tmp_path):
    """Round-7 verdict #5: a hand-written log with
    delta.columnMapping.mode=name (minReaderVersion 2, physical
    col-<uuid> names in the parquet and in partitionValues keys)
    reads back under LOGICAL names, prunes partitions, and feeds the
    change feed; reader v3 passes only when readerFeatures lists
    nothing beyond columnMapping; writes to mapped tables raise."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        read_delta_changes,
        write_delta,
    )

    path = str(tmp_path / "cm")
    os.makedirs(os.path.join(path, "_delta_log"))
    # physical-named data files
    spark.createDataFrame(
        [(1, "a")], "`col-11` bigint, `col-22` string"
    ).coalesce(1).write.parquet(str(tmp_path / "s0"))
    spark.createDataFrame(
        [(2, "b")], "`col-11` bigint, `col-22` string"
    ).coalesce(1).write.parquet(str(tmp_path / "s1"))
    import glob
    import shutil as _sh

    names = []
    for i in (0, 1):
        src = glob.glob(str(tmp_path / f"s{i}") + "/part-*.parquet")[0]
        dst_rel = f"g={'x' if i == 0 else 'y'}/f{i}.parquet"
        dst = os.path.join(path, dst_rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        _sh.copy(src, dst)
        names.append(dst_rel)

    sch = {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-11",
                },
            },
            {
                "name": "s",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-22",
                },
            },
            {
                "name": "g",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 3,
                    "delta.columnMapping.physicalName": "col-33",
                },
            },
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "cm-table",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(sch),
                "partitionColumns": ["g"],
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        },
        {
            "add": {
                "path": names[0],
                # mapped tables key partitionValues by PHYSICAL name
                "partitionValues": {"col-33": "x"},
                "size": os.path.getsize(os.path.join(path, names[0])),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
        {
            "add": {
                "path": names[1],
                "partitionValues": {"col-33": "y"},
                "size": os.path.getsize(os.path.join(path, names[1])),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(
        os.path.join(path, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")

    back = read_delta(spark, path)
    assert back.columns == ["id", "s", "g"]
    assert sorted((r.id, r.s, r.g) for r in back.collect()) == [
        (1, "a", "x"),
        (2, "b", "y"),
    ]
    pruned = read_delta(spark, path, partition_filter={"g": "y"})
    assert [(r.id, r.g) for r in pruned.collect()] == [(2, "y")]
    ch, last = read_delta_changes(spark, path)
    assert sorted((r.id, r._commit_version) for r in ch.collect()) == [
        (1, 0),
        (2, 0),
    ]
    # round-11: appends + row-level DML on mapped tables stage under
    # PHYSICAL names (the r10 gate lifted)
    write_delta(
        spark.createDataFrame(
            [(3, "c", "z")], "id bigint, s string, g string"
        ),
        path,
        mode="append",
    )
    assert sorted(
        (r.id, r.s, r.g) for r in read_delta(spark, path).collect()
    ) == [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")]
    # the new add keys partitionValues by the PHYSICAL partition name
    # and its parquet stores physical column names
    import pyarrow.parquet as _pq

    v1 = [
        json.loads(line)
        for line in open(
            os.path.join(path, "_delta_log", f"{1:020d}.json")
        )
        if line.strip()
    ]
    new_add = next(a["add"] for a in v1 if "add" in a)
    assert new_add["partitionValues"] == {"col-33": "z"}
    import urllib.parse as _up

    phys_cols = _pq.ParquetFile(
        os.path.join(path, _up.unquote(new_add["path"]))
    ).schema_arrow.names
    assert "col-11" in phys_cols and "id" not in phys_cols

    # row-level DML under mapping: UPDATE rewrites under physical
    # names, MERGE + DELETE land correctly, logical reads throughout
    from census_asc5_data_pipeline_spark.sources.merge import (
        merge_into,
        update_where,
    )

    update_where(spark, "delta", path, "id = 3", {"s": "'C'"})
    assert (3, "C", "z") in {
        (r.id, r.s, r.g) for r in read_delta(spark, path).collect()
    }
    merge_into(
        spark,
        "delta",
        path,
        spark.createDataFrame(
            [(1, "A", "x"), (9, "i", "w")], "id bigint, s string, g string"
        ),
        "t.id = s.id",
        matched=[("update", None, {"s": "s.s"})],
        not_matched={"id": "s.id", "s": "s.s", "g": "s.g"},
    )
    assert sorted(
        (r.id, r.s, r.g) for r in read_delta(spark, path).collect()
    ) == [(1, "A", "x"), (2, "b", "y"), (3, "C", "z"), (9, "i", "w")]
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
    )

    delete_delta_where(spark, path, "g = 'w'")
    assert sorted(
        r.id for r in read_delta(spark, path).collect()
    ) == [1, 2, 3]
    pruned_z = read_delta(spark, path, partition_filter={"g": "z"})
    assert [(r.id, r.s) for r in pruned_z.collect()] == [(3, "C")]

    # round-11: the STREAMING sources read mapped tables too — data
    # files carry physical names, the reader remaps to logical and
    # resolves partitionValues by physical key
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
    )

    delta_stream_source.register(spark)
    got: list = []

    def _sink(batch_df, epoch_id):
        got.extend(
            (r.id, r.s, r.g, r._commit_version)
            for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("delta_tail")
        .option("path", path)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cm_ck"))
        .foreachBatch(_sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # the append commit's row arrives under LOGICAL names with its
    # partition value decoded from the physical pv key
    assert (3, "c", "z", 1) in got
    # fold latest-commit-wins per id: the stream converges to the
    # table's final state
    latest: dict = {}
    for i, s_, g_, v_ in sorted(got, key=lambda t: t[3]):
        latest[i] = (s_, g_)
    final = {
        r.id: (r.s, r.g) for r in read_delta(spark, path).collect()
    }
    assert {k: v for k, v in latest.items() if k in final} == final

    got.clear()
    q = (
        spark.readStream.format("delta_cdf")
        .option("path", path)
        .option("startingversion", 2)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cm_ck2"))
        .foreachBatch(
            lambda b, e: got.extend(
                (r.id, r.s, r.g, r._change_type) for r in b.collect()
            )
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # the delete commit (v5) derives per-row delete images; the merge
    # insert (v4) derives an insert image — all under logical names
    assert (9, "i", "w", "insert") in got
    assert (9, "i", "w", "delete") in got

    # reader v3 + an unknown feature must still gate
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(line) for line in open(log)]
    lines[0] = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["columnMapping", "variantType"],
        }
    }
    with open(log, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(NotImplementedError, match="reader version 3"):
        read_delta(spark, path)
    # v3 with the two supported features passes (DVs read since r9)
    lines[0]["protocol"]["readerFeatures"] = [
        "columnMapping",
        "deletionVectors",
    ]
    with open(log, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    assert read_delta(spark, path).count() == 3


def test_delta_restore_to_version(spark, tmp_path):
    """RESTORE commits a new version whose live set equals the target
    version's — history preserved, the change feed sees the restored
    rows as inserts (dataChange=true), and vacuum keeps the re-added
    files because the new head references them."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        create_checkpoint,
        read_delta,
        read_delta_changes,
        restore_delta,
        vacuum_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(_mk(spark, [(1,), (2,)], "id bigint"), path)  # v0
    write_delta(_mk(spark, [(9,)], "id bigint"), path, "overwrite")  # v1
    write_delta(_mk(spark, [(10,)], "id bigint"), path, "append")  # v2

    v = restore_delta(spark, path, 0)
    assert v == 3
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [1, 2]
    # pre-restore states still time-travel
    assert sorted(
        r.id for r in read_delta(spark, path, version=2).collect()
    ) == [9, 10]
    # the restore's re-adds flow through the change feed as v3 inserts
    ch, last = read_delta_changes(spark, path, since_version=2)
    assert last == 3
    assert sorted((r.id, r._commit_version) for r in ch.collect()) == [
        (1, 3),
        (2, 3),
    ]
    # vacuum with retention=1 keeps the restored (v0-era) files
    create_checkpoint(spark, path)
    vacuum_delta(spark, path, keep_versions=1)
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [1, 2]
