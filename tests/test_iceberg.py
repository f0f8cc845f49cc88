"""Spec-level Iceberg reader/writer (sources/iceberg_io.py):
metadata-JSON + Avro manifest round-trips, snapshot time travel,
identity partitions with planning-time pruning, and loud feature
gates — built on the r7 generic nested-Avro codec."""

from __future__ import annotations

import json
import os

import pytest


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_iceberg_roundtrip_and_metadata_shape(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    df = _mk(
        spark,
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5)],
        "id bigint, s string, v double",
    )
    snap = write_iceberg(df, path)
    assert snap == 1
    back = read_iceberg(spark, path)
    assert back.schema == df.schema
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == sorted(
        (r.id, r.s, r.v) for r in df.collect()
    )
    # on-disk: v1.metadata.json + version-hint + avro manifests
    md = os.path.join(path, "metadata")
    meta = json.load(open(os.path.join(md, "v1.metadata.json")))
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == 1
    assert open(os.path.join(md, "version-hint.text")).read() == "1"
    fields = meta["schemas"][0]["fields"]
    assert [(f["id"], f["name"]) for f in fields] == [
        (1, "id"),
        (2, "s"),
        (3, "v"),
    ]
    ml = meta["snapshots"][0]["manifest-list"]
    assert os.path.exists(ml) and ml.endswith(".avro")


def test_iceberg_append_overwrite_and_snapshot_travel(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        iceberg_snapshots,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1,)], "id bigint"), path)
    write_iceberg(_mk(spark, [(2,)], "id bigint"), path, mode="append")
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == [
        1,
        2,
    ]
    s3 = write_iceberg(
        _mk(spark, [(9,)], "id bigint"), path, mode="overwrite"
    )
    assert [r.id for r in read_iceberg(spark, path).collect()] == [9]
    # AS OF: every snapshot stays readable
    assert sorted(
        r.id for r in read_iceberg(spark, path, snapshot_id=2).collect()
    ) == [1, 2]
    assert [
        r.id for r in read_iceberg(spark, path, snapshot_id=1).collect()
    ] == [1]
    snaps = iceberg_snapshots(path)
    assert [s["snapshot-id"] for s in snaps] == [1, 2, s3]
    with pytest.raises(ValueError, match="snapshot 99"):
        read_iceberg(spark, path, snapshot_id=99)


def test_iceberg_partitioned_files_keep_columns_and_prune(
    spark, tmp_path
):
    """Per spec (unlike Delta/Hive) data files carry ALL columns —
    identity partition sources included — so the read is one
    multi-path scan with no re-attachment join; partition_filter
    prunes the file list at planning time."""
    import glob

    import pyarrow.parquet as pq

    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "pt")
    df = _mk(
        spark,
        [(1, 2020, "x"), (2, 2020, "y"), (3, 2021, "z")],
        "id bigint, year int, s string",
    )
    write_iceberg(df, path, partition_by=["year"])
    back = read_iceberg(spark, path)
    assert sorted((r.id, r.year, r.s) for r in back.collect()) == [
        (1, 2020, "x"),
        (2, 2020, "y"),
        (3, 2021, "z"),
    ]
    # the parquet itself contains the partition column
    part = glob.glob(os.path.join(path, "data", "year=2020", "*.parquet"))[
        0
    ]
    assert "year" in pq.read_schema(part).names

    pruned = read_iceberg(spark, path, partition_filter={"year": "2020"})
    assert sorted(r.id for r in pruned.collect()) == [1, 2]
    assert all("year=2020" in f for f in pruned.inputFiles())
    with pytest.raises(ValueError, match="not a partition field"):
        read_iceberg(spark, path, partition_filter={"id": "1"})


def test_iceberg_feature_gates(spark, tmp_path):
    """format-version 3, delete manifests, non-parquet data files and
    renamed-column histories must all raise, never mis-read."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1,)], "id bigint"), path)
    md = os.path.join(path, "metadata", "v1.metadata.json")
    meta = json.load(open(md))

    # r16: v3 with only v2-compatible features READS (per-feature
    # gate, see test_iceberg_v3_gate.py); unknown versions still
    # blanket-refuse
    m3 = dict(meta)
    m3["format-version"] = 3
    json.dump(m3, open(md, "w"))
    assert read_iceberg(spark, path).count() == 1
    m3["format-version"] = 4
    json.dump(m3, open(md, "w"))
    with pytest.raises(NotImplementedError, match="format-version 4"):
        read_iceberg(spark, path)
    json.dump(meta, open(md, "w"))

    # renamed column across schema versions: since r12 this engine's
    # own files carry PARQUET field ids, so the rename RESOLVES (by
    # field id) instead of gating — values intact under the new name
    m4 = dict(meta)
    m4["schemas"] = meta["schemas"] + [
        {
            "schema-id": 1,
            "type": "struct",
            "fields": [{"id": 1, "name": "renamed_id", "type": "long"}],
        }
    ]
    m4["current-schema-id"] = 1
    json.dump(m4, open(md, "w"))
    got = read_iceberg(spark, path)
    assert got.columns == ["renamed_id"]
    assert [r.renamed_id for r in got.collect()] == [1]

    # ...but a renamed history over UNSTAMPED files (a foreign writer
    # without field ids) still gates — resolution would be a guess
    import glob as _glob

    import pyarrow.parquet as _pq

    f0 = next(
        f
        for f in _glob.glob(os.path.join(path, "data", "*.parquet"))
        if _pq.ParquetFile(f).metadata.num_rows
    )
    spark.createDataFrame([(1,)], "id bigint").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "plain"))
    import shutil as _sh

    plain = next(
        f
        for f in os.listdir(str(tmp_path / "plain"))
        if f.endswith(".parquet") and not f.startswith(".")
    )
    _sh.copy(os.path.join(str(tmp_path / "plain"), plain), f0)
    with pytest.raises(NotImplementedError, match="PARQUET:field_id"):
        read_iceberg(spark, path).collect()

    json.dump(meta, open(md, "w"))
    assert read_iceberg(spark, path).count() == 1


def test_iceberg_foreign_manifest_with_extra_fields_parses(
    spark, tmp_path
):
    """Foreign writers ship manifests with stats fields ours doesn't
    write (value_counts, bounds maps...). Decoding runs off each
    file's EMBEDDED schema, so extra fields must parse and be
    ignored."""
    from census_asc5_data_pipeline_spark.sources.avro_io import (
        read_container_generic,
        write_container_generic,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1,), (2,)], "id bigint"), path)
    meta = json.load(
        open(os.path.join(path, "metadata", "v1.metadata.json"))
    )
    ml_path = meta["snapshots"][0]["manifest-list"]
    _s, manifests = read_container_generic(ml_path)
    man_path = manifests[0]["manifest_path"]
    sch, entries = read_container_generic(man_path)
    # rewrite the manifest with an extra stats map per data_file
    sch2 = json.loads(json.dumps(sch))
    # column_sizes: a stats field this engine's writer does NOT emit
    # (value_counts/bounds are native since r13, so they no longer
    # exercise the foreign-extra-field path)
    sch2["fields"][2]["type"]["fields"].append(
        {
            "name": "column_sizes",
            "type": ["null", {"type": "map", "values": "long"}],
        }
    )
    for e in entries:
        e["data_file"]["column_sizes"] = {"1": 2}
    with open(man_path, "wb") as fh:
        write_container_generic(fh, sch2, entries)
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == [
        1,
        2,
    ]


def test_iceberg_changes_and_tail_fold(spark, tmp_path):
    """Snapshot-diff change feed: each snapshot's inserts attribute
    through added_snapshot_id (re-listed prior manifests skipped);
    the fold advances its cursor only after the consumer succeeds."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        iceberg_tail_fold,
        read_iceberg_changes,
        write_iceberg,
    )

    path = str(tmp_path / "cf")
    write_iceberg(_mk(spark, [(1,), (2,)], "id bigint"), path)
    write_iceberg(_mk(spark, [(3,)], "id bigint"), path, mode="append")
    write_iceberg(_mk(spark, [(9,)], "id bigint"), path, mode="overwrite")
    full, last = read_iceberg_changes(spark, path)
    assert last == 3
    assert sorted((r.id, r._snapshot_id) for r in full.collect()) == [
        (1, 1),
        (2, 1),
        (3, 2),
        (9, 3),
    ]
    tail, _ = read_iceberg_changes(spark, path, since_snapshot_id=1)
    assert sorted((r.id, r._snapshot_id) for r in tail.collect()) == [
        (3, 2),
        (9, 3),
    ]

    cursor = str(tmp_path / "cur.json")
    seen: list = []

    def boom(df):
        raise RuntimeError("crash")

    with pytest.raises(RuntimeError):
        iceberg_tail_fold(spark, path, cursor, boom)
    assert not os.path.exists(cursor)

    def consume(df):
        seen.append(sorted((r.id, r._snapshot_id) for r in df.collect()))

    n, v = iceberg_tail_fold(spark, path, cursor, consume)
    assert (n, v) == (3, 3) and len(seen) == 1
    n2, v2 = iceberg_tail_fold(spark, path, cursor, consume)
    assert (n2, v2) == (0, 3) and len(seen) == 1
    write_iceberg(_mk(spark, [(10,)], "id bigint"), path, mode="append")
    n3, v3 = iceberg_tail_fold(spark, path, cursor, consume)
    assert (n3, v3) == (1, 4)
    assert seen[-1] == [(10, 4)]


def test_iceberg_write_schema_enforcement_and_history(spark, tmp_path):
    """Round-7 ADVICE: an append with drifted (name, type) fields
    raises instead of silently rebinding field ids; an overwrite
    registers the new schema as a NEW schema-id with name-stable
    field ids and carries the prior schemas list forward, so schema
    history survives in the metadata."""
    import pytest as _pytest

    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _current_metadata,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(1, "a")], "id bigint, s string"), path
    )
    drifted = spark.createDataFrame([(2, 9)], "id bigint, s bigint")
    with _pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg(drifted, path, mode="append")

    # matching append keeps schema-id and field ids
    write_iceberg(
        spark.createDataFrame([(2, "b")], "id bigint, s string"), path,
        mode="append",
    )
    _v, meta = _current_metadata(path)
    assert meta["current-schema-id"] == 0 and len(meta["schemas"]) == 1

    # overwrite evolves: new schema-id, history preserved, id column
    # keeps its field id, the new column gets a fresh one
    evolved = spark.createDataFrame([(3, 1.5)], "id bigint, v double")
    write_iceberg(evolved, path, mode="overwrite")
    _v, meta = _current_metadata(path)
    assert meta["current-schema-id"] == 1
    sids = [s["schema-id"] for s in meta["schemas"]]
    assert sids == [0, 1]
    s0 = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    s1 = {f["name"]: f["id"] for f in meta["schemas"][1]["fields"]}
    assert s1["id"] == s0["id"]  # name-stable field id
    assert s1["v"] not in s0.values()  # fresh id, no rebind
    assert meta["last-column-id"] == max(*s0.values(), *s1.values())
    back = read_iceberg(spark, path)
    assert [f.name for f in back.schema.fields] == ["id", "v"]
    assert back.collect()[0].v == 1.5


def test_iceberg_expire_snapshots_reclaims_and_guards(spark, tmp_path):
    """expire_snapshots (vacuum_delta twin, round-7 verdict #2):
    retained snapshots stay AS-OF readable, files ONLY expired
    snapshots referenced are deleted (data + manifest/manifest-list
    avros + old metadata json), and the mtime age guard spares
    anything staged after the current metadata (in-flight writer)."""
    import glob

    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        expire_snapshots,
        iceberg_snapshots,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(1,)], "id bigint"), path)  # s1
    write_iceberg(
        spark.createDataFrame([(9,)], "id bigint"), path, mode="overwrite"
    )  # s2
    write_iceberg(
        spark.createDataFrame([(10,)], "id bigint"), path, mode="append"
    )  # s3
    data_before = len(glob.glob(path + "/data/**/*.parquet", recursive=True))
    avros_before = len(glob.glob(path + "/metadata/*.avro"))

    # in-flight writer simulation: a parquet newer than current metadata
    inflight = os.path.join(path, "data", "part-inflight.parquet")
    open(inflight, "wb").write(b"PAR1")

    rep = expire_snapshots(path, keep_snapshots=2)
    assert rep["retained_snapshot_ids"] == [2, 3]
    # current + retained AS-OF reads intact
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == [9, 10]
    assert [
        r.id for r in read_iceberg(spark, path, snapshot_id=2).collect()
    ] == [9]
    # expired snapshot is gone from the log and unreadable
    assert [s["snapshot-id"] for s in iceberg_snapshots(path)] == [2, 3]
    with pytest.raises(ValueError, match="snapshot 1"):
        read_iceberg(spark, path, snapshot_id=1).collect()
    # s1's data files reclaimed; in-flight file spared
    assert rep["data_files_removed"] >= 1
    assert (
        len(glob.glob(path + "/data/**/*.parquet", recursive=True))
        == data_before - rep["data_files_removed"] + 1  # + inflight
    )
    assert os.path.exists(inflight)
    # s1's manifest + manifest list reclaimed, metadata pruned
    assert rep["manifests_removed"] >= 2
    assert len(glob.glob(path + "/metadata/*.avro")) < avros_before
    assert rep["metadata_files_removed"] >= 1


def test_iceberg_rewrite_data_files_compacts_silently(spark, tmp_path):
    """rewrite_data_files (optimize_delta twin): file count drops,
    rows identical, prior snapshots intact, the change feed emits
    NOTHING for the rewrite snapshot (status=0 EXISTING entries), a
    second rewrite is a no-op, and expire_snapshots afterwards
    reclaims the superseded small files."""
    import glob

    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        expire_snapshots,
        read_iceberg,
        read_iceberg_changes,
        rewrite_data_files,
        write_iceberg,
    )

    path = str(tmp_path / "o")
    for i in range(5):
        write_iceberg(
            spark.createDataFrame(
                [(i * 10 + j,) for j in range(3)], "id bigint"
            ),
            path,
            mode="append",
        )
    before_rows = sorted(
        r.id for r in read_iceberg(spark, path).collect()
    )
    ch_before, last_before = read_iceberg_changes(spark, path)
    n_changes = ch_before.count()
    files_before = len(
        glob.glob(path + "/data/**/*.parquet", recursive=True)
    )

    rep = rewrite_data_files(spark, path, target_file_bytes=1 << 30)
    assert rep["partitions_compacted"] == 1
    assert rep["files_after"] < rep["files_before"] == files_before
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == before_rows
    # pre-rewrite snapshot still AS-OF readable
    assert sorted(
        r.id
        for r in read_iceberg(spark, path, snapshot_id=5).collect()
    ) == before_rows
    # the rewrite emits nothing into the change feed
    ch_after, last_after = read_iceberg_changes(spark, path)
    assert last_after == rep["snapshot_id"] and ch_after.count() == n_changes
    # resuming FROM the pre-rewrite cursor also sees nothing
    tail, _ = read_iceberg_changes(
        spark, path, since_snapshot_id=last_before
    )
    assert tail.count() == 0
    # idempotent
    assert rewrite_data_files(spark, path, target_file_bytes=1 << 30)[
        "snapshot_id"
    ] is None
    # expire reclaims the superseded smalls; table reads unchanged
    expire_snapshots(path, keep_snapshots=1)
    assert (
        len(glob.glob(path + "/data/**/*.parquet", recursive=True))
        == rep["files_after"]
    )
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == before_rows


def test_iceberg_rewrite_partitioned_keeps_partition_grouping(
    spark, tmp_path
):
    """Partitioned rewrite compacts WITHIN partitions: partition
    pruning still works afterwards and each partition's rows are
    intact."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        rewrite_data_files,
        write_iceberg,
    )

    path = str(tmp_path / "p")
    for i in range(3):
        write_iceberg(
            spark.createDataFrame(
                [(i * 2, "a"), (i * 2 + 1, "b")], "id bigint, g string"
            ),
            path,
            mode="append",
            partition_by=["g"] if i == 0 else None,
        )
    rep = rewrite_data_files(spark, path, target_file_bytes=1 << 30)
    assert rep["partitions_compacted"] == 2
    got_a = read_iceberg(spark, path, partition_filter={"g": "a"})
    assert sorted(r.id for r in got_a.collect()) == [0, 2, 4]
    assert len(got_a.inputFiles()) == 1  # pruning still prunes
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == [0, 1, 2, 3, 4, 5]


def test_iceberg_tail_stream_source_reads_and_resumes(spark, tmp_path):
    """spark.readStream.format('iceberg_tail') tails the table: rows
    arrive tagged with their snapshot id; a restart from the same
    checkpoint resumes at the stored offset and emits ONLY snapshots
    committed while the stream was down; a rewrite_data_files
    compaction emits NOTHING (status=0 entries skipped)."""
    from census_asc5_data_pipeline_spark.sources import (
        iceberg_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        rewrite_data_files,
        write_iceberg,
    )

    iceberg_stream_source.register(spark)
    table = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out: list = []

    def sink(batch_df, epoch_id):
        out.extend((r.id, r._snapshot_id) for r in batch_df.collect())

    write_iceberg(
        spark.createDataFrame([(1,), (2,)], "id bigint"), table
    )  # s1
    write_iceberg(
        spark.createDataFrame([(3,)], "id bigint"), table, mode="append"
    )  # s2

    stream = (
        spark.readStream.format("iceberg_tail")
        .option("path", table)
        .load()
    )
    assert stream.columns == ["id", "_change_type", "_snapshot_id"]
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(out) == [(1, 1), (2, 1), (3, 2)]

    # while the stream is down: one compaction (must emit nothing)
    # and one real append (must emit)
    assert rewrite_data_files(
        spark, table, target_file_bytes=1 << 30
    )["snapshot_id"] == 3
    write_iceberg(
        spark.createDataFrame([(4,)], "id bigint"), table, mode="append"
    )  # s4
    out.clear()
    q = (
        spark.readStream.format("iceberg_tail")
        .option("path", table)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(out) == [(4, 4)]


def test_iceberg_tail_stream_emits_delete_retractions(spark, tmp_path):
    """The iceberg_tail stream survives a restart across row-level
    DELETEs (round-9 twin of the mid-compaction restart test):
    equality deletes arrive as key-only retraction rows, position
    deletes as FULL row images, both tagged _change_type='delete'
    with their snapshot id — and only the snapshots committed while
    the stream was down are emitted."""
    from census_asc5_data_pipeline_spark.sources import (
        iceberg_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        delete_iceberg_positions,
        delete_iceberg_where,
        write_iceberg,
    )

    iceberg_stream_source.register(spark)
    table = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out: list = []

    def sink(batch_df, epoch_id):
        out.extend(
            (r.id, r.user, r._change_type, r._snapshot_id)
            for r in batch_df.collect()
        )

    write_iceberg(
        spark.createDataFrame(
            [(i, f"u{i % 2}") for i in range(6)], "id bigint, user string"
        ),
        table,
    )  # s1
    q = (
        spark.readStream.format("iceberg_tail")
        .option("path", table)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(out) == sorted(
        (i, f"u{i % 2}", "insert", 1) for i in range(6)
    )

    # while the stream is down: one equality delete + one position
    # delete
    s_eq = delete_iceberg_where(
        spark.createDataFrame([("u1",)], "user string"), table
    )  # retracts ids 1,3,5 as the key-only row (NULL, 'u1')
    s_pos = delete_iceberg_positions(spark, table, "id = 0")
    out.clear()
    q = (
        spark.readStream.format("iceberg_tail")
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
            (None, "u1", "delete", s_eq),  # equality: key-only
            (0, "u0", "delete", s_pos),  # position: full image
        ],
        key=repr,
    )


def test_iceberg_bucket_truncate_transforms_write_and_prune(
    spark, tmp_path
):
    """bucket(N)/truncate(W) partition transforms (round-7 verdict
    #4): the writer stages spec-correct partition values (bucket =
    the spec's murmur3, matching Appendix B test vectors), the
    metadata carries 'bucket[N]'/'truncate[W]' transforms, and a
    partition_filter on the SOURCE column evaluates the transform on
    the literal driver-side so the file list prunes at planning
    time."""
    import json as _json

    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _bucket_of,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "b")
    rows = [(i, f"s{i:03d}") for i in range(120)]  # prefixes s0*, s1*
    write_iceberg(
        _mk(spark, rows, "id bigint, s string"),
        path,
        partition_by=["bucket(4, id)", "truncate(2, s)"],
    )
    meta = _json.load(
        open(os.path.join(path, "metadata", "v1.metadata.json"))
    )
    tr = [
        (f["name"], f["transform"])
        for f in meta["partition-specs"][0]["fields"]
    ]
    assert tr == [("id_bucket", "bucket[4]"), ("s_trunc", "truncate[2]")]

    full = read_iceberg(spark, path)
    assert full.count() == 120
    n_all = len(full.inputFiles())

    # source-column filter: transform evaluated on the literal
    pruned = read_iceberg(spark, path, partition_filter={"id": "34"})
    assert len(pruned.inputFiles()) < n_all
    assert 34 in {r.id for r in pruned.collect()}
    # every surviving file holds only ids of bucket(4, 34)
    want_b = _bucket_of(34, "long", 4)
    assert {
        _bucket_of(r.id, "long", 4) for r in pruned.collect()
    } == {want_b}

    # truncate prunes on the string source; all rows share the prefix
    pr2 = read_iceberg(spark, path, partition_filter={"s": "s042"})
    assert len(pr2.inputFiles()) < n_all
    assert {r.s[:2] for r in pr2.collect()} == {"s0"}
    assert "s042" in {r.s for r in pr2.collect()}

    # direct partition-FIELD filtering with a transformed value works
    pr3 = read_iceberg(
        spark, path, partition_filter={"id_bucket": str(want_b)}
    )
    assert set(pr3.inputFiles()) == set(pruned.inputFiles())

    # appends must keep the spec (mismatch raises)
    write_iceberg(
        _mk(spark, [(100, "zz")], "id bigint, s string"),
        path,
        mode="append",
    )
    with pytest.raises(ValueError, match="partition_by"):
        write_iceberg(
            _mk(spark, [(101, "zz")], "id bigint, s string"),
            path,
            mode="append",
            partition_by=["id"],
        )


def test_iceberg_temporal_transforms(spark, tmp_path):
    """year/month/day transforms store the spec's epoch offsets and
    prune from a date literal."""
    import datetime
    import json as _json

    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "d")
    rows = [
        (1, datetime.date(2017, 11, 16)),
        (2, datetime.date(2017, 12, 1)),
        (3, datetime.date(2024, 3, 5)),
    ]
    write_iceberg(
        _mk(spark, rows, "id bigint, d date"),
        path,
        partition_by=["month(d)"],
    )
    meta = _json.load(
        open(os.path.join(path, "metadata", "v1.metadata.json"))
    )
    f = meta["partition-specs"][0]["fields"][0]
    assert (f["name"], f["transform"]) == ("d_month", "month")
    # spec epoch-offset: 2017-11 -> (2017-1970)*12 + 10 = 574
    pruned = read_iceberg(
        spark, path, partition_filter={"d": "2017-11-16"}
    )
    assert [r.id for r in pruned.collect()] == [1]
    assert len(pruned.inputFiles()) < len(
        read_iceberg(spark, path).inputFiles()
    )


def test_iceberg_distributed_manifest_decode_same_results(
    spark, tmp_path, monkeypatch
):
    """Round-7 verdict #6: with the threshold forced to 1, manifest
    Avro decodes in EXECUTORS (mapInArrow over the path list) and the
    read results are identical to the driver-side decode — incl. a
    partitioned table whose pruning consumes the decoded partition
    structs."""
    from census_asc5_data_pipeline_spark.sources import iceberg_io

    path = str(tmp_path / "t")
    for i in range(4):  # 4 appends -> 4 manifests in the list
        iceberg_io.write_iceberg(
            _mk(
                spark,
                [(i * 10 + j, ["x", "y"][j % 2]) for j in range(4)],
                "id bigint, g string",
            ),
            path,
            mode="append",
            partition_by=["g"] if i == 0 else None,
        )
    driver_rows = sorted(
        (r.id, r.g)
        for r in iceberg_io.read_iceberg(spark, path).collect()
    )
    monkeypatch.setattr(iceberg_io, "_DIST_MANIFEST_THRESHOLD", 1)
    dist = iceberg_io.read_iceberg(spark, path)
    assert sorted((r.id, r.g) for r in dist.collect()) == driver_rows
    pruned = iceberg_io.read_iceberg(
        spark, path, partition_filter={"g": "x"}
    )
    assert sorted(r.id for r in pruned.collect()) == sorted(
        i * 10 + j for i in range(4) for j in range(4) if j % 2 == 0
    )
    assert all("g=x" in f for f in pruned.inputFiles())


def test_iceberg_renamed_history_resolves_by_field_id(spark, tmp_path):
    """A foreign table whose column was RENAMED mid-history (same
    field id, new name) reads correctly through parquet-footer
    field-id resolution: pre-rename files bind their OLD physical
    name to the current name, a column added after a file was written
    surfaces as typed nulls, and mixed-layout file sets union."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(
        _mk(spark, [(1, "a"), (2, "b")], "id bigint, s string"), path
    )  # s1 — physical names id/s
    before = set(glob.glob(path + "/data/**/*.parquet", recursive=True))
    write_iceberg(
        _mk(spark, [(3, "c")], "id bigint, s string"), path, mode="append"
    )  # s2 — will be rewritten as post-rename layout (txt)
    after = set(glob.glob(path + "/data/**/*.parquet", recursive=True))

    def restamp(fp, rename_s_to=None):
        t = pq.read_table(fp)
        cols, fields = [], []
        for i, nm in enumerate(t.schema.names):
            col = t.column(i)
            fid = {"id": 1, "s": 2}[nm]
            out_nm = (
                rename_s_to if nm == "s" and rename_s_to else nm
            )
            fields.append(
                pa.field(
                    out_nm,
                    t.schema.field(i).type,
                    metadata={b"PARQUET:field_id": str(fid).encode()},
                )
            )
            cols.append(col)
        pq.write_table(pa.table(cols, schema=pa.schema(fields)), fp)

    for fp in before:
        restamp(fp)  # old layout: physical 's', field id 2
    for fp in after - before:
        restamp(fp, rename_s_to="txt")  # new layout: physical 'txt'

    md = os.path.join(path, "metadata", "v2.metadata.json")
    meta = json.load(open(md))
    meta["schemas"] = meta["schemas"] + [
        {
            "schema-id": 1,
            "type": "struct",
            "fields": [
                {"id": 1, "name": "id", "type": "long"},
                {"id": 2, "name": "txt", "type": "string"},
                # column added AFTER every existing file: all-null
                {"id": 3, "name": "v", "type": "double"},
            ],
        }
    ]
    meta["current-schema-id"] = 1
    json.dump(meta, open(md, "w"))

    back = read_iceberg(spark, path)
    assert back.columns == ["id", "txt", "v"]
    rows = sorted((r.id, r.txt, r.v) for r in back.collect())
    assert rows == [(1, "a", None), (2, "b", None), (3, "c", None)]
    # non-read surfaces still gate on renamed histories
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        write_iceberg as wi,
    )

    with pytest.raises(NotImplementedError, match="read_iceberg"):
        wi(_mk(spark, [(9, "z")], "id bigint, s string"), path,
           mode="append")


def test_iceberg_equality_delete_merge_on_read(spark, tmp_path):
    """Row-level DELETE end-to-end (v2 merge-on-read): the delete
    commits O(keys) bytes, the read anti-joins it away, sequence
    semantics hold (data appended AFTER the delete is unaffected),
    AS-OF pre-delete still shows everything, and deletes-incapable
    surfaces (compaction, change feed) gate loudly."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        delete_iceberg_where,
        read_iceberg,
        read_iceberg_changes,
        rewrite_data_files,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(
        _mk(
            spark,
            [(i, f"u{i % 3}", float(i)) for i in range(12)],
            "id bigint, user string, v double",
        ),
        path,
    )  # s1, seq 1
    # delete two ids + one whole user
    s_del = delete_iceberg_where(
        _mk(spark, [(3,), (7,)], "id bigint"), path
    )  # s2, seq 2
    delete_iceberg_where(_mk(spark, [("u0",)], "user string"), path)  # s3
    # data appended AFTER the deletes: same ids/users must SURVIVE
    write_iceberg(
        _mk(spark, [(3, "u0", 99.0)], "id bigint, user string, v double"),
        path,
        mode="append",
    )  # s4, seq 4

    back = read_iceberg(spark, path)
    got = sorted((r.id, r.user) for r in back.collect())
    surviving_old = [
        (i, f"u{i % 3}")
        for i in range(12)
        if i not in (3, 7) and i % 3 != 0
    ]
    assert got == sorted(surviving_old + [(3, "u0")])
    # AS-OF: pre-delete snapshot shows all 12; post-id-delete snapshot
    # shows 10 with u0 still present
    assert read_iceberg(spark, path, snapshot_id=1).count() == 12
    as_of_2 = read_iceberg(spark, path, snapshot_id=s_del)
    assert sorted(r.id for r in as_of_2.collect()) == [
        i for i in range(12) if i not in (3, 7)
    ]
    # change feed over the whole history: 13 inserts (12 from s1, 1
    # from s4); equality deletes retract as KEY-ONLY rows (s2: id=3/7
    # with user/v NULL; s3: user='u0' with id/v NULL)
    feed, _last = read_iceberg_changes(spark, path)
    assert feed.where("_change_type = 'insert'").count() == 13
    dels = feed.where("_change_type = 'delete'").collect()
    assert sorted(
        ((r.id, r.user, r.v) for r in dels), key=repr
    ) == sorted(
        [(3, None, None), (7, None, None), (None, "u0", None)], key=repr
    )
    assert len({r._snapshot_id for r in dels}) == 2  # s2 and s3
    # delete-aware MAJOR compaction: identical rows, delete files
    # retired, AS-OF pre-compaction intact, change feed SILENT for
    # the rewrite snapshot
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _current_metadata,
        _snapshot_files,
        read_iceberg_changes as _ric,
    )

    stats = rewrite_data_files(spark, path)
    assert stats["snapshot_id"] is not None
    back2 = read_iceberg(spark, path)
    assert sorted((r.id, r.user) for r in back2.collect()) == got
    _v, meta = _current_metadata(path)
    _live, delete_fs = _snapshot_files(path, meta, None)
    assert delete_fs == []  # delete files retired at the new seq
    assert read_iceberg(spark, path, snapshot_id=s_del).count() == 10
    tail, _ = _ric(
        spark, path, since_snapshot_id=stats["snapshot_id"] - 1
    )
    assert (
        tail.where(f"_snapshot_id = {stats['snapshot_id']}").count() == 0
    )


def test_iceberg_position_delete_foreign_file(spark, tmp_path):
    """A foreign-written POSITION delete file (file_path, pos) drops
    exactly the targeted row: pos deletes apply at delete_seq >=
    data_seq, and rows of other files are untouched."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from census_asc5_data_pipeline_spark.sources.avro_io import (
        write_container_generic,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _MANIFEST_FILE_SCHEMA,
        _entry_schema_for,
        read_container_generic,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(
        _mk(spark, [(1, "a"), (2, "b")], "id bigint, s string"), path
    )
    # find the data file holding id=2 and its row position
    target, pos = None, None
    for fp in glob.glob(path + "/data/**/*.parquet", recursive=True):
        t = pq.read_table(fp)
        ids = t.column("id").to_pylist()
        if 2 in ids:
            target, pos = fp, ids.index(2)
    assert target is not None

    # foreign position-delete file + delete manifest + new snapshot
    del_fp = os.path.join(path, "data", "pos-delete.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": [os.path.abspath(target)],
                "pos": pa.array([pos], pa.int64()),
            }
        ),
        del_fp,
    )
    md = os.path.join(path, "metadata", "v1.metadata.json")
    meta = json.load(open(md))
    man_path = os.path.join(path, "metadata", "manifest-posdel.avro")
    with open(man_path, "wb") as fh:
        write_container_generic(
            fh,
            _entry_schema_for([]),
            [
                {
                    "status": 1,
                    "snapshot_id": 2,
                    "data_file": {
                        "content": 1,
                        "file_path": os.path.abspath(del_fp),
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": 1,
                        "file_size_in_bytes": os.path.getsize(del_fp),
                    },
                }
            ],
        )
    old_ml = meta["snapshots"][0]["manifest-list"]
    _s, prev = read_container_generic(old_ml)
    new_ml = os.path.join(path, "metadata", "snap-2-posdel.avro")
    with open(new_ml, "wb") as fh:
        write_container_generic(
            fh,
            _MANIFEST_FILE_SCHEMA,
            [
                {
                    k: m.get(k, 0)
                    for k in (
                        f["name"] for f in _MANIFEST_FILE_SCHEMA["fields"]
                    )
                }
                for m in prev
            ]
            + [
                {
                    "manifest_path": man_path,
                    "manifest_length": os.path.getsize(man_path),
                    "partition_spec_id": 0,
                    "content": 1,
                    "sequence_number": 2,
                    "min_sequence_number": 2,
                    "added_snapshot_id": 2,
                    "added_files_count": 1,
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": 1,
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                }
            ],
        )
    meta["snapshots"].append(
        {
            "snapshot-id": 2,
            "sequence-number": 2,
            "timestamp-ms": 1,
            "manifest-list": new_ml,
            "summary": {"operation": "delete"},
            "schema-id": 0,
        }
    )
    meta["current-snapshot-id"] = 2
    meta["last-sequence-number"] = 2
    v2 = os.path.join(path, "metadata", "v2.metadata.json")
    json.dump(meta, open(v2, "w"))
    open(os.path.join(path, "metadata", "version-hint.text"), "w").write(
        "2"
    )

    back = read_iceberg(spark, path)
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "a")]
    assert read_iceberg(spark, path, snapshot_id=1).count() == 2

    # change feed: POSITION deletes recover the deleted row's FULL
    # image via the (basename, _metadata.row_index) join — unlike
    # equality deletes' key-only retractions
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg_changes,
    )

    feed, last = read_iceberg_changes(spark, path)
    assert last == 2
    assert sorted(
        (r.id, r.s)
        for r in feed.where("_change_type = 'insert'").collect()
    ) == [(1, "a"), (2, "b")]
    dels = feed.where("_change_type = 'delete'").collect()
    assert [(r.id, r.s, r._snapshot_id) for r in dels] == [(2, "b", 2)]
    # incremental window starting after the delete is empty
    tail, _ = read_iceberg_changes(spark, path, since_snapshot_id=2)
    assert tail.count() == 0


def test_iceberg_position_delete_writer_roundtrip(spark, tmp_path):
    """delete_iceberg_positions writes a spec-shaped content=1
    (file_path, pos) delete file: predicate rows vanish, data
    appended after survives the same predicate, already-deleted rows
    are not re-listed, AS-OF pre-delete intact, the change feed
    recovers the FULL row images, and a no-match predicate commits
    nothing (returns None)."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        delete_iceberg_positions,
        read_iceberg,
        read_iceberg_changes,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(
        _mk(
            spark,
            [(i, f"u{i % 2}", float(i)) for i in range(8)],
            "id bigint, user string, v double",
        ),
        path,
    )  # s1
    s_del = delete_iceberg_positions(spark, path, "v < 3.0")  # s2
    assert s_del == 2
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == [3, 4, 5, 6, 7]
    # delete file on disk is sorted (file_path, pos) with exactly the
    # 3 matched positions
    import glob as _glob

    import pyarrow.parquet as pq

    dfp = _glob.glob(path + "/data/pos-delete-*.parquet")
    assert len(dfp) == 1
    t = pq.read_table(dfp[0])
    assert t.schema.names == ["file_path", "pos"]
    pairs = list(
        zip(t.column("file_path").to_pylist(), t.column("pos").to_pylist())
    )
    assert pairs == sorted(pairs) and len(pairs) == 3
    # append rows matching the same predicate AFTER the delete: survive
    write_iceberg(
        _mk(spark, [(100, "u0", 1.0)], "id bigint, user string, v double"),
        path,
        mode="append",
    )  # s3
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == [3, 4, 5, 6, 7, 100]
    # a second position delete over an overlapping predicate must NOT
    # re-list the already-deleted rows (v<3 rows are gone from the
    # live scan) — it deletes only the new matches
    s_del2 = delete_iceberg_positions(spark, path, "v <= 4.0")
    assert s_del2 is not None
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == [5, 6, 7]
    second = [
        p
        for p in _glob.glob(path + "/data/pos-delete-*.parquet")
        if p not in dfp
    ]
    assert len(second) == 1
    # rows 3, 4 and the appended id=100 (v=1.0): 3 positions, none
    # duplicating the first file's
    assert pq.ParquetFile(second[0]).metadata.num_rows == 3
    # AS-OF: pre-delete shows all 8; post-first-delete shows 5
    assert read_iceberg(spark, path, snapshot_id=1).count() == 8
    assert read_iceberg(spark, path, snapshot_id=s_del).count() == 5
    # change feed recovers FULL images of position-deleted rows
    feed, _ = read_iceberg_changes(spark, path)
    dels = feed.where(f"_change_type = 'delete' and _snapshot_id = {s_del}")
    assert sorted((r.id, r.user, r.v) for r in dels.collect()) == [
        (0, "u0", 0.0),
        (1, "u1", 1.0),
        (2, "u0", 2.0),
    ]
    # no-match predicate: no snapshot committed
    before = open(
        os.path.join(path, "metadata", "version-hint.text")
    ).read()
    assert delete_iceberg_positions(spark, path, "v > 1e9") is None
    after = open(
        os.path.join(path, "metadata", "version-hint.text")
    ).read()
    assert after == before


def test_iceberg_rollback_to_snapshot(spark, tmp_path):
    """rollback_to_snapshot points the current metadata at an older
    retained snapshot without touching data; the rollback itself is
    recorded in the snapshot log and every snapshot stays AS-OF
    readable."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        rollback_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1,), (2,)], "id bigint"), path)  # s1
    write_iceberg(_mk(spark, [(9,)], "id bigint"), path, "overwrite")  # s2
    assert [r.id for r in read_iceberg(spark, path).collect()] == [9]
    v = rollback_iceberg(path, 1)
    assert v == 3
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == [
        1,
        2,
    ]
    # s2 still AS-OF readable; bogus snapshot raises
    assert [
        r.id for r in read_iceberg(spark, path, snapshot_id=2).collect()
    ] == [9]
    with pytest.raises(ValueError, match="snapshot 99"):
        rollback_iceberg(path, 99)
    # a write after rollback appends on the rolled-back state
    write_iceberg(_mk(spark, [(3,)], "id bigint"), path, mode="append")
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == [
        1,
        2,
        3,
    ]


def test_iceberg_snapshot_as_of_timestamp(spark, tmp_path):
    """snapshot_as_of_timestamp_iceberg resolves through the
    snapshot-log (latest entry <= ts): boundary-exact, rollbacks
    append a log entry so AS-OF-after-rollback returns the restored
    snapshot, too-early ts raises, and foreign metadata without a
    snapshot-log falls back to the snapshots' own timestamps."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        rollback_iceberg,
        snapshot_as_of_timestamp_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1,), (2,)], "id bigint"), path)  # s1
    write_iceberg(_mk(spark, [(3,)], "id bigint"), path, "append")  # s2
    rollback_iceberg(path, 1)  # appends a log entry for snapshot 1

    hint = os.path.join(path, "metadata", "version-hint.text")
    v = int(open(hint).read())
    md = os.path.join(path, "metadata", f"v{v}.metadata.json")
    meta = json.load(open(md))
    log = meta["snapshot-log"]
    assert [e["snapshot-id"] for e in log] == [1, 2, 1]
    for e, ts in zip(log, (1000, 2000, 3000)):
        e["timestamp-ms"] = ts
    json.dump(meta, open(md, "w"))

    with pytest.raises(ValueError, match="no Iceberg snapshot"):
        snapshot_as_of_timestamp_iceberg(path, 999)
    assert snapshot_as_of_timestamp_iceberg(path, 1000) == 1
    assert snapshot_as_of_timestamp_iceberg(path, 1999) == 1
    assert snapshot_as_of_timestamp_iceberg(path, 2000) == 2
    assert snapshot_as_of_timestamp_iceberg(path, 2999) == 2
    # the rollback's log entry wins at/after its timestamp: 'the
    # table AS OF t' honors the restore
    assert snapshot_as_of_timestamp_iceberg(path, 3000) == 1
    assert snapshot_as_of_timestamp_iceberg(path, 2**60) == 1
    sid = snapshot_as_of_timestamp_iceberg(path, 2500)
    assert sorted(
        r.id for r in read_iceberg(spark, path, snapshot_id=sid).collect()
    ) == [1, 2, 3]
    # foreign metadata without a snapshot-log: snapshots' timestamps
    del meta["snapshot-log"]
    for s, ts in zip(meta["snapshots"], (100, 200)):
        s["timestamp-ms"] = ts
    json.dump(meta, open(md, "w"))
    assert snapshot_as_of_timestamp_iceberg(path, 150) == 1
    assert snapshot_as_of_timestamp_iceberg(path, 200) == 2


def test_iceberg_merge_on_read_plan_has_no_nested_loop(spark, tmp_path):
    """The delete anti-joins carry equi keys (basename+pos / the
    equality columns) with the sequence comparison as a RESIDUAL, so
    the physical plan must stay hash/sort-merge — a
    BroadcastNestedLoopJoin here would be O(data x deletes) at scale."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        delete_iceberg_where,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(
        _mk(spark, [(i, f"u{i}") for i in range(8)], "id bigint, s string"),
        path,
    )
    delete_iceberg_where(_mk(spark, [(3,)], "id bigint"), path)
    df = read_iceberg(spark, path)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert df.count() == 7


def test_iceberg_metadata_log_and_retention(spark, tmp_path):
    """Every commit appends the previous metadata file to
    metadata-log; previous-versions-max trims the list; with
    delete-after-commit enabled the trimmed files are physically
    removed while the table stays fully readable."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg,
        set_iceberg_properties,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    df = _mk(spark, [(1, "a")], "id bigint, s string")
    write_iceberg(df, path)  # v1: no previous → empty log
    md = os.path.join(path, "metadata")
    meta = json.load(open(os.path.join(md, "v1.metadata.json")))
    assert meta.get("metadata-log") == []

    write_iceberg(df, path, mode="append")  # v2
    write_iceberg(df, path, mode="append")  # v3
    meta = json.load(open(os.path.join(md, "v3.metadata.json")))
    log = meta["metadata-log"]
    assert [os.path.basename(e["metadata-file"]) for e in log] == [
        "v1.metadata.json",
        "v2.metadata.json",
    ]
    assert all(e["timestamp-ms"] > 0 for e in log)
    assert all(os.path.exists(e["metadata-file"]) for e in log)

    # retention: keep at most 1 previous version, delete on commit
    v = set_iceberg_properties(
        path,
        {
            "write.metadata.previous-versions-max": "1",
            "write.metadata.delete-after-commit.enabled": "true",
        },
    )
    assert v == 4
    write_iceberg(df, path, mode="append")  # v5: trims to [v4], drops v1-v3
    meta = json.load(open(os.path.join(md, "v5.metadata.json")))
    assert [os.path.basename(e["metadata-file"]) for e in meta["metadata-log"]] == [
        "v4.metadata.json"
    ]
    gone = [f"v{i}.metadata.json" for i in (1, 2, 3)]
    assert all(not os.path.exists(os.path.join(md, g)) for g in gone)
    assert os.path.exists(os.path.join(md, "v4.metadata.json"))
    # table still reads fine (4 appended copies of the row)
    assert read_iceberg(spark, path).count() == 4


def test_iceberg_expire_drops_dangling_metadata_log(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        expire_snapshots,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    df = _mk(spark, [(1, "a")], "id bigint, s string")
    for _ in range(3):
        write_iceberg(df, path, mode="append")
    import time as _time

    _time.sleep(0.05)  # ensure expired files are strictly older
    expire_snapshots(path, keep_snapshots=1)
    md = os.path.join(path, "metadata")
    hint = int(open(os.path.join(md, "version-hint.text")).read())
    meta = json.load(open(os.path.join(md, f"v{hint}.metadata.json")))
    for e in meta["metadata-log"]:
        assert os.path.exists(e["metadata-file"]), e


def test_rewrite_data_files_zorder(spark, tmp_path):
    """rewrite_data_files(zorder_by=...) (round-11): the Iceberg twin
    of OPTIMIZE ZORDER — re-clustering tightens per-file zone maps on
    a 2-D planted predicate, content is unchanged, the change feed
    stays silent (status=0 rewrite), prior snapshots intact."""
    import os as _os

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _current_metadata,
        _local,
        _snapshot_files,
        read_iceberg,
        read_iceberg_changes,
        rewrite_data_files,
        write_iceberg,
    )

    path = str(tmp_path / "t")
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
    write_iceberg(df, path)

    def _overlap_count(x_hi, y_hi):
        _v, meta = _current_metadata(path)
        live, _dels = _snapshot_files(path, meta, None)
        hits = 0
        for d in live:
            pf = _pq.ParquetFile(_os.path.abspath(_local(d["file_path"])))
            mins = {"x": None, "y": None}
            for rg in range(pf.metadata.num_row_groups):
                for ci in range(pf.metadata.num_columns):
                    col = pf.metadata.row_group(rg).column(ci)
                    nm = col.path_in_schema
                    if nm in mins and col.statistics is not None:
                        st = col.statistics
                        mins[nm] = (
                            st.min
                            if mins[nm] is None
                            else min(mins[nm], st.min)
                        )
            if (
                mins["x"] is not None
                and mins["x"] < x_hi
                and mins["y"] is not None
                and mins["y"] < y_hi
            ):
                hits += 1
        return hits

    assert _overlap_count(8, 8) == 8  # scattered: every file overlaps
    pre = sorted(
        (r.x, r.y, r.payload) for r in read_iceberg(spark, path).collect()
    )
    res = rewrite_data_files(
        spark, path, target_file_bytes=5_000, zorder_by=["x", "y"]
    )
    assert res["snapshot_id"] is not None and res["files_after"] >= 4
    after = _overlap_count(8, 8)
    assert after < 8 and after <= res["files_after"] // 2
    post = sorted(
        (r.x, r.y, r.payload) for r in read_iceberg(spark, path).collect()
    )
    assert post == pre
    # pure rearrangement: the change feed emits nothing for the rewrite
    feed, _ = read_iceberg_changes(spark, path, since_snapshot_id=1)
    assert feed.count() == 0
    assert read_iceberg(spark, path, snapshot_id=1).count() == n
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zorder_by column"):
        rewrite_data_files(spark, path, zorder_by=["nope"])
