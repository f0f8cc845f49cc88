"""Iceberg branch WRITES + write-audit-publish (round-13 verdict #3,
table-spec §refs): write_iceberg(branch=)/MoR DML advance
refs[branch] WITHOUT moving main, read_iceberg(ref=) audits the
unpublished head, fast_forward publishes (ancestry-checked over
parent-snapshot-id), expire_snapshots keeps the unpublished branch
alive, and refs survive ordinary writes."""

from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.sources.iceberg_io import (
    create_branch,
    drop_ref,
    fast_forward,
    iceberg_refs,
    read_iceberg,
    tag_snapshot,
    write_iceberg,
)
from census_asc5_data_pipeline_spark.sources.merge import (
    merge_into,
    update_where,
)


def _mk(spark, rows, ddl="id bigint, v bigint"):
    return spark.createDataFrame(rows, ddl)


def _ids(spark, path, **kw):
    return sorted(r.id for r in read_iceberg(spark, path, **kw).collect())


def test_wap_write_audit_publish_roundtrip(spark, tmp_path):
    """The flagship WAP flow: append onto a branch (main unmoved),
    audit the branch head by ref, fast-forward main to publish, and
    only then does main see the rows."""
    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10)]), path)
    create_branch(path, "audit")
    write_iceberg(_mk(spark, [(2, 20)]), path, branch="audit")
    # WRITE landed on the branch only
    assert _ids(spark, path) == [1]
    assert _ids(spark, path, ref="audit") == [1, 2]
    # a second branch append stacks on the branch head
    write_iceberg(_mk(spark, [(3, 30)]), path, branch="audit")
    assert _ids(spark, path) == [1]
    assert _ids(spark, path, ref="audit") == [1, 2, 3]
    # AUDIT passed → PUBLISH
    fast_forward(path, "main", "audit")
    assert _ids(spark, path) == [1, 2, 3]
    # the branch still points at the published head; drop closes out
    assert iceberg_refs(path)["audit"]["snapshot-id"] == max(
        s["snapshot-id"]
        for s in __import__(
            "census_asc5_data_pipeline_spark.sources.iceberg_io",
            fromlist=["iceberg_snapshots"],
        ).iceberg_snapshots(path)
    )
    drop_ref(path, "audit")
    assert "audit" not in iceberg_refs(path)


def test_branch_write_guards(spark, tmp_path):
    """Unknown branches, tags, and fresh tables refuse branch
    writes with actionable messages."""
    path = str(tmp_path / "t")
    with pytest.raises(ValueError, match="existing table"):
        write_iceberg(_mk(spark, [(1, 1)]), path, branch="b")
    write_iceberg(_mk(spark, [(1, 10)]), path)
    with pytest.raises(ValueError, match="unknown branch"):
        write_iceberg(_mk(spark, [(2, 2)]), path, branch="nope")
    tag_snapshot(path, "v1")
    with pytest.raises(ValueError, match="not a branch"):
        write_iceberg(_mk(spark, [(2, 2)]), path, branch="v1")
    # Delta has no refs
    with pytest.raises(ValueError, match="Iceberg refs feature"):
        update_where(
            spark, "delta", path, "id = 1", {"v": "0"}, branch="b"
        )


def test_refs_survive_main_writes(spark, tmp_path):
    """Pre-r13 write_iceberg rebuilt the metadata without ``refs`` —
    any ordinary write silently dropped every tag/branch. They must
    survive now."""
    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10)]), path)
    tag_snapshot(path, "v1")
    create_branch(path, "dev")
    write_iceberg(_mk(spark, [(2, 20)]), path)  # ordinary main append
    refs = iceberg_refs(path)
    assert set(refs) == {"v1", "dev"}
    # and the branch still reads its original head, not main's
    assert _ids(spark, path, ref="dev") == [1]
    assert _ids(spark, path) == [1, 2]


def test_mor_dml_advances_branch_only(spark, tmp_path):
    """MERGE and UPDATE with branch= scan the BRANCH head and advance
    only the branch ref — main rows stay byte-identical until
    publish."""
    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10), (2, 20)]), path)
    create_branch(path, "stage")
    update_where(
        spark, "iceberg", path, "id = 1", {"v": "v + 1"}, branch="stage"
    )
    merge_into(
        spark, "iceberg", path,
        _mk(spark, [(2, 99), (3, 30)]),
        "t.id = s.id",
        matched=[("update", None, {"v": "s.v"})],
        not_matched={"id": "s.id", "v": "s.v"},
        branch="stage",
    )
    main_rows = sorted(
        (r.id, r.v) for r in read_iceberg(spark, path).collect()
    )
    stage_rows = sorted(
        (r.id, r.v)
        for r in read_iceberg(spark, path, ref="stage").collect()
    )
    assert main_rows == [(1, 10), (2, 20)]
    assert stage_rows == [(1, 11), (2, 99), (3, 30)]
    fast_forward(path, "main", "stage")
    assert sorted(
        (r.id, r.v) for r in read_iceberg(spark, path).collect()
    ) == stage_rows


def test_fast_forward_refuses_non_ancestor(spark, tmp_path):
    """After main moves past the branch point, the branch head no
    longer descends from main's head — fast_forward must refuse
    (publishing would silently discard main's commit)."""
    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10)]), path)
    create_branch(path, "b")
    write_iceberg(_mk(spark, [(2, 20)]), path, branch="b")
    write_iceberg(_mk(spark, [(3, 30)]), path)  # main diverges
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward(path, "main", "b")
    # and main kept its own line
    assert _ids(spark, path) == [1, 3]


def test_fast_forward_branch_target_and_noop(spark, tmp_path):
    """fast_forward also moves branch targets (branch→branch publish)
    and is a metadata no-op when already at the head; tags refuse."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _current_metadata,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10)]), path)
    create_branch(path, "dev")
    create_branch(path, "release")
    write_iceberg(_mk(spark, [(2, 20)]), path, branch="dev")
    fast_forward(path, "release", "dev")
    assert _ids(spark, path, ref="release") == [1, 2]
    assert _ids(spark, path) == [1]
    v_before = _current_metadata(path)[0]
    assert fast_forward(path, "release", "dev") == v_before  # no-op
    tag_snapshot(path, "v1")
    with pytest.raises(ValueError, match="tags are immutable"):
        fast_forward(path, "v1", "dev")


def test_expire_keeps_unpublished_branch(spark, tmp_path):
    """expire_snapshots retains the unpublished branch head (and its
    data) even when the keep-N window would drop it."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        expire_snapshots,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10)]), path)
    create_branch(path, "wap")
    write_iceberg(_mk(spark, [(2, 20)]), path, branch="wap")
    for i in range(3, 6):  # main churns past the branch point
        write_iceberg(_mk(spark, [(i, i * 10)]), path)
    out = expire_snapshots(path, keep_snapshots=1)
    refs = iceberg_refs(path)
    assert "wap" in refs
    assert refs["wap"]["snapshot-id"] in out["retained_snapshot_ids"]
    # the unpublished head still reads in full (its inherited data
    # files are live through the retained branch snapshot)
    assert _ids(spark, path, ref="wap") == [1, 2]
    # main diverged past the branch point, so publishing is rightly
    # no longer a fast-forward
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward(path, "main", "wap")


def test_branch_deletes_advance_branch_only(spark, tmp_path):
    """Both delete modes (equality + position) accept branch= and
    advance only the ref — the full DML verb set works unpublished."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        delete_iceberg_positions,
        delete_iceberg_where,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10), (2, 20), (3, 30)]), path)
    create_branch(path, "b")
    delete_iceberg_positions(spark, path, "id = 1", branch="b")
    delete_iceberg_where(
        spark.createDataFrame([(2,)], "id bigint"), path, branch="b"
    )
    assert _ids(spark, path) == [1, 2, 3]
    assert _ids(spark, path, ref="b") == [3]
    fast_forward(path, "main", "b")
    assert _ids(spark, path) == [3]


def test_branch_commits_invisible_to_streams_until_publish(spark, tmp_path):
    """WAP isolation for consumers: the iceberg_tail stream's offset
    and the batch change feed stop at the MAIN head — unpublished
    branch snapshots never leak; a fast_forward publish moves the head
    past them so they replay, in id order, exactly at publish time."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        iceberg_snapshots,
        read_iceberg_changes,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_stream_source import (
        IcebergTailStreamReader,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10)]), path)
    main_head = iceberg_snapshots(path)[-1]["snapshot-id"]
    create_branch(path, "b")
    write_iceberg(_mk(spark, [(2, 20)]), path, branch="b")
    write_iceberg(_mk(spark, [(3, 30)]), path, branch="b")

    r = IcebergTailStreamReader({"path": path})
    assert r.latestOffset() == {"snapshot_id": main_head}
    # batch change feed: cursor parks at main's head, no branch rows
    df, last = read_iceberg_changes(
        spark, path, since_snapshot_id=main_head
    )
    assert last == main_head and df.count() == 0

    fast_forward(path, "main", "b")
    new_head = iceberg_snapshots(path)[-1]["snapshot-id"]
    assert r.latestOffset() == {"snapshot_id": new_head}
    df2, last2 = read_iceberg_changes(
        spark, path, since_snapshot_id=main_head
    )
    assert last2 == new_head
    assert sorted(
        (x.id, x._change_type) for x in df2.collect()
    ) == [(2, "insert"), (3, "insert")]


def test_wap_flow_entirely_in_sql(spark, tmp_path):
    """The WAP flow with NOTHING but SQL statements: CREATE TABLE →
    INSERT → CALL create_branch → (branch write via Python — INSERT
    has no branch syntax) → audit via VERSION AS OF 'name' → CALL
    fast_forward → CALL drop_ref."""
    from census_asc5_data_pipeline_spark.sources.merge import (
        dml_sql,
        query_sql,
    )

    cat: dict = {}
    p = str(tmp_path / "t")
    dml_sql(
        spark,
        f"CREATE TABLE t (id BIGINT, v BIGINT) USING iceberg "
        f"LOCATION '{p}'",
        cat,
    )
    dml_sql(spark, "INSERT INTO t VALUES (1, 10)", cat)
    dml_sql(spark, "CALL system.create_branch(t, 'audit')", cat)
    write_iceberg(_mk(spark, [(2, 20)]), p, branch="audit")
    assert sorted(
        r.id
        for r in query_sql(
            spark, "SELECT id FROM t VERSION AS OF 'audit'", cat
        ).collect()
    ) == [1, 2]
    assert sorted(
        r.id for r in query_sql(spark, "SELECT id FROM t", cat).collect()
    ) == [1]
    dml_sql(spark, "CALL fast_forward(t, 'main', 'audit')", cat)
    assert sorted(
        r.id for r in query_sql(spark, "SELECT id FROM t", cat).collect()
    ) == [1, 2]
    dml_sql(spark, "CALL drop_ref(t, 'audit')", cat)
    assert iceberg_refs(p) == {}
    dml_sql(spark, "CALL create_tag(t, 'v1')", cat)
    assert iceberg_refs(p)["v1"]["type"] == "tag"


def test_branch_write_on_partitioned_table(spark, tmp_path):
    """Branch appends on a transform-partitioned table stage through
    the table's spec exactly like main appends (partition dirs +
    typed manifest values), and publish carries them to main."""
    path = str(tmp_path / "t")
    write_iceberg(
        _mk(spark, [(1, 10), (12, 20)]), path,
        partition_by=["bucket(4, id)"],
    )
    create_branch(path, "b")
    write_iceberg(_mk(spark, [(3, 30), (14, 40)]), path, branch="b")
    assert _ids(spark, path, ref="b") == [1, 3, 12, 14]
    assert _ids(spark, path) == [1, 12]
    # partition pruning still works on the branch read after publish
    fast_forward(path, "main", "b")
    assert _ids(spark, path) == [1, 3, 12, 14]


def test_branch_merge_cdf_and_update_images(spark, tmp_path):
    """Branch MoR UPDATE post-images land under the table's partition
    spec (identity) and read back correctly with the position deletes
    applied at the branch head."""
    path = str(tmp_path / "t")
    write_iceberg(
        _mk(spark, [(1, 10), (2, 20)]), path, partition_by=["v"]
    )
    create_branch(path, "b")
    update_where(
        spark, "iceberg", path, "id = 1", {"v": "99"}, branch="b"
    )
    got = sorted(
        (r.id, r.v)
        for r in read_iceberg(spark, path, ref="b").collect()
    )
    assert got == [(1, 99), (2, 20)]
    assert sorted(
        (r.id, r.v) for r in read_iceberg(spark, path).collect()
    ) == [(1, 10), (2, 20)]
