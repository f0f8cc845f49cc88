"""Crash-injection tests for sources/versioned.py — the
manifest-pointer snapshot commit replacing the two-rename swap
(round-4 verdict item 6 + the merge_cdc_stream crash-window advice).

Each test simulates a kill between two steps of the commit protocol
by invoking the module's internals partially, then asserts a reader
still resolves a COMPLETE snapshot and a subsequent commit heals.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.sources import versioned as V


def _mk(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v string")


def _vals(spark, table):
    return sorted(r.v for r in V.read_current(spark, table).collect())


def test_adopts_legacy_plain_dir_and_commits(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk(spark, ["a", "b"]).write.parquet(table)  # legacy seed layout
    assert _vals(spark, table) == ["a", "b"]  # adoption as v0
    V.commit_version(_mk(spark, ["c"]), table)
    assert _vals(spark, table) == ["c"]
    # legacy readers on the published path still work (symlink view)
    assert sorted(r.v for r in spark.read.parquet(table).collect()) == ["c"]


def test_crash_after_version_write_before_pointer(spark, tmp_path):
    """Kill between writing the new version dir and moving the
    pointer: readers must still see the OLD snapshot; the orphan is
    pruned by the next commit."""
    table = str(tmp_path / "t")
    V.commit_version(_mk(spark, ["old"]), table)
    # simulate: new version fully written, pointer never moved
    orphan = V._version_dir(table, 99)
    _mk(spark, ["half"]).write.parquet(orphan)
    assert _vals(spark, table) == ["old"]
    V.commit_version(_mk(spark, ["new"]), table, keep=1)
    assert _vals(spark, table) == ["new"]
    assert not os.path.exists(orphan)  # pruned


def test_crash_between_pointer_commit_and_symlink_flip(spark, tmp_path):
    """Kill after the pointer moved but before the symlink flip: the
    pointer is the commit point, so readers (and recover) must resolve
    the NEW version; the stale symlink is healed."""
    table = str(tmp_path / "t")
    V.commit_version(_mk(spark, ["v0"]), table)
    nxt = V._version_dir(table, 1)
    _mk(spark, ["v1"]).write.parquet(nxt)
    V._write_pointer(table, 1)
    # symlink still points at v0 (simulated crash here)
    assert os.path.realpath(table) == os.path.realpath(V._version_dir(table, 0))
    assert _vals(spark, table) == ["v1"]  # pointer wins
    V.recover(table)
    assert os.path.realpath(table) == os.path.realpath(nxt)  # healed


def test_lost_pointer_recovers_newest_complete_version(spark, tmp_path):
    table = str(tmp_path / "t")
    V.commit_version(_mk(spark, ["v0"]), table)
    V.commit_version(_mk(spark, ["v1"]), table)
    os.remove(V._pointer_path(table))
    # incomplete junk must not win recovery
    os.makedirs(V._version_dir(table, 7))
    assert _vals(spark, table) == ["v1"]


def test_old_versions_retained_then_pruned(spark, tmp_path):
    table = str(tmp_path / "t")
    for i in range(5):
        V.commit_version(_mk(spark, [f"v{i}"]), table, keep=3)
    vs = V.list_versions(table)
    assert len(vs) == 3 and vs[-1] == 4
    # a reader that resolved the previous version still has a live dir
    prev = V._version_dir(table, 3)
    assert sorted(r.v for r in spark.read.parquet(prev).collect()) == ["v3"]


def test_reader_always_complete_under_interleaved_commits(spark, tmp_path):
    """The invariant the old two-rename swap violated: at EVERY point
    during a commit sequence the published path and the pointer both
    resolve to a complete dataset."""
    table = str(tmp_path / "t")
    V.commit_version(_mk(spark, ["a", "b", "c"]), table)
    for i in range(3):
        df = V.read_current(spark, table)
        V.commit_version(df.withColumn("v", F.concat("v", F.lit("x"))), table)
        got = _vals(spark, table)
        assert got == sorted(w + "x" * (i + 1) for w in ["a", "b", "c"])
        assert os.path.exists(os.path.join(os.path.realpath(table), "_SUCCESS"))


def test_time_travel_reads_retained_versions(spark, tmp_path):
    table = str(tmp_path / "t")
    for i in range(4):
        V.commit_version(_mk(spark, [f"v{i}"]), table, keep=3)
    # current + two predecessors retained
    assert sorted(r.v for r in V.read_version(spark, table, 2).collect()) == ["v2"]
    assert sorted(r.v for r in V.read_version(spark, table, 3).collect()) == ["v3"]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        V.read_version(spark, table, 0)  # pruned
    with _pytest.raises(FileNotFoundError):
        V.read_version(spark, table, 99)  # never written


def test_legacy_writer_clobbering_symlink_is_adopted_not_wedged(spark, tmp_path):
    """Code-review regression (r5): a legacy df.write.parquet(table)
    replaces the symlink with a real directory AFTER versions exist;
    adoption must take the next free version number (renaming onto an
    existing v_000000 raises ENOTEMPTY and would wedge the table)."""
    import shutil

    table = str(tmp_path / "t")
    V.commit_version(_mk(spark, ["v0"]), table)
    V.commit_version(_mk(spark, ["v1"]), table)
    # simulate the legacy writer: blow away the symlink, write a real dir
    os.remove(table)
    _mk(spark, ["legacy"]).write.parquet(table)
    assert _vals(spark, table) == ["legacy"]  # adopted as v2, now current
    assert V.list_versions(table)[-1] == 2
    V.commit_version(_mk(spark, ["v3"]), table)
    assert _vals(spark, table) == ["v3"]


def test_as_of_version_and_timestamp(spark, tmp_path):
    """VERSION AS OF / TIMESTAMP AS OF resolution: timestamp picks the
    newest version committed at-or-before it (from the durable
    _commit_meta stamp, written before the pointer moves); exactly one
    selector is required; a timestamp before all history raises."""
    import pytest as _pytest

    table = str(tmp_path / "t")
    for i, ts in enumerate([1000, 2000, 3000]):
        V.commit_version(_mk(spark, [f"v{i}"]), table, keep=5, commit_ts_ms=ts)
    assert _df_vals(V.read_as_of(spark, table, version=1)) == ["v1"]
    assert V.version_as_of_timestamp(table, 2500) == 1
    assert _df_vals(V.read_as_of(spark, table, timestamp_ms=2500)) == ["v1"]
    assert _df_vals(V.read_as_of(spark, table, timestamp_ms=3000)) == ["v2"]
    with _pytest.raises(FileNotFoundError):
        V.version_as_of_timestamp(table, 500)  # before all history
    with _pytest.raises(ValueError):
        V.read_as_of(spark, table)  # no selector
    with _pytest.raises(ValueError):
        V.read_as_of(spark, table, version=1, timestamp_ms=2500)  # both


def test_register_versioned_views_sql_surface(spark, tmp_path):
    """register_versioned_views exposes the current snapshot under
    `name` and each retained version under `name__vN` — plain SQL time
    travel; registered views stay pinned to their immutable version
    dir even after a later commit."""
    table = str(tmp_path / "t")
    for i in range(3):
        V.commit_version(_mk(spark, [f"v{i}"]), table, keep=5)
    names = V.register_versioned_views(spark, "tt_tbl", table)
    assert names == ["tt_tbl", "tt_tbl__v0", "tt_tbl__v1", "tt_tbl__v2"]
    assert [r.v for r in spark.sql("SELECT v FROM tt_tbl__v0").collect()] == ["v0"]
    assert [r.v for r in spark.sql("SELECT v FROM tt_tbl").collect()] == ["v2"]
    # a later commit doesn't move an already-registered version view
    V.commit_version(_mk(spark, ["v3"]), table, keep=5)
    assert [r.v for r in spark.sql("SELECT v FROM tt_tbl__v1").collect()] == ["v1"]


def _df_vals(df):
    return sorted(r.v for r in df.collect())
