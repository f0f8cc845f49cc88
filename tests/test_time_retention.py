"""Time-based retention (r14 — r13 verdict #4): ``VACUUM t RETAIN n
HOURS`` resolves Delta versions by commit timestamp
(vacuum_delta(retain_ms=)), and ``expire_snapshots(older_than_ms=)``
is the Iceberg table-level twin of a branch's max-snapshot-age-ms.
Boundary version/snapshot exactly AT the cutoff is retained. Tests
backdate commit timestamps in the log/metadata (the timestamp
source of record) instead of sleeping."""

from __future__ import annotations

import json
import os
import time

import pytest

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
from census_asc5_data_pipeline_spark.sources.merge import dml_sql

HOUR_MS = 3_600_000


def _backdate_delta(path, version, age_ms):
    """Rewrite commitInfo.timestamp of one commit to now - age_ms."""
    fp = d._commit_file(path, version)
    lines = []
    stamp = int(time.time() * 1000) - age_ms
    for line in open(fp):
        if not line.strip():
            continue
        action = json.loads(line)
        if "commitInfo" in action:
            action["commitInfo"]["timestamp"] = stamp
        lines.append(json.dumps(action))
    with open(fp, "w") as fh:
        fh.write("\n".join(lines) + "\n")


@pytest.fixture()
def delta_table(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(5):
        d.write_delta(
            spark.createDataFrame([(i,)], "k long").coalesce(1), path
        )
    # v0..v2 are 10h old, v3 just inside the 2h window, v4 now
    for v, age_ms in [
        (0, 10 * HOUR_MS),
        (1, 10 * HOUR_MS),
        (2, 10 * HOUR_MS),
        (3, 2 * HOUR_MS - 60_000),
    ]:
        _backdate_delta(path, v, age_ms)
    # vacuum's mtime in-flight guard keys on file mtimes, not the
    # rewritten commitInfo — age the files too
    now = time.time()
    for root, _dirs, files in os.walk(path):
        for f in files:
            fp = os.path.join(root, f)
            os.utime(fp, (now - 36000, now - 36000))
    os.utime(d._commit_file(path, 4), (now, now))
    return path


def test_delta_retain_hours(spark, delta_table):
    path = delta_table
    res = d.vacuum_delta(spark, path, retain_ms=2 * HOUR_MS)
    # v3 sits inside the window -> retained; v0-v2 pruned
    assert res["retained_versions"] == [3, 4]
    assert res["log_files_removed"] == 3
    assert d.read_delta(spark, path).count() == 5  # data all live
    assert d.read_delta(spark, path, version=3).count() == 4
    with pytest.raises(FileNotFoundError):
        d.read_delta(spark, path, version=1).count()


def test_delta_retain_hours_sql(spark, delta_table):
    path = delta_table
    cat = {"t": ("delta", path)}
    dml_sql(spark, "VACUUM t RETAIN 2 HOURS", cat)
    # checkpointed at the window's oldest version (3), pruned below
    assert d.delta_versions(path) == [3, 4]
    assert d.read_delta(spark, path, version=3).count() == 4


def test_delta_always_keeps_latest(spark, tmp_path):
    path = str(tmp_path / "all_old")
    for i in range(3):
        d.write_delta(
            spark.createDataFrame([(i,)], "k long").coalesce(1), path
        )
    for v in range(3):
        _backdate_delta(path, v, 100 * HOUR_MS)
    res = d.vacuum_delta(spark, path, retain_ms=HOUR_MS)
    assert res["retained_versions"] == [2]
    assert d.read_delta(spark, path).count() == 3


def _backdate_iceberg(path, index_from_oldest, age_ms):
    cur_v, meta = ice._current_metadata(path)
    snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot-id"])
    snaps[index_from_oldest]["timestamp-ms"] = (
        int(time.time() * 1000) - age_ms
    )
    fp = os.path.join(ice._meta_dir(path), f"v{cur_v}.metadata.json")
    with open(fp, "w") as fh:
        json.dump(meta, fh)


@pytest.fixture()
def iceberg_table(spark, tmp_path):
    path = str(tmp_path / "it")
    for i in range(4):
        ice.write_iceberg(
            spark.createDataFrame([(i,)], "k long"), path
        )
    for idx, age_ms in [
        (0, 10 * HOUR_MS),
        (1, 10 * HOUR_MS),
        (2, 2 * HOUR_MS - 60_000),
    ]:
        _backdate_iceberg(path, idx, age_ms)
    now = time.time()
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (now - 36000, now - 36000))
    cur_v, _m = ice._current_metadata(path)
    os.utime(
        os.path.join(ice._meta_dir(path), f"v{cur_v}.metadata.json"),
        (now, now),
    )
    return path


def test_iceberg_expire_older_than(spark, iceberg_table):
    path = iceberg_table
    _v, meta = ice._current_metadata(path)
    snaps = sorted(
        meta["snapshots"], key=lambda s: s["snapshot-id"]
    )
    res = ice.expire_snapshots(path, older_than_ms=2 * HOUR_MS)
    # in-window snapshot + current retained; two expired
    kept = set(res["retained_snapshot_ids"])
    assert kept == {snaps[2]["snapshot-id"], snaps[3]["snapshot-id"]}
    assert ice.read_iceberg(spark, path).count() == 4
    assert (
        ice.read_iceberg(
            spark, path, snapshot_id=snaps[2]["snapshot-id"]
        ).count()
        == 3
    )
    with pytest.raises(ValueError, match="snapshot"):
        ice.read_iceberg(
            spark, path, snapshot_id=snaps[0]["snapshot-id"]
        ).count()


def test_iceberg_expire_hours_sql(spark, iceberg_table):
    path = iceberg_table
    cat = {"it": ("iceberg", path)}
    dml_sql(spark, "VACUUM it RETAIN 2 HOURS", cat)
    _v, meta = ice._current_metadata(path)
    assert len(meta["snapshots"]) == 2


def test_iceberg_tag_still_retains_beyond_age(spark, tmp_path):
    """Ref retention stays additive under older_than_ms."""
    path = str(tmp_path / "tagged")
    for i in range(3):
        ice.write_iceberg(
            spark.createDataFrame([(i,)], "k long"), path
        )
    _v, meta = ice._current_metadata(path)
    oldest = sorted(meta["snapshots"], key=lambda s: s["snapshot-id"])[0]
    ice.tag_snapshot(path, "keepme", snapshot_id=oldest["snapshot-id"])
    for idx in (0, 1):
        _backdate_iceberg(path, idx, 100 * HOUR_MS)
    now = time.time()
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (now - 36000, now - 36000))
    cur_v, _m = ice._current_metadata(path)
    os.utime(
        os.path.join(ice._meta_dir(path), f"v{cur_v}.metadata.json"),
        (now, now),
    )
    res = ice.expire_snapshots(path, older_than_ms=HOUR_MS)
    assert oldest["snapshot-id"] in set(res["retained_snapshot_ids"])
    assert (
        ice.read_iceberg(spark, path, ref="keepme").count() == 1
    )


def test_delta_boundary_exactly_at_cutoff_retained(
    spark, tmp_path, monkeypatch
):
    """The >= semantics: a version whose commit timestamp equals
    now - retain_ms exactly is RETAINED (frozen clock makes the
    equality deterministic)."""
    path = str(tmp_path / "boundary")
    for i in range(3):
        d.write_delta(
            spark.createDataFrame([(i,)], "k long").coalesce(1), path
        )
    fixed = time.time()
    _backdate_delta(path, 0, 10 * HOUR_MS)
    _backdate_delta(path, 1, 0)  # rewrite below to the exact cutoff
    fp = d._commit_file(path, 1)
    lines = []
    for line in open(fp):
        if not line.strip():
            continue
        action = json.loads(line)
        if "commitInfo" in action:
            action["commitInfo"]["timestamp"] = (
                int(fixed * 1000) - 2 * HOUR_MS
            )
        lines.append(json.dumps(action))
    with open(fp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    now = time.time()
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (now - 36000, now - 36000))
    os.utime(d._commit_file(path, 2), (now, now))
    monkeypatch.setattr(d.time, "time", lambda: fixed)
    res = d.vacuum_delta(spark, path, retain_ms=2 * HOUR_MS)
    assert res["retained_versions"] == [1, 2]
