"""remove_orphan_files (r14 — Iceberg's maintenance procedure):
crashed-writer debris (staged data files whose snapshot never
committed, torn avros) is reclaimed; everything ANY metadata version
references survives, and the mtime age guard protects in-flight
writers."""

from __future__ import annotations

import os
import time

import pytest

from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
from census_asc5_data_pipeline_spark.sources.merge import dml_sql


def _age(fp, seconds=3600):
    t = time.time() - seconds
    os.utime(fp, (t, t))


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    for lo in (0, 50):
        ice.write_iceberg(
            spark.createDataFrame(
                [(i, f"s{i}") for i in range(lo, lo + 50)],
                "k long, s string",
            ),
            path,
        )
    ice.delete_iceberg_where(
        spark.createDataFrame([(3,)], "k long"), path
    )
    return path


def test_orphans_removed_live_survives(spark, tmp_path, table):
    path = table
    # plant debris: an uncommitted data file, a torn avro, junk in a
    # data subdir — all old enough to qualify
    debris = [
        os.path.join(path, "data", "part-orphan.parquet"),
        os.path.join(path, "metadata", "manifest-torn.avro"),
        os.path.join(path, "data", "stale.tmp"),
    ]
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    for fp in debris:
        with open(fp, "wb") as fh:
            fh.write(b"junk")
        _age(fp)
    before = sorted(
        (r.k, r.s) for r in ice.read_iceberg(spark, path).collect()
    )
    res = ice.remove_orphan_files(path, older_than_ms=60_000)
    assert res["orphans_removed"] == 3
    for fp in debris:
        assert not os.path.exists(fp)
    # every snapshot still fully readable
    after = sorted(
        (r.k, r.s) for r in ice.read_iceberg(spark, path).collect()
    )
    assert after == before
    _v, meta = ice._current_metadata(path)
    for s in meta["snapshots"]:
        ice.read_iceberg(spark, path, snapshot_id=s["snapshot-id"]).count()


def test_age_guard_protects_fresh_files(spark, table):
    path = table
    fresh = os.path.join(path, "data", "part-inflight.parquet")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    with open(fresh, "wb") as fh:
        fh.write(b"staging")
    res = ice.remove_orphan_files(path)  # default 3-day guard
    assert res["orphans_removed"] == 0
    assert os.path.exists(fresh)


def test_metadata_and_hint_never_candidates(spark, table):
    path = table
    md = ice._meta_dir(path)
    now = time.time() - 10 * 24 * 3600
    for fn in os.listdir(md):
        os.utime(os.path.join(md, fn), (now, now))
    for root, _d, files in os.walk(path):
        for fn in files:
            os.utime(os.path.join(root, fn), (now, now))
    res = ice.remove_orphan_files(path, older_than_ms=60_000)
    assert res["orphans_removed"] == 0  # everything is referenced
    assert ice.read_iceberg(spark, path).count() == 99


def test_call_sql_spelling(spark, table):
    path = table
    orphan = os.path.join(path, "data", "junk.parquet")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    with open(orphan, "wb") as fh:
        fh.write(b"x")
    _age(orphan)
    n = dml_sql(
        spark,
        "CALL system.remove_orphan_files(t, '60000')",
        {"t": ("iceberg", path)},
    )
    assert n == 1
    assert not os.path.exists(orphan)
