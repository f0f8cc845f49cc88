"""COPY INTO (r13 — delta-spark's idempotent bulk loader): each run
loads only the files under FROM that no prior COPY INTO commit
recorded; the commit log is the idempotency ledger, so reruns and
crash-replays never double-load."""

from __future__ import annotations

import json
import os

import pytest

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import copy_into, dml_sql


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    cat: dict = {}
    dml_sql(
        spark,
        "CREATE TABLE ct (k BIGINT, v STRING) USING delta "
        f"LOCATION '{path}'",
        cat,
    )
    return path, cat


def _land(spark, root, sub, rows):
    spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
        os.path.join(root, sub)
    )


def test_idempotent_incremental_loading(spark, tmp_path, table):
    path, cat = table
    land = str(tmp_path / "landing")
    _land(spark, land, "b1", [(1, "a"), (2, "b")])
    v1 = dml_sql(
        spark, f"COPY INTO ct FROM '{land}' FILEFORMAT = PARQUET", cat
    )
    assert v1 is not None
    assert d.read_delta(spark, path).count() == 2
    # rerun: ledger says everything is loaded -> no commit at all
    assert (
        dml_sql(
            spark, f"COPY INTO ct FROM '{land}' FILEFORMAT = PARQUET", cat
        )
        is None
    )
    assert max(d.delta_versions(path)) == v1
    # a new batch lands: only ITS files load
    _land(spark, land, "b2", [(3, "c")])
    v2 = dml_sql(
        spark, f"COPY INTO ct FROM '{land}' FILEFORMAT = PARQUET", cat
    )
    assert v2 == v1 + 1
    out = d.read_delta(spark, path)
    assert sorted(r.k for r in out.collect()) == [1, 2, 3]
    # the ledger is readable in the history
    ops = [r.operation for r in d.describe_history(spark, path).collect()]
    assert ops.count("COPY INTO") == 2


def test_pattern_and_force(spark, tmp_path, table):
    path, cat = table
    land = str(tmp_path / "landing")
    _land(spark, land, "keep", [(1, "a")])
    _land(spark, land, "skip", [(9, "z")])
    assert (
        dml_sql(
            spark,
            f"COPY INTO ct FROM '{land}' FILEFORMAT = PARQUET "
            "PATTERN = 'keep/*'",
            cat,
        )
        is not None
    )
    assert sorted(
        r.k for r in d.read_delta(spark, path).collect()
    ) == [1]
    # force reloads even already-loaded files (duplicates by design)
    assert (
        dml_sql(
            spark,
            f"COPY INTO ct FROM '{land}' FILEFORMAT = PARQUET "
            "PATTERN = 'keep/*' COPY_OPTIONS('force'='true')",
            cat,
        )
        is not None
    )
    assert d.read_delta(spark, path).count() == 2


def test_csv_with_format_options(spark, tmp_path, table):
    path, cat = table
    land = str(tmp_path / "csvland")
    os.makedirs(land)
    with open(os.path.join(land, "x.csv"), "w") as fh:
        fh.write("k,v\n10,ten\n11,eleven\n")
    copy_into(
        spark,
        path,
        land,
        "csv",
        format_options={"header": "true"},
    )
    out = d.read_delta(spark, path)
    assert sorted((r.k, r.v) for r in out.collect()) == [
        (10, "ten"),
        (11, "eleven"),
    ]


def test_generated_and_constraints_apply(spark, tmp_path):
    """COPY INTO goes through write_delta, so the table's generated
    columns compute and its constraints enforce on loaded rows."""
    path = str(tmp_path / "gen")
    cat: dict = {}
    dml_sql(
        spark,
        "CREATE TABLE gt (k BIGINT NOT NULL, v STRING) USING delta "
        f"LOCATION '{path}'",
        cat,
    )
    land = str(tmp_path / "landing")
    os.makedirs(land)
    with open(os.path.join(land, "bad.csv"), "w") as fh:
        fh.write("k,v\n,oops\n")
    with pytest.raises(ValueError, match="NOT NULL"):
        copy_into(
            spark, path, land, "csv", format_options={"header": "true"}
        )
    assert d.read_delta(spark, path).count() == 0


def test_iceberg_target_refuses(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources import iceberg_io as ice

    ipath = str(tmp_path / "ice")
    ice.write_iceberg(
        spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1),
        ipath,
    )
    with pytest.raises(ValueError, match="Delta verb"):
        dml_sql(
            spark,
            f"COPY INTO it FROM '{tmp_path}' FILEFORMAT = PARQUET",
            {"it": ("iceberg", ipath)},
        )


def test_ledger_survives_checkpoint_and_vacuum(spark, tmp_path, table):
    """r13 ADVICE (medium): vacuum prunes log JSONs below the latest
    checkpoint and checkpoints don't retain commitInfo — the sidecar
    ledger must keep the loaded-file set so a scheduled rerun after
    checkpoint+vacuum never double-loads."""
    path, cat = table
    land = str(tmp_path / "landing")
    _land(spark, land, "b1", [(1, "a"), (2, "b")])
    dml_sql(spark, f"COPY INTO ct FROM '{land}' FILEFORMAT = PARQUET", cat)
    # push the COPY INTO commit below the retention window: several
    # later commits, then checkpoint + vacuum prunes its JSON
    for i in range(4):
        d.write_delta(
            spark.createDataFrame([(100 + i, "x")], "k long, v string"),
            path,
        )
    import time

    time.sleep(1.1)  # vacuum's mtime age guard
    res = d.vacuum_delta(spark, path, keep_versions=2)
    assert res["log_files_removed"] > 0
    ledger = os.path.join(path, "_delta_log", "_copy_into_ledger.json")
    assert os.path.exists(ledger)
    # the COPY INTO commitInfo is gone from the surviving log tail
    surviving = d.delta_versions(path)
    assert 1 not in surviving  # v1 was the COPY INTO commit
    # rerun: still nothing new — the ledger remembers
    assert (
        dml_sql(
            spark, f"COPY INTO ct FROM '{land}' FILEFORMAT = PARQUET", cat
        )
        is None
    )
    # a genuinely new file still loads exactly once
    _land(spark, land, "b2", [(3, "c")])
    assert (
        dml_sql(
            spark, f"COPY INTO ct FROM '{land}' FILEFORMAT = PARQUET", cat
        )
        is not None
    )
    rows = sorted(
        r.k for r in d.read_delta(spark, path).collect() if r.k < 100
    )
    assert rows == [1, 2, 3]
