"""Iceberg partition-spec evolution (r13 — table-spec §Partition
Evolution): `update_partition_spec` registers a new default spec
(metadata-only, no data movement), writes lay out under it, files
already written keep their original spec, and reads handle the mix —
partition_filter keeps pre-evolution files (their manifests never
carried the field), predicate skipping stays exact, MoR DML works
across specs, and cross-spec rewrite refuses loudly."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
from census_asc5_data_pipeline_spark.sources.merge import (
    dml_sql,
    update_where,
)


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(lo, hi)],
        "k long, g long, v string",
    )


@pytest.fixture()
def evolved(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, 0, 100).coalesce(1), path)
    ice.update_partition_spec(path, ["g"])
    ice.write_iceberg(_mk(spark, 100, 200), path, mode="append")
    return path


def test_metadata_shape_and_layout(spark, evolved):
    _v, meta = ice._current_metadata(evolved)
    assert meta["default-spec-id"] == 1
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    assert specs[0]["fields"] == []
    assert [f["name"] for f in specs[1]["fields"]] == ["g"]
    # post-evolution files land under hive-style g= dirs
    assert glob.glob(os.path.join(evolved, "data", "g=*", "*.parquet"))
    assert ice.read_iceberg(spark, evolved).count() == 200


def test_field_ids_stable_across_specs(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, 0, 10).coalesce(1), path)
    ice.update_partition_spec(path, ["g"])
    ice.update_partition_spec(path, ["g", "bucket(4, k)"])
    _v, meta = ice._current_metadata(path)
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    g1 = next(f for f in specs[1]["fields"] if f["name"] == "g")
    g2 = next(f for f in specs[2]["fields"] if f["name"] == "g")
    assert g1["field-id"] == g2["field-id"]  # same (transform, source)
    kb = next(f for f in specs[2]["fields"] if f["name"] == "k_bucket")
    assert kb["field-id"] == g1["field-id"] + 1


def test_noop_evolution_commits_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, 0, 10).coalesce(1), path, partition_by=["g"])
    v0, _ = ice._current_metadata(path)
    assert ice.update_partition_spec(path, ["g"]) == v0


def test_partition_filter_keeps_pre_evolution_files(spark, evolved):
    # old files (no g field in their manifests) are KEPT; new files
    # prune — so g=1 returns ALL 100 old rows + the 34 new g=1 rows
    got = ice.read_iceberg(
        spark, evolved, partition_filter={"g": "1"}
    ).count()
    old_rows = 100
    new_g1 = sum(1 for i in range(100, 200) if i % 3 == 1)
    assert got == old_rows + new_g1


def test_predicate_read_exact_across_specs(spark, evolved):
    got = ice.read_iceberg(spark, evolved, predicate="g = 1").count()
    assert got == sum(1 for i in range(200) if i % 3 == 1)
    got = ice.read_iceberg(
        spark, evolved, predicate="g = 1 AND k < 100"
    ).count()
    assert got == sum(1 for i in range(100) if i % 3 == 1)


def test_mor_dml_across_specs(spark, evolved):
    # k=5 lives in a pre-evolution file; k=150 in a post-evolution one
    update_where(spark, "iceberg", evolved, "k = 5", {"v": "'old'"})
    update_where(spark, "iceberg", evolved, "k = 150", {"v": "'new'"})
    out = ice.read_iceberg(spark, evolved)
    assert out.filter("k = 5").first().v == "old"
    assert out.filter("k = 150").first().v == "new"
    assert out.count() == 200


def test_rewrite_refuses_across_specs(spark, evolved):
    with pytest.raises(NotImplementedError, match="partition specs"):
        ice.rewrite_data_files(spark, evolved, target_file_bytes=1)
    # and the refusal left no new snapshot behind
    assert ice.read_iceberg(spark, evolved).count() == 200


def test_sql_add_drop_partition_field(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, 0, 20).coalesce(1), path)
    cat = {"t": ("iceberg", path)}
    dml_sql(spark, "ALTER TABLE t ADD PARTITION FIELD g", cat)
    dml_sql(spark, "ALTER TABLE t ADD PARTITION FIELD bucket(4, k)", cat)
    _v, meta = ice._current_metadata(path)
    cur = next(
        s
        for s in meta["partition-specs"]
        if s["spec-id"] == meta["default-spec-id"]
    )
    assert [f["name"] for f in cur["fields"]] == ["g", "k_bucket"]
    dml_sql(spark, "ALTER TABLE t DROP PARTITION FIELD bucket(4, k)", cat)
    _v, meta = ice._current_metadata(path)
    cur = next(
        s
        for s in meta["partition-specs"]
        if s["spec-id"] == meta["default-spec-id"]
    )
    assert [f["name"] for f in cur["fields"]] == ["g"]
    with pytest.raises(ValueError, match="no matching"):
        dml_sql(spark, "ALTER TABLE t DROP PARTITION FIELD year(v)", cat)
    with pytest.raises(ValueError, match="Iceberg feature"):
        dml_sql(
            spark,
            "ALTER TABLE d ADD PARTITION FIELD g",
            {"d": ("delta", str(tmp_path / "d"))},
        )


def test_refs_and_properties_survive_evolution(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, 0, 10).coalesce(1), path)
    ice.create_branch(path, "audit")
    ice.set_iceberg_properties(path, {"owner": "me"})
    ice.update_partition_spec(path, ["g"])
    _v, meta = ice._current_metadata(path)
    assert "audit" in (meta.get("refs") or {})
    assert (meta.get("properties") or {}).get("owner") == "me"
    # and a post-evolution write keeps the specs AND the refs
    ice.write_iceberg(_mk(spark, 10, 20), path, mode="append")
    _v, meta = ice._current_metadata(path)
    assert len(meta["partition-specs"]) == 2
    assert "audit" in (meta.get("refs") or {})


def test_unknown_source_column_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, 0, 5).coalesce(1), path)
    with pytest.raises(ValueError, match="not in the table schema"):
        ice.update_partition_spec(path, ["nope"])


def test_hour_and_void_transforms(spark, tmp_path):
    """r13 completes the transform vocabulary: hour(ts) = hours from
    epoch (writes lay out by hour, source-literal filters prune at
    planning time), void(col) = always-null partition values."""
    import datetime as dt

    path = str(tmp_path / "hourly")
    rows = [
        (i, dt.datetime(2024, 1, 1, h, 30)) for i, h in enumerate([0, 0, 1, 2])
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    ice.write_iceberg(df, path, partition_by=["hour(ts)"])
    _v, meta = ice._current_metadata(path)
    data, _dels = ice._snapshot_files(path, meta, None, spark=spark)
    hour0 = int(
        (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).total_seconds()
        // 3600
    )
    assert sorted({d["partition"]["ts_hour"] for d in data}) == [
        hour0,
        hour0 + 1,
        hour0 + 2,
    ]
    # a source-column literal prunes through the transform
    got = ice.read_iceberg(
        spark, path, partition_filter={"ts": "2024-01-01 00:30:00"}
    )
    assert sorted(r.k for r in got.collect()) == [0, 1]
    assert ice.read_iceberg(spark, path).count() == 4

    vpath = str(tmp_path / "voidt")
    ice.write_iceberg(df, vpath, partition_by=["void(k)"])
    _v, vmeta = ice._current_metadata(vpath)
    vdata, _ = ice._snapshot_files(vpath, vmeta, None, spark=spark)
    assert all(d["partition"]["k_void"] is None for d in vdata)
    assert ice.read_iceberg(spark, vpath).count() == 4
