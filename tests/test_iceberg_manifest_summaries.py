"""Manifest-list partition field summaries (r14 — table-spec
§Manifest Lists field 508): every staged manifest entry carries
per-partition-field contains_null + Appendix-D lower/upper bounds,
and a partition-predicate read prunes WHOLE MANIFESTS before any
manifest Avro decodes — composing with the >64-manifest distributed
decode. Summaries carried forward on append; foreign summary-less
lists keep every manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
from census_asc5_data_pipeline_spark.sources.avro_io import (
    read_container_generic,
)


def _manifest_list_entries(path):
    _v, meta = ice._current_metadata(path)
    snap = next(
        s
        for s in meta.get("snapshots", [])
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    return read_container_generic(ice._local(snap["manifest-list"]))[1]


@pytest.fixture()
def per_month_table(spark, tmp_path):
    """Three appends, one month of data each → three manifests whose
    identity-partition summaries tile distinct g-ranges."""
    path = str(tmp_path / "t")
    for g in (1, 2, 3):
        df = spark.createDataFrame(
            [(g * 100 + i, g) for i in range(50)], "k long, g int"
        )
        ice.write_iceberg(df, path, partition_by=["g"])
    return path


def test_writer_stamps_summaries(spark, per_month_table):
    entries = _manifest_list_entries(per_month_table)
    assert len(entries) == 3
    import struct

    gs = set()
    for m in entries:
        sums = m["partitions"]
        assert sums is not None and len(sums) == 1
        s = sums[0]
        assert s["contains_null"] is False
        lo = struct.unpack("<i", bytes(s["lower_bound"]))[0]
        hi = struct.unpack("<i", bytes(s["upper_bound"]))[0]
        assert lo == hi  # one g per manifest
        gs.add(lo)
    assert gs == {1, 2, 3}


def test_partition_predicate_decodes_only_matching_manifests(
    spark, per_month_table, monkeypatch
):
    decoded: list[str] = []
    real = ice.read_container_generic

    def counting(p):
        if "manifest-" in p:
            decoded.append(p)
        return real(p)

    monkeypatch.setattr(ice, "read_container_generic", counting)
    got = ice.read_iceberg(spark, per_month_table, predicate="g = 2")
    assert sorted(r.k for r in got.collect()) == [
        200 + i for i in range(50)
    ]
    assert len(decoded) == 1  # two manifests never decoded


def test_non_partition_predicate_keeps_all_manifests(
    spark, per_month_table, monkeypatch
):
    decoded: list[str] = []
    real = ice.read_container_generic

    def counting(p):
        if "manifest-" in p:
            decoded.append(p)
        return real(p)

    monkeypatch.setattr(ice, "read_container_generic", counting)
    got = ice.read_iceberg(spark, per_month_table, predicate="k = 205")
    assert [r.g for r in got.collect()] == [2]
    assert len(decoded) == 3  # summaries say nothing about k


def test_results_exact_under_pruning(spark, per_month_table):
    for pred, want in [
        ("g = 1", 50),
        ("g >= 2", 100),
        ("g BETWEEN 2 AND 3", 100),
        ("g = 9", 0),
        ("g IN (1, 3)", 100),
        ("g IS NULL", 0),
    ]:
        got = ice.read_iceberg(
            spark, per_month_table, predicate=pred
        ).count()
        assert got == want, pred


def test_null_partition_values_keep_manifest(spark, tmp_path):
    path = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, g int"
    )
    ice.write_iceberg(df, path, partition_by=["g"])
    entries = _manifest_list_entries(path)
    s = entries[0]["partitions"][0]
    assert s["contains_null"] is True
    assert s["lower_bound"] is None
    assert ice.read_iceberg(spark, path, predicate="g IS NULL").count() == 2
    # a value predicate over an all-null manifest: nothing matches,
    # but the result is exact either way
    assert ice.read_iceberg(spark, path, predicate="g = 1").count() == 0


def test_summaries_survive_append_carry_forward(spark, per_month_table):
    ice.write_iceberg(
        spark.createDataFrame([(999, 9)], "k long, g int"),
        per_month_table,
        partition_by=["g"],
    )
    entries = _manifest_list_entries(per_month_table)
    assert len(entries) == 4
    assert all(m.get("partitions") for m in entries)


def test_foreign_summary_less_list_keeps_everything(
    spark, per_month_table, tmp_path
):
    """Strip the summaries (a pre-508 writer) — every manifest must
    decode and results stay identical."""
    import os

    from census_asc5_data_pipeline_spark.sources.avro_io import (
        write_container_generic,
    )

    _v, meta = ice._current_metadata(per_month_table)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    ml = ice._local(snap["manifest-list"])
    entries = read_container_generic(ml)[1]
    legacy_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            f
            for f in ice._MANIFEST_FILE_SCHEMA["fields"]
            if f["name"] != "partitions"
        ],
    }
    with open(ml, "wb") as fh:
        write_container_generic(
            fh,
            legacy_schema,
            [
                {k: m[k] for m in [m] for k in m if k != "partitions"}
                for m in entries
            ],
        )
    got = ice.read_iceberg(spark, per_month_table, predicate="g = 2")
    assert got.count() == 50


def test_delete_manifests_never_pruned(spark, tmp_path):
    """A position delete lands in its own content=1 manifest; a
    partition-predicate read must still apply it."""
    path = str(tmp_path / "dels")
    for g in (1, 2):
        ice.write_iceberg(
            spark.createDataFrame(
                [(g * 10 + i, g) for i in range(5)], "k long, g int"
            ),
            path,
            partition_by=["g"],
        )
    ice.delete_iceberg_where(
        spark.createDataFrame([(21,)], "k long"), path
    )
    got = ice.read_iceberg(spark, path, predicate="g = 2")
    assert sorted(r.k for r in got.collect()) == [20, 22, 23, 24]


def test_bucket_transform_summaries_dont_misprune(spark, tmp_path):
    """Non-identity transforms are skipped by the pruner — a source-
    column predicate must not evaluate against bucket ordinals."""
    path = str(tmp_path / "bucketed")
    ice.write_iceberg(
        spark.createDataFrame(
            [(i, f"s{i}") for i in range(100)], "k long, s string"
        ),
        path,
        partition_by=["bucket(4, k)"],
    )
    got = ice.read_iceberg(spark, path, predicate="k = 57")
    assert [r.s for r in got.collect()] == ["s57"]
