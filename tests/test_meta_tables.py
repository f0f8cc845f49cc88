"""Metadata-table surface (round-12): Iceberg's
snapshots/history/refs/files/manifests tables and delta-spark's
DESCRIBE HISTORY / DESCRIBE DETAIL as DataFrames off the logs —
driver-side metadata scale, no data-file reads."""

from __future__ import annotations

import pytest


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_delta_describe_history_and_detail(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        describe_detail,
        describe_history,
        write_delta,
    )

    p = str(tmp_path / "t")
    write_delta(
        _mk(spark, [(1, 1.0), (2, 2.0)], "id bigint, v double"), p,
        partition_by=None,
    )
    write_delta(_mk(spark, [(3, 3.0)], "id bigint, v double"), p)
    delete_delta_where(spark, p, "id = 1")

    h = describe_history(spark, p).collect()
    assert [r.version for r in h] == [2, 1, 0]  # newest first
    assert [r.operation for r in h] == ["DELETE", "WRITE", "WRITE"]
    assert h[0].operation_parameters["predicate"] == "id = 1"
    assert all(r.timestamp_ms > 0 for r in h)

    d = describe_detail(spark, p).collect()[0]
    assert d.format == "delta" and d.id
    assert d.partition_columns == []
    assert d.num_files >= 1 and d.size_in_bytes > 0
    assert d.min_reader_version == 1 and d.min_writer_version == 2


def test_iceberg_metadata_tables(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        read_iceberg_meta,
        tag_snapshot,
        write_iceberg,
    )

    p = str(tmp_path / "i")
    write_iceberg(
        _mk(spark, [(1, "a"), (2, "b")], "id bigint, s string"), p,
        partition_by=["s"],
    )
    write_iceberg(_mk(spark, [(3, "c")], "id bigint, s string"), p)
    tag_snapshot(p, "v1.0", snapshot_id=1, max_ref_age_ms=86400000)

    snaps = read_iceberg_meta(spark, p, "snapshots").collect()
    assert [r.snapshot_id for r in snaps] == [1, 2]
    assert all(r.operation in ("append", "overwrite") for r in snaps)
    assert all(r.manifest_list for r in snaps)

    hist = read_iceberg_meta(spark, p, "history").collect()
    assert [r.snapshot_id for r in hist] == [1, 2]
    assert [r.is_current for r in hist] == [False, True]

    refs = read_iceberg_meta(spark, p, "refs").collect()
    assert [(r.name, r.type, r.snapshot_id, r.max_ref_age_ms)
            for r in refs] == [("v1.0", "tag", 1, 86400000)]

    files = read_iceberg_meta(spark, p, "files").collect()
    assert all(f.record_count > 0 and f.file_size_in_bytes > 0
               for f in files)
    assert sum(f.record_count for f in files) == 3
    parts = {f.partition.get("s") for f in files}
    assert parts == {"a", "b", "c"}

    mans = read_iceberg_meta(spark, p, "manifests").collect()
    assert len(mans) >= 1 and all(m.path.endswith(".avro") for m in mans)

    with pytest.raises(ValueError, match="unknown metadata table"):
        read_iceberg_meta(spark, p, "nope")
