"""CDF across a mid-range RENAME COLUMN (r15 verdict #6): on a
column-mapped table the batch walk and both streaming sources bind
columns by ``delta.columnMapping.id`` — a rename keeps every field's
id and physical name, so the feed replays across the boundary with
correct pre/post images instead of refusing. Non-rename schema
changes still refuse mid-stream."""
from __future__ import annotations

import pytest
import pyspark.sql.functions as F  # noqa: F401

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import dml_sql


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _build(spark, p: str) -> dict:
    """v0 create+insert (mapped, CDF on) → v1 RENAME v→price →
    v2 append → v3 UPDATE."""
    d.write_delta(
        _mk(spark, [(1, 10.0)], "id bigint, v double").coalesce(1),
        p,
        configuration={
            "delta.columnMapping.mode": "name",
            "delta.enableChangeDataFeed": "true",
        },
    )
    cat = {"t": ("delta", p)}
    dml_sql(spark, "ALTER TABLE t RENAME COLUMN v TO price", cat)
    d.write_delta(
        _mk(spark, [(2, 20.0)], "id bigint, price double").coalesce(1),
        p,
    )
    dml_sql(spark, "UPDATE t SET price = price + 1 WHERE id = 1", cat)
    return cat


def test_batch_cdf_binds_rename_by_field_id(spark, tmp_path):
    p = str(tmp_path / "t")
    _build(spark, p)
    cdf, last = d.read_delta_cdf(spark, p, since_version=-1)
    # the whole range emits under the RANGE-END name
    assert cdf.columns == ["id", "price", "_change_type", "_commit_version"]
    got = sorted(
        (r.id, r.price, r._change_type, r._commit_version)
        for r in cdf.collect()
    )
    assert got == [
        (1, 10.0, "insert", 0),
        (1, 10.0, "update_preimage", 3),
        (1, 11.0, "update_postimage", 3),
        (2, 20.0, "insert", 2),
    ]
    # a range ENDING before the rename emits under that range's end
    # schema — the pre-rename name
    pre, _ = d.read_delta_cdf(spark, p, since_version=-1, end_version=0)
    assert pre.columns[1] == "v"
    assert [(r.id, r.v) for r in pre.collect()] == [(1, 10.0)]


def test_streaming_cdf_replays_across_rename(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources import delta_stream_source

    delta_stream_source.register(spark)
    p = str(tmp_path / "t")
    _build(spark, p)
    got: list[tuple] = []

    def sink(batch_df, epoch_id):
        # the stream starts POST-rename: _log_meta reads the newest
        # metaData, so construction-time names are the renamed ones;
        # pre-rename commits bind to them by field id
        got.extend(
            (r.id, r.price, r._change_type, r._commit_version)
            for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("delta_cdf")
        .option("path", p)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == [
        (1, 10.0, "insert", 0),
        (1, 10.0, "update_preimage", 3),
        (1, 11.0, "update_postimage", 3),
        (2, 20.0, "insert", 2),
    ]


def test_streaming_tail_tolerates_rename_midstream(spark, tmp_path):
    """delta_tail keeps serving across a rename that lands WHILE the
    stream is up (construction pre-rename)."""
    from census_asc5_data_pipeline_spark.sources import delta_stream_source

    delta_stream_source.register(spark)
    p = str(tmp_path / "t")
    d.write_delta(
        _mk(spark, [(1, 10.0)], "id bigint, v double").coalesce(1),
        p,
        configuration={"delta.columnMapping.mode": "name"},
    )
    got: list[tuple] = []

    def sink(batch_df, epoch_id):
        got.extend((r.id, r.v) for r in batch_df.collect())

    q = (
        spark.readStream.format("delta_tail")
        .option("path", p)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    # rename + append while the stream is running: construction-time
    # column 'v' keeps serving (id/physical binding unchanged)
    cat = {"t": ("delta", p)}
    dml_sql(spark, "ALTER TABLE t RENAME COLUMN v TO price", cat)
    d.write_delta(
        _mk(spark, [(2, 20.0)], "id bigint, price double").coalesce(1),
        p,
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == [(1, 10.0), (2, 20.0)]


def test_streaming_cdf_still_refuses_non_rename_change(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources import delta_stream_source

    delta_stream_source.register(spark)
    p = str(tmp_path / "t")
    d.write_delta(
        _mk(spark, [(1, 10.0)], "id bigint, v double").coalesce(1),
        p,
        configuration={
            "delta.columnMapping.mode": "name",
            "delta.enableChangeDataFeed": "true",
        },
    )
    got: list[tuple] = []

    def sink(batch_df, epoch_id):
        got.extend((r.id,) for r in batch_df.collect())

    q = (
        spark.readStream.format("delta_cdf")
        .option("path", p)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    # ADD COLUMN mints a NEW field id — not a pure rename; the
    # stream must refuse rather than misbind
    d.add_delta_columns(spark, p, "extra double")
    d.write_delta(
        _mk(
            spark,
            [(2, 20.0, 1.0)],
            "id bigint, v double, extra double",
        ).coalesce(1),
        p,
    )
    with pytest.raises(Exception, match="schema"):
        q.processAllAvailable()
    q.stop()
