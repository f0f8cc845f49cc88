"""Delta typeWidening READ support (r14 — PROTOCOL.md §Type
Widening): a foreign table whose protocol lists the ``typeWidening``
readerFeature reads correctly, with older narrow-typed parquet files
scanned under the schema's widened types (Spark's vectorized reader
performs the promotion). Writes to such tables still refuse (the
writerFeature is not implemented); genuinely unknown readerFeatures
still refuse."""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.delta_stats import (
    file_stats_json,
)


def _field(name, t):
    return {"name": name, "type": t, "nullable": True, "metadata": {}}


def _plant_widened(spark, path):
    """Hand-written foreign log: v0 = int/float schema + one narrow
    file; v1 = widened long/double schema (typeWidening protocol) +
    one wide file. Both generations must read under the wide types."""
    os.makedirs(os.path.join(path, "_delta_log"))
    now_ms = int(time.time() * 1000)

    def _part(df):
        sub = os.path.join(path, f".stage-{uuid.uuid4().hex}")
        df.coalesce(1).write.parquet(sub)
        part = next(
            f
            for f in os.listdir(sub)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        dst = f"part-{uuid.uuid4().hex}.parquet"
        os.replace(os.path.join(sub, part), os.path.join(path, dst))
        import shutil

        shutil.rmtree(sub, ignore_errors=True)
        return dst

    narrow = _part(
        spark.createDataFrame([(1, 1.5), (2, 2.5)], "k int, v float")
    )
    wide = _part(
        spark.createDataFrame(
            [(3_000_000_000, 3.5)], "k long, v double"
        )
    )
    schema_v0 = {
        "type": "struct",
        "fields": [_field("k", "integer"), _field("v", "float")],
    }
    schema_v1 = {
        "type": "struct",
        "fields": [_field("k", "long"), _field("v", "double")],
    }
    meta = {
        "id": str(uuid.uuid4()),
        "format": {"provider": "parquet", "options": {}},
        "partitionColumns": [],
        "configuration": {"delta.enableTypeWidening": "true"},
        "createdTime": now_ms,
    }

    def _add(rel):
        full = os.path.join(path, rel)
        return {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": os.path.getsize(full),
                "modificationTime": now_ms,
                "dataChange": True,
                "stats": file_stats_json(full),
            }
        }

    d._put_if_absent_commit(
        path,
        0,
        [
            {"commitInfo": {"timestamp": now_ms, "operation": "WRITE"}},
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening"],
                    "writerFeatures": ["typeWidening"],
                }
            },
            {"metaData": {**meta, "schemaString": json.dumps(schema_v0)}},
            _add(narrow),
        ],
    )
    d._put_if_absent_commit(
        path,
        1,
        [
            {
                "commitInfo": {
                    "timestamp": now_ms + 1,
                    "operation": "CHANGE COLUMN",
                }
            },
            {"metaData": {**meta, "schemaString": json.dumps(schema_v1)}},
            _add(wide),
        ],
    )


def test_widened_table_reads_both_generations(spark, tmp_path):
    path = str(tmp_path / "widened")
    _plant_widened(spark, path)
    df = d.read_delta(spark, path)
    assert dict(df.dtypes) == {"k": "bigint", "v": "double"}
    rows = sorted((r.k, r.v) for r in df.collect())
    assert rows == [(1, 1.5), (2, 2.5), (3_000_000_000, 3.5)]


def test_widened_table_predicate_skipping_sound(spark, tmp_path):
    """Stats stamped from the NARROW file decode under the widened
    type; pruning stays exact."""
    path = str(tmp_path / "wskip")
    _plant_widened(spark, path)
    got = d.read_delta(spark, path, predicate="k >= 3000000000")
    assert [(r.k, r.v) for r in got.collect()] == [(3_000_000_000, 3.5)]
    assert d.read_delta(spark, path, predicate="k <= 2").count() == 2
    # time travel to the narrow generation reads narrow types
    v0 = d.read_delta(spark, path, version=0)
    assert dict(v0.dtypes) == {"k": "int", "v": "float"}


def test_widened_foreign_table_accepts_appends(spark, tmp_path):
    """r16: typeWidening is a WRITABLE feature now — a foreign
    widened table takes appends carrying the (widened) current
    schema; the narrow generation keeps reading."""
    path = str(tmp_path / "wgate")
    _plant_widened(spark, path)
    d.write_delta(
        spark.createDataFrame([(9, 9.0)], "k long, v double"), path
    )
    rows = sorted((r.k, r.v) for r in d.read_delta(spark, path).collect())
    assert rows == [(1, 1.5), (2, 2.5), (9, 9.0), (3_000_000_000, 3.5)]


def test_unknown_reader_feature_still_refuses(spark, tmp_path):
    path = str(tmp_path / "unknown")
    _plant_widened(spark, path)
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(line) for line in open(log) if line.strip()]
    for a in lines:
        if "protocol" in a:
            a["protocol"]["readerFeatures"] = [
                "typeWidening",
                "variantType",
            ]
    with open(log, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(NotImplementedError, match="reader version 3"):
        d.read_delta(spark, path).collect()
