"""r14 reader-feature acceptance: ``timestampNtz`` (schemaString
timestamp_ntz ↔ Spark TimestampNTZType, parquet
isAdjustedToUTC=false) and ``vacuumProtocolCheck`` (constrains
VACUUM-performing writers only — reads unaffected, and this engine's
writer gate already refuses writes to tables whose writerFeatures it
doesn't implement). Unknown features keep refusing."""

from __future__ import annotations

import datetime as dt
import json
import os
import time
import uuid

import pytest

from census_asc5_data_pipeline_spark.sources import delta_io as d


def _plant(spark, path, reader_feats, writer_feats, ntz=False):
    os.makedirs(os.path.join(path, "_delta_log"))
    now_ms = int(time.time() * 1000)
    ddl = "k bigint, t timestamp_ntz" if ntz else "k bigint, t string"
    rows = (
        [(1, dt.datetime(2024, 5, 1, 12, 30)), (2, dt.datetime(2024, 5, 2, 8, 0))]
        if ntz
        else [(1, "a"), (2, "b")]
    )
    df = spark.createDataFrame(rows, ddl)
    sub = os.path.join(path, ".stage")
    df.coalesce(1).write.parquet(sub)
    part = next(
        f
        for f in os.listdir(sub)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    rel = f"part-{uuid.uuid4().hex}.parquet"
    os.replace(os.path.join(sub, part), os.path.join(path, rel))
    import shutil

    shutil.rmtree(sub, ignore_errors=True)
    schema = df.schema.jsonValue()
    d._put_if_absent_commit(
        path,
        0,
        [
            {"commitInfo": {"timestamp": now_ms, "operation": "WRITE"}},
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": reader_feats,
                    "writerFeatures": writer_feats,
                }
            },
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            },
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(path, rel)),
                    "modificationTime": now_ms,
                    "dataChange": True,
                }
            },
        ],
    )


def test_timestamp_ntz_table_reads(spark, tmp_path):
    path = str(tmp_path / "ntz")
    _plant(
        spark, path, ["timestampNtz"], ["timestampNtz"], ntz=True
    )
    got = d.read_delta(spark, path)
    assert dict(got.dtypes) == {"k": "bigint", "t": "timestamp_ntz"}
    rows = sorted((r.k, r.t) for r in got.collect())
    assert rows == [
        (1, dt.datetime(2024, 5, 1, 12, 30)),
        (2, dt.datetime(2024, 5, 2, 8, 0)),
    ]
    # writes ACCEPT since r16 (timestampNtz joined _WRITER_FEATURES:
    # the values write through Spark's parquet codec; declaring the
    # feature was the only duty and the foreign table declares it)
    d.write_delta(
        spark.createDataFrame(
            [(3, dt.datetime(2024, 5, 3))], "k bigint, t timestamp_ntz"
        ),
        path,
    )
    rows2 = sorted((r.k, r.t) for r in d.read_delta(spark, path).collect())
    assert rows2 == rows + [(3, dt.datetime(2024, 5, 3))]


def test_timestamp_ntz_creation_declares_feature(spark, tmp_path):
    """r16: CREATING a table whose schema carries TIMESTAMP_NTZ must
    declare timestampNtz at (3,7) on BOTH protocol lists — a legacy
    reader would misparse the type; and an overwrite_schema that
    INTRODUCES the type upgrades the protocol in the same commit."""
    import json
    import os

    path = str(tmp_path / "born")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 5, 1, 12, 30))], "k bigint, t timestamp_ntz"
    )
    d.write_delta(df, path)
    first = open(
        os.path.join(path, "_delta_log", f"{0:020d}.json")
    ).read()
    proto = next(
        json.loads(ln)["protocol"]
        for ln in first.splitlines()
        if "protocol" in json.loads(ln)
    )
    assert proto["minReaderVersion"] == 3
    assert "timestampNtz" in proto["readerFeatures"]
    assert "timestampNtz" in proto["writerFeatures"]
    got = d.read_delta(spark, path)
    assert dict(got.dtypes)["t"] == "timestamp_ntz"
    # schema replacement introducing NTZ upgrades in the same commit
    p2 = str(tmp_path / "replaced")
    d.write_delta(spark.createDataFrame([(1, 2)], "k bigint, v bigint"), p2)
    d.write_delta(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 6, 1))], "k bigint, t timestamp_ntz"
        ),
        p2,
        mode="overwrite",
        overwrite_schema=True,
    )
    v1 = open(
        os.path.join(p2, "_delta_log", f"{1:020d}.json")
    ).read()
    proto2 = next(
        json.loads(ln)["protocol"]
        for ln in v1.splitlines()
        if "protocol" in json.loads(ln)
    )
    assert proto2["minReaderVersion"] == 3
    assert "timestampNtz" in proto2["readerFeatures"]
    assert "timestampNtz" in proto2["writerFeatures"]
    got2 = d.read_delta(spark, p2)
    assert dict(got2.dtypes)["t"] == "timestamp_ntz"
    assert [r.k for r in got2.collect()] == [1]


def test_vacuum_protocol_check_reads(spark, tmp_path):
    path = str(tmp_path / "vpc")
    _plant(
        spark,
        path,
        ["vacuumProtocolCheck"],
        ["vacuumProtocolCheck"],
    )
    assert sorted(r.k for r in d.read_delta(spark, path).collect()) == [
        1,
        2,
    ]
    # r16: the feature is WRITABLE — vacuum has gated the protocol
    # BEFORE deleting anything since r14, the feature's entire demand
    # (the acceptance round-trip is pinned in tests/test_sql_ddl.py)
    res = d.vacuum_delta(spark, path, keep_versions=1)
    assert res["retained_versions"] == [0]
    assert sorted(r.k for r in d.read_delta(spark, path).collect()) == [
        1,
        2,
    ]


def test_unknown_feature_combination_still_refuses(spark, tmp_path):
    path = str(tmp_path / "unknown")
    _plant(
        spark,
        path,
        ["timestampNtz", "variantType"],
        ["timestampNtz"],
        ntz=True,
    )
    with pytest.raises(NotImplementedError, match="reader version 3"):
        d.read_delta(spark, path).collect()
