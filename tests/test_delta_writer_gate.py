"""Delta WRITER responsibilities (sources/delta_io.py:_writer_gate /
_check_constraints — round-12 verdict #1): a writer advertising
``appendOnly`` + ``invariants`` in writerFeatures must ENFORCE them
(PROTOCOL.md writer requirements), refuse tables whose writerFeatures
it does not implement (the write-side twin of the readerFeatures
gate), and validate CHECK constraints / invariants / NOT NULL BEFORE
anything commits. Every foreign table here is a hand-written log —
the shapes delta-spark produces, not this engine's own output."""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pytest


def _schema_string(fields):
    """Spark StructType JSON from [(name, type, nullable, metadata)]."""
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": n,
                    "type": t,
                    "nullable": nl,
                    "metadata": md or {},
                }
                for n, t, nl, md in fields
            ],
        }
    )


def _hand_table(
    spark,
    path,
    rows,
    conf=None,
    fields=None,
    protocol=None,
):
    """A FOREIGN Delta table: one parquet data file staged by plain
    Spark, plus a hand-written 00000000000000000000.json commit."""
    fields = fields or [
        ("id", "long", True, None),
        ("v", "long", True, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    staging = os.path.join(path, ".stage")
    df.coalesce(1).write.parquet(staging)
    os.makedirs(path, exist_ok=True)
    part = next(
        f
        for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    name = f"part-{uuid.uuid4().hex}.snappy.parquet"
    shutil.move(os.path.join(staging, part), os.path.join(path, name))
    shutil.rmtree(staging)
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    lines = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": protocol or {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_string(fields),
                "partitionColumns": [],
                "configuration": conf or {},
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(path, name)),
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for obj in lines:
            fh.write(json.dumps(obj) + "\n")


def _versions(path):
    return sorted(
        int(f[:20])
        for f in os.listdir(os.path.join(path, "_delta_log"))
        if f.endswith(".json") and len(f) == 25
    )


def test_append_only_blocks_every_mutating_verb(spark, tmp_path):
    """delta.appendOnly=true: appends and insert-only MERGE pass;
    DELETE / UPDATE / OVERWRITE / MERGE-with-matched / RESTORE raise
    and leave the log untouched (delta-spark's
    modifyAppendOnlyTable error, enforced at spec level)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        read_delta,
        restore_delta,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.merge import (
        merge_into,
        update_where,
    )

    path = str(tmp_path / "ao")
    _hand_table(
        spark, path, [(1, 10), (2, 20)], conf={"delta.appendOnly": "true"}
    )
    df2 = spark.createDataFrame([(3, 30)], "id bigint, v bigint")
    assert write_delta(df2, path, mode="append") == 1  # appends fine

    with pytest.raises(ValueError, match="appendOnly"):
        delete_delta_where(spark, path, "id = 1")
    with pytest.raises(ValueError, match="appendOnly"):
        delete_delta_where(spark, path, "id = 1", mode="dv")
    with pytest.raises(ValueError, match="appendOnly"):
        update_where(spark, "delta", path, "id = 1", {"v": "99"})
    with pytest.raises(ValueError, match="appendOnly"):
        write_delta(df2, path, mode="overwrite")
    with pytest.raises(ValueError, match="appendOnly"):
        restore_delta(spark, path, 0)
    src = spark.createDataFrame([(1, 111), (9, 90)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="appendOnly"):
        merge_into(
            spark, "delta", path, src, on="t.id = s.id",
            matched=[("update", None, {"v": "s.v"})],
            not_matched={"id": "s.id", "v": "s.v"},
        )
    # insert-only MERGE never modifies committed rows → legal
    v = merge_into(
        spark, "delta", path, src, on="t.id = s.id",
        not_matched={"id": "s.id", "v": "s.v"},
    )
    assert v == 2
    got = {(r.id, r.v) for r in read_delta(spark, path).collect()}
    assert got == {(1, 10), (2, 20), (3, 30), (9, 90)}
    assert _versions(path) == [0, 1, 2]  # no failed verb committed


def test_check_constraint_rejects_before_commit(spark, tmp_path):
    """delta.constraints.* CHECK expressions bind every write verb:
    a violating append / UPDATE / MERGE raises naming the constraint
    and commits NOTHING; clean writes pass. NULL evaluation counts as
    a violation (delta's CheckDeltaInvariant)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.merge import (
        merge_into,
        update_where,
    )

    path = str(tmp_path / "chk")
    _hand_table(
        spark, path, [(1, 10)], conf={"delta.constraints.chk": "v > 0"}
    )
    bad = spark.createDataFrame([(2, -5)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="CHECK chk"):
        write_delta(bad, path, mode="append")
    nullv = spark.createDataFrame([(2, None)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="CHECK chk"):
        write_delta(nullv, path, mode="append")
    assert write_delta(
        spark.createDataFrame([(2, 5)], "id bigint, v bigint"), path
    ) == 1
    with pytest.raises(ValueError, match="CHECK chk"):
        update_where(spark, "delta", path, "id = 1", {"v": "-1"})
    src = spark.createDataFrame([(1, -3), (7, 70)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="CHECK chk"):
        merge_into(
            spark, "delta", path, src, on="t.id = s.id",
            matched=[("update", None, {"v": "s.v"})],
            not_matched={"id": "s.id", "v": "s.v"},
        )
    got = {(r.id, r.v) for r in read_delta(spark, path).collect()}
    assert got == {(1, 10), (2, 5)}
    assert _versions(path) == [0, 1]


def test_not_null_and_legacy_invariants(spark, tmp_path):
    """nullable=false schema fields enforce NOT NULL on write, and
    legacy per-column delta.invariants metadata (writer-v2 shape,
    {"expression": {"expression": ...}}) is parsed and enforced."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        write_delta,
    )

    path = str(tmp_path / "nn")
    inv = json.dumps({"expression": {"expression": "v < 100"}})
    _hand_table(
        spark,
        path,
        [(1, 10)],
        fields=[
            ("id", "long", False, None),
            ("v", "long", True, {"delta.invariants": inv}),
        ],
    )
    with pytest.raises(ValueError, match="NOT NULL id"):
        write_delta(
            spark.createDataFrame([(None, 5)], "id bigint, v bigint"), path
        )
    with pytest.raises(ValueError, match="invariant v"):
        write_delta(
            spark.createDataFrame([(2, 500)], "id bigint, v bigint"), path
        )
    assert write_delta(
        spark.createDataFrame([(2, 50)], "id bigint, v bigint"), path
    ) == 1


def test_unknown_writer_feature_refuses_all_writes(spark, tmp_path):
    """A foreign table listing a writerFeature this engine does not
    implement (icebergCompatV2 here; domainMetadata became SUPPORTED
    in r15) still READS fine but refuses every write — PROTOCOL.md:
    a writer must not write a table whose features it cannot
    enforce. rowTracking-style checkpoint-safe features are the
    DELIBERATE exception for CHECKPOINT only (see
    test_delta_row_tracking); anything else refuses checkpoints too."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        create_checkpoint,
        delete_delta_where,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "wf")
    _hand_table(
        spark,
        path,
        [(1, 10)],
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["appendOnly", "icebergCompatV2"],
        },
    )
    assert [r.id for r in read_delta(spark, path).collect()] == [1]
    df = spark.createDataFrame([(2, 20)], "id bigint, v bigint")
    with pytest.raises(NotImplementedError, match="icebergCompatV2"):
        write_delta(df, path)
    with pytest.raises(NotImplementedError, match="icebergCompatV2"):
        delete_delta_where(spark, path, "id = 1")
    # a checkpoint written here could drop actions the unknown
    # feature relies on
    with pytest.raises(NotImplementedError, match="icebergCompatV2"):
        create_checkpoint(spark, path)
    assert _versions(path) == [0]


def test_identity_columns_gate(spark, tmp_path):
    """Identity columns are allocation-SUPPORTED since r13, MERGE
    included since r14 (tests/test_delta_identity.py); what still
    gates: explicit values into a GENERATED ALWAYS column
    (ValueError, spec writer requirement) and SET on the identity
    column through any update path."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.merge import merge_into

    md = {"delta.identity.start": 1}
    path = str(tmp_path / "gid")
    _hand_table(
        spark,
        path,
        [(1, 10)],
        fields=[("id", "long", True, None), ("v", "long", True, md)],
    )
    df = spark.createDataFrame([(2, 20)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(df, path)
    # SET on the identity column refuses through MERGE
    with pytest.raises(ValueError, match="identity"):
        merge_into(
            spark,
            "delta",
            path,
            spark.createDataFrame([(1, 9)], "id long, x long"),
            on="t.id = s.id",
            matched=[("update", None, {"v": "s.x"})],
        )
    # a delete-clause MERGE works on an identity table (r14)
    merge_into(
        spark,
        "delta",
        path,
        spark.createDataFrame([(1, 9)], "id long, x long"),
        on="t.id = s.id",
        matched=[("delete", None)],
    )
    assert read_delta(spark, path).count() == 0
    # an append WITHOUT the identity column allocates it — this
    # foreign table never stamped a highWaterMark, so allocation
    # starts at `start` (the spec's rule; a conforming foreign writer
    # would have stamped the mark for its own explicit rows)
    write_delta(spark.createDataFrame([(7,)], "id bigint"), path)
    rows = sorted((r.id, r.v) for r in read_delta(spark, path).collect())
    assert rows == [(7, 1)]


def test_nested_field_metadata_gate(spark, tmp_path):
    """r12 ADVICE: generated/identity/invariant metadata on a NESTED
    struct field refuses every write — the top-level enforcement
    machinery never sees nested fields, so writing would silently
    skip a guarantee the table declares."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        _writer_gate,
    )

    for md in [
        {"delta.generationExpression": "x + 1"},
        {"delta.identity.start": 1},
        {"delta.invariants": '{"expression":{"expression":"x > 0"}}'},
    ]:
        schema = {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {
                    "name": "s",
                    "type": {
                        "type": "struct",
                        "fields": [
                            {"name": "x", "type": "long",
                             "nullable": True, "metadata": md}
                        ],
                    },
                    "nullable": True,
                    "metadata": {},
                },
            ],
        }
        with pytest.raises(NotImplementedError, match="nested field 's.x'"):
            _writer_gate(
                {"minReaderVersion": 1, "minWriterVersion": 2},
                {"schemaString": json.dumps(schema)},
                "WRITE",
            )
    # nested metadata inside ARRAY element structs gates too
    deep = {
        "type": "struct",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "array",
                    "elementType": {
                        "type": "struct",
                        "fields": [
                            {
                                "name": "y",
                                "type": "long",
                                "nullable": True,
                                "metadata": {
                                    "delta.invariants":
                                        '{"expression":'
                                        '{"expression":"y > 0"}}'
                                },
                            }
                        ],
                    },
                    "containsNull": True,
                },
                "nullable": True,
                "metadata": {},
            }
        ],
    }
    with pytest.raises(NotImplementedError, match="a\\[\\].y"):
        _writer_gate(
            {"minReaderVersion": 1, "minWriterVersion": 2},
            {"schemaString": json.dumps(deep)},
            "WRITE",
        )


def test_create_tblproperties_declares_protocol(spark, tmp_path):
    """r12 ADVICE: CREATE with interpreted TBLPROPERTIES declares the
    protocol those properties require — delta.constraints.* needs
    minWriterVersion>=3 and delta.enableChangeDataFeed>=4, else a
    legacy foreign writer at (1,2) would legally append without
    constraint checks or CDF files."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        write_delta,
    )

    def _v0_protocol(path):
        with open(
            os.path.join(path, "_delta_log",
                         "00000000000000000000.json")
        ) as fh:
            return next(
                json.loads(x)["protocol"] for x in fh
                if '"protocol"' in x
            )

    df = spark.createDataFrame([(1, 10)], "id bigint, v bigint")
    p1 = str(tmp_path / "plain")
    write_delta(df, p1)
    assert _v0_protocol(p1) == {
        "minReaderVersion": 1, "minWriterVersion": 2,
    }
    p2 = str(tmp_path / "ck")
    write_delta(df, p2, configuration={"delta.constraints.pos": "v > 0"})
    assert _v0_protocol(p2) == {
        "minReaderVersion": 1, "minWriterVersion": 3,
    }
    p3 = str(tmp_path / "cdf")
    write_delta(
        df, p3, configuration={"delta.enableChangeDataFeed": "true"}
    )
    assert _v0_protocol(p3) == {
        "minReaderVersion": 1, "minWriterVersion": 4,
    }


def test_overwrite_schema_validates_surviving_constraints(spark, tmp_path):
    """r12 ADVICE: overwrite_schema=True carries delta.constraints.*
    forward in the replacement metaData, so the replacement rows must
    satisfy them NOW — and a constraint referencing columns the new
    schema drops refuses the overwrite (committing would leave every
    later write failing at expression analysis)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10)], "id bigint, v bigint")
    write_delta(df, path, configuration={"delta.constraints.pos": "v > 0"})
    # replacement rows violating the surviving constraint refuse
    bad = spark.createDataFrame(
        [(1, -5, "x")], "id bigint, v bigint, w string"
    )
    with pytest.raises(ValueError, match="CHECK pos"):
        write_delta(bad, path, mode="overwrite", overwrite_schema=True)
    # a replacement schema DROPPING the referenced column refuses
    nref = spark.createDataFrame([(1, "x")], "id bigint, w string")
    with pytest.raises(ValueError, match="does not analyze"):
        write_delta(nref, path, mode="overwrite", overwrite_schema=True)
    # a valid replacement commits, and the constraint still binds
    ok = spark.createDataFrame(
        [(1, 5, "x")], "id bigint, v bigint, w string"
    )
    write_delta(ok, path, mode="overwrite", overwrite_schema=True)
    assert [(r.id, r.v, r.w) for r in read_delta(spark, path).collect()] \
        == [(1, 5, "x")]
    nxt = spark.createDataFrame(
        [(2, -1, "y")], "id bigint, v bigint, w string"
    )
    with pytest.raises(ValueError, match="CHECK pos"):
        write_delta(nxt, path)


def test_add_constraint_scans_existing_rows(spark, tmp_path):
    """set_delta_properties with a new delta.constraints.* key is
    ALTER TABLE ADD CONSTRAINT: it refuses when existing rows violate
    and binds future writes when they don't."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        set_delta_properties,
        write_delta,
    )

    path = str(tmp_path / "ac")
    _hand_table(spark, path, [(1, 10), (2, -4)])
    with pytest.raises(ValueError, match="CHECK pos"):
        set_delta_properties(
            spark, path, {"delta.constraints.pos": "v > 0"}
        )
    path2 = str(tmp_path / "ac2")
    _hand_table(spark, path2, [(1, 10), (2, 4)])
    v = set_delta_properties(
        spark, path2, {"delta.constraints.pos": "v > 0"}
    )
    assert v == 1
    with pytest.raises(ValueError, match="CHECK pos"):
        write_delta(
            spark.createDataFrame([(3, -1)], "id bigint, v bigint"), path2
        )
