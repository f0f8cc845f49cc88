"""Delta GENERATED columns (round-13 verdict #1): the writer computes
``delta.generationExpression`` for columns the caller leaves out,
VALIDATES caller-supplied values against the expression (delta-spark
semantics: mismatch refuses the whole write), and UPDATE/MERGE
post-images regenerate. Identity columns stay gated
(tests/test_delta_writer_gate.py). Every foreign table here is a
hand-written log — the shape delta-spark produces for
``GENERATED ALWAYS AS`` date-partitioned tables (PROTOCOL.md
§Generated Columns / Writer Requirements)."""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import types as T

from census_asc5_data_pipeline_spark.sources.delta_io import (
    delta_versions,
    read_delta,
    write_delta,
)
from census_asc5_data_pipeline_spark.sources.merge import (
    merge_into,
    update_where,
)


def _gen_table(path: str, expr: str = "v * 2", pcols=("g",)) -> None:
    """A FOREIGN empty Delta table whose ``g`` column is GENERATED
    ALWAYS AS ``expr`` and (by default) the partition column — the
    delta-spark generated-partition shape this engine previously
    refused every write on."""
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "long", "nullable": True,
             "metadata": {}},
            {
                "name": "g",
                "type": "long",
                "nullable": True,
                "metadata": {"delta.generationExpression": expr},
            },
        ],
    }
    lines = [
        {"commitInfo": {"timestamp": 1700000000000,
                        "operation": "CREATE TABLE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": list(pcols),
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
    ]
    with open(os.path.join(log, "00000000000000000000.json"), "w") as fh:
        fh.write("\n".join(json.dumps(x) for x in lines) + "\n")


def _rows(spark, path):
    return sorted(
        (r.id, r.v, r.g) for r in read_delta(spark, path).collect()
    )


def test_append_materializes_generated_partition_column(spark, tmp_path):
    """Append WITHOUT the generated column: the writer computes it
    from the expression, and because it is the partition column the
    add actions carry the computed partitionValues."""
    path = str(tmp_path / "t")
    _gen_table(path)
    df = spark.createDataFrame([(1, 10), (2, 25)], "id bigint, v bigint")
    v = write_delta(df, path)
    assert v == 1
    assert _rows(spark, path) == [(1, 10, 20), (2, 25, 50)]
    # the staged add actions are partitioned by the COMPUTED value
    pvals = set()
    with open(os.path.join(path, "_delta_log",
                           f"{v:020d}.json")) as fh:
        for line in fh:
            a = json.loads(line)
            if "add" in a:
                pvals.add(a["add"]["partitionValues"]["g"])
    assert pvals == {"20", "50"}


def test_append_validates_supplied_values(spark, tmp_path):
    """Caller-supplied generated values are validated against the
    expression: a match commits, a mismatch refuses the whole write
    (delta-spark's generated-column invariant)."""
    path = str(tmp_path / "t")
    _gen_table(path)
    ok = spark.createDataFrame(
        [(1, 10, 20)], "id bigint, v bigint, g bigint"
    )
    assert write_delta(ok, path) == 1
    bad = spark.createDataFrame(
        [(2, 30, 61)], "id bigint, v bigint, g bigint"
    )
    with pytest.raises(ValueError, match="GENERATED g"):
        write_delta(bad, path)
    assert delta_versions(path) == [0, 1]  # nothing committed


def test_update_regenerates_and_refuses_set(spark, tmp_path):
    """UPDATE recomputes generated columns in the post-image (both
    cow and dv modes); SETting one directly refuses — it is derived,
    not assignable."""
    for mode in ("cow", "dv"):
        path = str(tmp_path / f"t_{mode}")
        _gen_table(path, pcols=())
        write_delta(
            spark.createDataFrame([(1, 10), (2, 25)],
                                  "id bigint, v bigint"),
            path,
        )
        with pytest.raises(ValueError, match="cannot SET generated"):
            update_where(spark, "delta", path, "id = 1", {"g": "5"},
                         mode=mode)
        update_where(spark, "delta", path, "id = 1", {"v": "v + 1"},
                     mode=mode)
        assert _rows(spark, path) == [(1, 11, 22), (2, 25, 50)]


def test_merge_post_images_regenerate(spark, tmp_path):
    """MERGE: update post-images recompute the generated column,
    insert clauses without it compute it, and an insert clause
    supplying a mismatched value refuses the whole merge."""
    path = str(tmp_path / "t")
    _gen_table(path, pcols=())
    write_delta(
        spark.createDataFrame([(1, 10), (2, 25)], "id bigint, v bigint"),
        path,
    )
    src = spark.createDataFrame([(1, 100), (3, 7)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="cannot SET generated"):
        merge_into(
            spark, "delta", path, src, "t.id = s.id",
            matched=[("update", None, {"v": "s.v", "g": "0"})],
        )
    merge_into(
        spark, "delta", path, src, "t.id = s.id",
        matched=[("update", None, {"v": "s.v"})],
        not_matched={"id": "s.id", "v": "s.v"},
    )
    assert _rows(spark, path) == [(1, 100, 200), (2, 25, 50), (3, 7, 14)]
    # a supplied-but-wrong insert value refuses
    src2 = spark.createDataFrame([(4, 8)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="GENERATED g"):
        merge_into(
            spark, "delta", path, src2, "t.id = s.id",
            not_matched={"id": "s.id", "v": "s.v", "g": "99"},
        )
    # a supplied-and-right one commits
    merge_into(
        spark, "delta", path, src2, "t.id = s.id",
        not_matched={"id": "s.id", "v": "s.v", "g": "s.v * 2"},
    )
    assert (4, 8, 16) in _rows(spark, path)


def test_merge_dv_mode_regenerates(spark, tmp_path):
    """DV-mode MERGE post-images regenerate too (retire + append)."""
    path = str(tmp_path / "t")
    _gen_table(path, pcols=())
    write_delta(
        spark.createDataFrame([(1, 10)], "id bigint, v bigint"), path
    )
    merge_into(
        spark, "delta", path,
        spark.createDataFrame([(1, 33)], "id bigint, v bigint"),
        "t.id = s.id",
        matched=[("update", None, {"v": "s.v"})],
        mode="dv",
    )
    assert _rows(spark, path) == [(1, 33, 66)]


def test_generated_columns_writer_feature_accepted(spark, tmp_path):
    """A feature-protocol table listing ``generatedColumns`` in
    writerFeatures is writable (it was previously refused as an
    unknown feature)."""
    path = str(tmp_path / "t")
    _gen_table(path, pcols=())
    log = os.path.join(path, "_delta_log",
                       "00000000000000000000.json")
    lines = [json.loads(x) for x in open(log) if x.strip()]
    for a in lines:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["generatedColumns", "invariants"],
            }
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(x) for x in lines) + "\n")
    write_delta(
        spark.createDataFrame([(1, 10)], "id bigint, v bigint"), path
    )
    assert _rows(spark, path) == [(1, 10, 20)]


def test_creation_validates_and_declares_protocol(spark, tmp_path):
    """Creating a table whose schema carries generationExpression
    metadata validates the first rows against the expression and
    declares minWriterVersion 4 (the legacy generatedColumns writer
    version) so foreign writers know to honor it."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.LongType()),
            T.StructField(
                "g",
                T.LongType(),
                metadata={"delta.generationExpression": "v * 2"},
            ),
        ]
    )
    path = str(tmp_path / "t")
    bad = spark.createDataFrame([(1, 10, 21)], schema)
    with pytest.raises(ValueError, match="GENERATED g"):
        write_delta(bad, path)
    ok = spark.createDataFrame([(1, 10, 20)], schema)
    assert write_delta(ok, path) == 0
    with open(os.path.join(path, "_delta_log",
                           "00000000000000000000.json")) as fh:
        protos = [json.loads(x)["protocol"] for x in fh
                  if '"protocol"' in x]
    assert protos == [{"minReaderVersion": 1, "minWriterVersion": 4}]
    # and the follow-up append computes the column
    write_delta(
        spark.createDataFrame([(2, 5)], "id bigint, v bigint"), path
    )
    assert _rows(spark, path) == [(1, 10, 20), (2, 5, 10)]


def test_sql_insert_computes_unnamed_generated(spark, tmp_path):
    """INSERT INTO t (cols...) that omits the generated column
    computes it (not NULL-fills it); naming it validates the value."""
    from census_asc5_data_pipeline_spark.sources.merge import dml_sql

    path = str(tmp_path / "t")
    _gen_table(path, pcols=())
    cat = {"t": ("delta", path)}
    dml_sql(spark, "INSERT INTO t (id, v) VALUES (1, 10)", cat)
    assert _rows(spark, path) == [(1, 10, 20)]
    dml_sql(spark, "INSERT INTO t (id, v, g) VALUES (2, 5, 10)", cat)
    assert _rows(spark, path) == [(1, 10, 20), (2, 5, 10)]
    with pytest.raises(ValueError, match="GENERATED g"):
        dml_sql(spark, "INSERT INTO t (id, v, g) VALUES (3, 5, 11)", cat)


def test_cdf_postimages_regenerate(spark, tmp_path):
    """On a CDF-enabled generated table, MERGE/UPDATE change-feed
    post-images carry the RECOMPUTED generated value (a stale g in
    the feed would corrupt every downstream CDC consumer)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta_cdf,
        set_delta_properties,
    )

    path = str(tmp_path / "t")
    _gen_table(path, pcols=())
    set_delta_properties(
        spark, path, {"delta.enableChangeDataFeed": "true"}
    )
    write_delta(
        spark.createDataFrame([(1, 10)], "id bigint, v bigint"), path
    )
    v = update_where(spark, "delta", path, "id = 1", {"v": "v + 5"})
    cdf, _last = read_delta_cdf(spark, path, since_version=v - 1)
    post = [
        (r.id, r.v, r.g)
        for r in cdf.collect()
        if r._change_type == "update_postimage"
    ]
    assert post == [(1, 15, 30)]
    v2 = merge_into(
        spark, "delta", path,
        spark.createDataFrame([(1, 50)], "id bigint, v bigint"),
        "t.id = s.id",
        matched=[("update", None, {"v": "s.v"})],
    )
    cdf2, _l2 = read_delta_cdf(spark, path, since_version=v2 - 1)
    post2 = [
        (r.id, r.v, r.g)
        for r in cdf2.collect()
        if r._change_type == "update_postimage"
    ]
    assert post2 == [(1, 50, 100)]
