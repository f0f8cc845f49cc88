"""Type widening WRITE (r16; READ landed r14): ALTER COLUMN TYPE
widens the schemaString, records delta.typeChanges, upgrades the
protocol to (3,7)+typeWidening in the same commit, and only the
spec's supported pairs pass. Old narrow files keep reading through
Spark's native parquet promotion."""
from __future__ import annotations

import json

import pytest
import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import dml_sql


def test_alter_column_type_round_trip(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(
        spark.createDataFrame([(1, 1.5), (2, 2.5)], "k int, v float"),
        p,
    )
    v = d.alter_delta_column_type(spark, p, "k", "bigint")
    proto, meta, _a, _t = d._replay(spark, p, None)
    assert proto["minReaderVersion"] == 3
    assert "typeWidening" in proto["readerFeatures"]
    assert "typeWidening" in proto["writerFeatures"]
    sj = json.loads(meta["schemaString"])
    kf = next(f for f in sj["fields"] if f["name"] == "k")
    assert kf["type"] == "long"
    assert kf["metadata"]["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long"}
    ]
    assert meta["configuration"]["delta.enableTypeWidening"] == "true"
    # old narrow file reads under the widened schema; new wide rows
    # append through ordinary schema enforcement
    d.alter_delta_column_type(spark, p, "v", "double")
    d.write_delta(
        spark.createDataFrame(
            [(3_000_000_000, 9.0)], "k long, v double"
        ),
        p,
    )
    out = d.read_delta(spark, p)
    assert dict(out.dtypes) == {"k": "bigint", "v": "double"}
    assert sorted((r.k, r.v) for r in out.collect()) == [
        (1, 1.5),
        (2, 2.5),
        (3_000_000_000, 9.0),
    ]
    # time travel to the narrow generation keeps narrow types
    v0 = d.read_delta(spark, p, version=v - 1)
    assert dict(v0.dtypes) == {"k": "int", "v": "float"}
    # the chained second widening appends its own typeChanges entry
    d.alter_delta_column_type(spark, p, "k", "decimal(22, 0)")
    _p2, meta2, _a2, _t2 = d._replay(spark, p, None)
    kf2 = next(
        f
        for f in json.loads(meta2["schemaString"])["fields"]
        if f["name"] == "k"
    )
    assert kf2["metadata"]["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long"},
        {"fromType": "long", "toType": "decimal(22,0)"},
    ]
    assert d.read_delta(spark, p).count() == 3


def test_unsupported_widenings_refuse(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(
        spark.createDataFrame(
            [(1, "a", 5)], "k bigint, s string, part int"
        ),
        p,
        partition_by=["part"],
    )
    with pytest.raises(NotImplementedError, match="supported widening"):
        d.alter_delta_column_type(spark, p, "k", "int")  # narrowing
    with pytest.raises(NotImplementedError, match="supported widening"):
        d.alter_delta_column_type(spark, p, "s", "bigint")
    with pytest.raises(NotImplementedError, match="supported widening"):
        d.alter_delta_column_type(spark, p, "k", "decimal(10, 0)")
    with pytest.raises(ValueError, match="partition column"):
        d.alter_delta_column_type(spark, p, "part", "bigint")
    with pytest.raises(ValueError, match="not in the table schema"):
        d.alter_delta_column_type(spark, p, "nope", "bigint")
    with pytest.raises(ValueError, match="already has type"):
        d.alter_delta_column_type(spark, p, "k", "bigint")


def test_alter_column_type_sql_surface(spark, tmp_path):
    p = str(tmp_path / "t")
    cat: dict = {}
    dml_sql(
        spark,
        f"CREATE TABLE t (k int, v float) USING delta LOCATION '{p}'",
        cat,
    )
    dml_sql(spark, "INSERT INTO t VALUES (7, 1.5)", cat)
    dml_sql(spark, "ALTER TABLE t ALTER COLUMN k TYPE bigint", cat)
    dml_sql(spark, "INSERT INTO t VALUES (3000000000, 2.5)", cat)
    out = d.read_delta(spark, p)
    assert dict(out.dtypes)["k"] == "bigint"
    assert sorted(r.k for r in out.collect()) == [7, 3_000_000_000]
    # decimal widening through SQL (parenthesized type parses)
    dml_sql(
        spark, "ALTER TABLE t ALTER COLUMN k TYPE decimal(22, 0)", cat
    )
    assert dict(d.read_delta(spark, p).dtypes)["k"] == "decimal(22,0)"


def test_widened_stats_skipping_stays_exact(spark, tmp_path):
    """Stats written under the narrow type must keep pruning soundly
    after the engine's own widening (the r14 foreign-table pin, now
    on the engine's write path)."""
    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(8)
        .repartition(4)
        .select(F.col("id").cast("int").alias("k")),
        p,
    )
    d.alter_delta_column_type(spark, p, "k", "bigint")
    got = d.read_delta(spark, p, predicate="k >= 6")
    assert sorted(r.k for r in got.collect()) == [6, 7]
