"""Per-file statistics + data skipping (r13 — delta_stats).

The writer stamps a ``stats`` JSON on every add action from the
parquet FOOTER; ``read_delta(predicate=)`` prunes the file list by
min/max/nullCount intervals before Spark plans the scan, and DML
(DELETE/UPDATE WHERE) prunes its candidate files the same way.
Results are always exact: the evaluator only drops files PROVEN
matchless and the full predicate still applies row-wise."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources import delta_stats as ds

SF_SMALL = "/root/testdata/sf0.001"


def _live(spark, path):
    _p, meta, adds, _tx = d._replay(spark, path, None)
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    return meta, schema, list(adds.values())


@pytest.fixture()
def orders_table(spark, tmp_path):
    path = str(tmp_path / "orders_delta")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    d.write_delta(orders.repartition(8, "o_orderkey"), path)
    return path, orders


def test_writer_stamps_stats(spark, orders_table):
    path, _orders = orders_table
    _meta, _schema, adds = _live(spark, path)
    assert len(adds) == 8
    for a in adds:
        st = json.loads(a["stats"])
        assert st["numRecords"] > 0
        assert st["minValues"]["o_orderkey"] <= st["maxValues"]["o_orderkey"]
        assert st["nullCount"]["o_orderkey"] == 0


def test_point_lookup_prunes_and_matches(spark, orders_table):
    path, orders = orders_table
    meta, schema, adds = _live(spark, path)
    key = orders.select(F.max("o_orderkey")).first()[0]
    pred = f"o_orderkey = {key}"
    kept = ds.skip_files(
        adds, ds.parse_skip_predicate(pred), schema, [], None
    )
    assert 1 <= len(kept) < len(adds)  # the point lives in few files
    got = d.read_delta(spark, path, predicate=pred).count()
    assert got == orders.filter(pred).count() == 1


@pytest.mark.parametrize(
    "pred",
    [
        "o_totalprice BETWEEN 1000 AND 2000 AND o_orderstatus IN ('F','O')",
        "o_orderpriority = '1-URGENT'",
        "o_orderkey >= 100 AND o_orderkey < 200",
        "500 <= o_orderkey AND o_custkey != 7",
        "o_orderpriority IS NOT NULL",
    ],
)
def test_predicates_exact(spark, orders_table, pred):
    path, orders = orders_table
    got = d.read_delta(spark, path, predicate=pred).count()
    assert got == orders.filter(pred).count()


def test_unparseable_predicate_still_exact(spark, orders_table):
    path, orders = orders_table
    pred = "o_totalprice > 1000 OR o_orderkey = 5"
    assert ds.parse_skip_predicate(pred) is None  # ORs disable pruning
    got = d.read_delta(spark, path, predicate=pred).count()
    assert got == orders.filter(pred).count()


def test_impossible_predicate_skips_every_file(spark, orders_table):
    path, _orders = orders_table
    _meta, schema, adds = _live(spark, path)
    kept = ds.skip_files(
        adds,
        ds.parse_skip_predicate("o_orderkey < 0"),
        schema,
        [],
        None,
    )
    assert kept == []
    assert d.read_delta(spark, path, predicate="o_orderkey < 0").count() == 0


def test_null_atoms_prune_on_null_counts(spark, tmp_path):
    path = str(tmp_path / "nulls")
    full = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k int, v string"
    ).coalesce(1)
    d.write_delta(full, path)
    allnull = spark.createDataFrame(
        [(i, None) for i in range(10, 20)], "k int, v string"
    ).coalesce(1)
    d.write_delta(allnull, path)
    _meta, schema, adds = _live(spark, path)
    assert len(adds) == 2
    kept = ds.skip_files(
        adds, ds.parse_skip_predicate("v IS NULL"), schema, [], None
    )
    assert len(kept) == 1  # the no-nulls file skips
    kept = ds.skip_files(
        adds, ds.parse_skip_predicate("v IS NOT NULL"), schema, [], None
    )
    assert len(kept) == 1  # the all-null file skips
    # all-null file fails every comparison atom too
    kept = ds.skip_files(
        adds, ds.parse_skip_predicate("v = 'v3'"), schema, [], None
    )
    assert len(kept) == 1
    assert d.read_delta(spark, path, predicate="v IS NULL").count() == 10


def test_partition_columns_prune_through_same_predicate(spark, tmp_path):
    path = str(tmp_path / "parted")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
        "k int, bucket string",
    )
    d.write_delta(df, path, partition_by=["bucket"])
    _meta, schema, adds = _live(spark, path)
    kept = ds.skip_files(
        adds,
        ds.parse_skip_predicate("bucket = 'a' AND k <= 10"),
        schema,
        ["bucket"],
        None,
    )
    assert all(a["partitionValues"]["bucket"] == "a" for a in kept)
    got = d.read_delta(
        spark, path, predicate="bucket = 'a' AND k <= 10"
    )
    assert got.count() == 6  # 0,2,4,6,8,10


def test_stats_survive_checkpoint(spark, orders_table):
    path, orders = orders_table
    d.create_checkpoint(spark, path)
    # drop the JSON tail so the replay MUST come from the checkpoint
    for f in os.listdir(os.path.join(path, "_delta_log")):
        if f.endswith(".json") and len(f) == 25:
            os.remove(os.path.join(path, "_delta_log", f))
    _meta, schema, adds = _live(spark, path)
    assert all(a.get("stats") for a in adds)
    key = orders.select(F.min("o_orderkey")).first()[0]
    kept = ds.skip_files(
        adds,
        ds.parse_skip_predicate(f"o_orderkey = {key}"),
        schema,
        [],
        None,
    )
    assert 1 <= len(kept) < len(adds)


def test_stats_survive_v2_checkpoint(spark, tmp_path):
    path = str(tmp_path / "v2")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "k int, v int"
    ).repartition(4, "k")
    d.write_delta(df, path)
    d.set_delta_properties(spark, path, {"delta.checkpointPolicy": "v2"})
    d.create_checkpoint(spark, path)
    for f in os.listdir(os.path.join(path, "_delta_log")):
        if f.endswith(".json") and len(f) == 25:
            os.remove(os.path.join(path, "_delta_log", f))
    _meta, schema, adds = _live(spark, path)
    assert all(a.get("stats") for a in adds)


def test_delete_prunes_candidates(spark, tmp_path):
    path = str(tmp_path / "del")
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(1000)], "k long, g int"
    ).repartition(10, "k")
    d.write_delta(df, path)
    _meta, _schema, adds0 = _live(spark, path)
    assert len(adds0) == 10
    # delete a single key: only the file(s) holding it rewrite
    v = d.delete_delta_where(spark, path, "k = 17")
    assert v is not None
    _meta, _schema, adds1 = _live(spark, path)
    untouched0 = {a["path"] for a in adds0}
    survivors = {a["path"] for a in adds1}
    # at most one candidate file was rewritten: >= 9 originals remain
    assert len(untouched0 & survivors) >= 9
    assert d.read_delta(spark, path).count() == 999
    # a provably-matchless delete is a no-op, no commit written
    assert d.delete_delta_where(spark, path, "k = -1") is None


def test_update_prunes_candidates(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.merge import update_where

    path = str(tmp_path / "upd")
    df = spark.createDataFrame(
        [(i, 0) for i in range(1000)], "k long, v int"
    ).repartition(10, "k")
    d.write_delta(df, path)
    _meta, _schema, adds0 = _live(spark, path)
    v = update_where(spark, "delta", path, "k = 17", {"v": "99"})
    assert v is not None
    _meta, _schema, adds1 = _live(spark, path)
    kept = {a["path"] for a in adds0} & {a["path"] for a in adds1}
    assert len(kept) >= 9
    out = d.read_delta(spark, path)
    assert out.filter("v = 99").count() == 1
    assert out.count() == 1000
    # provably-matchless UPDATE: no commit
    assert update_where(spark, "delta", path, "k = -5", {"v": "1"}) is None


def test_column_mapped_stats_use_physical_names(spark, tmp_path):
    path = str(tmp_path / "mapped")
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(100)], "k int, s string"
    ).repartition(4, "k")
    d.write_delta(
        df, path, configuration={"delta.columnMapping.mode": "name"}
    )
    _p, meta, adds, _tx = d._replay(spark, path, None)
    phys = d._column_mapping(meta)
    st = json.loads(next(iter(adds.values()))["stats"])
    assert set(st["minValues"]) <= set(phys.values())
    # predicate in LOGICAL names prunes through the mapping
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    kept = ds.skip_files(
        list(adds.values()),
        ds.parse_skip_predicate("k = 3"),
        T.StructType([f for f in schema.fields]),
        [],
        phys,
    )
    assert 1 <= len(kept) < len(adds)
    got = d.read_delta(spark, path, predicate="k = 3")
    assert [r["s"] for r in got.collect()] == ["s3"]


def test_foreign_stats_string_parses(spark):
    # a hand-written add action the way delta-spark stamps it
    add = {
        "path": "x.parquet",
        "partitionValues": {},
        "stats": json.dumps(
            {
                "numRecords": 3,
                "minValues": {"a": 5, "ts": "2021-04-08T09:34:09.000Z"},
                "maxValues": {"a": 9, "ts": "2021-04-09T00:00:00.000Z"},
                "nullCount": {"a": 0, "ts": 0},
            }
        ),
    }
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    keep = ds.skip_files(
        [add], ds.parse_skip_predicate("a > 9"), schema, [], None
    )
    assert keep == []
    keep = ds.skip_files(
        [add], ds.parse_skip_predicate("a >= 9"), schema, [], None
    )
    assert keep == [add]
    keep = ds.skip_files(
        [add],
        ds.parse_skip_predicate("ts < TIMESTAMP '2021-04-08 09:00:00+00:00'"),
        schema,
        [],
        None,
    )
    assert keep == []


def test_statsless_adds_never_skip(spark):
    add = {"path": "x.parquet", "partitionValues": {}}
    schema = T.StructType([T.StructField("a", T.LongType())])
    keep = ds.skip_files(
        [add], ds.parse_skip_predicate("a = 1"), schema, [], None
    )
    assert keep == [add]


def test_parser_shapes():
    p = ds.parse_skip_predicate
    assert p("a = 1 AND b <= 2.5") == [("a", "=", 1), ("b", "<=", 2.5)]
    assert p("a BETWEEN 1 AND 3") == [("a", ">=", 1), ("a", "<=", 3)]
    assert p("s = 'it''s'") == [("s", "=", "it's")]
    assert p("d >= DATE '2020-01-02'") == [
        ("d", ">=", dt.date(2020, 1, 2))
    ]
    assert p("`weird col` = 1") == [("weird col", "=", 1)]
    assert p("a in (1, 2, 3)") == [("a", "in", [1, 2, 3])]
    # not provable → None, never a wrong atom list
    assert p("a = 1 OR b = 2") is None
    assert p("NOT a = 1") is None
    assert p("f(a) = 1") is None
    assert p("a = b") is None
    assert p("upper(s) = 'X'") is None


def test_optimize_restamps_stats(spark, tmp_path):
    """Compaction must not destroy data skipping: OPTIMIZE's
    rewritten (dataChange=false) files carry fresh footer stats."""
    path = str(tmp_path / "opt")
    for lo in (0, 100, 200, 300):
        d.write_delta(
            spark.createDataFrame(
                [(i, i % 5) for i in range(lo, lo + 100)], "k long, g int"
            ).coalesce(1),
            path,
        )
    res = d.optimize_delta(spark, path, target_file_bytes=1 << 30)
    assert res["files_after"] < res["files_before"]
    _meta, schema, adds = _live(spark, path)
    assert all(a.get("stats") for a in adds)
    kept = ds.skip_files(
        adds, ds.parse_skip_predicate("k = 17"), schema, [], None
    )
    assert d.read_delta(spark, path, predicate="k = 17").count() == 1
    assert len(kept) >= 1


def test_fractional_literal_never_truncates(spark):
    """r13 ADVICE (high): int(1.5) truncation made `x < 1.5` prune a
    file whose rows are all x=1 — the literal must compare as-is."""
    add = {
        "path": "x.parquet",
        "partitionValues": {},
        "stats": json.dumps(
            {
                "numRecords": 3,
                "minValues": {"x": 1},
                "maxValues": {"x": 1},
                "nullCount": {"x": 0},
            }
        ),
    }
    schema = T.StructType([T.StructField("x", T.LongType())])
    for pred in ("x < 1.5", "x != 1.5", "x <= 1.2", "x BETWEEN 0.5 AND 1.5"):
        kept = ds.skip_files(
            [add], ds.parse_skip_predicate(pred), schema, [], None
        )
        assert kept == [add], pred
    # and pruning still happens when provably matchless
    for pred in ("x > 1.5", "x = 1.5", "x < 0.5"):
        kept = ds.skip_files(
            [add], ds.parse_skip_predicate(pred), schema, [], None
        )
        assert kept == [], pred


def test_numeric_literal_vs_string_column_keeps_file(spark):
    """r13 ADVICE (high): Spark evaluates `s > 5` by CASTING the
    string column to a number — lexicographic min/max ('10' < '5')
    must never prune; the kind-mismatch atom proves nothing."""
    add = {
        "path": "x.parquet",
        "partitionValues": {},
        "stats": json.dumps(
            {
                "numRecords": 2,
                "minValues": {"s": "10"},
                "maxValues": {"s": "19"},
                "nullCount": {"s": 0},
            }
        ),
    }
    schema = T.StructType([T.StructField("s", T.StringType())])
    kept = ds.skip_files(
        [add], ds.parse_skip_predicate("s > 5"), schema, [], None
    )
    assert kept == [add]
    # string-literal atoms still prune string stats
    kept = ds.skip_files(
        [add], ds.parse_skip_predicate("s > '2'"), schema, [], None
    )
    assert kept == []


def test_numeric_vs_string_column_end_to_end(spark, tmp_path):
    """The CAST semantics survive the full read path: a numeric
    predicate over a string column returns Spark's answer."""
    path = str(tmp_path / "s_cast")
    df = spark.createDataFrame([("10",), ("19",)], "s string")
    d.write_delta(df.coalesce(1), path)
    assert d.read_delta(spark, path, predicate="s > 5").count() == 2


def test_between_inside_quoted_literal(spark):
    """r13 ADVICE (low): the BETWEEN rewrite must not fire inside a
    quoted string literal."""
    atoms = ds.parse_skip_predicate(
        "note = 'x BETWEEN 1 AND 2' AND k BETWEEN 3 AND 4"
    )
    assert atoms == [
        ("note", "=", "x BETWEEN 1 AND 2"),
        ("k", ">=", 3),
        ("k", "<=", 4),
    ]
    # string-literal BETWEEN bounds still rewrite
    assert ds.parse_skip_predicate("s BETWEEN 'a' AND 'b'") == [
        ("s", ">=", "a"),
        ("s", "<=", "b"),
    ]
