"""Bucketed co-located join: the claim is a PLAN SHAPE (no Exchange on
either join side), so that is what the test asserts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.catalog import read_table
from census_asc5_data_pipeline_spark.sources.bucketing import (
    cojoin_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(base / "li"))
    write_bucketed(orders, "ord_b", "l_orderkey", 8, path=str(base / "ord"))
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = cojoin_bucketed(spark, lt, rt, "l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = cojoin_bucketed(spark, lt, rt, "l_orderkey").groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    got = {r.o_orderpriority: r.n for r in joined.collect()}
    li = read_table(spark, SF, "lineitem").select(F.col("l_orderkey"))
    orders = read_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    want = {
        r.o_orderpriority: r.n
        for r in li.join(orders, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_zorder_key_interleaves_and_localizes(spark):
    from census_asc5_data_pipeline_spark.sources.bucketing import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], ["x", "y"]
    )
    out = {(r.x, r.y): r.z for r in df.withColumn("z", zorder_key(["x", "y"], 3)).collect()}
    # known Morton values for 3-bit interleave (x in even bit positions)
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    assert out[(7, 7)] == 63
    # locality: the 4x4 quadrant [0..3]x[0..3] occupies the contiguous
    # key range [0, 16) — that is the data-skipping property
    quad = {out[(x, y)] for x in range(4) for y in range(4)}
    assert quad == set(range(16))


def test_write_zordered_roundtrip(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.bucketing import write_zordered

    df = spark.createDataFrame(
        [(x, y, x * 100 + y) for x in range(16) for y in range(16)],
        ["x", "y", "v"],
    )
    path = str(tmp_path / "zorder")
    write_zordered(df, path, ["x", "y"], bits=4)
    back = spark.read.parquet(path)
    assert back.count() == 256
    assert {(r.x, r.y, r.v) for r in back.collect()} == {
        (x, y, x * 100 + y) for x in range(16) for y in range(16)
    }


def test_bucketed_groupby_needs_no_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # aggregation on the bucket key reuses the bucketing — no Exchange
    assert "Exchange" not in plan, plan


def test_zorder_key_rejects_bit_overflow(spark):
    import pytest as _pytest

    from census_asc5_data_pipeline_spark.sources.bucketing import zorder_key

    with _pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d", "e"], bits=16)  # 80 bit positions


def test_zone_index_prunes_files_and_preserves_results(spark, tmp_path):
    """Zone-map pruning must read fewer files for a selective range and
    return exactly the full-scan filter result."""
    from census_asc5_data_pipeline_spark.sources.stats_index import (
        build_stats_index,
        pruned_read,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    # 8 files, disjoint id ranges -> zones are genuinely selective
    df = spark.range(0, 8000).withColumn("v", F.col("id") * 2)
    df.repartitionByRange(8, "id").write.parquet(path)
    idx = build_stats_index(spark, path, "id")
    assert idx.count() == 8
    out, picked, total = pruned_read(spark, path, "id", 1000, 1999)
    assert total == 8
    assert picked < 8, "selective range must prune files"
    got = sorted((r.id, r.v) for r in out.collect())
    want = sorted(
        (r.id, r.v)
        for r in spark.read.parquet(path)
        .filter((F.col("id") >= 1000) & (F.col("id") <= 1999))
        .collect()
    )
    assert got == want and len(got) == 1000
    # out-of-range probe selects nothing but stays schema-stable
    empty, p0, _ = pruned_read(spark, path, "id", 10**9, 2 * 10**9)
    assert p0 == 0 and empty.count() == 0
    assert empty.columns == spark.read.parquet(path).columns


def test_zone_index_rejects_column_mismatch(spark, tmp_path):
    """Pruning on a column other than the indexed one must raise —
    stats for 'id' say nothing about 'v', so silent pruning would drop
    matching files (advisor round-5 finding)."""
    import pytest as _pytest

    from census_asc5_data_pipeline_spark.sources.stats_index import (
        build_stats_index,
        pruned_read,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    spark.range(0, 100).withColumn("v", F.col("id") * 2).write.parquet(path)
    build_stats_index(spark, path, "id")
    with _pytest.raises(ValueError, match="built on column 'id'"):
        pruned_read(spark, path, "v", 0, 10)


def test_zone_index_stale_files_still_read(spark, tmp_path):
    """Files appended AFTER the index build are unknown to the index —
    they must be read unpruned, so the result still equals the
    full-scan filter (advisor round-5 finding: correctness, not just
    over-selection)."""
    from census_asc5_data_pipeline_spark.sources.stats_index import (
        build_stats_index,
        pruned_read,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    df = spark.range(0, 4000).withColumn("v", F.col("id") * 2)
    df.repartitionByRange(4, "id").write.parquet(path)
    build_stats_index(spark, path, "id")
    # append rows IN the probe range after the build — stale index
    spark.range(1500, 1600).withColumn("v", F.col("id") * 2).write.mode(
        "append"
    ).parquet(path)
    out, picked, total = pruned_read(spark, path, "id", 1000, 1999)
    want = sorted(
        (r.id, r.v)
        for r in spark.read.parquet(path)
        .filter((F.col("id") >= 1000) & (F.col("id") <= 1999))
        .collect()
    )
    got = sorted((r.id, r.v) for r in out.collect())
    assert got == want  # includes the appended duplicates
    assert total > 4  # the appended files are counted
    assert picked < total  # out-of-range indexed files still pruned


def test_zone_and_bloom_index_survive_deleted_files(spark, tmp_path):
    """A file DELETED after the build (compaction/vacuum) must drop out
    of the indexed set instead of surfacing as a missing path in the
    explicit multi-path read (advisor round-6 finding); the result
    equals the full-scan filter over the remaining files."""
    import glob
    import os

    from census_asc5_data_pipeline_spark.sources.stats_index import (
        bloom_pruned_read,
        build_bloom_index,
        build_stats_index,
        pruned_read,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    df = spark.range(0, 4000).withColumn("v", F.col("id") * 2)
    df.repartitionByRange(4, "id").write.parquet(path)
    build_stats_index(spark, path, "id")
    build_bloom_index(spark, path, "id")
    # vacuum one data file out from under both indexes
    os.remove(sorted(glob.glob(os.path.join(path, "*.parquet")))[0])
    want = sorted(
        (r.id, r.v)
        for r in spark.read.parquet(path)
        .filter((F.col("id") >= 0) & (F.col("id") <= 3999))
        .collect()
    )
    out, picked, total = pruned_read(spark, path, "id", 0, 3999)
    assert total == 3 and picked <= 3
    assert sorted((r.id, r.v) for r in out.collect()) == want
    # bloom: probe a key from a SURVIVING file; must not name the
    # deleted path
    survivor = want[0][0]
    bout, bpicked, btotal = bloom_pruned_read(spark, path, "id", survivor)
    assert btotal == 3
    assert [(r.id, r.v) for r in bout.collect()] == [
        (survivor, survivor * 2)
    ]


def test_bloom_index_point_lookup_prunes_and_preserves_results(
    spark, tmp_path
):
    """A high-cardinality key HASH-scattered across files defeats the
    zone map (every file's [min,max] spans the domain) but the Bloom
    index must still prune a point lookup to ~1 file and return
    exactly the full-scan equality result."""
    from census_asc5_data_pipeline_spark.sources.stats_index import (
        bloom_pruned_read,
        build_bloom_index,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "bt")
    # keys scattered by hash -> 8 files with interleaved ranges
    df = spark.range(0, 8000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    df.repartition(8, "k").write.parquet(path)
    idx = build_bloom_index(spark, path, "k")
    assert idx.count() == 8
    out, picked, total = bloom_pruned_read(spark, path, "k", 4242)
    assert total == 8
    # the true file plus possible bloom false positives; at n_bits
    # 65536 vs ~1000 distinct per file the fp term is ~0.1%
    assert picked <= 2
    got = [(r.k, r.v) for r in out.collect()]
    assert got == [(4242, 4242 * 3)]
    # absent key: bloom may select 0 files; result must be empty and
    # schema-stable either way
    empty, p_absent, _ = bloom_pruned_read(spark, path, "k", 10**9)
    assert empty.count() == 0
    assert p_absent <= 1
    assert empty.columns == ["k", "v"]


def test_bloom_index_rejects_mismatch_and_reads_stale_unpruned(
    spark, tmp_path
):
    import pytest as _pytest

    from census_asc5_data_pipeline_spark.sources.stats_index import (
        bloom_pruned_read,
        build_bloom_index,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "bt2")
    spark.range(0, 100).select(F.col("id").alias("k")).coalesce(
        1
    ).write.parquet(path)
    build_bloom_index(spark, path, "k")
    with _pytest.raises(ValueError, match="built\\s+on column"):
        bloom_pruned_read(spark, path, "id", 5)
    # append AFTER the build: the new file is unknown to the index and
    # must be read unpruned — never silently skipped
    spark.range(100, 200).select(F.col("id").alias("k")).coalesce(
        1
    ).write.mode("append").parquet(path)
    out, picked, total = bloom_pruned_read(spark, path, "k", 150)
    assert total == 2
    assert [r.k for r in out.collect()] == [150]


def test_zone_index_multi_column_prunes_on_each(spark, tmp_path):
    """A single build over TWO columns (one distributed pass) must
    prune point/range reads on EITHER column, each against its
    native-typed zones."""
    from census_asc5_data_pipeline_spark.sources.stats_index import (
        build_stats_index,
        pruned_read,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "mt")
    df = spark.range(0, 8000).withColumn("v", 20000 - F.col("id") * 2)
    df.repartitionByRange(8, "id").write.parquet(path)
    build_stats_index(spark, path, ["id", "v"])
    out_id, picked_id, total = pruned_read(spark, path, "id", 1000, 1999)
    assert total == 8 and picked_id < 8
    assert out_id.count() == 1000
    # v is anti-correlated with id: its zones are disjoint per file too
    out_v, picked_v, _ = pruned_read(spark, path, "v", 4002, 6000)
    assert picked_v < 8
    want = spark.read.parquet(path).filter(
        (F.col("v") >= 4002) & (F.col("v") <= 6000)
    )
    assert out_v.count() == want.count() > 0
    # a column NOT in the build still refuses to prune
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cannot prune on 'nope'"):
        pruned_read(spark, path, "nope", 0, 1)
