"""Explain-plan audits (SURVEY §6): the 100 TB guarantees are plan
shapes, so they are asserted, not assumed — filters reach the parquet
scan, scans are column-pruned, dim joins broadcast, and nothing falls
back to a cartesian product unless the operator is explicitly the
exact O(n²) kernel.
"""

from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# queries whose semantics ARE an all-pairs kernel (the exact
# correctness baseline for the ANN family) — the only allowed cross
# join. dedup_embedding_cosine now registers the LSH-bucketed path and
# is covered by the no-cartesian assertion below.
CROSS_JOIN_OK = {
    "ann_cosine_topk",
    # deliberate 1-row (mn, span) bounds frame broadcast-crossJoined
    # onto the per-doc and per-token aggregates to drive the integer
    # bucket expression — one row, never data-scale
    "heaps_law",
    # deliberate 1-ROW broadcast crossJoin: the global (n_g, v) totals
    # frame attaches to every scored row without a scalar-subquery
    # re-render of the token lineage — a BroadcastNestedLoopJoin whose
    # build side is one row, not an accidental cartesian
    "distinctive_terms",
    # same shape: the 1-row (t_tot, r_tot) totals frame broadcast-
    # crossJoins onto the <=1024-row bucket census
    "dsir_weights",
    # deliberate |event_types|-row sketch-frame self-pairing
    # (type_a < type_b) — a broadcast nested-loop over k rows of
    # fixed-size sketches, never over data-scale rows
    "theta_audience",
    # deliberate 1-row × 1-row summary join (degree aggregate ×
    # triangle count)
    "clustering_coeff",
    # deliberate 1-row × 1-row summary join (size stats × gini sum)
    "key_skew_report",
    # deliberate 1-row weight-total broadcast crossJoin onto the
    # |sources|-row allocation frame
    "neyman_sample",
}


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushed_to_scan(spark):
    plan = _formatted_plan(spark, QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_scans_are_column_pruned(spark):
    # dim_extract touches 16-column customer but must read 1 column
    plan = _formatted_plan(spark, QUERIES["dim_extract"](spark, SF_DIR))
    scans = [l for l in plan.splitlines() if l.startswith("ReadSchema")]
    cust = [s for s in scans if "c_nationkey" in s]
    assert cust, plan
    assert all(s.count(":") <= 2 for s in cust), cust  # ≤2 fields read
    # q1 reads 7 of 16 lineitem columns, never the comment/strings
    plan1 = _formatted_plan(spark, QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "l_comment" not in plan1 and "l_shipinstruct" not in plan1


def test_snowflake_join_broadcasts_dims(spark):
    plan = _formatted_plan(spark, QUERIES["q5_region_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the two fact tables must NOT be broadcast
    for line in plan.splitlines():
        if "BroadcastExchange" in line:
            assert "lineitem" not in line and "orders" not in line


@pytest.mark.parametrize(
    "name", [n for n in QUERIES if n not in CROSS_JOIN_OK]
)
def test_no_accidental_cartesian_products(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = _formatted_plan(spark, df)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_fact_join_prunes_and_pushes(spark):
    plan = _formatted_plan(spark, QUERIES["fact_join"](spark, SF_DIR))
    # measure views aggregate BEFORE the fact join (partial agg exists)
    assert "HashAggregate" in plan
    assert "o_comment" not in plan  # never reads wide string cols


def test_dynamic_partition_pruning_fires_on_partitioned_fact(
    spark, tmp_path
):
    """A fact partitioned on the join key, joined to a FILTERED dim,
    must carry a dynamicpruning expression in its PartitionFilters —
    the plan feature that turns a 100 TB full-fact scan into a scan of
    the dim-selected partitions at runtime. Pin both the plan shape
    and the result."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "fact_part")
    (
        spark.range(0, 10_000)
        .select(
            F.col("id"), (F.col("id") % 10).alias("part_k"),
            (F.col("id") * 2).alias("v"),
        )
        .write.partitionBy("part_k")
        .parquet(path)
    )
    dim = (
        spark.range(0, 10)
        .select(F.col("id").alias("part_k"), F.concat(F.lit("n"), "id").alias("nm"))
        .filter(F.col("part_k") == 3)
    )
    fact = spark.read.parquet(path)
    joined = fact.join(dim, "part_k").select("part_k", "id", "v", "nm")
    plan = _formatted_plan(spark, joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    got = joined.count()
    assert got == 1000  # exactly partition 3's rows survive
