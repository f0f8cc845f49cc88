"""Runtime (post-AQE) executed-plan assertions — round-4 verdict item 4.

tests/test_shuffle_budget.py pins STATIC plan shapes; this file pins
what actually EXECUTED at sf0.01: broadcast joins stayed broadcast
(a future stats change demoting one to SortMergeJoin fails here, which
the static pin cannot see), AQE shuffle-read coalescing kicked in, and
operators that persist an intermediate really reused the cache
(InMemoryTableScan present) instead of recomputing lineage.

Caveat pinned deliberately loosely: ``explainString`` on a final
adaptive plan re-renders each InMemoryTableScan's cached lineage
inline, so raw Exchange-line counts are inflated by never-executed
fragments — counts here are therefore thresholds on JOIN STRATEGY
nodes, not exchange totals.
"""

from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.queries import QUERIES, unpersist_deps

SF_DIR = "/root/testdata/sf0.01"

# name -> (min BroadcastHashJoin, max SortMergeJoin, require AQE
#          coalesced read, min InMemoryTableScan)
EXPECT = {
    # star joins: every dim must stay broadcast, zero merge joins
    "q5_region_revenue": (2, 0, True, 0),
    "q3_top_unshipped": (1, 0, True, 0),
    "fact_join": (2, 2, True, 0),
    # pure agg: no joins, but the shuffle read must coalesce
    "q1_pricing_summary": (0, 0, True, 0),
    # the salting wrapper must not demote its broadcast side
    "salted_join_agg": (1, 0, True, 0),
    # persisted-postings operators: cache actually reused at runtime
    "dedup_ngram_jaccard": (1, 0, False, 1),
    "near_dup_triangles": (1, 16, False, 1),
    "curate_corpus": (2, 2, True, 1),
    # --- round-5 additions ---
    # cap-correction joins stay broadcast; postings cache reused
    "dedup_containment": (4, 0, False, 1),
    # full-outer group merge + semi-join are legitimately SMJ (Spark
    # cannot broadcast a full outer); anything beyond 4 is a regression
    "incremental_agg": (1, 4, True, 0),
    # the bucket pre-filter MUST stay broadcast and the exact sweep
    # must never become a join — an SMJ here means the O(n log n)
    # two-phase plan degenerated
    "skyline_2d": (1, 0, True, 0),
    # broadcast query side on the rerank; encoded-corpus cache reused
    "ann_pq_topk": (1, 0, False, 1),
    # symmetrized pair list: postings cache reused under both branches
    "similar_docs_topk": (1, 0, False, 1),
    # the tiny median/MAD join-backs must stay broadcast
    "mad_outliers": (2, 0, True, 0),
    # --- round-5 continuation ---
    # the exact semi-join after the bloom pre-filter must stay
    # broadcast — an SMJ here means the reduction shipped the fact
    # table into a shuffle anyway
    "bloom_join": (1, 0, True, 0),
    # 64-row per-dim stats join-back must stay broadcast
    "embedding_standardize": (1, 0, True, 0),
    # cross-corpus postings join shuffles (both sides corpus-scale);
    # the exact-dup reference-hash side must stay broadcast
    "dedup_against": (1, 2, True, 0),
}


@pytest.fixture(scope="module", autouse=True)
def _prod_shuffle_partitions(spark):
    """Run with production-shaped shuffle width (32) so AQE coalescing
    is observable; restore the conftest value after."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", sorted(EXPECT))
def test_executed_plan_shape(spark, name):
    min_bhj, max_smj, want_coalesce, min_imts = EXPECT[name]
    df = QUERIES[name](spark, SF_DIR)
    df.collect()  # materialize THIS plan so its AdaptiveSparkPlan finalizes
    s = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    unpersist_deps(df)
    spark.catalog.clearCache()

    assert "isFinalPlan=true" in s, f"{name}: adaptive plan never finalized"
    bhj = s.count("BroadcastHashJoin")
    smj = s.count("SortMergeJoin")
    assert bhj >= min_bhj, f"{name}: broadcast demoted — {bhj} BHJ < {min_bhj}"
    assert smj <= max_smj, f"{name}: {smj} SortMergeJoin > allowed {max_smj}"
    if want_coalesce:
        assert "AQEShuffleRead" in s and "coalesced" in s, (
            f"{name}: AQE shuffle-read coalescing did not engage"
        )
    assert s.count("InMemoryTableScan") >= min_imts, (
        f"{name}: persisted intermediate was not reused at runtime"
    )
