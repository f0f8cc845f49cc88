"""The driver's correctness gate verifies the FIRST 50 registry
entries per round, so the window membership is load-bearing: an
innocent alphabetization or an insertion near the top would silently
change which queries get driver-verified. This pin makes any reorder an
explicit, reviewed decision (update the list here alongside the
registry)."""

from __future__ import annotations

from census_asc5_data_pipeline_spark.queries import ORACLES, QUERIES

# round-8 window: the two queries NEW this round lead — delta_as_of /
# iceberg_as_of (the round-7 open-table-format surface facing the
# driver's oracle for the first time, verdict #7) — then the round-7
# window held one more round (its two-entry tail falls out).
PINNED_FIRST_50 = [
    # round-16 window: the new liquid-clustering and row-tracking
    # WRITE rows lead (r15 verdict #1/#2), joined late-r16 by the
    # iceberg v3 row-lineage row; the r15 head holds; the tail pops
    # to keep 50.
    "iceberg_lineage",
    "liquid_cluster",
    "row_tracking",
    # r16 rotation (r15 verdict #8): five never-windowed veterans
    "pagerank",
    "communities",
    "bm25_topk",
    "gopher_rules",
    "pack_sequences",
    # round-15 window: the two new observability-metrics rows lead
    # (operationMetrics / snapshot summary, verdict #1/#9) with five
    # NEVER-windowed veterans rotated in (verdict #7: fuzzy_match,
    # near_dup_triangles, scd2_history, asof_join, cohort_retention);
    # seven r6-r8 rows fall back to the registry tail.
    "stream_cdf_rename",
    "history_metrics",
    "snapshot_summary",
    "fuzzy_match",
    "near_dup_triangles",
    "scd2_history",
    "asof_join",
    "cohort_retention",
    "stream_sink_fold",
    "k_core",
    "q1_pricing_summary",
    "q9_product_profit",
    "q21_sole_returner",
    "data_skipping",
    "iceberg_skipping",
    "identity_insert",
    "shallow_clone",
    "partition_evolution",
    "copy_into",
    "wap_publish",
    "time_travel_sql",
    "schema_evolution",
    "insert_overwrite",
    "iceberg_merge_upsert",
    "cdf_replay",
    "delta_dv_delete",
    "merge_upsert",
    "delta_as_of",
    "iceberg_as_of",
    "ewma_smooth",
    "benford_profile",
    "tokenizer_fertility",
    "order_backlog",
    "graph_2hop_reach",
    "join_preflight",
    "top_movers",
    "revenue_bridge",
    "heaps_law",
    "funnel_windowed",
    "supplier_scorecard",
    "customer_migration",
    "order_cycle_time",
]


def test_first_50_registry_entries_are_pinned():
    assert list(QUERIES)[:50] == PINNED_FIRST_50


def test_registry_has_no_duplicate_or_orphan_oracles():
    # every oracle belongs to a registered query; registry keys unique
    assert set(ORACLES) <= set(QUERIES)
    assert len(list(QUERIES)) == len(set(QUERIES))
