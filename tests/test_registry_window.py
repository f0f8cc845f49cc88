"""The driver's correctness gate verifies the FIRST 50 registry
entries per round, so the window membership is load-bearing: an
innocent alphabetization or an insertion near the top would silently
change which queries get driver-verified. This pin makes any reorder an
explicit, reviewed decision (update the list here alongside the
registry)."""

from __future__ import annotations

from census_asc5_data_pipeline_spark.queries import ORACLES, QUERIES

# round-5 window: the twenty-five queries NEW this round (twenty-one
# oracled plus the rows-only-by-design pagerank, ann_pq_topk,
# embedding_kmeans and hll_rollup), the kernel CHANGED this round
# (fuzzy_match's
# q-gram candidate path; near_dup_triangles' degree orientation and
# attribution's NULL-ts filter were already in-window), then the
# round-4 window held one more round (its tail falls out).
PINNED_FIRST_50 = [
    "bloom_join",
    "conversion_lag",
    "vocab_coverage",
    "bm25_topk",
    "token_pmi",
    "communities",
    "embedding_standardize",
    "sample_k_per_group",
    "dedup_against",
    "rfm_segments",
    "seasonal_anomaly",
    "table_diff",
    "k_core",
    "event_paths",
    "label_centroids",
    "feature_hash_vectors",
    "jaccard_bands",
    "link_prediction",
    "zipf_fit",
    "mixture_rebalance",
    "source_length_stats",
    "market_concentration",
    "dedup_containment",
    "readability",
    "skyline_2d",
    "weighted_sample",
    "ann_pq_topk",
    "incremental_agg",
    "ngram_novelty",
    "rolling_quantile",
    "mode_agg",
    "embedding_kmeans",
    "hll_rollup",
    "mad_outliers",
    "interp_fill",
    "item_affinity",
    "similar_docs_topk",
    "event_trigrams",
    "interval_join",
    "winsorize",
    "url_canonical_dedup",
    "graph_degree_stats",
    "doc_perplexity",
    "source_entropy",
    "pagerank",
    "fuzzy_match",
    "span_dedup",
    "pack_sequences",
    "cdc_apply",
    "domain_cap",
]


def test_first_50_registry_entries_are_pinned():
    assert list(QUERIES)[:50] == PINNED_FIRST_50


def test_registry_has_no_duplicate_or_orphan_oracles():
    # every oracle belongs to a registered query; registry keys unique
    assert set(ORACLES) <= set(QUERIES)
    assert len(list(QUERIES)) == len(set(QUERIES))
