"""Shuffle-budget regression pin: every registered query's physical
plan has a maximum allowed number of Exchange operators, captured at
the round-4 plan shapes. A future change that silently adds a shuffle
(a lost broadcast hint, an accidental repartition, a window where an
aggregate sufficed) fails here loudly instead of shipping as a 100 TB
regression.

The pin is an UPPER bound (``<=``): plan improvements that remove
shuffles pass; update the budget downward when that happens. Counts
are static (pre-AQE, pre-ReuseExchange) plan shapes at sf0.001 —
deterministic for a fixed Spark version. Persisted-but-unmaterialized
subtrees count at full lineage, so self-join reuse (e.g.
near_dup_triangles) pins at its static, not runtime, exchange count.
"""

from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

SHUFFLE_BUDGET = {
    # --- new in round 16 ---
    # returned plan = one groupBy over the lineage read: the v3 DV
    # anti-join shuffles (positions frame + data side) plus the
    # lineage broadcast; the born-v3 create/append/DV-delete/UPDATE
    # lifecycle runs at construction. Measured 5; 6 = AQE headroom
    "iceberg_lineage": 6,
    # returned plan = one groupBy (partial/final agg pair) over the
    # re-clustered table's skipping read; the clustered CREATE +
    # append + ALTER + OPTIMIZE recluster run at construction.
    # Measured 1; 2 = AQE headroom
    "liquid_cluster": 2,
    # returned plan = one groupBy over the tracking read's
    # broadcast-joined scan (the rt map join is broadcast, no
    # exchange); the create/append/DELETE/UPDATE lifecycle runs at
    # construction. Measured 2 (agg pair); 3 = AQE headroom
    "row_tracking": 3,
    # --- new in round 15 ---
    # returned plan = one groupBy (partial/final agg pair) over the
    # drained target table's file-list scan; the CDF pipeline + the
    # availableNow drain run at construction. Measured 1; 2 = AQE
    # headroom
    "stream_cdf_rename": 2,
    # returned plan = a filter/explode over DESCRIBE HISTORY's
    # driver-built rows (the DML pipeline runs at construction).
    # Measured 0; 1 = headroom
    "history_metrics": 1,
    # returned plan = a projection over the snapshots metadata
    # table's driver-built rows. Measured 0; 1 = headroom
    "snapshot_summary": 1,
    # --- new in round 14 ---
    # returned plan = one groupBy (partial/final agg pair, plus the
    # countDistinct expand) over the streamed-into target table's
    # file-list scan; the source commits + the availableNow drain run
    # at construction. Measured 2 (distinct rewrite); 3 = AQE headroom
    "stream_sink_fold": 3,
    # --- new in round 13 ---
    # returned plan = the localCheckpointed 'initial' rollup (already
    # materialized, zero exchanges) unioned with the post-delete
    # phase's one partial/final agg pair over the stats-pruned
    # file-list scan. Measured 1; 2 leaves room for an AQE re-plan
    "data_skipping": 2,
    # same shape over the Iceberg reader; the post-update phase adds
    # the MoR position-delete anti-join, whose tiny pos frame
    # broadcasts. Measured 1; 3 if that broadcast ever degrades
    "iceberg_skipping": 3,
    # returned plan = one groupBy over the identity table read
    # (partial/final agg pair measures 1); the CREATE/INSERTs and the
    # allocation's count job run at construction. 2 = AQE headroom
    "identity_insert": 2,
    # union of two per-priority rollups (one partial/final agg pair
    # each) over the source / clone file-list scans; clone + DML run
    # at construction. Measured 2; 3 = AQE headroom
    "shallow_clone": 3,
    # one (priority, yr) agg pair over the mixed-spec scan; the MoR
    # position anti-join's tiny pos frame broadcasts. Measured 1;
    # 3 if that broadcast ever degrades
    "partition_evolution": 3,
    # one (priority, yr) agg pair over the loaded table's scan; the
    # landing writes + three COPY INTOs run at construction
    "copy_into": 2,
    # returned plan = union of three 5-row per-priority rollups (one
    # partial/final agg pair each over fixed file-list scans; the
    # audit branch adds the MoR position-delete anti-join, whose tiny
    # pos frame broadcasts). WAP writes/UPDATE/fast_forward run at
    # construction. Measured 7 with this counter; 8 leaves room if
    # the delete anti-join broadcast ever degrades
    "wap_publish": 8,
    # returned plan = union of three per-segment rollups over the
    # as-of / current file-list scans (one partial/final agg pair
    # each). CREATE/INSERT/UPDATE/RESTORE run at construction.
    # Measured 3; 4 leaves room for an AQE re-plan
    "time_travel_sql": 4,
    # --- new in round 12 ---
    # returned plan = one groupBy over the evolved-table read (agg
    # pair measures 1); CREATE/ALTER/INSERT run at construction
    "schema_evolution": 2,
    # returned plan = one groupBy over the post-overwrite table read
    # (partial/final agg pair measures 1 with this counter); the
    # CREATE/INSERT/OVERWRITE statements run at construction time
    "insert_overwrite": 2,
    # --- new in round 11 ---
    # returned plan = one groupBy over the cdc-file scan union
    # (partial/final agg pair measures 1 with this counter); 2 leaves
    # room if the union branches ever stop coalescing
    "cdf_replay": 2,
    # returned plan = union of two 5-row rollups (partial/final agg
    # pair each); the MoR position-delete anti-join broadcasts (tiny
    # pos frame). Measured 2 with this counter; 4 = one agg pair per
    # union branch if the broadcast ever degrades
    "iceberg_merge_upsert": 4,
    # --- new in round 10 ---
    # one partial/final agg pair per union branch; the post-delete
    # branch's DV position anti-join broadcasts (tiny pos_df)
    "delta_dv_delete": 4,
    # returned plan = one groupBy over the merged-table read (partial/
    # final agg pair); the merge itself runs at construction time
    "merge_upsert": 2,
    # --- new in round 8 ---
    # construction is eager (write two commits of a 5-row rollup);
    # the RETURNED plan is a union of two log-planned parquet scans —
    # zero shuffles by design
    "delta_as_of": 0,
    "iceberg_as_of": 0,
    # daily pre-agg + the 5-partition priority window repartitioning
    "ewma_smooth": 2,
    # digit-count agg + the 9-row single-partition proportion window
    "benford_profile": 2,
    # one map-side-combinable per-language rollup; lang scoring and
    # token/byte counts ride the scan projection — zero joins
    "tokenizer_fertility": 1,
    # per-order completion agg + orderkey join (lineages render under
    # both union branches pre-AQE; runtime ReuseExchange collapses) +
    # the (priority, day) pre-agg + the 5-partition running-sum window
    "order_backlog": 4,
    # the persisted-but-unmaterialized jaccard pair lineage renders at
    # full depth under BOTH self-join roles and both union branches
    # (the near_dup_triangles static-shape effect) + the middle-vertex
    # join, distinct and final count; runtime reuses the one persisted
    # edge frame
    "graph_2hop_reach": 28,
    # --- new in round 7 ---
    # join_size_estimate runs its metadata-scale probes EAGERLY at
    # construction (two 1-row aggs + two top-K + isin fills, all
    # collected to driver scalars); the returned plan is a 1-row
    # local relation
    "join_preflight": 0,
    # fact agg renders under both self-join sides (no static reuse,
    # pre-AQE) + the per-year rank window partitioning on each side +
    # the (yr, brand) join itself
    "top_movers": 8,
    # same two-sided fact-agg lineage without the rank windows
    "revenue_bridge": 5,
    # token pass -> per-doc counts (1) + per-token first-doc (1), the
    # 64-cell census full-outer join + its tiny single-partition
    # cumulative window + the 1-row fit aggregate
    "heaps_law": 9,
    # three stage aggregates, each keyed on user_id, joined pairwise;
    # stage lineages render under every downstream side pre-AQE
    "funnel_windowed": 11,
    # one fact agg on suppkey + the broadcast dim join's build side
    "supplier_scorecard": 2,
    # spend agg renders under both self-join sides + per-year ntile
    # window partitioning on each + the tiny matrix rollup reuses the
    # join partitioning
    "customer_migration": 5,
    # orderkey join + per-order min (shares the join partitioning) +
    # the per-priority rollup
    "order_cycle_time": 3,
    # vector fold is in-row; label agg renders under med/dev/mad
    # lineages pre-AQE + the two broadcast build sides
    "embedding_norm_profile": 7,
    # one grouped count + the share window reusing its partitioning
    "source_lang_mix": 2,
    # per-user conversion agg + the 2-row variant agg + the 1-row
    # pivot; lineages render under the summary pre-AQE
    "ab_test": 3,
    # round-8 band-bucket rewrite (no BNLJ — covered by the generic
    # no-cartesian pin): the distinct renders under the 4 boundary
    # anti-join sides, then the per-band lead window + the constant-
    # size firsts agg/window + the bucket equi-join; runtime
    # ReuseExchange collapses the repeated distinct lineages
    "id_gap_report": 16,
    # iteration lineage cut by eager localCheckpoints; the static plan
    # is the final checkpointed rank frame
    "pagerank_exact": 0,
    # --- new in round 6 ---
    # the sketch-census groupBy renders statically under BOTH pair
    # sides (the broadcast subtree doesn't reuse under this fixture's
    # session); runtime ReuseExchange collapses them to one
    "theta_audience": 2,
    # near_dup_triangles' static shape (persisted-but-unmaterialized
    # edge lineage renders at full depth under every role) + the
    # degree/wedge aggregate lineage; runtime reuses the one persisted
    # edge frame
    "clustering_coeff": 105,
    # iteration lineage is cut by eager localCheckpoints; the static
    # plan is the final hub/authority full-join's two scan sides
    "purchase_hits": 2,
    # size groupBy renders under both 1-row summary sides (no static
    # reuse), + the distinct-size census groupBy and its tiny
    # single-partition window
    "key_skew_report": 6,
    # one per-user window sort
    "rolling_distinct": 1,
    # parse_json once, one keyed aggregate
    "variant_profile": 1,
    # one scan + one keyed aggregate
    "pii_census": 1,
    # doc_perplexity's LM lineage (bigram counts, head marginals,
    # scalar V, per-doc rollup) + the source join, per-source ntile
    # window and bucket rollup. r16 +1: the LM heads frame is now
    # persisted (see doc_perplexity) and the static tree renders the
    # cached lineage per reference; runtime materializes it once
    "perplexity_buckets": 8,
    # everything keys on o_custkey: summary agg + the two per-column
    # latest-value subtrees reuse one partitioning (AQE coalesces the
    # equal-key joins)
    "golden_record": 3,
    # decontaminate's per-doc rollup + the source join + source rollup
    # (benchmark grams ride a broadcast)
    "contamination_report": 3,
    # distinct-days shuffle + one user partitioning shared by the
    # window and both rollups
    "longest_streak": 2,
    # stats agg renders under the alloc AND weight-total subtrees +
    # the source window, sampled rollup and final assembly join
    "neyman_sample": 7,
    # UnionLoop recursion is iterative inside one stage; the static
    # plan shows the per-node window partition + the depth rollup
    "recursive_hierarchy": 2,
    # one l_returnflag partition shuffle shared by both windows and
    # the final group aggregate
    "weighted_median": 1,
    # one token pass → bucket census (1) + its single-partition totals
    # (1), (doc,bucket) counts (1), final per-doc rollup (1); the
    # census lineage renders statically under both the broadcast-ratio
    # subtree and totals (no ReuseExchange pre-AQE), so +1
    "dsir_weights": 5,
    # boundary computation runs EAGERLY at plan-construction time
    # (groupBy(value) + global window + k-1-scalar agg, collected to
    # driver literals), so the returned plan is scan → literal
    # when-chain → one bin rollup; at sf0.001's single file the two
    # HashAggregates fuse without an Exchange, 1 allows the split case
    "quantile_bins": 1,
    # (source,tok) agg + the global tok agg + per-source totals agg +
    # the broadcast joins' lineage re-renders + the per-source rank
    # window; 1-row totals ride a broadcast crossJoin (no scalar
    # subquery re-render of the token lineage)
    "distinctive_terms": 7,
    # the (source, shingle) distinct renders once per reference (a/b
    # probe sides + the size census), the self-join re-keys both sides
    # on shingle, plus the pair agg; broadcast size joins add none —
    # runtime ReuseExchange collapses the repeated distinct lineages
    "source_overlap": 7,
    # one priority agg + the 5-row single-partition window
    "psi_drift": 2,
    # one length agg + the bounded ordered window + the 1-row max agg
    "ks_drift": 2,
    # --- new in round 5 ---
    # final priority rollup; the bloom word-table build is a separate
    # (eager, metadata-scale) job, and the exact semi-join broadcasts
    "bloom_join": 2,
    # per-user conditional-MIN agg + cohort rollup
    "conversion_lag": 2,
    # type-count agg + the 500-row top-k sort + its bounded window;
    # the scalar-subquery total re-renders the counts lineage
    "vocab_coverage": 5,
    # tf agg + tiny df agg + per-doc score agg (broadcast df join);
    # the avgdl/N scalar subqueries render their own aggregate
    # lineages in the static tree (runtime reuses the subquery result)
    "bm25_topk": 7,
    # bigram-count agg + head/tail marginal re-aggregates + joins;
    # the n_bg scalar subquery re-renders the bigram lineage
    "token_pmi": 7,
    # static plan renders only up to the first localCheckpoint
    # barrier (pair generation + the directed/labels prep); per-round
    # exchanges happen in the eager checkpointed jobs
    "communities": 8,
    # one 64-group moment aggregate; its lineage renders again under
    # the broadcast build side
    "embedding_standardize": 2,
    # one keyed window shuffle
    "sample_k_per_group": 1,
    # cross-corpus postings join + pair agg + kept/in rollups; the
    # exact-dup and near-dup anti-join branches render their lineages
    "dedup_against": 8,
    # per-customer agg + three global ntile windows (customer-level
    # frame) + the segment census
    "rfm_segments": 5,
    # bucket agg + peak argmax agg + baseline agg; the bucket lineage
    # renders under both the peak and broadcast-baseline branches
    "seasonal_anomaly": 4,
    # full-outer join (both sides shuffle) + status census
    "table_diff": 3,
    # static plan renders pair generation up to the first
    # localCheckpoint barrier; per-round peels are eager jobs
    "k_core": 8,
    # one (user, day) window + path agg (same shuffle) + path census
    "event_paths": 3,
    # the (label, dim) centroid agg lineage renders under the dot
    # self-join's both roles, the norm re-aggregate and its broadcast
    # build sides; every frame past the first agg is |labels|x64 rows
    "label_centroids": 7,
    # one (doc, dim) aggregate
    "feature_hash_vectors": 1,
    # the jaccard pair machinery (postings repartition + pair agg +
    # cap-correction lineage) + the band census
    "jaccard_bands": 5,
    # the persisted top-100 edge list's support lineage (basket join +
    # support agg + top-k) re-renders under the directed union's both
    # branches and the anti-join; runtime reuses the cache
    "link_prediction": 16,
    # type-count agg; the 500-row slice windows share one tiny sort
    "zipf_fit": 4,
    # source census + its single-partition totals window (census-sized
    # frame) under the broadcast rate build + the final keep census
    "mixture_rebalance": 3,
    # one source-keyed aggregate
    "source_length_stats": 1,
    # fact agg + per-type share window + HHI rollup
    "market_concentration": 3,
    # postings repartition + pair-count agg + the two cap-correction
    # broadcast joins' build-side lineage
    "dedup_containment": 4,
    "readability": 0,
    # bucket agg + the two survivor-sweep windows (the sliver)
    "skyline_2d": 3,
    # TakeOrderedAndProject top-k: no Exchange in the static plan
    "weighted_sample": 0,
    # shortlist window + candidate-vector re-join; the ADC scan and
    # encode passes are narrow maps
    "ann_pq_topk": 2,
    # base-agg groupBy + changelog window + delta agg + group merge
    "incremental_agg": 4,
    # first-occurrence min-agg + per-doc count
    "ngram_novelty": 2,
    # single per-customer window
    "rolling_quantile": 1,
    # count agg + argmax window
    "mode_agg": 2,
    # narrow assignment passes over the cached projection
    "embedding_kmeans": 0,
    # per-type sketch agg + the union re-aggregate (static tree renders
    # the sketch lineage under both the per-type and ALL branches)
    "hll_rollup": 3,
    # two grouped medians + the conditional-count agg (broadcast
    # join-backs add the build-side lineage)
    "mad_outliers": 4,
    # one per-user window pass (both frames share the sort)
    "interp_fill": 1,
    # static tree re-renders the distinct-basket lineage under both
    # self-join roles plus the part-count and scalar-subquery branches;
    # runtime dedups via ReuseExchange
    # r16: the (order, brand) basket frame is persisted (five aliased
    # consumers re-ran the join+distinct; no ReuseExchange across
    # aliases). Static tree renders the cached lineage per reference
    # (+1); runtime materializes once, later refs are InMemoryTableScan
    "item_affinity": 10,
    # static tree renders the persisted pair lineage under BOTH union
    # branches (same accounting as near_dup_triangles); runtime is one
    # materialization + the per-doc window
    "similar_docs_topk": 9,
    # one sequence window + the trigram count agg
    "event_trigrams": 2,
    "interval_join": 2,
    "winsorize": 1,
    "url_canonical_dedup": 1,
    # static tree re-renders the jaccard pair lineage per role (see
    # the near_dup_triangles note); runtime is one materialization
    "graph_degree_stats": 10,
    # r16: the head-annotated LM frame is persisted (heads/uni/V/
    # scored were each re-running the corpus tokenize — aliased
    # subtrees don't ReuseExchange). The static tree re-renders the
    # cached subtree's lineage per reference (+1 here); RUNTIME
    # materializes it once and later references are InMemoryTableScan
    "doc_perplexity": 7,
    "source_entropy": 2,
    # returned lineage starts at the final localCheckpoint
    "pagerank": 0,
    "locf_fill": 1,
    "span_dedup": 2,
    "pack_sequences": 3,
    "cdc_apply": 2,
    "domain_cap": 1,
    "attribution": 1,
    "q2_min_cost_supplier": 2,
    "q17_small_qty_revenue": 2,
    "q22_idle_customers": 7,
    "q6_forecast_revenue": 1,
    "q12_priority_by_returnflag": 1,
    "q13_order_count_distribution": 2,
    "q16_supplier_count_by_part": 3,
    "q20_excess_stock_suppliers": 3,
    "q9_product_profit": 1,
    "q11_important_stock": 3,
    "event_transitions": 2,
    "cluster_best_doc": 5,
    "rare_token_ratio": 2,
    "bigram_lm": 3,
    # r5: 16 -> 91 STATIC-TREE only. The degree-oriented plan
    # references the persisted jaccard edge list from FIVE roles
    # (degree-count union sides, two wedge roles, closing semi-join)
    # and this metric counts every cloned tree occurrence of the
    # 4-Exchange edge lineage; at runtime the persist collapses them
    # to one materialization plus InMemoryTableScans (the executed
    # plan is pinned in tests/test_runtime_plans.py). The intermediate
    # is now O(m) wedges, not hub-degree^2 (tests/test_triangles.py).
    "near_dup_triangles": 91,
    "dedup_embedding_cosine": 1,
    "dedup_embedding_clusters": 5,
    "ann_cosine_topk": 1,
    "ann_lsh_topk": 1,
    "ann_lsh_multiprobe": 1,
    "ann_ivf_topk": 1,
    "dedup_minhash": 5,
    "dedup_simhash": 3,
    "dedup_ngram_jaccard": 4,
    "dedup_clusters": 5,
    "curate_corpus": 8,
    "chunk_documents": 0,
    "source_mixture": 1,
    "gopher_rules": 0,
    "script_profile": 0,
    "dup_ngram_stats": 2,
    "bpe_merges": 0,
    "q8_market_share": 3,
    "q15_top_supplier": 7,
    "q21_sole_returner": 4,
    "decontaminate": 2,
    "top_terms": 1,
    "pii_redact": 0,
    "train_split": 1,
    "tfidf_top_terms": 5,
    "repetition_ratio": 2,
    "quality_funnel": 1,
    "boilerplate_segments": 1,
    "compression_ratio": 0,
    "stats_agg": 1,
    "ntile_quartiles": 1,
    "above_avg_orders": 1,
    "set_ops": 18,
    "funnel": 8,
    "salted_join_agg": 1,
    "range_frame": 1,
    "full_outer_balance": 2,
    "events_pivot": 2,
    "string_agg": 1,
    "argmax_agg": 1,
    "vector_stats": 0,
    "dow_seasonality": 1,
    "conditional_agg": 1,
    "scd1_upsert": 5,
    "scd2_history": 2,
    "dq_report": 7,
    "stratified_sample": 1,
    "grouping_sets": 1,
    "approx_quantiles": 1,
    "heavy_hitters": 1,
    "dedup_exact": 1,
    "measure_view": 1,
    "fact_join": 3,
    "q1_pricing_summary": 1,
    "dim_extract": 1,
    "year_dim": 1,
    "multi_year_union": 3,
    "serving_agg": 1,
    "pivot_wide": 2,
    "q3_top_unshipped": 1,
    "q5_region_revenue": 1,
    "q7_nation_volume": 1,
    "q10_returned_items": 1,
    "q18_large_orders": 1,
    "q14_promo_share": 1,
    "q19_disjunctive": 1,
    "q4_late_shipments": 1,
    "top_k_per_group": 1,
    "running_agg": 1,
    "moving_avg": 1,
    "rollup_agg": 1,
    "semi_join_exists": 1,
    "anti_join_not_exists": 0,
    "distinct_count": 2,
    "events_json": 1,
    "events_window": 1,
    "sessionize": 1,
    "events_dedup_latest": 1,
    "asof_join": 1,
    "group_median": 1,
    "cube_agg": 1,
    "unpivot_long": 1,
    "lag_lead_delta": 1,
    "cohort_retention": 4,
    "user_trend": 1,
    "gap_fill": 2,
    # r5: 0 -> 7. The round-4 plan was 0-Exchange only because the
    # whole quadratic block self-join broadcast at sf0.001; the r5
    # q-gram count-filter plan (operators/fuzzy.py) spends 7 bounded
    # shuffles (posting freq, kept-count window, pair co-count,
    # direct-path distinct, verify joins) to remove the O(n^2/90)
    # block product — the right trade at 100 TB.
    "fuzzy_match": 7,
    "histogram": 1,
    "monthly_revenue": 1,
    "url_domains": 2,
    "prefix_dups": 1,
    "dedup_char_ngram": 4,
    "percent_rank": 1,
    "lang_id": 0,
    "text_quality": 0,
    "token_count": 0,
    "doc_fingerprint": 1,
    "multimodal_meta": 0,
}


def test_budget_covers_every_registered_query():
    assert set(SHUFFLE_BUDGET) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_shuffle_count_within_budget(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    n = len(
        [
            l
            for l in plan.splitlines()
            if l.lstrip().startswith("Exchange (") or "- Exchange (" in l
        ]
    )
    assert n <= SHUFFLE_BUDGET[name], (
        f"{name}: {n} Exchanges > pinned {SHUFFLE_BUDGET[name]} — a shuffle "
        "regressed; inspect the plan before raising the budget"
    )
    spark.catalog.clearCache()
