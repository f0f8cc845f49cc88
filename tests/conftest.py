from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# The `slow` tier (deselected by pytest.ini's default `-m "not slow"`
# so the driver's bounded verification window fits — r16's full run was
# truncated at ~90% with zero failures shown): the oracle-parity sweep
# file (its coverage is duplicated by the driver's own correctness gate
# and tools/oracle_check.py's full-registry sweeps, which CI-equivalent
# runs execute separately) plus the individually slowest (>~6s)
# property/round-trip tests, measured with --durations=0. Regression
# pins for recently-changed code stay in the default tier regardless of
# cost. SPARK_GRAFT_FULL_TESTS=1 disables the marking (everything then
# matches `not slow`).
SLOW_FILES = {"test_oracle_queries.py"}
SLOW_TESTS = {
    ("test_bpe.py", "test_bpe_encode_matches_reference"),
    ("test_bpe.py", "test_bpe_train_matches_reference"),
    ("test_cdc.py", "test_cdc_apply_matches_replay_model"),
    ("test_cdf_rename.py", "test_streaming_cdf_replays_across_rename"),
    ("test_checkpoint_multipart.py", "test_chained_distributed_checkpoints"),
    ("test_checkpoint_multipart.py", "test_multipart_checkpoint_equals_driver"),
    ("test_checkpoint_multipart.py", "test_multipart_reads_after_log_prune"),
    ("test_checkpoint_multipart.py", "test_v2_policy_tables_keep_v2_form"),
    ("test_checkpoint_multipart.py", "test_vacuum_over_multipart"),
    ("test_copy_into.py", "test_ledger_survives_checkpoint_and_vacuum"),
    ("test_curation.py", "test_curate_drops_dups_and_low_quality"),
    ("test_curation.py", "test_curation_summary_accounts_for_all_kept"),
    ("test_curation.py", "test_export_corpus_layout_and_roundtrip"),
    ("test_dedup.py", "test_cross_corpus_df_cap_identical_to_uncapped"),
    ("test_dedup.py", "test_minhash_est_close_to_true"),
    ("test_dedup.py", "test_minhash_recall_at_registered_params"),
    ("test_dedup.py", "test_minhash_recall_vs_exact"),
    ("test_dedup.py", "test_simhash_finds_exact_and_near"),
    ("test_delta.py", "test_delta_column_mapping_read"),
    ("test_delta.py", "test_delta_tail_stream_source_reads_commits_and_resumes"),
    ("test_delta.py", "test_delta_txn_fence_makes_sink_exactly_once"),
    ("test_delta_distributed_prune.py", "test_dml_candidates_via_spark_plane_match_driver"),
    ("test_delta_distributed_prune.py", "test_optimize_and_vacuum_via_plane_match_driver"),
    ("test_delta_distributed_prune.py", "test_partitioned_table_and_filter"),
    ("test_delta_distributed_prune.py", "test_prune_set_equality"),
    ("test_delta_distributed_prune.py", "test_read_rows_identical"),
    ("test_delta_distributed_prune.py", "test_time_travel_between_ckpt_and_head"),
    ("test_delta_dv.py", "test_delta_cdf_delete_images_and_derived_changes"),
    ("test_delta_dv.py", "test_delta_cdf_stream_source"),
    ("test_delta_generated.py", "test_cdf_postimages_regenerate"),
    ("test_delta_generated.py", "test_merge_post_images_regenerate"),
    ("test_delta_v2_checkpoint.py", "test_v2_sharded_checkpoint_distributed_path"),
    ("test_delta_v2_checkpoint.py", "test_v2_sidecar_sharding_driver_path"),
    ("test_fuzzy.py", "test_candidates_bounded_on_common_first_token"),
    ("test_fuzzy.py", "test_planted_output_matches_bruteforce"),
    ("test_fuzzy.py", "test_stop_gram_cap_is_exact"),
    ("test_graph.py", "test_hits_duplicate_edges_do_not_double_weight"),
    ("test_graph.py", "test_hits_early_exit_matches_full_iteration"),
    ("test_graph_pagerank.py", "test_pagerank_hub_outranks_spokes_and_sums_to_one"),
    ("test_graph_pagerank.py", "test_pagerank_tol_converges_to_reference"),
    ("test_iceberg.py", "test_iceberg_equality_delete_merge_on_read"),
    ("test_iceberg.py", "test_iceberg_tail_stream_emits_delete_retractions"),
    ("test_iceberg.py", "test_iceberg_tail_stream_source_reads_and_resumes"),
    ("test_iceberg_v3_gate.py", "test_v3_dml_over_initial_default_columns"),
    ("test_iceberg_v3_gate.py", "test_v3_dv_retractions_through_the_stream"),
    ("test_persistent_catalog.py", "test_analyze_catalog_lands_cbo_stats"),
    ("test_persistent_catalog.py", "test_catalog_survives_a_fresh_session"),
    ("test_relational.py", "test_asof_join_matches_python_model"),
    ("test_sources.py", "test_python_datasource_streaming_resumes_exactly"),
    ("test_sql_ddl.py", "test_alter_set_tblproperties_and_vacuum_optimize"),
    ("test_stream_rate_limit.py", "test_delta_cdf_and_iceberg_tail_rate_limit"),
    ("test_stream_rate_limit.py", "test_delta_tail_max_files_per_trigger"),
    ("test_streaming.py", "test_stream_delta_drift_scores_each_commit"),
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    for item in items:
        fname = Path(item.fspath).name
        base = item.name.split("[", 1)[0]
        if fname in SLOW_FILES or (fname, base) in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from census_asc5_data_pipeline_spark import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con


def assert_oracle_match(spark, con, name: str, sf_dir: str = SF_SMALL) -> None:
    """Same comparison the driver applies: row count + column names +
    order-insensitive value equality."""
    from census_asc5_data_pipeline_spark.catalog import assert_utc
    from census_asc5_data_pipeline_spark.queries import ORACLES, QUERIES

    assert_utc(spark)  # epoch comparisons below assume naive-as-UTC
    from census_asc5_data_pipeline_spark.queries import unpersist_deps

    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    # Release operator-persisted intermediates: Spark substitutes
    # cached plans by logical-plan equality, so a leaked cache changes
    # LATER tests' rendered plans (shuffle-budget counts) and
    # accumulates blocks across the parametrized sweep.
    unpersist_deps(sdf)
    rel = con.sql(ORACLES[name])
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns), name
    assert len(srows) == len(drows), f"{name}: {len(srows)} != {len(drows)}"
    order_s = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    order_d = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    ns = sorted(tuple(repr(r[i]) for i in order_s) for r in srows)
    nd = sorted(tuple(repr(r[i]) for i in order_d) for r in drows)
    assert ns == nd, f"{name}: value mismatch, first diff: " + str(
        next((a, b) for a, b in zip(ns, nd) if a != b)
    )
