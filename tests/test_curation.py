from __future__ import annotations

from census_asc5_data_pipeline_spark.plans.curation import curate, curation_summary


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight " * 3
    near = base.replace("lazy", "sleepy")  # near-duplicate of base
    rows = [
        (0, base),
        (1, base),            # exact dup of 0 → dropped
        (2, near),            # near-dup of 0 → clustered, dropped
        (3, "short"),         # quality-fail (too short)
        (4, "completely different words " * 12),  # kept
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curate_drops_dups_and_low_quality(spark):
    kept = {r.doc_id: r for r in curate(_corpus(spark)).collect()}
    assert 0 in kept          # cluster keeper (min id)
    assert 1 not in kept      # exact dup
    assert 2 not in kept      # near dup
    assert 3 not in kept      # quality fail
    assert 4 in kept
    assert all(r.split in ("train", "val", "test") for r in kept.values())
    assert all(r.clean_len > 0 for r in kept.values())


def test_curation_summary_accounts_for_all_kept(spark):
    per_doc = curate(_corpus(spark)).collect()
    summary = {r.split: (r.n_docs, r.total_chars) for r in curation_summary(_corpus(spark)).collect()}
    assert sum(n for n, _ in summary.values()) == len(per_doc)
    assert sum(c for _, c in summary.values()) == sum(r.clean_len for r in per_doc)


def test_export_corpus_layout_and_roundtrip(spark, tmp_path):
    from census_asc5_data_pipeline_spark.catalog import read_table
    from census_asc5_data_pipeline_spark.plans.curation import curate, export_corpus

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "corpus")
    counts = export_corpus(docs, out, shards_per_split=2)
    # written counts match the curation verdict split-for-split
    want = {
        r.split: r.n
        for r in curate(docs).groupBy("split").count().withColumnRenamed("count", "n").collect()
    }
    assert counts == want and sum(counts.values()) > 0
    # layout: one directory per split, gzipped json shards inside
    import os

    splits = {d for d in os.listdir(out) if d.startswith("split=")}
    assert splits == {f"split={s}" for s in counts}
    some = os.listdir(os.path.join(out, next(iter(splits))))
    assert any(f.endswith(".json.gz") for f in some), some
    # a trainer can read one split directory directly
    train = spark.read.json(os.path.join(out, "split=train"))
    assert train.count() == counts.get("train", 0)
    assert {"doc_id", "text", "clean_len"} <= set(train.columns)


def test_observed_quality_metrics_free_with_action(spark, tmp_path):
    """observe() metrics must match explicit recomputation and cost no
    extra scan (single action drives both output and metrics)."""
    from census_asc5_data_pipeline_spark.plans.observability import (
        observed_bounds,
        observed_quality,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, "e")], ["id", "v"]
    )
    observed, obs = observed_quality(df, ["v", "id"])
    out = str(tmp_path / "obs_out")
    observed.write.mode("overwrite").parquet(out)  # the job's own action
    got = obs.get
    assert got["n_rows"] == 5
    assert got["null_v"] == 2
    assert got["null_id"] == 0
    b, bobs = observed_bounds(df, "id")
    b.count()
    assert bobs.get == {"lo": 1, "hi": 5}


def test_explain_summary_reports_plan_shape(spark):
    """explain_summary must agree with the plan-shape suite's counting
    convention: q5's snowflake join shows broadcast joins and pushed
    scan evidence; a plain scan shows zero joins and zero exchanges."""
    from census_asc5_data_pipeline_spark.plans.observability import (
        explain_summary,
    )
    from census_asc5_data_pipeline_spark.queries import QUERIES

    rep = explain_summary(
        QUERIES["q5_region_revenue"](spark, "/root/testdata/sf0.001")
    )
    assert rep["n_broadcast_hash_joins"] >= 3  # region/nation/supplier dims
    assert rep["n_exchanges"] >= 1
    assert rep["scans"], "parquet scans must be reported"
    assert any(s["pushed_filters"] > 0 for s in rep["scans"])
    assert all(s["read_cols"] > 0 for s in rep["scans"])

    from census_asc5_data_pipeline_spark.catalog import read_table

    plain = explain_summary(
        read_table(spark, "/root/testdata/sf0.001", "region")
    )
    assert plain["n_exchanges"] == 0
    assert plain["n_broadcast_hash_joins"] == 0
    assert plain["n_sort_merge_joins"] == 0
