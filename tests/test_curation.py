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
