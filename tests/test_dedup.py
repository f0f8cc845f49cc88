"""Dedup operators on corpora with planted duplicates: exact groups,
exact-Jaccard as ground truth, MinHash-LSH and SimHash recall."""

from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.operators.dedup import (
    cross_corpus_near_pairs,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_postings,
    simhash_near_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls softly on the quiet village roofs tonight"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 3 exact copies of BASE
    for i in range(3):
        rows.append((i, BASE))
    # near-dup: one word changed
    rows.append((10, BASE.replace("village", "mountain")))
    # near-dup: a few words appended
    rows.append((11, BASE + " and the wind keeps singing"))
    # unrelated docs
    rows.append((20, "completely different text about census data pipelines"))
    rows.append((21, "spark engines shuffle partitions across executors quickly"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(corpus):
    groups = exact_dedup_groups(corpus).collect()
    by_keeper = {r.keep_doc_id: r.n_copies for r in groups}
    assert by_keeper[0] == 3  # the three exact copies collapse to doc 0
    assert sum(by_keeper.values()) == 7


def test_shingle_postings_counts(corpus):
    post = shingle_postings(corpus)
    n_by_doc = {
        r.doc_id: r.n_sh for r in post.select("doc_id", "n_sh").distinct().collect()
    }
    words = BASE.split()
    expected = len(set(zip(words, words[1:])))
    assert n_by_doc[0] == expected


def test_exact_jaccard_finds_planted_pairs(corpus):
    pairs = ngram_jaccard_pairs(corpus, threshold_ppm=300000).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    # exact copies have jaccard 1.0
    assert (0, 1) in found and (0, 2) in found and (1, 2) in found
    # planted near-dups cross threshold
    assert (0, 10) in found
    assert (0, 11) in found
    # unrelated docs don't pair with the BASE cluster
    assert not any(a == 20 or b == 20 for a, b in found)


def test_minhash_recall_vs_exact(corpus):
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(corpus, threshold_ppm=700000).collect()
    }
    assert exact  # sanity: ground truth is non-empty
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(corpus, verify_threshold=0.5).collect()
    }
    # every high-jaccard pair must be recalled by LSH banding
    assert exact <= lsh


def test_minhash_recall_at_registered_params(corpus):
    """The registered dedup_minhash query runs 32 hashes / 8 bands —
    recall of high-jaccard pairs must hold at THOSE parameters too
    (the gate for the bench-motivated 64/16 -> 32/8 change)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(corpus, threshold_ppm=700000).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            corpus, num_hashes=32, bands=8, verify_threshold=0.5
        ).collect()
    }
    assert exact <= lsh


def test_minhash_est_close_to_true(corpus):
    rows = minhash_lsh_pairs(corpus, verify_threshold=0.5).collect()
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in rows}
    assert est[(0, 1)] == 1.0  # identical docs: every signature matches
    if (0, 10) in est:
        assert 0.4 <= est[(0, 10)] <= 1.0


def test_simhash_finds_exact_and_near(corpus):
    pairs = simhash_near_pairs(corpus, max_hamming=6).collect()
    found = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert found[(0, 1)] == 0  # identical text → identical simhash
    assert (0, 10) in found  # one-word change → small hamming distance
    assert not any({a, b} == {20, 21} for a, b in found)


# --------------------------------------- df_cap: stop-shingle pruning


@pytest.fixture(scope="module")
def stop_shingle_corpus(spark):
    """60 docs that ALL share a boilerplate header (a stop-shingle
    factory: every header bigram has df=60) plus unique bodies; one
    planted near-dup pair (50, 51) that also shares rare shingles."""
    header = "copyright notice all rights reserved by the site owner"
    rows = []
    for i in range(60):
        # every body token is doc-unique -> no cross-doc body bigrams,
        # so non-planted pairs overlap ONLY via the header (j=9/29<0.4)
        body = " ".join(f"w{i}x{k}" for k in range(10))
        rows.append((i, header + " " + body))
    rows.append((50_0, header + " shared rare tail about crimson albatross migration"))
    rows.append((50_1, header + " shared rare tail about crimson albatross migration today"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_df_cap_output_identical_to_uncapped(stop_shingle_corpus):
    uncapped = {
        (r.doc_a, r.doc_b, r.co, r.jaccard_ppm)
        for r in ngram_jaccard_pairs(
            stop_shingle_corpus, threshold_ppm=400000, df_cap=None
        ).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.co, r.jaccard_ppm)
        for r in ngram_jaccard_pairs(
            stop_shingle_corpus, threshold_ppm=400000, df_cap=10
        ).collect()
    }
    assert capped == uncapped
    assert (500, 501) in {(a, b) for a, b, *_ in capped}  # planted pair found
    # and the emitted scores are TRUE jaccard (include stop-shingle co)
    co_by_pair = {(a, b): c for a, b, c, _ in capped}
    uncapped_co = {(a, b): c for a, b, c, _ in uncapped}
    assert co_by_pair == uncapped_co


def test_df_cap_bounds_candidate_join(stop_shingle_corpus):
    """With threshold ~0 every co-shingled pair is emitted: uncapped,
    the shared header makes that ALL ~n²/2 pairs; capped, candidates
    collapse to only pairs sharing a sub-cap shingle."""
    n = stop_shingle_corpus.count()
    uncapped = ngram_jaccard_pairs(
        stop_shingle_corpus, threshold_ppm=1, df_cap=None
    ).count()
    capped = ngram_jaccard_pairs(
        stop_shingle_corpus, threshold_ppm=1, df_cap=10
    ).count()
    assert uncapped == n * (n - 1) / 2  # stop-shingles connect everything
    assert capped < 10  # only genuinely-overlapping pairs remain candidates


# ------------------------------ df_cap: cross-corpus stop-shingle valve


@pytest.fixture(scope="module")
def cross_corpus(spark):
    """30 incoming + 30 reference docs that ALL share a boilerplate
    header (every header bigram has union-df=60 — the k_inc x k_ref
    join-blowup factory) plus corpus-unique bodies; one planted
    cross-corpus near-dup (900 incoming, 901 reference) sharing rare
    shingles beyond the header."""
    header = "copyright notice all rights reserved by the site owner"
    inc_rows, ref_rows = [], []
    for i in range(30):
        inc_rows.append((i, header + " " + " ".join(f"i{i}x{k}" for k in range(10))))
        ref_rows.append((100 + i, header + " " + " ".join(f"r{i}x{k}" for k in range(10))))
    inc_rows.append((900, header + " shared rare tail about crimson albatross migration"))
    ref_rows.append((901, header + " shared rare tail about crimson albatross migration today"))
    inc = spark.createDataFrame(inc_rows, ["doc_id", "text"])
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    return inc, ref


def test_cross_corpus_df_cap_identical_to_uncapped(cross_corpus):
    inc, ref = cross_corpus
    uncapped = {
        (r.doc_id, r.ref_id, r.co, r.jaccard_ppm)
        for r in cross_corpus_near_pairs(
            inc, ref, threshold_ppm=400000, df_cap=None
        ).collect()
    }
    capped = {
        (r.doc_id, r.ref_id, r.co, r.jaccard_ppm)
        for r in cross_corpus_near_pairs(
            inc, ref, threshold_ppm=400000, df_cap=10
        ).collect()
    }
    assert capped == uncapped
    assert (900, 901) in {(a, b) for a, b, *_ in capped}  # planted pair
    # emitted co is TRUE overlap (stop-shingle correction applied)
    assert {(a, b): c for a, b, c, _ in capped} == {
        (a, b): c for a, b, c, _ in uncapped
    }


def test_cross_corpus_df_cap_bounds_candidate_join(cross_corpus):
    """With threshold ~0 every co-shingled cross pair is emitted:
    uncapped, the shared header connects ALL n_inc x n_ref pairs;
    capped, candidates collapse to pairs sharing a sub-cap shingle."""
    inc, ref = cross_corpus
    n_i, n_r = inc.count(), ref.count()
    uncapped = cross_corpus_near_pairs(
        inc, ref, threshold_ppm=1, df_cap=None
    ).count()
    capped = cross_corpus_near_pairs(
        inc, ref, threshold_ppm=1, df_cap=10
    ).count()
    assert uncapped == n_i * n_r  # header connects every cross pair
    assert capped < 10  # only genuinely-overlapping pairs remain


def test_span_dedup_planted_duplicate_span(spark):
    from census_asc5_data_pipeline_spark.operators.dedup import span_dedup_stats

    boiler = " ".join(f"b{i}" for i in range(10))  # one exact 10-token span
    uniq = lambda d: " ".join(f"u{d}_{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, boiler + " " + uniq(0)),   # spans: [boiler][uniq0]
            (1, boiler + " " + uniq(1)),   # spans: [boiler][uniq1]
            (2, uniq(2) + " " + uniq(3)),  # all unique
            (3, "short doc"),              # < 10 tokens: excluded
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in span_dedup_stats(docs, span_words=10).collect()}
    assert set(got) == {0, 1, 2}
    for d in (0, 1):
        assert got[d].n_spans == 2
        assert got[d].n_dup_spans == 1  # the boilerplate span
        assert got[d].dup_span_ppm == 500000
    assert got[2].n_dup_spans == 0


def test_containment_catches_embedded_doc(spark):
    from census_asc5_data_pipeline_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    long = " ".join(f"tok{k}" for k in range(100))
    short = " ".join(f"tok{k}" for k in range(10, 20))  # contiguous slice
    df = spark.createDataFrame([(1, long), (2, short)], ["doc_id", "text"])
    pairs = ngram_containment_pairs(df, threshold_ppm=900000).collect()
    assert len(pairs) == 1
    r = pairs[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment_ppm == 1000000  # fully embedded
    # the same pair is invisible to Jaccard (9 shared / 99 union ~ 9%)
    assert ngram_jaccard_pairs(df, threshold_ppm=200000).collect() == []


def test_containment_df_cap_identical_to_uncapped(stop_shingle_corpus):
    from census_asc5_data_pipeline_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    un = {
        tuple(r)
        for r in ngram_containment_pairs(
            stop_shingle_corpus, threshold_ppm=600000, df_cap=None
        ).collect()
    }
    capped = {
        tuple(r)
        for r in ngram_containment_pairs(
            stop_shingle_corpus, threshold_ppm=600000, df_cap=8
        ).collect()
    }
    assert capped == un
    # the planted pair survives with full containment of the smaller doc
    assert any(r[0] == 500 and r[1] == 501 and r[5] == 1000000 for r in un)
