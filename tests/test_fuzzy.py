"""Planted-corpus tests for operators/fuzzy.py — the de-quadratified
`fuzzy_match` path (round-4 verdict item 1).

The quadratic-blowup gate: a corpus where EVERY row shares one first
token (the worst case for first-token blocking — one block of n rows,
n(n-1)/2 naive pairs) must produce a bounded candidate set, and the
verified output must equal a brute-force O(n^2) Python oracle.
"""

from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.operators import fuzzy as FZ


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _planted_corpus() -> list[tuple[int, str]]:
    """220 names, ALL sharing first token 'promo'. Rests are
    deterministic pseudo-random 24-char strings (pairwise far apart)
    plus 6 planted near-duplicate pairs at distances 0..4."""
    import hashlib

    rows = []
    for i in range(200):
        h = hashlib.md5(f"base-{i}".encode()).hexdigest()[:24]
        rows.append((i, f"promo {h}"))
    # Planted near pairs: mutate a base string by d edits.
    for j, d in enumerate([0, 1, 2, 3, 4, 4]):
        base = hashlib.md5(f"pair-{j}".encode()).hexdigest()[:24]
        mutated = ("z" * d) + base[d:]
        rows.append((1000 + 2 * j, f"promo {base}"))
        rows.append((1001 + 2 * j, f"promo {mutated}"))
    return rows


def _brute_pairs(rows):
    out = set()
    for i, (ka, na) in enumerate(rows):
        for kb, nb in rows[i + 1 :]:
            if na.split(" ")[0] != nb.split(" ")[0]:
                continue
            d = _lev(na, nb)
            if d <= 4:
                lo, hi = min(ka, kb), max(ka, kb)
                out.add((lo, hi, d))
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(_planted_corpus(), ["id", "name"])


def test_planted_output_matches_bruteforce(spark, corpus_df):
    got = {
        (r.key_a, r.key_b, r.dist)
        for r in FZ.edit_distance_pairs(corpus_df, "id", "name").collect()
    }
    assert got == _brute_pairs(_planted_corpus())


def test_candidates_bounded_on_common_first_token(spark, corpus_df):
    """THE regression gate: one 212-row block would naively yield
    212*211/2 = 22366 pairs; the q-gram count filter must keep the
    candidate set orders of magnitude smaller (planted pairs + noise
    collisions only)."""
    n = corpus_df.count()
    naive = n * (n - 1) // 2
    cand = FZ.edit_distance_candidates(corpus_df, "id", "name").count()
    assert cand < naive * 0.02, f"{cand} candidates vs naive {naive}"
    # Every planted pair must still be among the candidates (exactness).
    got = {
        (r.key_a, r.key_b)
        for r in FZ.edit_distance_candidates(corpus_df, "id", "name").collect()
    }
    assert {(ka, kb) for ka, kb, _ in _brute_pairs(_planted_corpus())} <= got


def test_stop_gram_cap_is_exact(spark, corpus_df):
    """A brutally small cap (every gram appearing >3 times becomes a
    stop gram) must demote rows loudly, never drop pairs: capped output
    == uncapped output == brute force."""
    uncapped = {
        (r.key_a, r.key_b, r.dist)
        for r in FZ.edit_distance_pairs(corpus_df, "id", "name").collect()
    }
    capped = {
        (r.key_a, r.key_b, r.dist)
        for r in FZ.edit_distance_pairs(
            corpus_df, "id", "name", stop_gram_cap=3
        ).collect()
    }
    assert capped == uncapped == _brute_pairs(_planted_corpus())


def test_short_rest_rows_route_through_direct_path(spark):
    """Rows whose rest has too few grams for the count filter (incl.
    one-token names with empty rest) must still pair exactly."""
    rows = [
        (1, "promo ab"),
        (2, "promo abd"),  # dist 1 to row 1
        (3, "promo"),  # empty rest; dist to 'promo ab' = 3
        (4, "promo xyzzy"),
        (5, "other ab"),  # different block: never paired with 1..4
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.key_a, r.key_b, r.dist)
        for r in FZ.edit_distance_pairs(df, "id", "name").collect()
    }
    assert got == _brute_pairs(rows)


def test_rows_with_all_grams_stop_listed_are_not_dropped(spark):
    """Code-review regression (r5): a block of identical long rests
    makes EVERY gram exceed a tiny cap — rows then have zero kept
    postings and must be demoted to the direct path, not silently
    dropped with all their pairs."""
    rows = [(i, "promo abcdefghijklmnop") for i in range(40)]
    rows += [(100, "promo zzzzzzzzzzzzzzzzz"), (101, "promo zzzzzzzzzzzzzzzzz")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.key_a, r.key_b, r.dist)
        for r in FZ.edit_distance_pairs(df, "id", "name", stop_gram_cap=3).collect()
    }
    assert got == _brute_pairs(rows)
    # sanity: the identical-rest block contributes C(40,2) zero-dist pairs
    assert sum(1 for a, b, d in got if d == 0 and a < 100) == 40 * 39 // 2
