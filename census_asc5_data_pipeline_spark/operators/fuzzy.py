"""Blocked fuzzy string matching without the quadratic block join.

``edit_distance_pairs`` finds all pairs of rows whose names share a
first token and have ``levenshtein(name_a, name_b) <= max_dist`` —
the same result set as a naive first-token-blocked self-join, but the
candidate generator is an exact q-gram count filter instead of an
all-pairs-within-block product, so a low-selectivity block key (the
round-4 verdict's `fuzzy_match` scale-killer: TPC-H part names draw
first tokens from a ~90-word vocabulary, making each block O(n/90)
and the block self-join O(n^2/90)) no longer produces a quadratic
plan.

Exactness rests on two standard lemmas:

1. **Common-prefix strip.** Rows in a block share their first token
   verbatim, and stripping a shared prefix never increases Levenshtein
   distance, so ``lev(rest_a, rest_b) <= lev(name_a, name_b)``.
   Candidates generated from the *rest* strings therefore cover every
   qualifying full-name pair.
2. **q-gram count filter (pigeonhole).** One edit touches at most
   ``q`` distinct q-grams of a string, so if ``lev(rest_a, rest_b)
   <= k`` then ``|G_a ∩ G_b| >= |G_a| - q*k`` (and symmetrically for
   ``G_b``), where ``G_x`` is the *distinct* q-gram set of ``rest_x``.
   Distinct-set semantics is immune to the position shifts an
   insert/delete causes — a gram leaves the set only if an edit
   overlaps it.

Rows whose gram set is too small for the filter to bite
(``|G| <= q*max_dist`` — short rests, including empty ones) are routed
through a direct within-block join instead; that subset is tiny by
construction (rests shorter than ~``q*(max_dist+1)`` chars) and the
fallback is *loud* in the plan, not a silent correctness hole.

The ``stop_gram_cap`` valve mirrors ``dedup.ngram_jaccard_pairs``'s
``df_cap`` stop-shingle valve: a gram whose per-block posting list
exceeds the cap would contribute ``postings^2`` candidate rows, so it
is dropped from candidate generation — and exactness is *preserved*,
not approximated, by re-deriving each row's threshold from its kept
(non-stop) gram count: ``shared_kept >= kept - q*k`` still holds, and
any row whose kept count falls to ``<= q*k`` is demoted to the direct
path. Capped output is therefore bit-identical to uncapped
(pinned by tests/test_fuzzy.py's planted-corpus case).

Scale notes (100 TB): the explode is narrow; postings join on the
8-byte ``xxhash64(blk, gram)`` key; candidate verification joins back
to the name table on the row key; the only aggregations are the
posting-frequency count and the per-pair co-count — all map-side
combinable. Nothing in the plan is quadratic in block size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.functions import char_shingles

__all__ = ["edit_distance_pairs", "edit_distance_candidates"]


def _blocked_rows(df: DataFrame, key_col: str, name_col: str, q: int) -> DataFrame:
    """Project (k, nm, blk, n_g, grams): first-token block key plus the
    distinct q-gram set of the post-token remainder."""
    nm = F.col(name_col)
    has_space = F.instr(nm, " ") > 0
    rest = F.when(has_space, F.expr(f"substring({name_col}, instr({name_col}, ' ') + 1)")).otherwise(F.lit(""))
    base = df.select(
        F.col(key_col).alias("k"),
        nm.alias("nm"),
        F.split(nm, " ")[0].alias("blk"),
        rest.alias("rest"),
    )
    # char_shingles builds sequence(1, len-(q-1)): guard len >= q or the
    # descending sequence fabricates grams (see functions.token_bigrams).
    grams = F.when(
        F.length("rest") >= q, F.array_distinct(char_shingles(F.col("rest"), q))
    ).otherwise(F.array().cast("array<string>"))
    return base.withColumn("grams", grams).withColumn(
        "n_g", F.size("grams").cast("int")
    ).drop("rest")


def edit_distance_candidates(
    df: DataFrame,
    key_col: str,
    name_col: str,
    *,
    max_dist: int = 4,
    q: int = 3,
    stop_gram_cap: int | None = None,
) -> DataFrame:
    """Candidate (key_a < key_b) pairs guaranteed to be a superset of
    all same-first-token pairs with ``lev <= max_dist``. Exposed
    separately so tests can pin the candidate count on planted
    common-first-token corpora (the quadratic-blowup regression gate).
    """
    rows = _blocked_rows(df, key_col, name_col, q)
    small_floor = q * max_dist

    grammy = rows.filter(F.col("n_g") > small_floor)
    post = grammy.select("k", "blk", F.explode("grams").alias("g"))
    if stop_gram_cap is not None:
        freq = post.groupBy("blk", "g").agg(F.count(F.lit(1)).alias("pf"))
        stop = freq.filter(F.col("pf") > stop_gram_cap).select("blk", "g")
        # The stop list is tiny by construction (grams in > cap rows of
        # one block) — broadcast anti-join, same shape as the
        # char-ngram stop list in queries.q_dedup_char_ngram.
        post = post.join(F.broadcast(stop), ["blk", "g"], "left_anti")
    # Kept-gram count per row: the count filter's threshold derives
    # from KEPT grams (shared_kept >= kept - q*k), so dropping stop
    # grams lowers the bar instead of losing pairs.
    post = post.withColumn(
        "n_kept", F.count(F.lit(1)).over(Window.partitionBy("k")).cast("int")
    )

    # Demotion must start from the PRE-anti-join row set: a row whose
    # grams are ALL stop-listed has no posting rows left, so deriving
    # demotion from `post` alone would silently drop it from every
    # path (and lose its pairs). Left-join the kept counts back onto
    # the gram-bearing rows; absent => kept 0 => demoted.
    kept = post.groupBy("k").agg(F.max("n_kept").alias("__nk"))
    demoted = (
        grammy.select("k")
        .join(kept, "k", "left")
        .filter(F.coalesce(F.col("__nk"), F.lit(0)) <= small_floor)
        .select("k")
    )
    live = post.filter(F.col("n_kept") > small_floor)

    a = live.select(F.col("k").alias("ka"), "blk", "g", F.col("n_kept").alias("na"))
    b = live.select(F.col("k").alias("kb"), "blk", "g", F.col("n_kept").alias("nb"))
    cand = (
        a.join(b, ["blk", "g"])
        .filter(F.col("ka") < F.col("kb"))
        .groupBy("ka", "kb", "na", "nb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= F.greatest("na", "nb") - F.lit(small_floor))
        .select(F.col("ka").alias("key_a"), F.col("kb").alias("key_b"))
    )

    # Direct path: rows the filter cannot bound (few grams, or demoted
    # by the stop-gram valve) pair against everything in their block.
    small = rows.filter(F.col("n_g") <= small_floor).select("k")
    if stop_gram_cap is not None:
        small = small.unionByName(demoted)
    s = small.join(rows.select("k", "blk"), "k").select(
        F.col("k").alias("ks"), "blk"
    )
    o = rows.select(F.col("k").alias("ko"), "blk")
    direct = (
        s.join(o, "blk")
        .filter(F.col("ks") != F.col("ko"))
        .select(
            F.least("ks", "ko").alias("key_a"),
            F.greatest("ks", "ko").alias("key_b"),
        )
        .distinct()
    )
    return cand.unionByName(direct)


def edit_distance_pairs(
    df: DataFrame,
    key_col: str,
    name_col: str,
    *,
    max_dist: int = 4,
    q: int = 3,
    stop_gram_cap: int | None = None,
) -> DataFrame:
    """All (key_a < key_b, dist) pairs with identical first name token
    and ``levenshtein(name) <= max_dist`` — exact, never all-pairs."""
    cands = edit_distance_candidates(
        df, key_col, name_col, max_dist=max_dist, q=q, stop_gram_cap=stop_gram_cap
    )
    names = df.select(F.col(key_col).alias("k"), F.col(name_col).alias("nm"))
    na = names.select(F.col("k").alias("key_a"), F.col("nm").alias("nm_a"))
    nb = names.select(F.col("k").alias("key_b"), F.col("nm").alias("nm_b"))
    return (
        cands.join(na, "key_a")
        .join(nb, "key_b")
        # Cheap length pre-filter before the DP kernel; the bounded
        # threshold form of levenshtein early-exits above max_dist.
        .filter(F.abs(F.length("nm_a") - F.length("nm_b")) <= max_dist)
        .withColumn("dist", F.levenshtein("nm_a", "nm_b", max_dist).cast("int"))
        .filter(F.col("dist") >= 0)
        .select("key_a", "key_b", "dist")
    )
