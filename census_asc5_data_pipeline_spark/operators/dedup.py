"""Deduplication operators: exact, exact n-gram Jaccard, MinHash+LSH,
SimHash — the standard large-corpus near-dup ladder.

Scale design (100 TB):
- exact: shuffle key is a 128-bit content hash, never the document text.
- jaccard: inverted-index self-join — O(sum of postings²) pairs, never
  an O(n²) crossJoin; a df-cap drops degenerate stop-shingles.
- minhash: signatures are 64 JVM-side min-aggregates over one explode
  (map-side partial agg), LSH bands shuffle only (band_hash, doc_id).
- simhash: 64 bit-column sums, banded hamming join, F.bit_count verify.

No Python UDFs anywhere — every stage is whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.functions import explode_computed, words


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical documents: (content_hash, keeper id, copy count).

    Keeps one row per distinct content; at scale group on the md5 so the
    shuffle carries 16 bytes + id per row, with map-side combine.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_postings(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_sh, shingle) inverted-index postings over distinct
    token-bigram shingles.

    Shape notes: bigrams come from ``zip_with`` over two slices (one
    cheap HOF); per-doc dedup + count happen INSIDE the row via
    ``array_distinct``/``size`` before a single ``posexplode_outer`` —
    ZERO shuffles (the old distinct + count-window form paid two
    corpus-wide shuffles for the same rows, ~7x slower cold at sf0.1).
    ``posexplode_outer``, not ``posexplode``: the non-outer Generate
    adds an implicit size>0 filter that clones the whole array
    expression into the plan and evaluates it twice per row (same
    finding as similarity.py's ``_lsh_band_buckets``). Everything is
    per-row array math — no driver or broadcast bottleneck at corpus
    scale, and one fewer shuffle stage to spill at 100 TB.
    """
    w = words(F.col(text_col))
    toks = df.select("doc_id", w.alias("__w")).filter(F.size("__w") >= 2)
    bigrams = F.array_distinct(
        F.zip_with(
            F.slice("__w", 1, F.size("__w") - 1),
            F.slice("__w", 2, F.size("__w") - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    return (
        toks.select(
            "doc_id",
            F.size(bigrams).cast("bigint").alias("n_sh"),
            bigrams.alias("__b"),
        )
        .select("doc_id", "n_sh", F.posexplode_outer("__b").alias("__i", "shingle"))
        .drop("__i")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold_ppm: int = 100000,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via inverted-index self-join.

    jaccard(a,b) = |A∩B| / (|A|+|B|-|A∩B|) over distinct shingle sets,
    emitted as parts-per-million (fixed-point — engine-portable).

    ``df_cap`` is the 100 TB safety valve for stop-shingles: a shingle
    shared by k documents contributes k² rows to the self-join, so one
    degenerate "of the"-style bigram across 10⁶ docs would emit 10¹²
    join rows. With ``df_cap`` set, shingles whose document frequency
    exceeds the cap are excluded from CANDIDATE GENERATION ONLY (an
    anti-join against the tiny broadcast stop-shingle list), and every
    surviving candidate pair is then re-verified EXACTLY against the
    full uncapped shingle sets (array_intersect over per-doc hash
    arrays, built only for candidate docs). Emitted scores are
    therefore true Jaccard values — identical to the uncapped output
    unless a qualifying pair shares *only* stop-shingles, which at
    jaccard >= 0.1 requires the pair to be composed almost entirely of
    corpus-degenerate bigrams (tests/test_dedup.py plants exactly that
    corpus shape and asserts output identity + bounded join size).
    """
    # Join on a 64-bit hash of the shingle, not the string: the shuffle
    # carries 8 bytes instead of a variable-length string, and the
    # postings are persisted so shingle generation runs once, not twice.
    # A cross-shingle hash collision could miscount co by 1 — odds are
    # ~|shingles|²/2^64, negligible against corpus sizes.
    # The explicit repartition is LOAD-BEARING twice over:
    # (1) shingle_postings is shuffle-free, so without it the postings
    #     inherit the scan's partitioning and the whole pair pipeline
    #     runs at scan parallelism;
    # (2) the key must be doc_id, NOT the join key sh: the broadcast
    #     self-join streams the probe side straight into the partial
    #     pair-count aggregate, and doc_id clustering bounds each
    #     task's group cardinality to (its docs × their neighbors) —
    #     hashed by sh, every task sees nearly EVERY (doc_a, doc_b)
    #     group and the partial hash maps blow past the in-memory
    #     limit (measured +60% wall on a dense-vocabulary corpus).
    post = (
        shingle_postings(df, text_col)
        .select("doc_id", "n_sh", F.xxhash64(F.col("shingle")).alias("sh"))
        .repartition(F.col("doc_id"))
        .persist()
    )
    cand_post = post
    if df_cap is not None:
        freq = post.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
        # Broadcast the STOP list (df > cap), not its complement — the
        # sub-cap side is nearly every distinct shingle in the corpus.
        # Persisted because the capped plan references it three times
        # (two anti-joins + the stop-set correction), and each reference
        # would otherwise recompute the frequency aggregate.
        stop = freq.filter(F.col("__df") > df_cap).select("sh").persist()
        if stop.isEmpty():
            # Common case: no shingle exceeds the cap, so the capped
            # plan would equal the uncapped one while still paying for
            # the correction subtrees (two extra broadcast joins + two
            # collect_list aggregates in the physical plan). One tiny
            # job (limit-1 over the cached postings' frequency agg)
            # collapses it — driver-side control flow on a scalar, the
            # same contract as BPE's per-merge best-pair fetch.
            stop.unpersist()
            df_cap = None
        else:
            cand_post = post.join(F.broadcast(stop), "sh", "left_anti")
    a = cand_post.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"), "sh"
    )
    b = cand_post.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"), "sh"
    )
    # Length filter (exactness-preserving, r5): jaccard <= min/max of
    # the set sizes, so J >= t forces min(n_a,n_b) >= t*max(n_a,n_b).
    # Applying it IN the join prunes size-mismatched postings pairs
    # before they reach the pair-count shuffle — the classic
    # set-similarity-join size bound, zero effect on output.
    # The output filter is on floor(J*1e6 + 0.5) >= t_ppm, which a
    # true J as low as (t_ppm - 0.5)/1e6 can pass — so the bound gets
    # the same half-ppm slack (2e6·min >= (2·t_ppm - 1)·max), or a
    # pair in that rounding window would be pruned here yet kept by
    # the oracle (code-review r5 finding).
    ratio_ok = (
        F.col("n_a") * 2000000 >= F.lit(2 * threshold_ppm - 1) * F.col("n_b")
    ) & (F.col("n_b") * 2000000 >= F.lit(2 * threshold_ppm - 1) * F.col("n_a"))
    if df_cap is None:
        out = (
            a.join(b, "sh")
            .filter((F.col("doc_a") < F.col("doc_b")) & ratio_ok)
            .groupBy("doc_a", "doc_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("co"))
            .withColumn(
                "jaccard_ppm",
                F.floor(
                    F.col("co").cast("double")
                    * 1000000.0
                    / (F.col("n_a") + F.col("n_b") - F.col("co"))
                    + F.lit(0.5)
                ).cast("bigint"),
            )
            .filter(F.col("jaccard_ppm") >= threshold_ppm)
            .select("doc_a", "doc_b", "co", "jaccard_ppm")
        )
        # Long-lived sessions: release via queries.unpersist_deps(out);
        # consumers that persist the pair list themselves must CARRY
        # these deps forward (r5 code-review finding — the postings
        # cache otherwise leaks behind every wrapper).
        out._cached_deps = [post]  # type: ignore[attr-defined]
        return out
    # Capped path: co splits exactly into
    #   co = co_sub (sub-cap shingles — counted by the SAME map-side-
    #        combinable join+groupBy as the uncapped path, just over the
    #        pruned index) + |stop(a) ∩ stop(b)| (stop-shingle overlap).
    # Per-doc STOP arrays are tiny (≤ |stop list|, the handful of
    # degenerate shingles), so the correction is two cheap left joins —
    # nothing like materializing full shingle sets. n_a/n_b were counted
    # before pruning, so the emitted jaccard is the true uncapped value.
    stop_sets = (
        post.join(F.broadcast(stop), "sh")
        .groupBy("doc_id")
        .agg(F.collect_list("sh").alias("ss"))
    )
    pairs_sub = (
        a.join(b, "sh")
        .filter((F.col("doc_a") < F.col("doc_b")) & ratio_ok)
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("co_sub"))
    )
    ssa = stop_sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    ssb = stop_sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    co_stop = F.when(
        F.col("ss_a").isNotNull() & F.col("ss_b").isNotNull(),
        F.size(F.array_intersect("ss_a", "ss_b")).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    out = (
        pairs_sub.join(ssa, "doc_a", "left")
        .join(ssb, "doc_b", "left")
        .withColumn("co", (F.col("co_sub") + co_stop).cast("bigint"))
        .withColumn(
            "jaccard_ppm",
            F.floor(
                F.col("co").cast("double")
                * 1000000.0
                / (F.col("n_a") + F.col("n_b") - F.col("co"))
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .filter(F.col("jaccard_ppm") >= threshold_ppm)
        .select("doc_a", "doc_b", "co", "jaccard_ppm")
    )
    # Same release contract as the uncapped branch, plus the stop list.
    out._cached_deps = [post, stop]  # type: ignore[attr-defined]
    return out


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold_ppm: int = 500000,
    df_cap: int | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs over distinct token-bigram
    shingle sets: containment = |A∩B| / min(|A|,|B|) — the overlap
    coefficient. This catches the quote/excerpt/wrapper duplication
    family Jaccard structurally misses: a 50-shingle doc fully embedded
    in a 5000-shingle doc has containment 1.0 but Jaccard ~0.01, so no
    Jaccard threshold can separate it from noise.

    Mirrors ``ngram_jaccard_pairs``'s inverted-index structure (8-byte
    hashed shingle keys, aggregate-key repartition, broadcast
    stop-shingle cap with EXACT re-correction) but is kept separate
    rather than factored: the exactness-preserving in-join pruning
    differs (containment admits no symmetric length-ratio bound — a
    tiny doc inside a huge one is precisely the target), and the hot,
    measurement-tuned Jaccard path stays untouched. Same capped-path
    caveat: a qualifying pair sharing *only* stop shingles is missed,
    which at any real threshold requires a pair composed entirely of
    corpus-degenerate bigrams; with df_cap above the corpus max-df the
    empty-stop early-out makes the plans identical.
    """
    post = (
        shingle_postings(df, text_col)
        .select("doc_id", "n_sh", F.xxhash64(F.col("shingle")).alias("sh"))
        .repartition(F.col("doc_id"))
        .persist()
    )
    cand_post = post
    stop = None
    if df_cap is not None:
        freq = post.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
        stop = freq.filter(F.col("__df") > df_cap).select("sh").persist()
        if stop.isEmpty():
            stop.unpersist()
            stop = None
        else:
            cand_post = post.join(F.broadcast(stop), "sh", "left_anti")
    a = cand_post.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"), "sh"
    )
    b = cand_post.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"), "sh"
    )
    pairs = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    if stop is not None:
        # Exact correction, same split as the Jaccard capped path:
        # co = co_sub + |stop(a) ∩ stop(b)| via tiny per-doc stop arrays.
        stop_sets = (
            post.join(F.broadcast(stop), "sh")
            .groupBy("doc_id")
            .agg(F.collect_list("sh").alias("ss"))
        )
        ssa = stop_sets.select(
            F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a")
        )
        ssb = stop_sets.select(
            F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b")
        )
        co_stop = F.when(
            F.col("ss_a").isNotNull() & F.col("ss_b").isNotNull(),
            F.size(F.array_intersect("ss_a", "ss_b")).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        pairs = (
            pairs.withColumnRenamed("co", "co_sub")
            .join(ssa, "doc_a", "left")
            .join(ssb, "doc_b", "left")
            .withColumn("co", (F.col("co_sub") + co_stop).cast("bigint"))
        )
    out = (
        pairs.withColumn(
            "containment_ppm",
            F.floor(
                F.col("co").cast("double")
                * 1000000.0
                / F.least("n_a", "n_b")
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .filter(F.col("containment_ppm") >= threshold_ppm)
        .select("doc_a", "doc_b", "n_a", "n_b", "co", "containment_ppm")
    )
    # Long-lived sessions: release via queries.unpersist_deps(out)
    out._cached_deps = [post] + ([stop] if stop is not None else [])  # type: ignore[attr-defined]
    return out


_MERSENNE31 = (1 << 31) - 1


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per document, entirely JVM-side.

    One explode of distinct shingles, ONE xxhash64 per shingle, then a
    universal-hash family h_i = (a_i*h + b_i) mod (2^31-1) derived by
    pure integer arithmetic (values stay < 2^62, so no overflow under
    ANSI mode). ``num_hashes`` min-aggregates with map-side partial
    aggregation — the shuffle is one row per document regardless of
    document length.
    """
    import random

    rng = random.Random(42)
    params = [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num_hashes)
    ]
    # Raw (non-distinct) shingles: MIN over a multiset equals MIN over
    # the set, so minhash skips the dedup shuffle and the count window
    # that the exact-jaccard path needs — one explode, one groupBy.
    w = words(F.col(text_col))
    toks = df.select("doc_id", w.alias("__w")).filter(F.size("__w") >= 2)
    bigrams = F.zip_with(
        F.slice("__w", 1, F.size("__w") - 1),
        F.slice("__w", 2, F.size("__w") - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    post = explode_computed(toks, bigrams, "shingle").withColumn(
        "__h", F.pmod(F.xxhash64(F.col("shingle")), F.lit(_MERSENNE31))
    )
    # All num_hashes universal hashes land in ONE array column per row;
    # the aggregates are then trivial `min(__ha[i])` updates. The hash
    # family is applied as a HOF transform over a LITERAL (a, b)
    # parameter array — measured 5x faster cold than an unrolled
    # F.array of num_hashes pmod expressions (0.65s vs 3.3s at sf0.1)
    # and faster warm too: the fold runs one specialized loop per row
    # while the unrolled form pays janino compile plus per-term
    # overhead (same finding as similarity._norm_expr).
    pstructs = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in params
        ]
    )
    ha = F.transform(
        pstructs,
        lambda p: F.pmod(F.col("__h") * p["a"] + p["b"], F.lit(_MERSENNE31)),
    )
    post = post.withColumn("__ha", ha)
    aggs = [F.min(F.col("__ha")[i]).alias(f"h{i}") for i in range(num_hashes)]
    wide = post.groupBy("doc_id").agg(*aggs)
    # Single array column out: downstream banding/verification hash and
    # slice the array (one small expression each) instead of touching 64
    # named columns, which keeps every later codegen stage tiny.
    return wide.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs.

    rows-per-band = num_hashes // bands; two docs collide in a band iff
    that band's signature slice matches exactly, so only (band_hash,
    doc_id) rows are shuffled — O(n·bands), never O(n²).

    With ``verify_threshold`` the candidates are verified against the
    estimated Jaccard = fraction of matching signature components.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, num_hashes).cache()
    # Band hash = xxhash64 over an array *slice* of the signature —
    # generated as a loop over band indices, not 16 unrolled wide
    # expressions (xxhash64 hashes complex types natively).
    band_structs = F.transform(
        F.array(*[F.lit(b) for b in range(bands)]),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
            ).alias("bh"),
        ),
    )
    buckets = explode_computed(sig, band_structs, "bb").select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # Verify with one zip_with/aggregate over the signature arrays — a
    # 64-term when-chain here costs ~8s of janino compilation.
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", F.round(matches / F.lit(num_hashes), 6))
        .filter(F.col("est_jaccard") >= verify_threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document, JVM-side.

    Explode tokens, xxhash64 each, then per bit position sum (+1/-1)
    contributions and fold the signs back into one BIGINT signature.
    """
    toks = (
        df.withColumn("__w", words(F.col(text_col)))
        .select("doc_id", F.explode("__w").alias("tok"))
        .withColumn("h", F.xxhash64(F.col("tok")))
    )
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    per_bit = toks.groupBy("doc_id").agg(*bit_aggs)
    sig = sum(
        [
            F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint") * F.lit(2 ** i if i < 63 else -(2 ** 63))).otherwise(0)
            for i in range(64)
        ],
        F.lit(0).cast("bigint"),
    )
    return per_bit.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash banding (pigeonhole over 4×16-bit
    bands) verified with ``bit_count(a XOR b) <= max_hamming``."""
    sig = simhash_signatures(df, text_col).cache()
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
        )
        for b in range(4)
    ]
    buckets = explode_computed(
        sig, F.array(*bands), "bb", keep=("doc_id", "simhash")
    ).select(
        "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a = buckets.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "bh")
    b = buckets.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def span_dedup_stats(
    df: DataFrame, text_col: str = "text", span_words: int = 10
) -> DataFrame:
    """Fixed-window exact span dedup: slice each document into
    non-overlapping ``span_words``-token spans, count how often each
    span's text occurs ANYWHERE in the corpus, and report per document
    how much of it is made of corpus-duplicated spans.

    This is the span-granularity member of the dedup family (between
    whole-document exact dedup and shingle Jaccard): training pipelines
    use it to find boilerplate runs repeated across documents that
    document-level dedup misses (the reference has no analog; standard
    corpus-prep operator).

    Scale shape: spans are built IN-ROW (one transform over the token
    array, no corpus-wide distinct), exploded once; the occurrence
    count is a groupBy on ``xxhash64(span)`` — an 8-byte shuffle key,
    never the span text (the oracle groups by the raw span string; a
    cross-span hash collision merging two counts has odds
    ~|spans|²/2^64, negligible) — and the join back to spans is a
    same-key equi-join. Everything is map-side-combinable aggregation;
    no driver state.
    """
    w = words(F.col(text_col))
    toks = df.select("doc_id", w.alias("__w")).filter(
        F.size("__w") >= span_words
    )
    n_spans = F.floor(F.size("__w") / F.lit(span_words)).cast("int")
    spans_arr = F.transform(
        F.sequence(F.lit(1), n_spans),
        lambda i: F.xxhash64(
            F.concat_ws(
                " ", F.slice(F.col("__w"), (i - 1) * span_words + 1, span_words)
            )
        ),
    )
    # persist: the span frame feeds the occurrence aggregate AND the
    # join back — without the cache the corpus tokenize+explode runs
    # once per consumer (r16; the jaccard postings precedent). 16
    # bytes/row at ~tokens/span_words rows — an order below corpus
    # scale; consumers release via queries.unpersist_deps.
    spans = explode_computed(toks, spans_arr, "sh").persist()
    # agg+join, NOT count().over(Window.partitionBy("sh")): the window
    # form measured ~3x faster at sf0.1 (one shuffle fewer) but
    # WindowExec buffers each partition whole and gets no AQE skew
    # handling — a boilerplate mega-span repeated across millions of
    # docs would pin its entire partition on one task. The aggregate
    # keeps map-side combine and the join inherits AQE skew-join
    # splitting, which is the shape that survives a degenerate corpus.
    occ = spans.groupBy("sh").agg(F.count(F.lit(1)).alias("__occ"))
    out = (
        spans.join(occ, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("__occ") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_spans"),
            F.floor(
                F.sum(F.when(F.col("__occ") > 1, 1).otherwise(0)).cast("double")
                * 1000000.0
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("dup_span_ppm"),
        )
    )
    out._cached_deps = [spans]  # type: ignore[attr-defined]
    return out


def cross_corpus_near_pairs(
    inc: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    threshold_ppm: int = 500000,
    df_cap: int | None = None,
) -> DataFrame:
    """Jaccard-similar (incoming, reference) pairs ACROSS two corpora —
    the candidate space is |inc postings| ⋈ |ref postings| on shared
    shingles, never a within-corpus self-join.  Output: (doc_id,
    ref_id, co, jaccard_ppm) with true (uncapped) Jaccard values.

    ``df_cap`` is the same 100 TB stop-shingle valve as
    ``ngram_jaccard_pairs``: a boilerplate bigram occurring in k_inc
    incoming × k_ref reference docs emits k_inc·k_ref join rows, so
    document frequency is computed over the UNION of both postings
    (a shingle degenerate in either corpus is degenerate for the
    join), shingles past the cap are excluded from candidate
    generation only (broadcast anti-join), and every surviving
    candidate pair is corrected EXACTLY by adding back its
    stop-shingle overlap (two cheap broadcast-built per-doc stop
    arrays — each at most |stop list| long).  n_sh/n_r are counted
    in-row before any pruning, so emitted scores are true Jaccard —
    identical to the uncapped output unless a qualifying pair shares
    *only* stop-shingles (tests/test_dedup.py plants exactly that
    cross-corpus shape and asserts output identity + bounded join
    rows).  Round-6 item: the r5 query relied on the size-ratio bound
    alone, which does nothing against same-length boilerplate
    blowups.
    """
    pi = (
        shingle_postings(inc, text_col)
        .select("doc_id", "n_sh", F.xxhash64(F.col("shingle")).alias("sh"))
        .repartition(F.col("doc_id"))
        .persist()
    )
    pr = (
        shingle_postings(ref, text_col)
        .select(
            F.col("doc_id").alias("ref_id"),
            F.col("n_sh").alias("n_r"),
            F.xxhash64(F.col("shingle")).alias("sh"),
        )
        .repartition(F.col("ref_id"))
        .persist()
    )
    deps: list[DataFrame] = [pi, pr]
    cand_i, cand_r = pi, pr
    if df_cap is not None:
        freq = (
            pi.select("sh")
            .unionAll(pr.select("sh"))
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
        )
        stop = freq.filter(F.col("__df") > df_cap).select("sh").persist()
        if stop.isEmpty():
            # Same collapse as ngram_jaccard_pairs: no degenerate
            # shingles → drop the correction subtrees entirely.
            stop.unpersist()
            df_cap = None
        else:
            deps.append(stop)
            cand_i = pi.join(F.broadcast(stop), "sh", "left_anti")
            cand_r = pr.join(F.broadcast(stop), "sh", "left_anti")
    # Exactness-preserving size bound with the half-ppm slack (see
    # ngram_jaccard_pairs): J >= t forces min >= ~t·max.
    ratio_ok = (
        F.col("n_sh") * 2000000 >= F.lit(2 * threshold_ppm - 1) * F.col("n_r")
    ) & (
        F.col("n_r") * 2000000 >= F.lit(2 * threshold_ppm - 1) * F.col("n_sh")
    )

    def _jac(co):  # fixed-point ppm, identical expression tree to SQL
        return F.floor(
            co.cast("double")
            * 1000000.0
            / (F.col("n_sh") + F.col("n_r") - co)
            + F.lit(0.5)
        ).cast("bigint")

    if df_cap is None:
        out = (
            cand_i.join(cand_r, "sh")
            .filter(ratio_ok)
            .groupBy("doc_id", "n_sh", "ref_id", "n_r")
            .agg(F.count(F.lit(1)).alias("co"))
            .withColumn("jaccard_ppm", _jac(F.col("co")))
            .filter(F.col("jaccard_ppm") >= threshold_ppm)
            .select("doc_id", "ref_id", "co", "jaccard_ppm")
        )
        out._cached_deps = deps  # type: ignore[attr-defined]
        return out
    stop_i = (
        pi.join(F.broadcast(stop), "sh")
        .groupBy("doc_id")
        .agg(F.collect_list("sh").alias("ss_i"))
    )
    stop_r = (
        pr.join(F.broadcast(stop), "sh")
        .groupBy("ref_id")
        .agg(F.collect_list("sh").alias("ss_r"))
    )
    pairs_sub = (
        cand_i.join(cand_r, "sh")
        .filter(ratio_ok)
        .groupBy("doc_id", "n_sh", "ref_id", "n_r")
        .agg(F.count(F.lit(1)).alias("co_sub"))
    )
    co_stop = F.when(
        F.col("ss_i").isNotNull() & F.col("ss_r").isNotNull(),
        F.size(F.array_intersect("ss_i", "ss_r")).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    out = (
        pairs_sub.join(stop_i, "doc_id", "left")
        .join(stop_r, "ref_id", "left")
        .withColumn("co", (F.col("co_sub") + co_stop).cast("bigint"))
        .withColumn("jaccard_ppm", _jac(F.col("co")))
        .filter(F.col("jaccard_ppm") >= threshold_ppm)
        .select("doc_id", "ref_id", "co", "jaccard_ppm")
    )
    out._cached_deps = deps  # type: ignore[attr-defined]
    return out
