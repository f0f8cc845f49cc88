"""Text-analysis operators for training-data pipelines.

All JVM-side (split/filter/transform/regexp) — no Python in the hot
path, so these run at full scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.functions import (
    count_in_set,
    explode_computed,
    token_bigrams,
    words,
)

# Marker vocabularies for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "es": ["el", "la", "los", "de", "que"],
    "fr": ["le", "les", "des", "et", "une"],
    "de": ["der", "und", "die", "das", "ein"],
}
CJK_PATTERN = "[一-鿿]"


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID with a deterministic argmax.

    Adds ``s_<lang>`` marker-hit counts and ``pred_lang``. Tie-break is
    fixed priority en > es > fr > de > zh > unknown so results are
    engine-reproducible.
    """
    w = words(F.col(text_col))
    out = df.withColumn("__w", w)
    for lang, vocab in LANG_MARKERS.items():
        out = out.withColumn(f"s_{lang}", count_in_set(F.col("__w"), vocab).cast("bigint"))
    out = out.withColumn(
        "s_zh",
        F.size(F.filter(F.col("__w"), lambda x: x.rlike(CJK_PATTERN))).cast("bigint"),
    )
    scores = [F.col(f"s_{lang}") for lang in ("en", "es", "fr", "de", "zh")]
    best = F.greatest(*scores)
    pred = (
        F.when(best <= 0, F.lit("unknown"))
        .when(F.col("s_en") == best, "en")
        .when(F.col("s_es") == best, "es")
        .when(F.col("s_fr") == best, "fr")
        .when(F.col("s_de") == best, "de")
        .otherwise("zh")
    )
    return out.withColumn("pred_lang", pred).drop("__w")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, word, punctuation, stopword
    and mean-word-length signals combined into ``quality`` ∈ [0, 1].

    All continuous outputs are fixed-point micro/ppm BIGINTs computed
    with FLOOR(x*1e6+0.5) over integer-fed double math — deterministic
    across engines (see queries.py determinism rules).
    """
    w = words(F.col(text_col))
    n_chars = F.length(F.col(text_col)).cast("bigint")
    n_words = F.size(w).cast("bigint")
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    ).cast("bigint")
    n_stop = count_in_set(w, LANG_MARKERS["en"]).cast("bigint")

    def micro(x):  # FLOOR(x*1e6 + 0.5) — portable fixed point
        return F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")

    awl = (n_chars - (n_words - 1)) / n_words
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    quality = (
        F.least(F.lit(1.0), n_words / F.lit(64.0)) * 0.4
        + (1 - punct_ratio) * 0.3
        + F.least(F.lit(1.0), stop_ratio * F.lit(8.0)) * 0.3
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_txt"),
        n_words.alias("n_words"),
        micro(awl).alias("awl_micro"),
        micro(punct_ratio).alias("punct_ppm"),
        micro(stop_ratio).alias("stop_ppm"),
        micro(quality).alias("quality_ppm"),
    )


def readability_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch-reading-ease-style readability per document.

    Sentences from punctuation runs (``[.!?]+``, min 1), syllables from
    vowel-group runs (``[aeiouy]+`` — the standard cheap approximation),
    words from non-empty whitespace tokens. All three inputs are exact
    integer counts, so the one shared double expression (scaled to
    milli-points via FLOOR(x*1000+0.5)) is bit-identical across
    engines. Rows with zero words are dropped (score undefined).
    """
    n_w = F.size(
        F.filter(words(F.col(text_col)), lambda t: F.length(t) > 0)
    ).cast("bigint")
    n_s = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    n_y = F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+")).cast(
        "bigint"
    )
    score = F.floor(
        (
            F.lit(206.835)
            - F.lit(1.015) * (n_w.cast("double") / n_s.cast("double"))
            - F.lit(84.6) * (n_y.cast("double") / n_w.cast("double"))
        )
        * 1000
        + F.lit(0.5)
    ).cast("bigint")
    return df.select(
        "doc_id",
        n_w.alias("n_words"),
        n_s.alias("n_sentences"),
        n_y.alias("n_syllables"),
        score.alias("flesch_milli"),
    ).filter(F.col("n_words") >= 1)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count
    (letters-run | digit-run | single symbol)."""
    ws = F.size(words(F.col(text_col))).cast("bigint")
    bpe = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).cast("bigint")
    return df.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    )


# PII patterns kept to RE2-safe syntax (no lookarounds) so the same
# regex runs identically on Spark (java.util.regex) and RE2 engines.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / phone numbers / SSN-shaped spans, keeping per-doc
    redaction counts — the standard pre-training scrub pass.

    Order matters: SSNs are masked before phones (both are digit-dash
    shapes) and counts are taken on the ORIGINAL text. Pure
    regexp_replace/regexp_count — full scan speed, no Python.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_SSN, "<SSN>")
    redacted = F.regexp_replace(redacted, PII_PHONE, "<PHONE>")
    return df.select(
        "doc_id",
        redacted.alias("clean_text"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_SSN)).cast("bigint").alias("n_ssns"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("bigint").alias("n_phones"),
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split-v1",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    id hash — stable under re-runs, resharding, and corpus growth.

    Bucket = first 8 hex chars of md5(salt || id) as an int mod 100.
    md5 (not xxhash64) so the very same bucket function exists on any
    engine; the salt versions the split.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(100))
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by an integer tf-idf.

    idf_ppm = FLOOR(1e6 * N / df + 0.5) (no log — exact integer math is
    engine-portable; log differs in ulps across libm implementations),
    score = tf * idf_ppm. Two shuffles: term-count groupBy and the
    per-doc top-k window; the doc-frequency table is broadcast back.
    N (the corpus size) is folded INTO the plan as a scalar subquery
    (``DataFrame.scalar()``) — one query, no separate driver-blocking
    df.count() scan of the corpus.
    """
    from pyspark.sql import Window

    n_docs = df.groupBy().agg(F.count(F.lit(1)).cast("double")).scalar()
    terms = explode_computed(df, words(F.col(text_col)), "term").filter(
        F.length("term") >= 3
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.floor(F.lit(1000000.0) * n_docs / F.col("df") + F.lit(0.5)).cast(
        "bigint"
    )
    scored = tf.join(F.broadcast(dfreq.withColumn("idf_ppm", idf)), "term").withColumn(
        "score", F.col("tf") * F.col("idf_ppm")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


def repetition_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc repetition signal: share of the most frequent token
    bigram among all bigrams (ppm). High values flag boilerplate /
    degenerate generations. One explode + one groupBy."""
    docs = df.select("doc_id", words(F.col(text_col)).alias("__w")).filter(
        F.size("__w") >= 2
    )
    big = explode_computed(docs, token_bigrams(F.col("__w")), "bg")
    per = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.max("c").alias("max_bg"), F.sum("c").alias("n_bg")
    )
    rep = F.floor(
        F.col("max_bg").cast("double") * 1000000.0 / F.col("n_bg") + F.lit(0.5)
    ).cast("bigint")
    return agg.select("doc_id", "max_bg", "n_bg", rep.alias("rep_ppm"))


def compression_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """zlib compression ratio per document (ppm) — the classic
    redundancy/boilerplate signal (highly compressible ≈ repetitive).

    This is the ONE text op that genuinely needs Python (no codec in
    SQL), so it is an Arrow-batched ``pandas_udf`` — vectorized
    transfer, one Python call per batch, never per row.
    """
    from census_asc5_data_pipeline_spark.operators._udfs import zlib_ratio_ppm

    return df.select(
        "doc_id",
        F.length(text_col).cast("bigint").alias("n_chars_txt"),
        zlib_ratio_ppm()(F.col(text_col)).alias("compress_ppm"),
    )


def boilerplate_segments(
    df: DataFrame, text_col: str = "text", seg_tokens: int = 8, min_docs: int = 2
) -> DataFrame:
    """Segment-level (C4-style line-level) dedup signal: fixed
    ``seg_tokens``-token chunks that recur across ≥ ``min_docs``
    distinct documents — the removal list for boilerplate stripping.

    Scale shape: explode distinct segments per doc (one narrow shuffle
    on the segment string), count distinct docs per segment with
    map-side partial aggregation. Never pairs documents.
    """
    w = words(F.col(text_col))
    n_segs = F.floor(F.size(w) / F.lit(float(seg_tokens))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(
            " ", F.slice(w, i * seg_tokens + 1, seg_tokens)
        ),
    )
    # posexplode_outer, not explode: the non-outer Generate clones the
    # whole segs expression into its implicit size>0 null-filter and
    # evaluates it twice per row (see shingle_postings)
    per_doc = (
        df.filter(F.size(words(F.col(text_col))) >= seg_tokens)
        .select("doc_id", F.array_distinct(segs).alias("__s"))
        .select("doc_id", F.posexplode_outer("__s").alias("__i", "segment"))
        .drop("__i")
    )
    return (
        per_doc.groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the share of its
    distinct token ``n``-grams that also occur in the benchmark set
    (ppm). Docs above a threshold get dropped from training data.

    The benchmark n-gram set is DISTINCT and broadcast (benchmarks are
    tiny next to the corpus); the corpus side is one explode + one
    groupBy — never a corpus×benchmark pair join.
    """
    # per-doc gram dedup happens IN-ROW (array_distinct) and the single
    # posexplode_outer avoids the non-outer Generate's cloned
    # null-filter double-eval (see shingle_postings) — so the corpus
    # side needs NO corpus-wide .distinct() shuffle at all
    def gram_rows(df):
        toks = df.select("doc_id", words(F.col(text_col)).alias("__w")).filter(
            F.size("__w") >= n
        )
        grams = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("__w", i, n)),
            )
        )
        return (
            toks.select("doc_id", grams.alias("__g"))
            .select("doc_id", F.posexplode_outer("__g").alias("__i", "gram"))
            .drop("__i")
        )

    bench = (
        gram_rows(benchmark).select("gram").distinct().withColumn("__hit", F.lit(1))
    )
    corp = gram_rows(corpus)
    joined = corp.join(F.broadcast(bench), "gram", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_hit"),
        F.floor(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("double")
            * 1000000.0
            / F.count(F.lit(1))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("contam_ppm"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Winnowing-style document fingerprint: min/max of the md5 hashes
    of the document's token-bigram shingles.

    md5 (not xxhash64) so the fingerprint is portable across engines;
    at scale the min/max fold happens map-side (partial aggregation),
    so the shuffle is one 2×32-byte row per document.
    """
    w = words(F.col(text_col))
    docs = df.withColumn("__w", w).filter(F.size("__w") >= 2)
    sh = explode_computed(
        docs, F.array_distinct(token_bigrams(F.col("__w"))), "shingle"
    )
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle"))).alias("fp_min"),
        F.max(F.md5(F.col("shingle"))).alias("fp_max"),
        F.count(F.lit(1)).alias("n_shingles"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Sliding token-window chunking — the standard prep step that turns
    variable-length documents into fixed-size training windows.

    Emits (doc_id, chunk_id, n_tokens, chunk_text): windows of
    ``chunk_tokens`` tokens every ``stride`` tokens (overlap =
    chunk_tokens - stride). Window starts run to n - chunk_tokens + 1,
    so only FULL windows are emitted, except that a document shorter
    than one window yields its single partial chunk (so no document is
    silently dropped). chunk_id = start // stride — deterministic,
    engine-portable, no window function needed.

    Scale shape: one narrow map + one generator per doc — output rows
    ≈ n_tokens/stride per doc, no shuffle at all; writers typically
    repartition by hash(doc_id, chunk_id) downstream.
    """
    toks = df.select("doc_id", words(F.col(text_col)).alias("__w")).filter(
        F.size("__w") >= 1
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("__w") - (chunk_tokens - 1), F.lit(1)),
        F.lit(stride),
    )
    return (
        toks.select("doc_id", "__w", F.explode(starts).alias("st"))
        .select(
            "doc_id",
            ((F.col("st") - 1) / stride).cast("int").alias("chunk_id"),
            F.size(F.slice("__w", F.col("st"), chunk_tokens))
            .cast("bigint")
            .alias("n_tokens"),
            F.concat_ws(" ", F.slice("__w", F.col("st"), chunk_tokens)).alias(
                "chunk_text"
            ),
        )
    )


def mixture_sample(
    df: DataFrame,
    rates_ppm: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_ppm: int = 1000000,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic per-source mixture sampling — the 'dataset mixture
    weights' step of corpus assembly (downsample web, keep books, ...).

    A doc is kept iff its salted-md5 bucket (ppm) < its source's rate.
    Same content-independent hash family as ``hash_split``: stable
    under re-runs and resharding, identically computable on any engine
    with md5 — no RNG state anywhere.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(1000000))
    rate = F.lit(default_ppm)
    for src, ppm in sorted(rates_ppm.items()):
        rate = F.when(F.col(source_col) == src, F.lit(ppm)).otherwise(rate)
    return df.withColumn("__bucket_ppm", bucket).withColumn(
        "keep", F.col("__bucket_ppm") < rate
    )


# Gopher quality-rule stopword probe (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", §A1.1: "contains at least 2 of the
# following English words" — the canonical 8-word list).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1),
    each emitted as its own verdict column plus the conjunction —
    the standard pre-training heuristic filter bundle.

    Rules (thresholds are the published ones, word count bounds scaled
    to this corpus's shorter synthetic docs):
    - word count within [min_words, max_words]
    - mean word length within [3, 10] characters
    - symbol-to-word ratio (# and "..." occurrences / words) <= 0.1
    - >= 80% of words contain at least one alphabetic character
    - >= 2 hits from the 8-word Gopher stopword probe

    All signals are integer counts; ratios compare cross-multiplied
    integers (no division), so verdicts are bit-portable to any SQL
    engine. One scan, pure ``F.*`` — full scan speed at 100 TB.
    """
    w = words(F.col(text_col))
    n_words = F.size(w).cast("bigint")
    # sum of token lengths via one fold — whitespace excluded exactly
    word_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_symbols = (
        F.regexp_count(F.col(text_col), F.lit(r"#"))
        + F.regexp_count(F.col(text_col), F.lit(r"\.\.\."))
    ).cast("bigint")
    n_alpha_words = F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).cast("bigint")
    n_stop_hits = count_in_set(w, GOPHER_STOPWORDS).cast("bigint")

    ok_words = (n_words >= 20) & (n_words <= 100000)
    # 3 <= word_chars/n_words <= 10 as integer cross-multiplication
    ok_awl = (word_chars >= 3 * n_words) & (word_chars <= 10 * n_words)
    ok_symbols = n_symbols * 10 <= n_words
    ok_alpha = n_alpha_words * 5 >= n_words * 4
    ok_stops = n_stop_hits >= 2
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        n_symbols.alias("n_symbols"),
        n_alpha_words.alias("n_alpha_words"),
        n_stop_hits.alias("n_stop_hits"),
        ok_words.alias("ok_words"),
        ok_awl.alias("ok_awl"),
        ok_symbols.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha"),
        ok_stops.alias("ok_stops"),
        (ok_words & ok_awl & ok_symbols & ok_alpha & ok_stops).alias("pass_gopher"),
    )


# Script ranges as explicit codepoint classes — RE2-safe (no \p{...}
# unicode properties, which java.util.regex and RE2 spell differently).
SCRIPT_PATTERNS = {
    "latin": "[A-Za-z]",
    "digit": "[0-9]",
    "cjk": "[一-鿿]",
    "cyrillic": "[Ѐ-ӿ]",
}


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document writing-script census: character counts per script
    class plus the dominant script (deterministic priority tiebreak
    latin > digit > cjk > cyrillic > other) — the multilingual-corpus
    routing signal (script, not language: a CJK doc routes to a CJK
    tokenizer regardless of which language it is).

    Counts come from ``regexp_count`` over explicit codepoint ranges —
    identical semantics in java.util.regex and RE2/DuckDB, one scan,
    no Python.
    """
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)).cast("bigint")
        for name, pat in SCRIPT_PATTERNS.items()
    }
    n_chars = F.length(t).cast("bigint")
    classified = sum(list(counts.values()), F.lit(0).cast("bigint"))
    other = (n_chars - classified).cast("bigint")
    best = F.greatest(*counts.values(), other)
    main = (
        F.when(best <= 0, F.lit("empty"))
        .when(counts["latin"] == best, "latin")
        .when(counts["digit"] == best, "digit")
        .when(counts["cjk"] == best, "cjk")
        .when(counts["cyrillic"] == best, "cyrillic")
        .otherwise("other")
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_txt"),
        *[counts[n].alias(f"n_{n}") for n in SCRIPT_PATTERNS],
        other.alias("n_other"),
        main.alias("main_script"),
    )


def dup_ngram_stats(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Within-document duplicated word-n-gram fraction (RefinedWeb /
    MassiveText-style repetition signal, the n-gram generalization of
    ``repetition_ratio``'s top-bigram share).

    dup_ppm = 1e6 · (# n-gram occurrences whose n-gram occurs >= 2
    times in the doc) / (total n-gram occurrences). Docs shorter than
    ``n`` words emit no row (no n-gram exists — same convention as the
    bigram operators).

    Scale shape: explode positions → two-level groupBy, both keyed on
    (doc_id[, gram]) — map-side combinable, shuffle rows bounded by
    distinct grams per doc, never corpus-wide state.
    """
    w = words(F.col(text_col))
    toks = df.select("doc_id", w.alias("__w")).filter(F.size("__w") >= n)
    idx = F.sequence(F.lit(1), F.size("__w") - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("__w"), i + j) for j in range(n)]
        ),
    )
    per_gram = (
        explode_computed(toks, gram, "gram")
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
            "dup_grams"
        ),
    )
    return agg.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("dup_grams").cast("bigint").alias("dup_grams"),
        F.floor(
            F.col("dup_grams").cast("double") * 1000000.0 / F.col("n_grams") + F.lit(0.5)
        )
        .cast("bigint")
        .alias("dup_ppm"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    ctx: int = 2048,
    shard: int = 1024,
) -> DataFrame:
    """Concat-and-split sequence packing: documents are concatenated in
    ``doc_id`` order into one global token stream and cut into
    fixed-``ctx`` training sequences; each document reports the packs
    it lands in. This is the standard GPT-style packing layout (no
    padding, documents may straddle pack boundaries).

    Scale shape: the global running token offset is computed as a
    TWO-LEVEL cumulative sum — an intra-shard window (partitioned by
    ``doc_id DIV shard``, fully parallel) plus per-shard offsets from a
    tiny shard-total aggregate. The only single-partition window runs
    over #shards rows (n/shard — e.g. 10⁶ rows for 10⁹ docs at the
    default, and ``shard`` scales up freely), never over the corpus: a
    naive ``Window.orderBy(doc_id)`` global cumsum would serialize the
    whole table through one task. The shard-offset table is broadcast
    back (one row per shard).
    """
    from pyspark.sql import Window

    n_tok = F.size(words(F.col(text_col))).cast("bigint")
    base = df.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.floor(F.col("doc_id") / F.lit(shard)).cast("bigint").alias("__shard"),
    )
    w_intra = (
        Window.partitionBy("__shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = base.withColumn("__cum", F.sum("n_tok").over(w_intra))
    shard_tot = base.groupBy("__shard").agg(F.sum("n_tok").alias("__tot"))
    w_shard = (
        Window.orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = shard_tot.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_shard), F.lit(0)).cast("bigint")
    ).select("__shard", "__off")
    out = intra.join(F.broadcast(offs), "__shard")
    tok_end = F.col("__off") + F.col("__cum")
    tok_start = tok_end - F.col("n_tok")
    return out.select(
        "doc_id",
        "n_tok",
        tok_start.alias("tok_start"),
        F.floor(tok_start / F.lit(ctx)).cast("bigint").alias("pack_first"),
        F.floor((tok_end - 1) / F.lit(ctx)).cast("bigint").alias("pack_last"),
        (
            F.floor((tok_end - 1) / F.lit(ctx)) - F.floor(tok_start / F.lit(ctx)) + 1
        ).cast("bigint").alias("n_packs"),
    )
