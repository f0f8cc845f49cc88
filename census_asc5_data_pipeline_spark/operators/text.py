"""Text-analysis operators for training-data pipelines.

All JVM-side (split/filter/transform/regexp) — no Python in the hot
path, so these run at full scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.functions import count_in_set, token_bigrams, words

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


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count
    (letters-run | digit-run | single symbol)."""
    ws = F.size(words(F.col(text_col))).cast("bigint")
    bpe = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).cast("bigint")
    return df.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
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
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(token_bigrams(F.col("__w")))).alias("shingle")
    )
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle"))).alias("fp_min"),
        F.max(F.md5(F.col("shingle"))).alias("fp_max"),
        F.count(F.lit(1)).alias("n_shingles"),
    )
