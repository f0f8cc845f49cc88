"""End-to-end LLM training-corpus curation — the flagship composition.

One declarative plan: quality gate → exact dedup (content-hash
keep-first) → near-dup clustering (Jaccard pairs → connected
components, cluster-min keeper) → PII redaction → deterministic
train/val/test split. Catalyst sees the whole graph at once, so
filters push into the scan and each stage's shuffle feeds the next —
no materialization between stages.

Scale: the near-dup subgraph only ever contains quality+exact
survivors; clustering runs on PAIRS (tiny vs corpus); everything else
is one pass over the documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.functions import words
from census_asc5_data_pipeline_spark.operators import dedup as D
from census_asc5_data_pipeline_spark.operators import graph as G
from census_asc5_data_pipeline_spark.operators import text as TX


def curate(
    docs: DataFrame,
    min_chars: int = 100,
    min_words: int = 20,
    jaccard_ppm: int = 500000,
    df_cap: int = 4096,
) -> DataFrame:
    """Per-document curation verdict.

    Returns (doc_id, split, clean_len) for every KEPT document:
    quality-passing, first of its exact-content group, and its near-dup
    cluster's keeper (minimum surviving doc_id).
    """
    quality = docs.filter(
        (F.length("text") >= min_chars) & (F.size(words(F.col("text"))) >= min_words)
    )
    exact_keep = quality.groupBy(F.md5(F.col("text")).alias("__h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # Persist the quality+exact survivors: three downstream consumers
    # (shingle postings, the cluster node set, the kept-join) would each
    # otherwise re-scan the corpus and re-run the quality filter and the
    # exact-dedup aggregation. This is the canonical materialization
    # point of a curation pipeline — everything after it touches only
    # survivors or pair-sized data.
    survivors = quality.join(exact_keep.select("doc_id"), "doc_id").persist()
    # df_cap bounds the stop-shingle self-join blowup (one bigram shared
    # by k docs -> k² join rows); capped candidates are exactly
    # re-verified inside ngram_jaccard_pairs, so kept/dropped verdicts
    # are unchanged for any pair not composed purely of stop-shingles.
    pairs = D.ngram_jaccard_pairs(survivors, threshold_ppm=jaccard_ppm, df_cap=df_cap)
    clusters = G.dedup_clusters(survivors, pairs)
    keepers = clusters.filter(F.col("is_keeper")).select("doc_id")
    kept = survivors.join(keepers, "doc_id")
    redacted = TX.pii_redact(kept)
    split = TX.hash_split(
        redacted.select("doc_id", F.length("clean_text").alias("clean_len")),
        id_col="doc_id",
        salt="split-v1",
    )
    out = split.select("doc_id", "split", F.col("clean_len").cast("bigint"))
    # release contract: the persisted survivors frame + the pair
    # generator's postings (queries.unpersist_deps walks this)
    out._cached_deps = [survivors, *getattr(pairs, "_cached_deps", ())]  # type: ignore[attr-defined]
    return out


def curation_summary(docs: DataFrame, **kwargs) -> DataFrame:
    """Split-level rollup of the curation verdict (the dataset card)."""
    return (
        curate(docs, **kwargs)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("clean_len").alias("total_chars"),
        )
    )


def export_corpus(
    docs: DataFrame,
    out_dir: str,
    shards_per_split: int = 4,
    **kwargs,
) -> dict[str, int]:
    """Last mile of the curation pipeline: materialize the curated
    corpus as split-partitioned, sharded, compressed JSONL — the layout
    a training job consumes (``out_dir/split=train/part-*.json.gz``).

    The curation verdict joins back to the raw text (only KEPT docs are
    rewritten), writes partition by ``split`` so a trainer reads one
    directory per split with no filtering scan, and repartitions to a
    fixed shard count per split so shard sizes are stable regardless of
    upstream partitioning (downstream dataloaders shard by file). At
    scale ``shards_per_split`` is sized to target file sizes (the same
    small-files discipline as ``sinks.compact_parquet``).

    Returns {split: n_docs} read back from the written dataset — the
    write is verified, not assumed.
    """
    from pyspark.sql import functions as F

    verdict = curate(docs, **kwargs)
    kept = verdict.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", "split", "text", "clean_len"
    )
    (
        kept.repartition(shards_per_split, F.col("doc_id"))
        .write.mode("overwrite")
        .partitionBy("split")
        .option("compression", "gzip")
        .json(out_dir)
    )
    spark = docs.sparkSession
    back = spark.read.json(out_dir)
    return {
        r.split: r.n
        for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
