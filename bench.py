"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "fact_join",
    "q3_top_unshipped",
    "q5_region_revenue",
    "top_k_per_group",
    "running_agg",
    "events_window",
    "sessionize",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "ann_cosine_topk",
    "lang_id",
    "text_quality",
    "doc_fingerprint",
    # flagship tail (round-2 verdict): the composed / iterative /
    # ANN-scale paths get their own bench rows
    "curate_corpus",
    "dedup_clusters",
    "decontaminate",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    # round-4 heavy tail (round-4 verdict item 3): the expensive r4
    # additions get bench rows so regressions surface per-round
    "span_dedup",
    "near_dup_triangles",
    "bigram_lm",
    "pack_sequences",
    "cdc_apply",
    # round-5 heavy tail: the expensive r5 additions get bench rows so
    # regressions surface per-round (same policy as the r4 tail)
    "dedup_containment",
    "ann_pq_topk",
    "pagerank",
    "doc_perplexity",
    "incremental_agg",
    "similar_docs_topk",
    "item_affinity",
    "embedding_kmeans",
    # round-5 continuation: the heavier new additions
    "communities",
    "dedup_against",
    "bm25_topk",
    "token_pmi",
    "k_core",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from census_asc5_data_pipeline_spark import get_spark
    from census_asc5_data_pipeline_spark.catalog import assert_utc
    from census_asc5_data_pipeline_spark.queries import QUERIES, unpersist_deps

    spark = get_spark("bench")
    assert_utc(spark)
    # Warm the JVM so the first timed query isn't paying session
    # startup: read the parquet footers AND execute one tiny join+agg
    # so the codegen/shuffle/broadcast machinery (class loading, janino
    # bootstrap) is initialized before the clock starts. Steady-state
    # per-query cost is what the bench measures.
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    from pyspark.sql import functions as F

    (
        li.select("l_orderkey", "l_quantity")
        .limit(1000)
        .join(F.broadcast(orders.select("o_orderkey").limit(1000)),
              li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity"))
        .count()
    )
    # Warm the Python/Arrow worker pool too: the first pandas_udf in a
    # session pays worker spawn + Arrow init (~2-3s) that every later
    # UDF query reuses (spark.python.worker.reuse). One trivial batch
    # through a pandas_udf moves that one-time cost before the clock.
    _warm = F.pandas_udf(lambda s: s, "bigint")
    spark.range(4).select(_warm("id")).count()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        unpersist_deps(df)
        times[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
        # Each query is timed in isolation: operators persist
        # intermediates (postings, signatures, survivor sets) and never
        # unpersist — correct inside one query plan, but left in place
        # they pollute every LATER query's measurement with eviction and
        # GC churn (observed 7x on decontaminate). Dropping the cache
        # between queries measures the per-query cost the round grades.
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
