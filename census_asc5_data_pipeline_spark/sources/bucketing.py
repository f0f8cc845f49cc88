"""Bucketed-table layout — the shuffle-free co-located join path.

At 100 TB the dominant cost of a fact⋈fact join (lineitem⋈orders on
orderkey) is shuffling both sides. Writing both tables bucketed (and
sorted) by the join key with the SAME bucket count lets Spark plan a
SortMergeJoin with NO Exchange on either side: each task zips bucket i
of A with bucket i of B straight off storage. One up-front bucketed
write amortizes over every subsequent join/aggregation on that key.

Datasource (non-Hive) bucketed tables: bucket id = Murmur3 hash of the
key pmod nbuckets, recorded in the table catalog; readers must keep
``spark.sql.sources.bucketing.enabled=true`` (default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table. ``path`` makes it external (tests use tmp dirs); sorting by
    the bucket key additionally removes the Sort from later merge
    joins."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cojoin_bucketed(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
    force_merge: bool = True,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with
    zero Exchange operators (assert via tests/test_bucketing.py).

    ``force_merge`` pins the SortMergeJoin strategy: fact⋈fact sides
    are far above any broadcast threshold in production, but small test
    inputs would otherwise broadcast and mask the bucketing."""
    left = spark.table(left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), key, how)
