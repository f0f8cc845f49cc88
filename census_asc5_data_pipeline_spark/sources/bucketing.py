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


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of up to 4 numeric columns, as one
    Column expression — sort-by this key before writing and parquet
    row-group min/max stats become selective on EVERY interleaved
    column at once (multi-dimensional data skipping), where a plain
    sort only skips on its leading column.

    Columns must be pre-scaled to [0, 2**bits) integers (use ntile or
    epoch-truncation upstream); values are clamped defensively.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    # bit positions must stay inside a signed 64-bit long: JVM shiftleft
    # masks the shift amount mod 64, so overflow would silently wrap
    # high bits onto low positions instead of erroring
    if n * bits > 63:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} bit positions > 63"
        )
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            col = F.col(c) if isinstance(c, str) else c
            clamped = F.least(
                F.greatest(col.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1)
            )
            bit = F.shiftright(clamped, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + i)
            )
    return key


def zorder_cluster(df: DataFrame, zcols: list[str], n_files: int) -> DataFrame:
    """Cluster ``df`` for a compaction rewrite: min/max-scale each
    numeric ``zcols`` column into a bit lane, Morton-interleave
    (:func:`zorder_key`), then range-partition into ``n_files`` and
    sort within partitions — each output file covers a compact
    hyper-rectangle of the key space so parquet zone maps skip on all
    the named columns at once. Shared by ``optimize_delta(zorder_by=)``
    and ``rewrite_data_files(zorder_by=)`` (round-11). One extra
    min/max agg job over the files being rewritten — metadata-cheap
    next to the rewrite itself."""
    from pyspark.sql import functions as F

    bits = min(16, 63 // len(zcols))
    stats = df.agg(
        *(
            [F.min(c).alias(f"__mn{i}") for i, c in enumerate(zcols)]
            + [F.max(c).alias(f"__mx{i}") for i, c in enumerate(zcols)]
        )
    ).first()
    lanes = []
    for i, c in enumerate(zcols):
        mn, mx = stats[f"__mn{i}"], stats[f"__mx{i}"]
        if mn is None or mx is None or mx == mn:
            lanes.append(F.lit(0).cast("bigint"))
        else:
            span = float(mx) - float(mn)
            lanes.append(
                F.floor(
                    (F.col(c).cast("double") - float(mn))
                    / span
                    * ((1 << bits) - 1)
                ).cast("bigint")
            )
    return (
        df.withColumn("__zk", zorder_key(lanes, bits))
        .repartitionByRange(int(n_files), "__zk")
        .sortWithinPartitions("__zk")
        .drop("__zk")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Sort-by-Z-order write: range-partition + sort on the interleaved
    key so row groups cover compact hyper-rectangles of the key space.

    ``n_files`` defaults to the session's shuffle width — a plan-level
    setting, not the input's physical partition count (reading that
    off the RDD handle forces RDD-conversion machinery for what is
    plan metadata; the DataFrame API never needs it here)."""
    if n_files is None:
        n_files = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    out = df.withColumn("__z", zorder_key(zcols, bits))
    out = out.repartitionByRange(max(n_files, 1), "__z")
    out.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


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
