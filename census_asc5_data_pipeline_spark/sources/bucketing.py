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


#: widest UTF-8 prefix that still fits a SIGNED 64-bit integer as a
#: big-endian value: 7 bytes = 56 bits
_ZORDER_STR_PREFIX_BYTES = 7


def _zorder_str_int(s: str | bytes | None, skip: int) -> int:
    """Big-endian integer of ``s``'s UTF-8 bytes after dropping the
    first ``skip`` (the columns' longest common prefix), truncated to
    :data:`_ZORDER_STR_PREFIX_BYTES` and zero-padded — the same
    monotone string→int map the Column expression below computes, for
    deriving the scaling bounds from the min/max STRINGS driver-side
    (one stats job total, no second pass over the converted values)."""
    if s is None:
        return 0
    b = (s if isinstance(s, bytes) else str(s).encode("utf-8"))[skip:]
    b = b[:_ZORDER_STR_PREFIX_BYTES]
    return int.from_bytes(
        b + b"\x00" * (_ZORDER_STR_PREFIX_BYTES - len(b)), "big"
    )


def _zorder_numeric_expr(c: str, dtype):
    """``c`` as an order-preserving NUMERIC Column for a Morton lane.
    Numerics cast double; dates map to epoch DAYS and timestamps
    (both tz flavors) to epoch micros (r15 verdict #3 — real
    clustering keys are mostly identifiers and dates, a numeric-only
    kernel forces those tables back to unclustered compaction);
    booleans to 0/1. Strings are handled separately (the prefix map
    needs the min/max strings)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dtype, T.DateType):
        return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
    if isinstance(dtype, T.BooleanType):
        return F.col(c).cast("int").cast("double")
    return F.col(c).cast("double")


def zorder_lane_types(schema, zcols: list[str]) -> None:
    """Refuse (loudly, before any rewrite I/O) when a requested
    Z-order column's type has no order-preserving lane map."""
    from pyspark.sql import types as T

    by_name = {f.name: f for f in schema.fields}
    for c in zcols:
        if c not in by_name:
            raise ValueError(
                f"zorder_by column {c!r} is not a data column "
                f"(data columns: {sorted(by_name)})"
            )
        dt = by_name[c].dataType
        if not isinstance(
            dt,
            (T.NumericType, T.StringType, T.DateType,
             T.TimestampType, T.TimestampNTZType, T.BooleanType),
        ):
            raise NotImplementedError(
                f"zorder over {dt.simpleString()} is out of scope "
                "(numeric/string/date/timestamp/boolean columns only)"
            )


def zorder_cluster(df: DataFrame, zcols: list[str], n_files: int) -> DataFrame:
    """Cluster ``df`` for a compaction rewrite: min/max-scale each
    ``zcols`` column into a bit lane, Morton-interleave
    (:func:`zorder_key`), then range-partition into ``n_files`` and
    sort within partitions — each output file covers a compact
    hyper-rectangle of the key space so parquet zone maps skip on all
    the named columns at once. Shared by ``optimize_delta(zorder_by=)``
    and ``rewrite_data_files(zorder_by=)`` (round-11) and the liquid
    clustering OPTIMIZE path (round-16). One extra min/max agg job
    over the files being rewritten — metadata-cheap next to the
    rewrite itself.

    Lane maps by type: numerics cast double; dates/timestamps map to
    epoch days/seconds; STRINGS (round-16) map their UTF-8 bytes to a
    big-endian 7-byte integer AFTER stripping the column's longest
    common prefix — computed from the min/max strings of the same
    stats job, so shared key prefixes (``Customer#000…``) don't
    collapse every row into one lane value. The byte map is monotone
    w.r.t. the string sort order, so min/max scaling uses the
    converted bounds of the min/max strings directly."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    zorder_lane_types(df.schema, zcols)
    dtype_of = {f.name: f.dataType for f in df.schema.fields}
    bits = min(16, 63 // len(zcols))
    # ONE stats job: strings aggregate their RAW min/max (the lane
    # expression needs the longest-common-prefix, and the byte map is
    # monotone so the converted bounds derive from the bound strings
    # driver-side); every other type aggregates its CONVERTED
    # expression, so the driver never re-implements a tz-sensitive map
    aggs = []
    for i, c in enumerate(zcols):
        probe = (
            F.col(c)
            if isinstance(dtype_of[c], T.StringType)
            else _zorder_numeric_expr(c, dtype_of[c])
        )
        aggs += [
            F.min(probe).alias(f"__mn{i}"),
            F.max(probe).alias(f"__mx{i}"),
        ]
    stats = df.agg(*aggs).first()
    lanes = []
    for i, c in enumerate(zcols):
        mn, mx = stats[f"__mn{i}"], stats[f"__mx{i}"]
        if mn is None or mx is None or mx == mn:
            lanes.append(F.lit(0).cast("bigint"))
            continue
        if isinstance(dtype_of[c], T.StringType):
            mnb = str(mn).encode("utf-8")
            mxb = str(mx).encode("utf-8")
            lcp = 0
            while (
                lcp < len(mnb)
                and lcp < len(mxb)
                and mnb[lcp] == mxb[lcp]
            ):
                lcp += 1
            lo_f = float(_zorder_str_int(mn, lcp))
            hi_f = float(_zorder_str_int(mx, lcp))
            # hex() of the zero-padded prefix bytes, parsed base-16:
            # the same monotone map as _zorder_str_int, JVM-side
            raw = F.conv(
                F.hex(
                    F.rpad(
                        F.substring(
                            F.encode(F.col(c), "utf-8"),
                            lcp + 1,
                            _ZORDER_STR_PREFIX_BYTES,
                        ),
                        _ZORDER_STR_PREFIX_BYTES,
                        bytes([0]),
                    )
                ),
                16,
                10,
            ).cast("bigint")
            num = F.coalesce(raw, F.lit(0)).cast("double")
        else:
            num = _zorder_numeric_expr(c, dtype_of[c])
            lo_f, hi_f = float(mn), float(mx)
        if hi_f == lo_f:
            lanes.append(F.lit(0).cast("bigint"))
            continue
        lanes.append(
            F.floor(
                (num - lo_f) / (hi_f - lo_f) * ((1 << bits) - 1)
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
