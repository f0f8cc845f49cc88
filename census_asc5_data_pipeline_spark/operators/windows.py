"""Event-time operators over the ``events`` table (batch forms).

Streaming twins live in ``census_asc5_data_pipeline_spark.streaming``.
All timestamps are emitted as epoch-millis BIGINT so results are
engine-portable (no timestamp-rendering ambiguity in oracle hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MS = 1000


def tumbling_agg(
    df: DataFrame, ts_col: str, duration: str, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """Tumbling event-time window aggregate (epoch-aligned, same
    semantics as DuckDB ``time_bucket``)."""
    win = F.window(F.col(ts_col), duration)
    out = (
        df.groupBy(win.alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("window_start_ms", F.unix_millis(F.col("w.start")))
        .drop("w")
    )
    return out


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-and-island sessionization: one shuffle on the user key, all
    window functions — no per-group Python, scales to any user count.

    A new session starts when the gap from the previous event is
    strictly greater than ``gap_minutes``.
    """
    ts_ms = F.unix_millis(F.col(ts_col))
    # Order on epoch-millis (not the raw timestamp) + an id tiebreak so
    # the island assignment is a total order portable across engines.
    order = [ts_ms] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_ms = gap_minutes * 60 * MS
    is_new = (
        F.when(F.lag(ts_ms).over(w).isNull(), 1)
        .when(ts_ms - F.lag(ts_ms).over(w) > gap_ms, 1)
        .otherwise(0)
    )
    with_sess = df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w).cast("bigint")
    )
    return (
        with_sess.groupBy(F.col(user_col), F.col("session_id"))
        .agg(
            F.min(ts_ms).alias("session_start_ms"),
            F.max(ts_ms).alias("session_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def gap_fill_daily(
    df: DataFrame, key_col: str, ts_ms: Column, value: Column | None = None
) -> DataFrame:
    """Time-series resample: per-key daily counts with missing days
    densified to explicit zero rows (charting / feature pipelines need
    the gaps).

    Scale shape: the spine is built per key from its own [min_day,
    max_day] span (``sequence`` + ``explode``) — output is bounded by
    sum-of-spans, never keys × global-calendar; the fill join is an
    equi-join on (key, day) against the already-aggregated daily table,
    so raw events are touched exactly once.
    """
    day = F.floor(ts_ms / F.lit(86400000.0)).cast("bigint")
    daily = (
        df.select(F.col(key_col), day.alias("day"))
        if value is None
        else df.select(F.col(key_col), day.alias("day"), value.alias("__v"))
    )
    agg_exprs = [F.count(F.lit(1)).alias("n_events")] + (
        [F.sum("__v").alias("total_value")] if value is not None else []
    )
    daily = daily.groupBy(key_col, "day").agg(*agg_exprs)
    spine = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            key_col, F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
        )
    )
    out = spine.join(daily, [key_col, "day"], "left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint")
    )
    if value is not None:
        out = out.withColumn(
            "total_value", F.coalesce(F.col("total_value"), F.lit(0)).cast("bigint")
        )
    return out


def keep_first_per_key(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """CDC-style dedup: earliest row per key under a deterministic total
    order. Streaming twin: ``dropDuplicatesWithinWatermark``."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
