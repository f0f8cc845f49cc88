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
