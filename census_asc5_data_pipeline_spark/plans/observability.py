"""Pipeline observability via ``DataFrame.observe`` — quality counters
collected as a side effect of the job's OWN action, not a second scan.

The reference pipeline had no metrics at all (its verification was a
printed row count, report.md's manual checks); a 100 TB pipeline can't
afford the alternative either: a separate ``df.count()`` +
``df.filter(col.isNull()).count()`` pass re-reads the table per metric.
``observe`` attaches aggregates to the plan itself — Spark folds them
into the action already running, so null-rate/rowcount monitoring is
free at any scale, and works identically under streaming (metrics per
micro-batch via StreamingQueryListener).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame, cols: list[str], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count + distinct-ish metrics
    to ``df``'s plan. Returns the observed frame and the Observation;
    read ``obs.get`` AFTER the first action on the returned frame.

    Only fully-aggregatable expressions are legal in ``observe``
    (they run as an AggregatingAccumulator alongside the action), so
    the metric set sticks to count/sum/min/max — approx distinct via
    HLL would need the sketch aggregate, which observe rejects.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def observed_bounds(
    df: DataFrame, col: str, name: str = "bounds"
) -> tuple[DataFrame, Observation]:
    """Min/max watermark-style bounds of a column, free with the action
    (e.g. ingest freshness: min/max event time of the batch written)."""
    obs = Observation(name)
    return (
        df.observe(obs, F.min(col).alias("lo"), F.max(col).alias("hi")),
        obs,
    )
