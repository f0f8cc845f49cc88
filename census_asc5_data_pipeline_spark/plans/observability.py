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


def explain_summary(df: DataFrame) -> dict:
    """Compact, machine-readable physical-plan report — the five
    numbers a user tunes for at 100 TB, without reading a 300-line
    explain: shuffle Exchanges, broadcast vs sort-merge joins,
    whole-stage-codegen span count, and per-scan pushdown evidence
    (PushedFilters / ReadSchema column count per parquet scan). Built
    on the same formatted-explain text the plan-shape test suite pins,
    so the numbers here and the CI budgets can never diverge in
    counting convention.

    Driver-side string parsing of an already-built plan — zero jobs
    run; safe to call on any DataFrame before deciding to execute it.
    """
    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    lines = plan.splitlines()
    n_exchange = sum(
        1
        for l in lines
        if l.lstrip().startswith("Exchange (") or "- Exchange (" in l
    )
    scans = []
    for i, l in enumerate(lines):
        if l.startswith("(") and "Scan parquet" in l:
            entry = {"scan": l.strip(), "pushed_filters": 0, "read_cols": 0}
            for m in lines[i : i + 12]:
                m = m.strip()
                if m.startswith("PushedFilters:"):
                    body = m.split(":", 1)[1].strip()
                    entry["pushed_filters"] = (
                        0 if body in ("[]", "") else body.count(",") + 1
                    )
                if m.startswith("ReadSchema:"):
                    entry["read_cols"] = m.count(":") - 1
            scans.append(entry)
    import re as _re

    def _detail_nodes(name: str) -> int:
        # formatted explain prints each node once as a detail header
        # "(<id>) <NodeName>" — count those, never the tree lines
        # (which carry build-side/join-type words before the id)
        return sum(
            1
            for l in lines
            if _re.match(rf"^\(\d+\) {name}(\s|$)", l.strip())
        )

    return {
        "n_exchanges": n_exchange,
        "n_broadcast_hash_joins": _detail_nodes("BroadcastHashJoin"),
        "n_sort_merge_joins": _detail_nodes("SortMergeJoin"),
        "n_codegen_spans": len(
            set(_re.findall(r"\[codegen id : (\d+)\]", plan))
        ),
        "scans": scans,
    }
