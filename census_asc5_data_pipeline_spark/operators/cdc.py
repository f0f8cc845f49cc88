"""CDC / slowly-changing-dimension maintenance — batch MERGE shapes.

Spark has no MERGE INTO against plain parquet (that's a table-format
feature), so the engine expresses upserts as full-outer joins and SCD2
history as window functions — both single-shuffle-per-key, no driver
loops, the standard warehouse-maintenance shapes at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd1_upsert(dim: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Type-1 upsert: updates overwrite matching keys, new keys insert,
    unmatched dim rows persist. One full-outer join on the key.

    Matched keys take the update row's payload VERBATIM — including
    explicit NULLs — per MERGE ... WHEN MATCHED THEN UPDATE SET
    semantics. Selection is driven by a matched flag from the update
    side, not per-column coalesce: coalesce would silently keep the
    stale dim value whenever an update intentionally nulls a column.

    Both inputs must share the schema (key + payload columns).
    """
    payload = [c for c in dim.columns if c != key]
    u = updates.select(
        key,
        F.lit(True).alias("__matched"),
        *[F.col(c).alias(f"__u_{c}") for c in payload],
    )
    out = dim.join(u, key, "full_outer")
    for c in payload:
        out = out.withColumn(
            c,
            F.when(F.col("__matched").isNotNull(), F.col(f"__u_{c}")).otherwise(
                F.col(c)
            ),
        )
    return out.select(key, *payload)


def scd2_from_snapshots(
    snapshots: DataFrame,
    key: str,
    version: str,
    payload_cols: list[str],
) -> DataFrame:
    """Type-2 history from periodic snapshots: per key, collapse
    consecutive versions into validity ranges [valid_from, valid_to)
    with an ``is_current`` flag; only CHANGED payloads open a new row
    (gap-and-island on payload equality — one shuffle on the key).
    """
    w = Window.partitionBy(key).orderBy(version)
    changed = (
        sum(
            [
                F.when(
                    ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)), 1
                ).otherwise(0)
                for c in payload_cols
            ],
            F.when(F.lag(F.col(version)).over(w).isNull(), 1).otherwise(0),
        )
        > 0
    )
    grp = F.sum(F.when(changed, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    collapsed = (
        snapshots.withColumn("__grp", grp)
        .groupBy(key, "__grp", *payload_cols)
        .agg(F.min(version).alias("valid_from"))
    )
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return (
        collapsed.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, *payload_cols, "valid_from", "valid_to", "is_current")
    )


def cdc_apply(
    snapshot: DataFrame,
    changelog: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an insert/update/delete changelog to a snapshot — the
    table-format MERGE a CDC consumer runs (Debezium-style op streams).

    Per key, the HIGHEST-``seq_col`` changelog row wins (one window
    shuffle on the key); 'D' removes the key, 'I'/'U' upsert the
    payload verbatim (explicit NULLs included — same matched-flag
    discipline as ``scd1_upsert``). Keys untouched by the changelog
    pass through. One window + one full-outer join, both keyed
    shuffles — no driver state at any scale.

    ``seq_col`` must be unique per key (a CDC stream's LSN/offset is);
    with duplicate (key, seq) pairs the winner among the tied rows is
    partition-order-dependent.
    """
    payload = [c for c in snapshot.columns if c != key]
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            key,
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__u_{c}") for c in payload],
        )
    )
    out = snapshot.join(latest, key, "full_outer").filter(
        F.col("__op").isNull() | (F.col("__op") != "D")
    )
    for c in payload:
        out = out.withColumn(
            c,
            F.when(F.col("__op").isNotNull(), F.col(f"__u_{c}")).otherwise(
                F.col(c)
            ),
        )
    # a 'D' for an absent key must not resurrect it as an all-NULL row
    return out.select(key, *payload)


def incremental_agg(
    base_agg: DataFrame,
    snapshot: DataFrame,
    changelog: DataFrame,
    key: str,
    group_col: str,
    value_col: str,
    count_col: str,
    sum_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Incrementally maintain a (count, sum) materialized aggregate
    under a CDC changelog — classic incremental-view-maintenance delta
    algebra, instead of re-aggregating the fact table.

    ``base_agg`` is the materialized ``group_col -> (count_col,
    sum_col)`` over ``snapshot`` — both named explicitly because a
    positional guess would silently swap same-typed count/sum columns. For each changed key the net effect of the batch
    is: retract the key's OLD (group, value) contribution if the key
    existed in the snapshot, and insert the NEW contribution from its
    highest-``seq_col`` op unless that op is a delete — exactly
    ``cdc_apply``'s winner semantics, so the maintained aggregate
    equals a full re-aggregation of ``cdc_apply``'s output (which is
    what the DuckDB oracle checks). Groups whose count reaches zero
    drop out.

    Scale shape: the delta side touches ONLY changed keys (semi-join
    against the changelog's key set) and shuffles |touched groups|
    rows into the merge; ``base_agg`` streams through one full-outer
    join keyed on the group. The fact table is never rescanned beyond
    the old-image lookup, which at 100 TB is the entire point of
    maintaining the view incrementally.
    """
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            key,
            F.col(op_col).alias("__op"),
            F.col(group_col).alias("__g_new"),
            F.col(value_col).alias("__v_new"),
        )
    )
    # old images: only keys the batch touched, straight from the snapshot
    old = snapshot.select(key, group_col, value_col).join(
        latest.select(key), key, "left_semi"
    )
    retract = old.select(
        F.col(group_col).alias("__g"),
        F.lit(-1).cast("bigint").alias("__dn"),
        (-F.col(value_col)).cast("bigint").alias("__dv"),
    )
    insert = latest.filter(F.col("__op") != "D").select(
        F.col("__g_new").alias("__g"),
        F.lit(1).cast("bigint").alias("__dn"),
        F.col("__v_new").cast("bigint").alias("__dv"),
    )
    deltas = (
        retract.unionByName(insert)
        .groupBy("__g")
        .agg(F.sum("__dn").alias("__dn"), F.sum("__dv").alias("__dv"))
    )
    missing = {count_col, sum_col} - set(base_agg.columns)
    if missing:
        raise ValueError(f"incremental_agg: base_agg lacks columns {missing}")
    n_col, s_col = count_col, sum_col
    merged = base_agg.join(
        deltas, base_agg[group_col] == deltas["__g"], "full_outer"
    )
    return (
        merged.select(
            F.coalesce(base_agg[group_col], F.col("__g")).alias(group_col),
            (
                F.coalesce(base_agg[n_col], F.lit(0))
                + F.coalesce(F.col("__dn"), F.lit(0))
            )
            .cast("bigint")
            .alias(n_col),
            (
                F.coalesce(base_agg[s_col], F.lit(0))
                + F.coalesce(F.col("__dv"), F.lit(0))
            )
            .cast("bigint")
            .alias(s_col),
        )
        .filter(F.col(n_col) > 0)
    )
