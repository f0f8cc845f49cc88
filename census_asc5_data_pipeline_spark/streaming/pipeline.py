"""Structured Streaming twins of the batch event-time operators.

Each builder takes a streaming DataFrame (``spark.readStream``) and
returns the transformed streaming DataFrame; callers attach sinks.
Watermarks bound state on every stateful operator so the pipelines run
indefinitely at production scale. Local tests drive them with a file
source and ``processAllAvailable()`` against a memory sink.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-based event stream (the local stand-in for Kafka; swap
    ``format`` for kafka + the same downstream graph in production)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums with a watermark bounding state —
    the streaming twin of ``operators.windows.tumbling_agg``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum(F.col("value")) * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("sum_value_c_approx"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value_c_approx",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Keyed dedup within the watermark — the streaming twin of
    ``operators.windows.keep_first_per_key``."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful sessionizer: merge each micro-batch's events into
    the open session; emit + reset when the inactivity gap passes
    (event-time driven via timeout). Gap: 30 minutes."""
    gap_ms = 30 * 60 * 1000
    if state.hasTimedOut:
        start_ms, end_ms, n = state.get
        state.remove()
        yield pd.DataFrame(
            [[key[0], start_ms, end_ms, n]],
            columns=["user_id", "session_start_ms", "session_end_ms", "n_events"],
        )
        return

    ts_ms_all: list[int] = []
    for pdf in pdfs:
        # Normalize to ns first: under a us-resolution pandas/Arrow
        # path a bare .astype("int64") would be off by 1000x (round-4
        # advice) — same normalization as stream_rate_cap.
        ns = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
        ts_ms_all.extend((ns // 1_000_000).tolist())
    if not ts_ms_all:
        return
    # Re-sessionize the open session TOGETHER with the batch's events:
    # each event is a (t, t, 1) interval, the open session an
    # (start, end, n) interval (its internal gaps are <= gap by
    # invariant), and a standard sorted gap-fold merges them. A late
    # event within gap of the session start still extends it backward,
    # but an event more than gap BEFORE the open session now closes as
    # its own earlier session instead of being silently absorbed —
    # matching batch sessionize() and session_window semantics.
    intervals: list[tuple[int, int, int]] = [(t, t, 1) for t in sorted(ts_ms_all)]
    if state.exists:
        intervals.append(tuple(state.get))
        intervals.sort()
    closed: list[list[int]] = []
    start_ms, end_ms, n = intervals[0]
    for s, e, cnt in intervals[1:]:
        if s - end_ms > gap_ms:
            closed.append([key[0], start_ms, end_ms, n])
            start_ms, end_ms, n = s, e, cnt
        else:
            end_ms = max(end_ms, e)
            n += cnt
    state.update((start_ms, end_ms, n))
    state.setTimeoutTimestamp(end_ms + gap_ms)
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_ms", "session_end_ms", "n_events"],
        )


def stateful_sessionize(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState — sessions
    with a 30-minute inactivity gap, state bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def native_session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Built-in ``session_window`` sessionization (vs the custom
    ``applyInPandasWithState`` operator: JVM-side, no Python worker, but
    fixed merge semantics — window end = last event + gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts: each event lands in window/slide
    overlapping windows (state is that factor larger than tumbling —
    the watermark still bounds it)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
        )
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static join: per-micro-batch hash join against a static
    (broadcastable) dimension — no state, no watermark needed; the dim
    is re-resolved each batch so slowly-changing dims pick up updates."""
    return events.join(F.broadcast(dim), key, "left")


def enrich_as_of(
    events: DataFrame,
    dim_history: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Stream-static TEMPORAL join: enrich each event with the
    dimension version valid AT ITS EVENT TIME — ``[valid_from,
    valid_to)`` interval semantics over an SCD2 history (the streaming
    face of the batch ``scd2_from_snapshots`` + ``read_as_of`` pair).
    ``enrich_with_dim`` answers "what is this user NOW"; replayed or
    late events need "what was this user THEN", or a backfill rewrites
    history with today's attributes.

    Version resolution is a pure per-row predicate on the broadcast
    static side — no streaming state, no watermark, and late data is
    correct BY CONSTRUCTION rather than by state-retention tuning. An
    open current version (``valid_to IS NULL``) matches everything
    from its ``valid_from`` on; events before the key's first version
    (or unknown keys) keep NULL attributes under the left join."""
    cond = (
        (events[key] == dim_history[key])
        & (events[ts_col] >= dim_history[valid_from])
        & (
            dim_history[valid_to].isNull()
            | (events[ts_col] < dim_history[valid_to])
        )
    )
    return events.join(F.broadcast(dim_history), cond, "left").drop(
        dim_history[key]
    )


def purchase_attribution(
    events: DataFrame, watermark: str = "2 hours", attribution_window: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's views in the preceding hour. Both sides are watermarked and
    the join condition carries the time bound, so each side's state
    buffer is dropped once the watermark passes the interval."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {attribution_window}"))
    )
    return views.join(purchases, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        F.unix_millis("p_ts").alias("purchase_ms"),
        F.unix_millis("v_ts").alias("view_ms"),
    )


def write_idempotent_parquet(df: DataFrame, out_dir: str, checkpoint: str):
    """Exactly-once-style sink: foreachBatch writes each epoch to a
    batch-id-named directory, so replays overwrite instead of double-
    appending."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


RATE_CAP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)

RATE_CAP_STATE_SCHEMA = T.StructType([T.StructField("admitted", T.LongType())])


def stream_rate_cap(
    events: DataFrame, cap: int = 100, watermark: str = "2 hours"
) -> DataFrame:
    """Per-key admission quota — the streaming twin of the batch
    ``domain_cap`` query: each user admits at most ``cap`` events over
    the stream's lifetime, later arrivals are dropped. The canonical
    ingestion rate-limit / per-domain crawl-quota operator.

    Custom stateful via ``applyInPandasWithState``: state is ONE long
    per key (the admitted count), so state size is O(keys) regardless
    of throughput. Admission order inside a micro-batch is (ts,
    event_id) — deterministic under replay of the same batch
    boundaries; cross-batch order is arrival order, which is the
    contract a streaming quota means (first-come-first-admitted).
    """

    def _cap_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # no timeout configured, defensive only
            state.remove()
            return
        admitted = state.get[0] if state.exists else 0
        # Concatenate ALL of the group's batch chunks before sorting:
        # Arrow may deliver one group as several frames, and sorting
        # each chunk separately would admit in chunk order, breaking
        # the documented (ts, event_id) batch-determinism. Buffering is
        # bounded by the group's rows in one micro-batch (same contract
        # as the sessionizer above).
        frames = [pdf for pdf in pdfs if not pdf.empty]
        if frames and admitted < cap:
            batch = pd.concat(frames, ignore_index=True)
            # Resolution-independent ms derivation (round-4 advice):
            # normalize to datetime64[ns] before the integer cast so a
            # us-resolution Arrow batch can't skew the admission sort.
            ns = pd.to_datetime(batch["ts"]).astype("datetime64[ns]").astype("int64")
            batch = batch.assign(ts_ms=ns // 1_000_000)
            take = batch.sort_values(["ts_ms", "event_id"]).head(cap - admitted)
            admitted += len(take)
            yield take[["event_id", "user_id", "ts_ms", "event_type"]]
        state.update((admitted,))

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _cap_fn,
            outputStructType=RATE_CAP_OUT_SCHEMA,
            stateStructType=RATE_CAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def merge_cdc_stream(
    changelog: DataFrame, snapshot_dir: str, key: str, checkpoint: str
):
    """Streaming MERGE: apply each micro-batch of an I/U/D changelog
    stream onto a parquet snapshot via ``cdc_apply`` — the Structured
    Streaming twin of a Debezium-consumer MERGE INTO. foreachBatch
    resolves the current snapshot version, applies the batch, and
    commits the result as a NEW immutable version via
    ``sources.versioned.commit_version`` (manifest-pointer commit:
    the pointer file moves atomically only after the new version is
    fully written, and the previous versions are retained — so a
    concurrent reader never sees a mid-swap or missing snapshot, and
    a crash at ANY point is healed by ``recover`` at the next batch;
    round-4 advice replaced the old two-rename swap which had a
    nothing-at-the-path crash window).

    Restart semantics: the checkpoint replays the last uncommitted
    batch; cdc_apply is idempotent for a replayed batch (same latest
    op per key re-applied onto either pre- or post-commit snapshot
    yields the same table) as long as batch boundaries are stable.
    """
    from census_asc5_data_pipeline_spark.operators.cdc import cdc_apply
    from census_asc5_data_pipeline_spark.sources import versioned as V

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        V.recover(snapshot_dir)
        snap = V.read_current(spark, snapshot_dir)
        payload = [c for c in snap.columns]
        merged = cdc_apply(snap, batch_df, key).select(*payload)
        V.commit_version(merged, snapshot_dir)

    return (
        changelog.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


ZSCORE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z_milli", T.LongType()),
    ]
)

ZSCORE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def stream_zscore_anomalies(
    events: DataFrame,
    threshold_milli: int = 3000,
    min_history: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key streaming anomaly detector: emit events whose value is
    more than ``threshold_milli``/1000 standard deviations from the
    key's running mean — the canonical metrics-pipeline outlier
    operator (fraud spikes, sensor faults, ingestion glitches).

    Custom stateful via ``applyInPandasWithState`` with Welford's
    online algorithm: state is THREE numbers per key (count, mean,
    M2), so state size is O(keys) at any throughput and the update is
    numerically stable (naive sum/sumsq cancels catastrophically once
    mean^2 >> variance). Each event is scored against the statistics
    of all events that PRECEDED it in (ts, event_id) order — the
    prefix contract, replay-deterministic for stable batch boundaries
    (same discipline as stream_rate_cap); the first ``min_history``
    events per key only train.
    """

    def _z_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # no timeout configured, defensive only
            state.remove()
            return
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        frames = [pdf for pdf in pdfs if not pdf.empty]
        if not frames:
            state.update((n, mean, m2))
            return
        batch = pd.concat(frames, ignore_index=True)
        # Resolution-independent ms (same normalization as the
        # sessionizer and rate cap above).
        ns = pd.to_datetime(batch["ts"]).astype("datetime64[ns]").astype("int64")
        batch = batch.assign(ts_ms=ns // 1_000_000).sort_values(["ts_ms", "event_id"])
        out_rows = []
        for r in batch.itertuples():
            v = float(r.value)
            if n >= min_history and m2 > 0.0:
                sd = (m2 / n) ** 0.5
                z = (v - mean) / sd
                z_milli = int(z * 1000 + (0.5 if z >= 0 else -0.5))
                if abs(z_milli) >= threshold_milli:
                    out_rows.append(
                        (key[0], r.event_id, r.ts_ms, v, z_milli)
                    )
            # Welford update AFTER scoring: prefix semantics
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        state.update((n, mean, m2))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["user_id", "event_id", "ts_ms", "value", "z_milli"]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _z_fn,
            outputStructType=ZSCORE_OUT_SCHEMA,
            stateStructType=ZSCORE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


TOPK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("item", T.StringType()),
        T.StructField("count_lb", T.LongType()),
        T.StructField("decr", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("decr", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def stream_heavy_hitters(
    events: DataFrame,
    capacity: int = 8,
    nshards: int = 4,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming heavy hitters (frequent ``event_type`` values) with
    hard-bounded state via sharded Misra-Gries summaries — the
    streaming twin of the batch ``heavy_hitters`` sketch.

    Items shard by ``xxhash64(event_type) % nshards``, so EVERY
    occurrence of an item lands in exactly one shard and that shard's
    Misra-Gries bound applies to the item's global count:
    ``count_lb <= true <= count_lb + decr`` (``decr`` = the shard's
    total decrement rounds). State is ``capacity`` counters per shard —
    O(nshards·capacity) total regardless of throughput or key
    cardinality, which is the whole point versus a groupBy count whose
    state grows with distinct items. Shards also spread the update load
    across tasks (one hot item saturates at most one shard).

    Each batch appends the shard's full current summary tagged with the
    shard's monotone ``n_seen`` version; append-mode sinks accumulate
    history, so readers take the max-``n_seen`` snapshot per shard
    (tests/test_streaming.py does exactly that). Inside a batch events
    apply in (ts_ms, event_id) order — the same replay-deterministic
    prefix contract as the sessionizer / rate cap / z-score operators.
    """

    def _mg_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # no timeout configured, defensive only
            state.remove()
            return
        if state.exists:
            items, counts, decr, n_seen = state.get
            ctr = dict(zip(items, counts))
        else:
            ctr, decr, n_seen = {}, 0, 0
        frames = [pdf for pdf in pdfs if not pdf.empty]
        if not frames:
            state.update((list(ctr), list(ctr.values()), decr, n_seen))
            return
        batch = pd.concat(frames, ignore_index=True)
        ns = pd.to_datetime(batch["ts"]).astype("datetime64[ns]").astype("int64")
        batch = batch.assign(ts_ms=ns // 1_000_000).sort_values(
            ["ts_ms", "event_id"]
        )
        for e in batch["event_type"]:
            n_seen += 1
            if e in ctr:
                ctr[e] += 1
            elif len(ctr) < capacity:
                ctr[e] = 1
            else:
                # decrement round: the incoming item and every counter
                # each give up one unit (the classic MG step)
                decr += 1
                for it in list(ctr):
                    ctr[it] -= 1
                    if ctr[it] == 0:
                        del ctr[it]
        state.update((list(ctr), list(ctr.values()), decr, n_seen))
        if ctr:
            yield pd.DataFrame(
                [(key[0], it, c, decr, n_seen) for it, c in sorted(ctr.items())],
                columns=["shard", "item", "count_lb", "decr", "n_seen"],
            )

    ev = events.withWatermark("ts", watermark).withColumn(
        "shard", F.pmod(F.xxhash64("event_type"), F.lit(nshards)).cast("int")
    )
    return ev.groupBy("shard").applyInPandasWithState(
        _mg_fn,
        outputStructType=TOPK_OUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


WSAMPLE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

WSAMPLE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("scores", T.ArrayType(T.DoubleType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def stream_weighted_sample(
    events: DataFrame,
    k: int = 16,
    nshards: int = 4,
) -> DataFrame:
    """Streaming weighted sample without replacement — the
    bounded-state twin of the batch ``weighted_sample`` query, same
    A-ES reduction: each event gets the deterministic key
    ``score = -ln(u)/w`` (``u`` from a salted md5 of the event id,
    ``w = abs(value)+1``), and the weighted sample IS the k smallest
    scores. The score is computed IN-PLAN (JVM expressions) before the
    stateful operator; Python only maintains the per-shard reservoir.

    State is the k best (score, id) pairs per shard — O(nshards·k)
    regardless of throughput. Because A-ES top-k is a distributive
    aggregate, per-shard reservoirs lose nothing: the global top-k is
    exactly the top-k of the shard union, which readers take from the
    max-``n_seen`` snapshot per shard (the same versioned-emission
    contract as ``stream_heavy_hitters``). Determinism end to end: the
    md5 key makes the sample a pure function of the data, so a replay
    or a batch recomputation yields the identical sample — auditable
    subsampling on a stream.

    Deliberately NO watermark (unlike the other stateful operators): a
    watermark would silently drop late events before they could enter
    the reservoir, breaking the replay-equality guarantee above, and
    it buys nothing here — state is already hard-bounded at
    O(nshards·k) with NoTimeout, independent of event time.
    """

    def _ws_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # no timeout configured, defensive only
            state.remove()
            return
        if state.exists:
            ids, scores, n_seen = state.get
            pairs = list(zip(scores, ids))
        else:
            pairs, n_seen = [], 0
        frames = [pdf for pdf in pdfs if not pdf.empty]
        if not frames:
            state.update(
                ([i for _, i in pairs], [s for s, _ in pairs], n_seen)
            )
            return
        batch = pd.concat(frames, ignore_index=True)
        n_seen += len(batch)
        pairs.extend(zip(batch["score"], batch["event_id"]))
        pairs.sort()  # (score asc, id asc) — deterministic reservoir cut
        pairs = pairs[:k]
        state.update(([i for _, i in pairs], [s for s, _ in pairs], n_seen))
        yield pd.DataFrame(
            [(key[0], i, s, n_seen) for s, i in pairs],
            columns=["shard", "event_id", "score", "n_seen"],
        )

    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("sws-v1"), F.col("event_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    score = -F.log((u32 + 1) / F.lit(4294967296.0)) / (
        F.abs(F.col("value")) + F.lit(1.0)
    )
    ev = events.withColumn("score", score).withColumn(
        "shard", F.pmod(F.xxhash64("event_id"), F.lit(nshards)).cast("int")
    )
    return ev.groupBy("shard").applyInPandasWithState(
        _ws_fn,
        outputStructType=WSAMPLE_OUT_SCHEMA,
        stateStructType=WSAMPLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_distinct_sketch(
    events: DataFrame,
    table: str,
    checkpoint: str,
    value_col: str = "user_id",
):
    """Streaming distinct-count maintenance via mergeable HLL sketches
    — the streaming twin of the batch ``hll_rollup``: each micro-batch
    aggregates ITS OWN Datasketches sketch (``hll_sketch_agg``, fixed
    size regardless of batch rows), and the sink merges it with the
    stored sketch (``hll_union``) under the versioned-snapshot commit,
    so the running estimate is maintained in O(sketch-bytes) work per
    batch with no rescan of history and no per-key streaming state at
    all.

    Crash-safety falls out of the ALGEBRA, not bookkeeping: HLL union
    is idempotent over re-merged element sets, so a batch replayed
    after a crash (foreachBatch's at-least-once contract) unions the
    same registers again and the estimate is unchanged — the property
    tests/test_streaming.py pins by re-merging a batch on purpose.
    Readers take ``versioned.read_current`` and
    ``hll_sketch_estimate`` off the single stored row.
    """
    from census_asc5_data_pipeline_spark.sources import versioned

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # skip empty batches entirely: committing a version for zero
        # rows would churn the retention window for nothing
        if batch_df.isEmpty():
            return
        batch_sk = batch_df.groupBy().agg(
            F.expr(f"hll_sketch_agg({value_col})").alias("sk")
        )
        spark = batch_df.sparkSession
        try:
            stored = versioned.read_current(spark, table)
            merged = (
                stored.unionByName(batch_sk)
                .groupBy()
                .agg(F.expr("hll_union_agg(sk)").alias("sk"))
            )
        except FileNotFoundError:
            merged = batch_sk
        versioned.commit_version(merged, table)

    return (
        events.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )


def windowed_distinct_users(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Approximate distinct users per tumbling window — the streaming
    unique-visitors metric. ``approx_count_distinct`` keeps an
    HLL++-style fixed-size register set per (window, event_type) group
    instead of the unbounded user-id set an exact streaming distinct
    would need, and the watermark closes windows — state is
    O(open windows · sketch bytes), throughput-independent. The batch
    twin (the same aggregate over the static frame) pins per-window
    equality in tests/test_streaming.py: identical registers, so the
    stream and batch ESTIMATES match exactly, not just approximately.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "approx_users",
        )
    )


def kll_fold_batch(
    batch_df: DataFrame, epoch_id: int, table: str, value_col: str
) -> bool:
    """Fold one micro-batch into the stored KLL quantile sketch under
    an EPOCH FENCE; returns True iff the batch was applied. Kept
    module-level (not a closure) so the at-least-once replay contract
    is directly testable: call it twice with the same epoch_id and the
    second call must be a fenced no-op."""
    from census_asc5_data_pipeline_spark.sources import versioned

    if batch_df.isEmpty():
        return False
    spark = batch_df.sparkSession
    batch_sk = (
        batch_df.selectExpr(f"CAST({value_col} AS BIGINT) AS v")
        .groupBy()
        .agg(F.expr("kll_sketch_agg_bigint(v)").alias("sk"))
        .select(
            "sk", F.lit(int(epoch_id)).cast("bigint").alias("last_epoch")
        )
    )
    try:
        stored = versioned.read_current(spark, table)
        # 1-row metadata fence read, not a data-scale collect
        fence = stored.select("last_epoch").first()
        if fence is not None and fence[0] >= int(epoch_id):
            return False
        merged = (
            stored.unionByName(batch_sk)
            .groupBy()
            .agg(
                F.expr("kll_merge_agg_bigint(sk)").alias("sk"),
                F.max("last_epoch").cast("bigint").alias("last_epoch"),
            )
        )
    except FileNotFoundError:
        merged = batch_sk
    versioned.commit_version(merged, table)
    return True


def stream_quantile_sketch(
    events: DataFrame,
    table: str,
    checkpoint: str,
    value_col: str = "value",
):
    """Streaming quantile maintenance via mergeable KLL sketches — the
    quantile member of the streaming sketch family (distinct = HLL,
    frequency = Misra-Gries, now rank/quantile = KLL): each micro-batch
    aggregates its own fixed-size ``kll_sketch_agg_bigint`` and the
    sink merges it into the stored sketch with ``kll_merge_agg_bigint``
    under the versioned-snapshot commit, so running p50/p90/p99 are
    maintained in O(sketch-bytes) work per batch with no rescan of
    history and no per-key streaming state.

    Unlike HLL union (idempotent over re-merged element SETS), KLL
    merge is weight-additive: re-merging a replayed batch would
    double-count its items. foreachBatch's at-least-once contract is
    therefore hardened to exactly-once by an EPOCH FENCE — the stored
    row carries ``last_epoch`` and a replay with epoch_id <=
    last_epoch is a no-op (valid because epochs commit in order within
    one query). tests/test_streaming.py replays a batch on purpose and
    pins both the fence and sketch-vs-exact quantile agreement.
    Readers take :func:`read_quantiles` off the single stored row.
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        kll_fold_batch(batch_df, epoch_id, table, value_col)

    return (
        events.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )


def read_quantiles(
    spark: SparkSession, table: str, qs: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Serve quantiles off the maintained KLL snapshot: one stored row,
    O(sketch) work, no history rescan."""
    from census_asc5_data_pipeline_spark.sources import versioned

    exprs = [
        "CAST(kll_sketch_get_quantile_bigint(sk, CAST("
        f"{q!r} AS DOUBLE)) AS BIGINT) AS p{int(round(q * 100))}"
        for q in qs
    ]
    return versioned.read_current(spark, table).selectExpr(
        "CAST(kll_sketch_get_n_bigint(sk) AS BIGINT) AS n",
        "last_epoch",
        *exprs,
    )


def stream_windowed_topk(
    events: DataFrame,
    out_dir: str,
    checkpoint: str,
    k: int = 2,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Per-window top-k event types — the streaming leaderboard.

    Built on the append-mode windowed aggregate: a window's grouped
    rows are all emitted in the trigger where the watermark passes its
    end, so ranking WITHIN the foreachBatch output batch sees every
    group of each closed window exactly once — no cross-batch merge
    state needed (state stays the windowed aggregate's own, watermark-
    bounded). The rank window partitions by window_start (each
    partition is |event types| rows), ties break lexicographically,
    and each batch's top-k rows land in their own overwrite-on-replay
    ``epoch=N`` partition, so at-least-once replays are idempotent.
    READ CONTRACT: ``spark.read.parquet(out_dir)`` returns
    (window_start_ms, event_type, n, rn) PLUS the ``epoch`` partition
    column — consumers select by name.
    """
    counts = windowed_counts(events, window, watermark).select(
        "window_start_ms", "event_type", "n"
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy("window_start_ms").orderBy(
            F.col("n").desc(), F.col("event_type")
        )
        top = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("window_start_ms", "event_type", "n", "rn")
        )
        # foreachBatch is at-least-once: an epoch replayed after a
        # crash-before-checkpoint-commit must not duplicate its rows.
        # Epoch-partitioned overwrite (the write_idempotent_parquet
        # discipline) makes the replay rewrite the same partition, and
        # the "epoch=" layout means a plain spark.read.parquet(out_dir)
        # traverses every batch via partition discovery.
        top.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .start()
    )


def _psi_score(
    obs: DataFrame, key_col: str, cat_col: str, base: DataFrame
) -> DataFrame:
    """Shared PSI kernel for the drift sinks: per-``key_col`` group,
    score the observed ``cat_col`` counts (column ``n``) against the
    fixed baseline frame (``cat_col``, ``base_ppm``). Category axis =
    baseline UNION observed (a category the baseline never saw still
    contributes drift; a baseline category absent from a group drifts
    through its clamp); both proportions clamp at 1 ppm (ln never
    sees 0); FLOOR-scaled nano terms sum to an exact integer.
    Metadata-scale: (groups × categories) grid. Returns (key_col,
    n_events, psi_nano)."""
    tot = Window.partitionBy(key_col)
    obs = obs.withColumn("tot", F.sum("n").over(tot))
    cats = base.join(
        obs.select(cat_col).distinct(), cat_col, "full_outer"
    ).select(
        cat_col,
        F.coalesce("base_ppm", F.lit(0)).cast("bigint").alias("base_ppm"),
    )
    grid = obs.select(key_col, "tot").distinct().crossJoin(cats)
    joined = grid.join(
        obs.select(key_col, cat_col, "n"), [key_col, cat_col], "left"
    )
    p_ppm = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor(
            F.coalesce(F.col("n"), F.lit(0)).cast("double")
            * 1000000.0
            / F.col("tot")
            + F.lit(0.5)
        ).cast("bigint"),
    )
    q_ppm = F.greatest(F.lit(1).cast("bigint"), F.col("base_ppm"))
    p = p_ppm.cast("double") / 1000000.0
    q = q_ppm.cast("double") / 1000000.0
    term = F.floor(
        (p - q) * F.log(p / q) * 1000000000.0 + F.lit(0.5)
    ).cast("bigint")
    return (
        joined.select(
            key_col,
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            term.alias("term_nano"),
        )
        .groupBy(key_col)
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("term_nano").cast("bigint").alias("psi_nano"),
        )
    )


def stream_delta_drift(
    spark: SparkSession,
    table_path: str,
    out_dir: str,
    checkpoint: str,
    baseline_ppm: dict[str, int],
    category_col: str,
):
    """PSI drift over the DELTA CHANGE FEED (round-7 verdict elective
    #9): tails the table through the ``delta_tail`` streaming source
    (offsets in Spark's own checkpoint), and scores each COMMIT's
    category mix against a fixed baseline with the same clamped-ppm
    FLOOR-nano kernel as :func:`stream_mix_drift` — train the
    baseline offline, then every commit that lands in the table gets
    a drift score before it is mixed into a corpus. Per-commit
    attribution comes from the source's ``_commit_version`` tag, so
    one micro-batch spanning several commits still scores each commit
    separately. Epoch-partitioned overwrite keeps at-least-once
    replays idempotent. READ CONTRACT: ``spark.read.parquet(out_dir)``
    → (_commit_version, n_events, psi_nano) + the epoch partition
    column."""
    from census_asc5_data_pipeline_spark.sources import delta_stream_source

    delta_stream_source.register(spark)
    base_rows = sorted(baseline_ppm.items())

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        base = sp.createDataFrame(
            base_rows, f"{category_col} string, base_ppm bigint"
        )
        obs = batch_df.groupBy("_commit_version", category_col).agg(
            F.count("*").cast("bigint").alias("n")
        )
        out = _psi_score(obs, "_commit_version", category_col, base)
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        spark.readStream.format("delta_tail")
        .option("path", table_path)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .start()
    )


def stream_iceberg_drift(
    spark: SparkSession,
    table_path: str,
    out_dir: str,
    checkpoint: str,
    baseline_ppm: dict[str, int],
    category_col: str,
):
    """The :func:`stream_delta_drift` twin on the other table format:
    tails an Iceberg table through the ``iceberg_tail`` source and
    scores each SNAPSHOT's category mix against the fixed baseline
    with the shared :func:`_psi_score` kernel (attribution =
    ``_snapshot_id``; ``rewrite_data_files`` compactions emit nothing
    so they never score). Epoch-partitioned idempotent overwrite;
    READ CONTRACT: ``spark.read.parquet(out_dir)`` →
    (_snapshot_id, n_events, psi_nano) + the epoch partition."""
    from census_asc5_data_pipeline_spark.sources import (
        iceberg_stream_source,
    )

    iceberg_stream_source.register(spark)
    base_rows = sorted(baseline_ppm.items())

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # inserts only: a delete snapshot's retraction rows are not
        # arriving events and must not score against the baseline
        batch_df = batch_df.where(F.col("_change_type") == "insert")
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        base = sp.createDataFrame(
            base_rows, f"{category_col} string, base_ppm bigint"
        )
        obs = batch_df.groupBy("_snapshot_id", category_col).agg(
            F.count("*").cast("bigint").alias("n")
        )
        out = _psi_score(obs, "_snapshot_id", category_col, base)
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        spark.readStream.format("iceberg_tail")
        .option("path", table_path)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .start()
    )


def stream_mix_drift(
    events: DataFrame,
    out_dir: str,
    checkpoint: str,
    baseline_ppm: dict[str, int],
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Per-window category-mix drift monitor: the PSI of each closed
    window's event-type distribution against a FIXED baseline mix —
    the streaming twin of the batch ``psi_drift`` query (train the
    baseline offline, watch every window of the live feed; PSI > 0.2
    pages before a skewed era contaminates the corpus mix).

    Built on the append-mode windowed aggregate like
    ``stream_windowed_topk``: all of a window's category rows arrive
    in the trigger where the watermark closes it, so PSI is computed
    WHOLLY within the batch — no cross-batch merge state beyond the
    windowed aggregate's own watermark-bounded state. Inside the sink
    the per-window math is metadata-scale: a (closed windows x
    baseline categories) grid (both tiny) left-joined with the
    observed counts so categories MISSING from a window still
    contribute drift; both proportions clamp at 1 ppm (PSI's standard
    zero-guard — ln never sees 0); the per-category FLOOR-scaled nano
    terms sum to an exact integer psi_nano. Epoch-partitioned
    overwrite keeps at-least-once replays idempotent. READ CONTRACT:
    ``spark.read.parquet(out_dir)`` → (window_start_ms, n_events,
    psi_nano) + the epoch partition column.
    """
    counts = windowed_counts(events, window, watermark).select(
        "window_start_ms", "event_type", "n"
    )
    base_rows = sorted(baseline_ppm.items())

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        base = spark.createDataFrame(
            base_rows, "event_type string, base_ppm bigint"
        )
        # category axis = baseline UNION observed, both proportions
        # clamped at 1 ppm — the shared _psi_score kernel (also the
        # delta-change-feed twin's scorer)
        out = _psi_score(
            batch_df.select("window_start_ms", "event_type", "n"),
            "window_start_ms",
            "event_type",
            base,
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .start()
    )


def stream_user_activity(events: DataFrame) -> DataFrame:
    """Per-user lifetime activity counter on Spark 4's
    ``transformWithStateInPandas`` — the NEW arbitrary-state API
    (typed ValueState handles, timer support, state-store-backed)
    that succeeds ``applyInPandasWithState``'s single-tuple state.
    The engine exercises BOTH: the sessionizer keeps the legacy API
    (interval-merge semantics port 1:1), and this op pins the new
    one — a running (n_events, last_seen_ms) per user, state read +
    update once per key per batch, emitted in Update mode.

    State is O(1) per user (two longs) and Arrow-batched per key —
    the 100 TB shape for billions of keys. Requires the RocksDB state
    store provider AND the ``protobuf`` package (the TWS state-server
    wire protocol); this container ships neither protobuf nor pip, so
    tests/test_streaming.py skips the runtime drive when protobuf is
    absent and pins construction (unresolved plan) only — on a real
    cluster the same test runs end-to-end. The applyInPandasWithState
    sessionizer above remains the fully-tested stateful path here."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "acc", "n BIGINT, last_ms BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            last = 0
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    last = max(last, int(pdf["ts_ms"].max()))
            if self._state.exists():
                prev = self._state.get()
                n += int(prev[0])
                last = max(last, int(prev[1]))
            self._state.update((n, last))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_events": [n],
                    "last_ms": [last],
                }
            )

        def close(self) -> None:
            pass

    ev = events.select(
        "user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms")
    )
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Proc(),
        outputStructType="user_id BIGINT, n_events BIGINT, last_ms BIGINT",
        outputMode="Update",
        timeMode="None",
    )


def bloom_dedup_fold(
    batch_df: DataFrame,
    epoch_id: int,
    table: str,
    out_dir: str,
    key_col: str = "event_id",
    n_bits: int = 1 << 20,
) -> int:
    """Fold one micro-batch through the persistent Bloom dedup under
    an epoch fence; returns rows emitted. Module-level for direct
    replay testing (the kll_fold_batch pattern)."""
    from census_asc5_data_pipeline_spark.sources import versioned

    if batch_df.isEmpty():
        return 0
    spark = batch_df.sparkSession
    k = F.col(key_col).cast("bigint")
    pos = F.array(
        F.pmod(F.xxhash64(F.lit(1), k), F.lit(n_bits)),
        F.pmod(F.xxhash64(F.lit(2), k), F.lit(n_bits)),
    )
    try:
        stored = versioned.read_current(spark, table)
        fence = stored.select("last_epoch").first()
        if fence is not None and fence[0] >= int(epoch_id):
            return 0
        bits = stored.select(F.explode("bits").alias("p"))
    except FileNotFoundError:
        stored = None
        bits = spark.range(0).select(F.col("id").alias("p"))
    bset = F.broadcast(bits.distinct())
    probed = batch_df.withColumn("__pos", pos).withColumn(
        "__p1", F.col("__pos")[0]
    ).withColumn("__p2", F.col("__pos")[1])
    hit1 = bset.select(F.col("p").alias("__p1")).withColumn(
        "__h1", F.lit(1)
    )
    hit2 = bset.select(F.col("p").alias("__p2")).withColumn(
        "__h2", F.lit(1)
    )
    fresh = (
        probed.join(hit1, "__p1", "left")
        .join(hit2, "__p2", "left")
        .filter(F.col("__h1").isNull() | F.col("__h2").isNull())
        .drop("__pos", "__p1", "__p2", "__h1", "__h2")
    )
    # first occurrence WITHIN the batch also dedups (the filter alone
    # admits both copies when neither is in the filter yet)
    fresh = fresh.dropDuplicates([key_col])
    n = fresh.count()
    if n:
        # Epoch-partitioned overwrite, NOT append: a crash between this
        # write and commit_version below replays the batch with the old
        # fence, and the replay recomputes the identical survivor set
        # (the bit-set is exactly the uncommitted one) — overwriting
        # epoch=N replaces the debris instead of duplicating it. The
        # fence alone can't close that window; the sink must be
        # idempotent per epoch (the stream_windowed_topk discipline).
        fresh.write.mode("overwrite").parquet(
            f"{out_dir}/epoch={int(epoch_id)}"
        )
    new_bits = (
        batch_df.select(F.explode(pos).alias("p"))
        .unionByName(bits)
        .groupBy()
        .agg(F.sort_array(F.collect_set("p")).alias("bits"))
        .select(
            "bits", F.lit(int(epoch_id)).cast("bigint").alias("last_epoch")
        )
    )
    versioned.commit_version(new_bits, table)
    return n


def stream_bloom_dedup(
    events: DataFrame,
    table: str,
    out_dir: str,
    checkpoint: str,
    key_col: str = "event_id",
    n_bits: int = 1 << 20,
):
    """GLOBAL streaming dedup with O(n_bits) state — the unbounded
    complement of ``stream_dedup``, whose watermark forgets keys once
    event time passes: corpus ingestion must drop a document re-sent
    WEEKS later, and keeping every key forever is exactly the
    unbounded-state trap. The persistent filter is the k=2
    seeded-xxhash64 position set (the bloom file index design) stored
    as a versioned snapshot: each batch drops rows whose BOTH
    positions are already present (false positive = a lost unique at
    ~(2n/n_bits)², never a duplicate emitted), writes survivors to an
    overwrite-on-replay ``epoch=N`` sink partition, then commits the
    union of positions under an EPOCH FENCE. Exactly-once needs BOTH
    halves: the fence makes a replay AFTER a successful commit a
    no-op, and the epoch-partitioned overwrite makes a replay in the
    crash window BETWEEN sink write and fence commit rewrite the same
    partition instead of re-appending (the replay recomputes the
    identical survivor set, since the bit-set it probes is exactly the
    one whose commit never landed). In-batch duplicates collapse via
    dropDuplicates before emission. READ CONTRACT:
    ``spark.read.parquet(out_dir)`` traverses every epoch via
    partition discovery and carries an extra ``epoch`` column —
    consumers select by name. tests/test_streaming.py replays a batch
    on purpose, kills the fold INSIDE the crash window, and pins
    cross-batch dropping, FP-free emission and zero duplicates."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        bloom_dedup_fold(
            batch_df, epoch_id, table, out_dir, key_col, n_bits
        )

    return (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )


def delta_sink_fold(
    batch_df: DataFrame, epoch_id: int, table_path: str, app_id: str
) -> int:
    """Fold one micro-batch into a Delta table exactly-once via the
    protocol's application-transaction fence: the ``txn`` action
    commits ATOMICALLY with the batch's add actions (one put-if-absent
    log file), so — unlike the bloom sink's two-phase write+fence —
    there is NO crash window to close: a replayed epoch either finds
    its version already recorded (skip) or the whole commit never
    landed (clean rewrite). Module-level for direct replay testing.
    Returns rows appended (0 for fenced replays/empty batches)."""
    from census_asc5_data_pipeline_spark.sources import delta_io

    # fence first: a driver-side log replay, no Spark job — a fenced
    # replay exits before touching the batch at all (r16; previously
    # an isEmpty job ran even for fenced epochs)
    last = delta_io.last_txn_version(
        batch_df.sparkSession, table_path, app_id
    )
    if last is not None and last >= int(epoch_id):
        return 0
    # ONE batch scan (r17): stage directly — write_delta(skip_empty=)
    # returns None without committing when nothing staged, replacing
    # the r16 isEmpty() job that re-read every batch through the
    # Python stream source before the staging write read it again
    version = delta_io.write_delta(
        batch_df, table_path, mode="append",
        txn=(app_id, int(epoch_id)), skip_empty=True,
    )
    if version is None:
        return 0
    # rows appended from the commit's own operationMetrics (stamped
    # from the staged files' footer stats) — the pre-r16 count() job
    # re-read the whole micro-batch through the Python stream source,
    # so every batch paid the source scan twice
    rows = delta_io.commit_operation_metrics(table_path, version).get(
        "numOutputRows"
    )
    return int(rows) if rows is not None else batch_df.count()


def stream_to_delta(
    events: DataFrame, table_path: str, checkpoint: str,
    app_id: str = "stream_to_delta",
):
    """Streaming sink INTO a Delta table — foreachBatch +
    :func:`delta_sink_fold`'s atomic txn fence make at-least-once
    replays exactly-once end-to-end; every micro-batch becomes one
    Delta commit, so downstream consumers can tail the table with
    ``delta_io.read_delta_changes`` / ``delta_tail_fold`` (stream →
    table → incremental consumer, all on the same log)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        delta_sink_fold(batch_df, epoch_id, table_path, app_id)

    return (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )
