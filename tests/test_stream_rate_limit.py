"""maxFilesPerTrigger-style admission control for the three streaming
sources (round-11 verdict #4): a catch-up over many commits splits
into bounded batches — each planned batch stops at the first commit
where the cumulative changed-file count reaches the cap — and a
RESTART after commits landed while the stream was down also catches up
in >1 batch with exactly-once totals. These pipelines run on repeated
triggers and opt into strictratelimit (r14): the non-strict default
leaves the FIRST latestOffset uncapped so Trigger.AvailableNow's
capture-once wrapper can never truncate a drain (see
test_available_now_cap_never_loses_data)."""

from __future__ import annotations


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_delta_tail_max_files_per_trigger(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        write_delta,
    )

    delta_stream_source.register(spark)
    table = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    for i in range(4):  # 4 commits x 1 file x 2 rows
        write_delta(
            _mk(
                spark,
                [(i * 2, float(i)), (i * 2 + 1, float(i))],
                "id bigint, v double",
            ).coalesce(1),
            table,
        )
    batches: list[tuple[int, list[int]]] = []

    def sink(batch_df, epoch_id):
        vs = [r._commit_version for r in batch_df.collect()]
        if vs:
            batches.append((epoch_id, vs))

    q = (
        spark.readStream.format("delta_tail")
        .option("path", table)
        .option("maxfilespertrigger", 1)
        .option("strictratelimit", "true")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # one commit (= 1 file) per batch, 4 batches, every row exactly once
    assert len(batches) == 4
    assert all(len(set(vs)) == 1 for _e, vs in batches)
    assert sum(len(vs) for _e, vs in batches) == 8

    # stream down: 3 more commits land; the restart catches up in
    # >1 bounded batch with exactly-once totals
    for i in range(4, 7):
        write_delta(
            _mk(spark, [(i * 2, float(i))], "id bigint, v double")
            .coalesce(1),
            table,
        )
    batches.clear()
    q = (
        spark.readStream.format("delta_tail")
        .option("path", table)
        .option("maxfilespertrigger", 1)
        .option("strictratelimit", "true")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(batches) == 3  # NOT one giant catch-up batch
    assert sorted(v for _e, vs in batches for v in vs) == [4, 5, 6]

    # unbounded control: the same catch-up without the option is one
    # batch (proves the cap, not the engine, split the batches)
    ck2 = str(tmp_path / "ck2")
    batches.clear()
    q = (
        spark.readStream.format("delta_tail")
        .option("path", table)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck2)
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(batches) == 1
    assert sum(len(vs) for _e, vs in batches) == 11


def test_delta_cdf_and_iceberg_tail_rate_limit(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
        iceberg_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delete_delta_where,
        set_delta_properties,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        write_iceberg,
    )

    delta_stream_source.register(spark)
    iceberg_stream_source.register(spark)

    # delta_cdf: 2 appends + a CDF delete = 3 change-bearing commits
    table = str(tmp_path / "t")
    write_delta(
        _mk(spark, [(1, 1.0), (2, 2.0)], "id bigint, v double")
        .coalesce(1),
        table,
    )
    set_delta_properties(
        spark, table, {"delta.enableChangeDataFeed": "true"}
    )
    write_delta(
        _mk(spark, [(3, 3.0)], "id bigint, v double").coalesce(1),
        table,
    )
    delete_delta_where(spark, table, "id = 1", mode="dv")
    got: list[tuple[int, int, str]] = []
    nbatches = [0]

    def sink(batch_df, epoch_id):
        rows = [(r.id, r._commit_version, r._change_type)
                for r in batch_df.collect()]
        if rows:
            nbatches[0] += 1
            got.extend(rows)

    q = (
        spark.readStream.format("delta_cdf")
        .option("path", table)
        .option("maxfilespertrigger", 1)
        .option("strictratelimit", "true")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert nbatches[0] == 3
    assert sorted(t for _i, _v, t in got) == [
        "delete", "insert", "insert", "insert"
    ]

    # iceberg_tail: 3 one-file snapshots, cap 1 → 3 batches
    ice = str(tmp_path / "ice")
    for i in range(3):
        write_iceberg(
            _mk(spark, [(i, f"s{i}")], "id bigint, s string").coalesce(1),
            ice,
        )
    got.clear()
    nbatches[0] = 0

    def sink2(batch_df, epoch_id):
        rows = [(r.id, r._snapshot_id) for r in batch_df.collect()]
        if rows:
            nbatches[0] += 1
            got.extend(rows)

    q = (
        spark.readStream.format("iceberg_tail")
        .option("path", ice)
        .option("maxfilespertrigger", 1)
        .option("strictratelimit", "true")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ick"))
        .foreachBatch(sink2)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert nbatches[0] == 3
    assert sorted(i for i, _s in got) == [0, 1, 2]

    # byte-based cap: 1 byte per trigger degenerates to one snapshot
    # per batch too (every snapshot exceeds the budget, commits are
    # never split)
    got.clear()
    nbatches[0] = 0
    q = (
        spark.readStream.format("iceberg_tail")
        .option("path", ice)
        .option("maxbytespertrigger", 1)
        .option("strictratelimit", "true")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ick2"))
        .foreachBatch(sink2)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert nbatches[0] == 3
    assert sorted(i for i, _s in got) == [0, 1, 2]


def test_starting_timestamp_option(spark, tmp_path):
    """startingtimestamp (round-11): commits/snapshots stamped AT or
    AFTER the given epoch-millis (or ISO) timestamp stream; earlier
    history is skipped — the time-travel twin of startingversion."""
    import json
    import os
    import time

    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
        iceberg_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        iceberg_snapshots,
        write_iceberg,
    )

    delta_stream_source.register(spark)
    iceberg_stream_source.register(spark)
    table = str(tmp_path / "t")
    write_delta(_mk(spark, [(1,)], "id bigint").coalesce(1), table)
    time.sleep(0.05)
    write_delta(_mk(spark, [(2,)], "id bigint").coalesce(1), table)
    v1_ts = next(
        json.loads(l)["commitInfo"]["timestamp"]
        for l in open(
            os.path.join(table, "_delta_log", f"{1:020d}.json")
        )
        if "commitInfo" in l
    )
    got: list[int] = []

    def sink(batch_df, epoch_id):
        got.extend(r.id for r in batch_df.collect())

    q = (
        spark.readStream.format("delta_tail")
        .option("path", table)
        .option("startingtimestamp", str(v1_ts))
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert got == [2]  # v0 (stamped before) skipped

    # both options together is ambiguous (constructor-level check —
    # stream-runner errors surface asynchronously)
    import pytest

    from census_asc5_data_pipeline_spark.sources.delta_stream_source import (
        DeltaTailStreamReader,
    )

    with pytest.raises(ValueError, match="not both"):
        DeltaTailStreamReader(
            {
                "path": table,
                "startingversion": "0",
                "startingtimestamp": str(v1_ts),
            }
        )

    # iceberg twin
    ice = str(tmp_path / "ice")
    write_iceberg(_mk(spark, [(1,)], "id bigint").coalesce(1), ice)
    time.sleep(0.05)
    write_iceberg(_mk(spark, [(2,)], "id bigint").coalesce(1), ice)
    s2_ts = max(
        int(s["timestamp-ms"]) for s in iceberg_snapshots(ice)
    )
    got.clear()
    q = (
        spark.readStream.format("iceberg_tail")
        .option("path", ice)
        .option("startingtimestamp", str(s2_ts))
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ick"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert got == [2]


def test_rate_limit_regression_proof(spark, tmp_path):
    """r11 ADVICE: the cap must not depend on the engine's empirical
    call order for exactly-once. A reversed batch range (what the
    engine would plan if a restart ever asked latestOffset before
    revealing the checkpointed position and got a sub-checkpoint cap
    back) plans an EMPTY batch with a warning (r12 ADVICE — the
    exclusive-start range holds no new versions, so nothing is
    duplicated and the query survives) — and partitions() learns the
    true position from the range START, so the very next latestOffset
    caps correctly (warned once, then self-healed, zero duplicates)."""
    import pytest

    from census_asc5_data_pipeline_spark.sources.delta_io import (
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.delta_stream_source import (
        DeltaTailStreamReader,
    )

    table = str(tmp_path / "t")
    for i in range(6):
        write_delta(
            _mk(spark, [(i, float(i))], "id bigint, v double").coalesce(1),
            table,
        )
    # fresh stream: the probe caps from `starting` (bounded backfill)
    r = DeltaTailStreamReader(
        {"path": table, "maxfilespertrigger": 1, "strictratelimit": "true"}
    )
    assert r.latestOffset() == {"version": 0}
    # simulated bad restart: the engine's checkpoint is at version 4
    # and it plans the reversed batch (4 -> 0) from that stale cap —
    # the batch is empty, warned, and the query keeps running
    with pytest.warns(UserWarning, match="offset regression"):
        parts0 = r.partitions({"version": 4}, {"version": 0})
    assert [p.path for p in parts0] == [None]  # one no-op partition
    # the range start revealed the true position: capping resumes
    # FROM it — versions 0-4 are never re-planned
    assert r.latestOffset() == {"version": 5}
    parts = r.partitions({"version": 4}, {"version": 5})
    assert parts  # the one un-emitted commit
    # and the cap is monotonic: it never returns below a learned floor
    assert r.latestOffset() == {"version": 5}


def test_starting_timestamp_session_timezone(spark):
    """A timezone-NAIVE startingtimestamp resolves in the session
    timezone (delta-spark semantics, r11 ADVICE); zone-aware strings
    and integer millis are timezone-independent."""
    import datetime

    from census_asc5_data_pipeline_spark.sources.delta_stream_source import (
        _parse_ts_ms,
    )

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # 2024-01-15 12:00 naive == 17:00 UTC in EST (UTC-5)
        assert _parse_ts_ms("2024-01-15 12:00:00") == int(
            datetime.datetime(
                2024, 1, 15, 17, tzinfo=datetime.timezone.utc
            ).timestamp() * 1000
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    # zone-aware and integer forms are unaffected by the session tz
    assert _parse_ts_ms("2024-01-15T12:00:00+00:00") == int(
        datetime.datetime(
            2024, 1, 15, 12, tzinfo=datetime.timezone.utc
        ).timestamp() * 1000
    )
    assert _parse_ts_ms("1700000000000") == 1700000000000


def test_available_now_cap_never_loses_data(spark, tmp_path):
    """r14: Trigger.AvailableNow calls latestOffset ONCE (fresh and
    restart) and drains only to that answer — under the non-strict
    default a capped source must still report the true end, so the
    backfill is COMPLETE. This was a silent data-loss bug: the capped
    capture made availableNow stop after the first 4 files."""
    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        write_delta,
    )

    delta_stream_source.register(spark)
    table = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    import pyspark.sql.functions as F

    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        write_delta(
            spark.range(lo, hi).select(F.col("id").alias("k"))
            .repartition(4),
            table,
        )
    seen: list[int] = []

    def sink(bdf, eid):
        seen.extend(r.k for r in bdf.collect())

    def drain():
        q = (
            spark.readStream.format("delta_tail")
            .option("path", table)
            .option("maxfilespertrigger", 4)
            .load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ck)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted(seen) == list(range(30))
    # restart drain: commits landed while down — still complete
    for lo, hi in ((30, 40), (40, 50)):
        write_delta(
            spark.range(lo, hi).select(F.col("id").alias("k"))
            .repartition(4),
            table,
        )
    seen.clear()
    drain()
    assert sorted(seen) == list(range(30, 50))


def test_available_now_complete_on_cdf_and_iceberg(spark, tmp_path):
    """The capture-once safety lives in the shared mixin — pin it on
    the other two table sources too."""
    import pyspark.sql.functions as F

    from census_asc5_data_pipeline_spark.sources import (
        delta_stream_source,
        iceberg_stream_source,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        set_delta_properties,
        write_delta,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        write_iceberg,
    )

    delta_stream_source.register(spark)
    iceberg_stream_source.register(spark)
    # delta_cdf
    dt = str(tmp_path / "cdf_t")
    write_delta(
        spark.range(0, 5).select(F.col("id").alias("k")).coalesce(1),
        dt,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    for lo, hi in ((5, 10), (10, 15)):
        write_delta(
            spark.range(lo, hi).select(F.col("id").alias("k")).coalesce(1),
            dt,
        )
    seen: list[int] = []

    def sink(bdf, eid):
        seen.extend(r.k for r in bdf.collect())

    q = (
        spark.readStream.format("delta_cdf")
        .option("path", dt)
        .option("maxfilespertrigger", 1)
        .load()
        .writeStream.option("checkpointLocation", str(tmp_path / "ck1"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(seen) == list(range(15))
    # iceberg_tail
    it = str(tmp_path / "ice_t")
    for lo, hi in ((0, 5), (5, 10), (10, 15)):
        write_iceberg(
            spark.range(lo, hi).select(F.col("id").alias("k")), it
        )
    seen.clear()
    q = (
        spark.readStream.format("iceberg_tail")
        .option("path", it)
        .option("maxfilespertrigger", 1)
        .load()
        .writeStream.option("checkpointLocation", str(tmp_path / "ck2"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(seen) == list(range(15))
