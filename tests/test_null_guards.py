"""The NULL-guard fixes (round-5 code review) as TESTED cross-engine
properties, not just filters: plant an events table CONTAINING NULL
timestamps and NULL event types, point the affected registry queries +
their DuckDB oracles at it, and require the same hash-equality the
driver's gate applies. Without the guards, Spark's NULLS-FIRST vs
DuckDB's NULLS-LAST ordering (and concat_ws-vs-|| NULL handling) make
these diverge on exactly this data shape."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from census_asc5_data_pipeline_spark.queries import ORACLES, QUERIES

GUARDED = ["mode_agg", "event_trigrams", "interp_fill", "attribution"]


@pytest.fixture(scope="module")
def null_events_dir(spark, tmp_path_factory):
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for uid in (1, 2, 3):
        for i in range(40):
            ts = None if i % 11 == 7 else t0 + dt.timedelta(minutes=3 * i + uid)
            etype = None if i % 13 == 4 else f"t{(i * 7 + uid) % 5}"
            rows.append((eid, ts, uid, etype, float((i * 37 + uid) % 90), "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("null_events")
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", GUARDED)
def test_null_carrying_events_still_hash_match(spark, null_events_dir, name):
    con = duckdb.connect()
    # Spark writes a directory of part files; DuckDB needs the glob
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{null_events_dir}/events.parquet/*.parquet'"
    )
    sdf = QUERIES[name](spark, null_events_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(ORACLES[name])
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns), name
    assert len(srows) == len(drows), f"{name}: {len(srows)} != {len(drows)}"
    order_s = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    order_d = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    ns = sorted(tuple(repr(r[i]) for i in order_s) for r in srows)
    nd = sorted(tuple(repr(r[i]) for i in order_d) for r in drows)
    assert ns == nd, f"{name}: diverged on NULL-carrying events"
