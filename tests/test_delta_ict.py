"""Delta in-commit timestamps (r15 — PROTOCOL.md §In-Commit
Timestamps, delta-spark 3.3+): the enablement commit declares the
feature + provenance, every later commit chains a MONOTONIC
commitInfo.inCommitTimestamp through the central commit hook (all
verbs, no per-site code), and the timestamp readers — time travel,
DESCRIBE HISTORY, time-based retention — prefer it over wall-clock
file times."""
from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import update_where


def _icts(path: str) -> dict[int, int | None]:
    out = {}
    for v in d.delta_versions(path):
        out[v] = d._ict_of_commit(path, v)
    return out


def test_enablement_and_monotonic_chain(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(spark.range(4).coalesce(1).select(F.col("id"), F.lit(0).alias("k")), p)
    assert _icts(p) == {0: None}  # not enabled: no stamps
    v1 = d.set_delta_properties(
        spark, p, {"delta.enableInCommitTimestamps": "true"}
    )
    protocol, meta, _a, _t = d._replay(spark, p, None)
    assert "inCommitTimestamp" in (protocol.get("writerFeatures") or [])
    conf = meta["configuration"]
    assert conf["delta.inCommitTimestampEnablementVersion"] == str(v1)
    assert int(conf["delta.inCommitTimestampEnablementTimestamp"]) > 0
    # every verb after enablement chains: append, UPDATE, OPTIMIZE,
    # RESTORE, SET TBLPROPERTIES, domain commit
    d.write_delta(spark.range(4, 6).coalesce(1).select(F.col("id"), F.lit(0).alias("k")), p)
    update_where(spark, "delta", p, "id = 1", {"k": "k + 1"})
    d.optimize_delta(spark, p, target_file_bytes=1 << 30)
    d.set_delta_properties(spark, p, {"foo.bar": "1"})
    d.set_domain_metadata(spark, p, "app.x", "y")
    icts = _icts(p)
    stamped = [icts[v] for v in sorted(icts) if v >= v1]
    assert all(t is not None for t in stamped)
    assert stamped == sorted(stamped)
    assert len(set(stamped)) == len(stamped)  # strictly monotonic
    assert icts[0] is None  # pre-enablement commits stay unstamped


def test_ict_drives_time_travel_and_history(spark, tmp_path):
    """Backdated FILE mtimes and commitInfo.timestamp must lose to
    the ICT once enabled — the feature's whole point."""
    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(3).coalesce(1).select(F.col("id")),
        p,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    d.write_delta(spark.range(3, 5).coalesce(1).select(F.col("id")), p)
    icts = _icts(p)
    assert icts[0] is not None and icts[1] is not None
    # sabotage the wall-clock signals: absurd mtimes + absurd
    # commitInfo.timestamp, keeping ICT intact
    for v in (0, 1):
        cf = d._commit_file(p, v)
        lines = [json.loads(x) for x in open(cf) if x.strip()]
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = 1  # epoch 1970
        with open(cf, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
        os.utime(cf, (1, 1))
    assert d._commit_timestamp_ms(p, 0) == icts[0]
    # time travel by the ICT boundary resolves version 0
    assert d.version_as_of_timestamp_delta(p, icts[0]) == 0
    assert d.version_as_of_timestamp_delta(p, icts[1]) == 1
    assert d.read_delta(spark, p, timestamp_ms=icts[0]).count() == 3
    h = d.describe_history(spark, p).collect()
    assert {r.version: r.timestamp_ms for r in h} == icts


def test_creation_with_ict_declares_feature(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(2).coalesce(1).select(F.col("id")),
        p,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    protocol, _m, _a, _t = d._replay(spark, p, None)
    assert protocol["minWriterVersion"] == 7
    assert "inCommitTimestamp" in protocol["writerFeatures"]
    assert _icts(p)[0] is not None


def test_foreign_enabled_table_chains_on_our_writes(spark, tmp_path):
    """A foreign table whose last commit carries an ICT in the
    FUTURE: our next commit must stamp strictly above it (the
    monotonicity rule), not wall-clock below it."""
    import time as _time

    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(2).coalesce(1).select(F.col("id")),
        p,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    future = int(_time.time() * 1000) + 10_000_000
    cf = d._commit_file(p, 0)
    lines = [json.loads(x) for x in open(cf) if x.strip()]
    for a in lines:
        if "commitInfo" in a:
            a["commitInfo"]["inCommitTimestamp"] = future
    with open(cf, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    d.write_delta(spark.range(2, 4).coalesce(1).select(F.col("id")), p)
    assert _icts(p)[1] == future + 1
