"""Profile ONE registry query: per-Spark-job wall (event log) + Python
driver time (cProfile), split construct vs exec.

Usage: python tools/profile_query.py <query> [sf_dir] [--cprofile]

Writes the event log to /tmp/spark-events-profile/<app-id> and prints:
- construct / exec wall seconds
- every Spark job with duration + description (from the event log)
- total job wall vs python-side gap (driver work between jobs)
- with --cprofile: top driver-side cumulative functions
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.1"
    do_prof = "--cprofile" in sys.argv

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    from census_asc5_data_pipeline_spark import get_spark

    # get_spark builds the tuned session; add event logging before
    import census_asc5_data_pipeline_spark.session as S
    from pyspark.sql import SparkSession

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    spark = (
        SparkSession.builder.appName(f"profile-{name}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from census_asc5_data_pipeline_spark.catalog import assert_utc
    from census_asc5_data_pipeline_spark.queries import QUERIES, unpersist_deps
    from pyspark.sql import functions as F

    assert_utc(spark)
    # warm like bench.py does
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (
        li.select("l_orderkey", "l_quantity").limit(1000)
        .join(F.broadcast(orders.select("o_orderkey").limit(1000)),
              li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey").agg(F.sum("l_quantity")).count()
    )
    _warm = F.pandas_udf(lambda s: s, "bigint")
    spark.range(4).select(_warm("id")).count()

    fn = QUERIES[name]

    prof = cProfile.Profile() if do_prof else None
    spark.sparkContext.setJobDescription(f"{name}: construct")
    t0 = time.time()
    if prof:
        prof.enable()
    df = fn(spark, sf_dir)
    t1 = time.time()
    spark.sparkContext.setJobDescription(f"{name}: exec")
    n = df.count()
    if prof:
        prof.disable()
    t2 = time.time()
    unpersist_deps(df)
    construct_end_ms = t1 * 1000

    print(f"== {name}: {n} rows, construct {t1-t0:.2f}s + exec {t2-t1:.2f}s = {t2-t0:.2f}s")

    spark.stop()
    time.sleep(1.0)

    # parse event log
    jobs = {}
    paths = []
    for root, _dirs, files in os.walk(EVDIR):
        for fname in files:
            if "appstatus" not in fname:
                paths.append(os.path.join(root, fname))
    for fp in paths:
        with open(fp) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    desc = ev.get("Properties", {}).get("spark.job.description", "")
                    jobs[jid] = {"start": ev["Submission Time"], "desc": desc,
                                 "stages": len(ev.get("Stage Infos", []))}
                elif et == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]

    rows = []
    for jid, j in sorted(jobs.items()):
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        phase = "construct" if j["start"] <= construct_end_ms else "exec"
        if f"{name}:" not in j["desc"]:
            phase = "warm"
        rows.append((jid, dur, phase, j["stages"], j["desc"][:60]))

    tot = {"construct": 0.0, "exec": 0.0, "warm": 0.0}
    cnt = {"construct": 0, "exec": 0, "warm": 0}
    print(f"{'job':>4} {'sec':>7} {'phase':9} {'stg':>3}  desc")
    for jid, dur, phase, stg, desc in rows:
        tot[phase] += dur
        cnt[phase] += 1
        if phase != "warm":
            print(f"{jid:>4} {dur:7.3f} {phase:9} {stg:>3}  {desc}")
    print(f"-- construct: {cnt['construct']} jobs, {tot['construct']:.2f}s job-wall "
          f"(python gap {t1-t0-tot['construct']:.2f}s)")
    print(f"-- exec:      {cnt['exec']} jobs, {tot['exec']:.2f}s job-wall "
          f"(python gap {t2-t1-tot['exec']:.2f}s)")

    if prof:
        s = io.StringIO()
        st = pstats.Stats(prof, stream=s)
        st.sort_stats("cumulative").print_stats(35)
        print(s.getvalue())


if __name__ == "__main__":
    main()
