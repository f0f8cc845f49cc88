"""Same-JVM A/B of the identity-column write path across engine
revisions (r15 verdict #2: adjudicate the r13→r14 identity_insert
1.66x bench drift).

FINDING (r15): the drift is a WORKLOAD change, not a code
regression — r14 commit 7efd99d extended the `identity_insert`
registry query itself from CREATE + 2 INSERTs (2 output rows) to
CREATE + 2 INSERTs + a MERGE upserting a third year (3 output
rows), so BENCH_r13's 3.98s and BENCH_r14's 6.59s timed different
query bodies under the same key. This tool therefore runs the SAME
workload (CREATE + 2 identity INSERTs, the r13 body; optionally +
the r14 MERGE where the revision supports identity MERGE) against
every revision in one JVM.

Engine code is swapped by purging ``census_asc5_data_pipeline_spark*``
from sys.modules and repointing sys.path at a git worktree of the
revision under test. Trials interleave (A,B,A,B,...) so JVM warm-up
and host load hit both sides equally. Prints one JSON line.

Usage:
  python tools/ab_identity_r15.py /root/repo /tmp/ab_r13 [more]
  AB_MERGE=1 to append the r14 MERGE step (revisions that refuse
  identity MERGE will error).
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _load_engine(root: str):
    for mod in [m for m in sys.modules if m.startswith(
        "census_asc5_data_pipeline_spark"
    )]:
        del sys.modules[mod]
    while root in sys.path:
        sys.path.remove(root)
    sys.path.insert(0, root)
    import census_asc5_data_pipeline_spark  # noqa: F401

    got = os.path.dirname(
        os.path.abspath(census_asc5_data_pipeline_spark.__file__)
    )
    assert got == os.path.join(
        root, "census_asc5_data_pipeline_spark"
    ), got


def _workload(spark, view: str, with_merge: bool) -> int:
    """The identity_insert body (r13 shape; + the r14 MERGE when
    with_merge). Runs on whichever engine revision is currently
    loaded. Returns the output row count."""
    from census_asc5_data_pipeline_spark.sources import delta_io
    from census_asc5_data_pipeline_spark.sources.merge import dml_sql

    import pyspark.sql.functions as F

    base = os.path.join(
        tempfile.gettempdir(), f"ab_identity_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    cat: dict = {}
    dml_sql(
        spark,
        "CREATE TABLE ident_t (id BIGINT GENERATED ALWAYS AS "
        "IDENTITY, okey BIGINT, yr INT) USING delta "
        f"LOCATION '{base}'",
        cat,
    )
    for yr in (1995, 1996):
        dml_sql(
            spark,
            f"INSERT INTO ident_t (okey, yr) SELECT okey, yr FROM "
            f"{view} WHERE yr = {yr}",
            cat,
        )
    if with_merge:
        dml_sql(
            spark,
            f"MERGE INTO ident_t t USING (SELECT okey, yr FROM {view} "
            "WHERE yr IN (1995, 1997)) s ON t.okey = s.okey "
            "WHEN MATCHED THEN UPDATE SET okey = s.okey "
            "WHEN NOT MATCHED THEN INSERT (okey, yr) VALUES "
            "(s.okey, s.yr)",
            cat,
        )
    n = (
        delta_io.read_delta(spark, base)
        .groupBy("yr")
        .count()
        .count()
    )
    shutil.rmtree(base, ignore_errors=True)
    return n


def main() -> None:
    roots = [os.path.abspath(p) for p in sys.argv[1:]] or [
        "/root/repo",
        "/tmp/ab_r13",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    with_merge = os.environ.get("AB_MERGE", "0") == "1"

    sys.path.insert(0, roots[0])
    from census_asc5_data_pipeline_spark import get_spark

    import pyspark.sql.functions as F

    spark = get_spark(
        "ab_identity",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    view = f"ab_ident_orders_{os.getpid()}"
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_orderkey").alias("okey"),
        F.year("o_orderdate").alias("yr"),
    ).createOrReplaceTempView(view)

    times: dict[str, list[float]] = {r: [] for r in roots}
    for trial in range(rounds + 1):
        for root in roots:
            _load_engine(root)
            t0 = time.time()
            n = _workload(spark, view, with_merge)
            dt = time.time() - t0
            assert n == (3 if with_merge else 2), n
            if trial > 0:  # trial 0 = warm-up, discarded
                times[root].append(dt)
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "with_merge": with_merge,
        "medians": {
            r: round(statistics.median(v), 3) for r, v in times.items()
        },
        "all": {r: [round(x, 3) for x in v] for r, v in times.items()},
    }
    base_t = out["medians"][roots[-1]]
    out["ratios_vs_last"] = {
        r: round(out["medians"][r] / base_t, 3) for r in roots
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
