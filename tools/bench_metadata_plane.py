"""Bench the Delta metadata plane at planning scale (r14, r13
verdict #9): plant a checkpoint with N synthetic add actions (stats
JSON per file — data files never open during pruning) and measure
the time to produce the pruned live-file set for a needle predicate

  (a) driver path      — _replay (checkpoint collect) + skip_files
  (b) distributed path — _replay_pruned_spark (mapInPandas mask,
                         only survivors collected)

Usage: python tools/bench_metadata_plane.py [n_files] [repeats]
Prints one JSON line. Numbers recorded in SURVEY.md §6.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def plant(spark, path: str, n_files: int) -> None:
    from census_asc5_data_pipeline_spark.sources import delta_io as d

    os.makedirs(d._log_dir(path), exist_ok=True)
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": c,
                    "type": t,
                    "nullable": True,
                    "metadata": {},
                }
                for c, t in (
                    ("k", "long"),
                    ("v", "double"),
                    ("s", "string"),
                )
            ],
        }
    )
    now_ms = int(time.time() * 1000)
    meta = {
        "id": str(uuid.uuid4()),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": now_ms,
    }
    protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
    d._put_if_absent_commit(
        path,
        0,
        [
            {"commitInfo": {"timestamp": now_ms, "operation": "WRITE"}},
            {"protocol": protocol},
            {"metaData": meta},
        ],
    )
    # checkpoint parquet with n_files synthetic adds: file i covers
    # k in [i*1000, i*1000+999] — a point predicate matches ONE file
    rows = [
        (
            {**protocol, "readerFeatures": None, "writerFeatures": None},
            None,
            None,
            None,
            None,
        ),
        (None, meta, None, None, None),
    ] + [
        (
            None,
            None,
            {
                "path": f"part-{i:07d}.parquet",
                "partitionValues": {},
                "size": 1 << 20,
                "modificationTime": now_ms,
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": 1000,
                        "minValues": {"k": i * 1000, "v": float(i)},
                        "maxValues": {
                            "k": i * 1000 + 999,
                            "v": float(i) + 0.5,
                        },
                        "nullCount": {"k": 0, "v": 0, "s": 1000},
                    }
                ),
                "deletionVector": None,
            },
            None,
            None,
        )
        for i in range(n_files)
    ]
    tmp = d._checkpoint_file(path, 0) + ".tmp"
    (
        spark.createDataFrame(rows, d._CKPT_SCHEMA)
        .repartition(8)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    parts = sorted(
        f
        for f in os.listdir(tmp)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    # multipart checkpoint so the distributed read parallelizes
    for idx, part in enumerate(parts, start=1):
        os.replace(
            os.path.join(tmp, part),
            os.path.join(
                d._log_dir(path),
                f"{0:020d}.checkpoint.{idx:010d}.{len(parts):010d}.parquet",
            ),
        )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    with open(os.path.join(d._log_dir(path), "_last_checkpoint"), "w") as fh:
        json.dump({"version": 0, "size": len(rows)}, fh)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("bench_metadata_plane")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    from pyspark.sql import types as T

    from census_asc5_data_pipeline_spark.sources import delta_io as d
    from census_asc5_data_pipeline_spark.sources import delta_stats as ds

    root = tempfile.mkdtemp(prefix="meta_bench_")
    path = os.path.join(root, "t")
    plant(spark, path, n_files)
    pred = f"k = {(n_files // 2) * 1000 + 17}"

    def driver_path():
        _p, meta, adds, _tx = d._replay(spark, path, None)
        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        atoms = ds.parse_skip_predicate(pred)
        return ds.skip_files(list(adds.values()), atoms, schema, [], None)

    def spark_path():
        res = d._replay_pruned_spark(spark, path, None, None, pred)
        assert res is not None
        return res[2]

    # warm both paths once (JVM + Arrow init), then time
    assert [a["path"] for a in driver_path()] == [
        a["path"] for a in spark_path()
    ]
    out = {}
    for name, fn in (("driver_sec", driver_path), ("spark_sec", spark_path)):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            kept = fn()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        out.setdefault("survivors", len(kept))
    out.update(
        {
            "n_files": n_files,
            "predicate": pred,
            "speedup": round(out["driver_sec"] / out["spark_sec"], 2),
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
