"""Delta liquid clustering READ (r15 elective): a foreign
delta-spark clustered table (clusteringW/domainMetadata writer
features + the system delta.clustering domain) reads, exposes its
clustering columns (physical names mapped back to logical on mapped
tables), and — since r16 — ACCEPTS DML: the engine maintains the
domain and OPTIMIZE reclusters (write-side pins live in
test_delta_clustering_write.py)."""
from __future__ import annotations

import json
import os

import pytest
import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d


def _mk_clustered(spark, table: str) -> None:
    """Hand-written foreign log: one data file, clusteringW +
    domainMetadata writer features, the delta.clustering domain."""
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    df = spark.range(6).select(
        F.col("id"), (F.col("id") % 2).alias("bucket")
    )
    staging = os.path.join(table, ".stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    src = next(
        f
        for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.replace(
        os.path.join(staging, src), os.path.join(table, "f1.parquet")
    )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "bucket", "type": "long", "nullable": True,
             "metadata": {}},
        ],
    }
    actions = [
        {"commitInfo": {"timestamp": 1, "operation": "CLUSTER BY",
                        "engineInfo": "foreign/4.0"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["clusteringW",
                                         "domainMetadata"]}},
        {"metaData": {"id": "ct", "format": {"provider": "parquet",
                                             "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [], "configuration": {},
                      "createdTime": 1}},
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": json.dumps(
                                {"clusteringColumns": [["bucket"],
                                                       ["id"]]}),
                            "removed": False}},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": os.path.getsize(
                     os.path.join(table, "f1.parquet")),
                 "modificationTime": 1, "dataChange": True,
                 "stats": json.dumps({"numRecords": 6})}},
    ]
    with open(os.path.join(table, "_delta_log", f"{0:020d}.json"),
              "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_clustered_table_reads_and_exposes_columns(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_clustered(spark, t)
    assert d.read_delta(spark, t).count() == 6
    assert d.clustering_columns(spark, t) == ["bucket", "id"]
    det = d.describe_detail(spark, t).collect()[0]
    assert det.clustering_columns == ["bucket", "id"]
    # unclustered tables report []
    p2 = str(tmp_path / "plain")
    d.write_delta(spark.range(3).coalesce(1).select(F.col("id")), p2)
    assert d.clustering_columns(spark, p2) == []
    assert d.describe_detail(spark, p2).collect()[0].clustering_columns == []


def test_foreign_clustered_table_accepts_dml(spark, tmp_path):
    """r16 (the r15 verdict's top item): the clusteringW spelling is
    a WRITABLE feature now — a foreign clustered log takes appends,
    the domain survives, and checkpointing stays lossless."""
    t = str(tmp_path / "t")
    _mk_clustered(spark, t)
    d.write_delta(
        spark.range(2).select(
            F.col("id"), (F.col("id") % 2).alias("bucket")
        ),
        t,
    )
    assert d.read_delta(spark, t).count() == 8
    assert d.clustering_columns(spark, t) == ["bucket", "id"]
    # checkpointing is LOSSLESS (domains + adds round-trip)
    cv = d.create_checkpoint(spark, t)
    os.remove(os.path.join(t, "_delta_log", f"{cv:020d}.json"))
    assert d.read_delta(spark, t).count() == 8
    assert d.clustering_columns(spark, t) == ["bucket", "id"]