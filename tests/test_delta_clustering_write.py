"""Delta liquid clustering WRITE (r16, the r15 verdict's top item):
CREATE ... CLUSTER BY stamps the clustering feature + the
delta.clustering domain, appends preserve it, ALTER ... CLUSTER BY
re-stamps it, and OPTIMIZE reclusters on the declared columns via
the Morton kernel — with a planted-predicate skipping pin. Foreign
clustered logs (the clusteringW spelling) accept DML in
test_delta_clustering_read.py."""
from __future__ import annotations

import json
import os
import urllib.parse as up

import pyarrow.parquet as pq
import pytest
import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import dml_sql


def _protocol(path: str) -> dict:
    with open(
        os.path.join(path, "_delta_log", f"{0:020d}.json")
    ) as fh:
        for ln in fh:
            a = json.loads(ln)
            if "protocol" in a:
                return a["protocol"]
    raise AssertionError("no protocol in v0")


def _scattered(spark, n: int = 4096):
    return (
        spark.range(n)
        .select(
            ((F.col("id") * 7919) % 64).alias("x"),
            (F.col("id") % 64).alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )


def _overlap(spark, path: str, x_hi: int, y_hi: int) -> tuple[int, int]:
    """(files overlapping x<x_hi AND y<y_hi, total live files)."""
    _p, _m, adds, _t = d._replay(spark, path, None)
    hits = 0
    for a in adds.values():
        pf = pq.ParquetFile(os.path.join(path, up.unquote(a["path"])))
        mins = {"x": None, "y": None}
        for rg in range(pf.metadata.num_row_groups):
            for ci in range(pf.metadata.num_columns):
                col = pf.metadata.row_group(rg).column(ci)
                nm = col.path_in_schema
                if nm in mins and col.statistics is not None:
                    st = col.statistics
                    mins[nm] = (
                        st.min
                        if mins[nm] is None
                        else min(mins[nm], st.min)
                    )
        if mins["x"] is not None and mins["x"] < x_hi and (
            mins["y"] is not None and mins["y"] < y_hi
        ):
            hits += 1
    return hits, len(adds)


def test_create_cluster_by_round_trip(spark, tmp_path):
    """CREATE → append → OPTIMIZE: the domain is live from v0, the
    protocol declares clustering+domainMetadata, OPTIMIZE defaults
    its Z-order to the clustering columns and tightens skipping."""
    path = str(tmp_path / "t")
    d.write_delta(_scattered(spark), path, cluster_by=["x", "y"])
    proto = _protocol(path)
    assert proto["minWriterVersion"] == 7
    assert {"clustering", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    assert d.clustering_columns(spark, path) == ["x", "y"]
    # ordinary append: domain preserved, files may land unclustered
    d.write_delta(_scattered(spark, 512), path)
    assert d.clustering_columns(spark, path) == ["x", "y"]
    before, total_before = _overlap(spark, path, 8, 8)
    assert before == total_before  # scattered: every file overlaps
    pre = sorted(
        (r.x, r.y, r.payload)
        for r in d.read_delta(spark, path).collect()
    )
    res = d.optimize_delta(spark, path, target_file_bytes=5_000)
    assert res["version"] is not None
    after, total_after = _overlap(spark, path, 8, 8)
    assert after < before and after <= total_after // 2
    post = sorted(
        (r.x, r.y, r.payload)
        for r in d.read_delta(spark, path).collect()
    )
    assert post == pre
    # the OPTIMIZE commit records clusterBy (not zOrderBy)
    hist = {
        r.operation: r.operation_parameters
        for r in d.describe_history(spark, path).collect()
    }
    assert json.loads(hist["OPTIMIZE"]["clusterBy"]) == ["x", "y"]


def test_cluster_by_validation(spark, tmp_path):
    df = _scattered(spark, 64)
    with pytest.raises(ValueError, match="cannot also be partitioned"):
        d.write_delta(
            df, str(tmp_path / "a"), partition_by=["y"],
            cluster_by=["x"],
        )
    with pytest.raises(ValueError, match="1-4 columns"):
        d.write_delta(df, str(tmp_path / "b"), cluster_by=[])
    with pytest.raises(ValueError, match="not a data column"):
        d.write_delta(df, str(tmp_path / "c"), cluster_by=["nope"])
    p = str(tmp_path / "d")
    d.write_delta(df, p)
    with pytest.raises(ValueError, match="creation only"):
        d.write_delta(df, p, cluster_by=["x"])


def test_alter_cluster_by_and_sql_surface(spark, tmp_path):
    """SQL front-end: CREATE ... CLUSTER BY, ALTER ... CLUSTER BY,
    OPTIMIZE on a clustered table; plus upgrade of an UNclustered
    table (protocol gains the features in the ALTER commit)."""
    path = str(tmp_path / "t")
    cat: dict = {}
    dml_sql(
        spark,
        f"CREATE TABLE t (x bigint, y bigint, payload bigint) "
        f"USING delta CLUSTER BY (x, y) LOCATION '{path}'",
        cat,
    )
    assert d.clustering_columns(spark, path) == ["x", "y"]
    dml_sql(spark, "INSERT INTO t VALUES (1, 2, 3)", cat)
    dml_sql(spark, "ALTER TABLE t CLUSTER BY (y)", cat)
    assert d.clustering_columns(spark, path) == ["y"]
    assert dml_sql(spark, "OPTIMIZE t", cat) is not None
    # upgrading a plain table: ALTER adds features + domain
    p2 = str(tmp_path / "plain")
    d.write_delta(_scattered(spark, 64), p2)
    v = d.set_clustering_columns(spark, p2, ["x"])
    assert v == 1
    assert d.clustering_columns(spark, p2) == ["x"]
    _p, _m, _a, _t = d._replay(spark, p2, None)
    assert {"clustering", "domainMetadata"} <= set(
        _p.get("writerFeatures") or []
    )
    # iceberg refuses the clause
    with pytest.raises(ValueError, match="CLUSTER BY"):
        dml_sql(
            spark,
            f"CREATE TABLE i (x bigint) USING iceberg "
            f"CLUSTER BY (x) LOCATION '{tmp_path / 'i'}'",
            cat,
        )


def test_cluster_by_on_column_mapped_table(spark, tmp_path):
    """The domain stores PHYSICAL names on mapped tables; the reader
    maps them back to logical (delta-spark convention)."""
    path = str(tmp_path / "t")
    d.write_delta(
        _scattered(spark, 64),
        path,
        configuration={"delta.columnMapping.mode": "name"},
        cluster_by=["x"],
    )
    doms = d.replay_domains(spark, path)
    stored = json.loads(doms["delta.clustering"])["clusteringColumns"]
    assert stored[0][0].startswith("col-")  # physical, not logical
    assert d.clustering_columns(spark, path) == ["x"]
    d.optimize_delta(spark, path, target_file_bytes=5_000)
    assert d.read_delta(spark, path).count() == 64
