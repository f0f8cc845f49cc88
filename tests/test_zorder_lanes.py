"""Z-order lane maps beyond numerics (round-16 verdict #3): strings
via LCP-stripped fixed-width UTF-8 prefixes, dates via epoch days,
timestamps via epoch micros — so real clustering keys (identifiers,
dates) get multi-dimensional skipping instead of falling back to
unclustered compaction. Numeric pins stay in test_delta_dv.py."""
from __future__ import annotations

import os
import urllib.parse as up

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.sources.bucketing import (
    _zorder_str_int,
    zorder_cluster,
)
from census_asc5_data_pipeline_spark.sources.delta_io import (
    _replay,
    optimize_delta,
    read_delta,
    write_delta,
)


def _file_ranges(spark, path: str, cols: list[str]) -> list[dict]:
    """Per-live-file {col: (min, max)} off the parquet footers."""
    _p, _m, adds, _t = _replay(spark, path, None)
    out = []
    for a in adds.values():
        pf = pq.ParquetFile(os.path.join(path, up.unquote(a["path"])))
        mins: dict = {c: None for c in cols}
        maxs: dict = {c: None for c in cols}
        for rg in range(pf.metadata.num_row_groups):
            for ci in range(pf.metadata.num_columns):
                col = pf.metadata.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    st = col.statistics
                    mins[name] = (
                        st.min
                        if mins[name] is None
                        else min(mins[name], st.min)
                    )
                    maxs[name] = (
                        st.max
                        if maxs[name] is None
                        else max(maxs[name], st.max)
                    )
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def test_zorder_str_int_is_monotone():
    """The driver-side string→int map must order exactly like the
    strings themselves (truncation keeps it non-strict)."""
    vals = ["", "a", "ab", "abc", "abcdefgh", "b", "ba", "z" * 12]
    ints = [_zorder_str_int(v, 0) for v in vals]
    assert ints == sorted(ints)
    # skip strips a shared prefix without reordering
    pref = ["Customer#0001", "Customer#0456", "Customer#0999"]
    stripped = [_zorder_str_int(v, 9) for v in pref]
    assert stripped == sorted(stripped) and len(set(stripped)) == 3


def test_optimize_zorder_by_string_key_improves_skipping(spark, tmp_path):
    """Planted-predicate pin on a STRING clustering key sharing a
    long common prefix — the LCP strip is what keeps the lanes
    discriminating (without it every row maps to one lane value)."""
    path = str(tmp_path / "t")
    n = 4096
    df = (
        spark.range(n)
        .select(
            F.format_string("Customer#%04d", (F.col("id") * 7919) % 64)
            .alias("s"),
            (F.col("id") % 64).alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )
    write_delta(df, path)

    def overlap(s_hi: str, y_hi: int) -> int:
        hits = 0
        for r in _file_ranges(spark, path, ["s", "y"]):
            smin, ymin = r["s"][0], r["y"][0]
            if smin is not None and smin < s_hi and (
                ymin is not None and ymin < y_hi
            ):
                hits += 1
        return hits

    assert overlap("Customer#0008", 8) == 8  # scattered: all files
    pre = sorted(
        (r.s, r.y, r.payload) for r in read_delta(spark, path).collect()
    )
    res = optimize_delta(
        spark, path, target_file_bytes=5_000, zorder_by=["s", "y"]
    )
    assert res["version"] is not None and res["files_after"] >= 4
    after = overlap("Customer#0008", 8)
    assert after < 8 and after <= res["files_after"] // 2
    post = sorted(
        (r.s, r.y, r.payload) for r in read_delta(spark, path).collect()
    )
    assert post == pre


def test_zorder_cluster_date_and_timestamp_lanes(spark, tmp_path):
    """Date/timestamp lanes: after clustering, each range partition
    covers a compact, non-interleaved slice of the time axis."""
    n = 2000
    df = spark.range(n).select(
        F.date_add(F.lit("1995-01-01"), ((F.col("id") * 37) % 1000).cast("int"))
        .alias("d"),
        F.col("id").alias("payload"),
    )
    out = zorder_cluster(df.repartition(8), ["d"], 4)
    rows = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .collect()
    )
    spans = sorted([(r.lo, r.hi) for r in rows])
    assert len(spans) == 4
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # single-column z-order = range sort: disjoint
    # ntz timestamps (the testdata flavor) take the unix_micros lane
    tdf = spark.range(500).select(
        F.col("id").cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 86400)
        .cast("timestamp_ntz")
        .alias("ts"),
    )
    assert zorder_cluster(tdf, ["ts"], 2).count() == 500


def test_zorder_unsupported_type_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id"), F.array(F.col("id")).alias("arr")
    )
    write_delta(df, path)
    with pytest.raises(NotImplementedError, match="out of scope"):
        optimize_delta(spark, path, zorder_by=["arr"])
    with pytest.raises(ValueError, match="zorder"):
        optimize_delta(spark, path, zorder_by=["nope"])
