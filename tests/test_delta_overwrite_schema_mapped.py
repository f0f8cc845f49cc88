"""overwriteSchema on COLUMN-MAPPED tables (r16, r15 verdict #4):
the replacement schema mints fresh physicalName/columnMapping.id per
field ABOVE the old maxColumnId (never reused — a reused id would
alias old physical bytes onto a new column), the commit stays atomic
(one metaData action, same table id), old versions time-travel under
the old mapping, and follow-up DML + CDF run green."""
from __future__ import annotations

import json

import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d


def _field_meta(meta: dict) -> list[tuple[str, int, str]]:
    sch = json.loads(meta["schemaString"])
    return [
        (
            f["name"],
            f["metadata"]["delta.columnMapping.id"],
            f["metadata"]["delta.columnMapping.physicalName"],
        )
        for f in sch["fields"]
    ]


def test_overwrite_schema_remints_mapping(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(4)
        .coalesce(1)
        .select(F.col("id"), F.lit("a").alias("v")),
        p,
        configuration={
            "delta.columnMapping.mode": "name",
            "delta.enableChangeDataFeed": "true",
        },
    )
    _p0, meta0, _a0, _t0 = d._replay(spark, p, None)
    old = _field_meta(meta0)
    assert meta0["configuration"]["delta.columnMapping.maxColumnId"] == "2"
    d.write_delta(
        spark.range(3)
        .coalesce(1)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("w")),
        p,
        mode="overwrite",
        overwrite_schema=True,
    )
    _p1, meta1, adds1, _t1 = d._replay(spark, p, None)
    new = _field_meta(meta1)
    assert [n for n, _i, _ph in new] == ["k", "w"]
    # ids minted ABOVE the old max, physical names all fresh
    old_ids = {i for _n, i, _ph in old}
    old_phys = {ph for _n, _i, ph in old}
    assert all(i > max(old_ids) for _n, i, _ph in new)
    assert all(ph not in old_phys for _n, _i, ph in new)
    assert meta1["configuration"]["delta.columnMapping.maxColumnId"] == "4"
    assert meta1["id"] == meta0["id"]  # same table
    # current read: only the new logical columns, nothing leaks
    cur = d.read_delta(spark, p)
    assert cur.columns == ["k", "w"] and cur.count() == 3
    # the staged files carry the NEW physical names
    import os as _os
    import urllib.parse as _up

    import pyarrow.parquet as _pq

    new_phys = {ph for _n, _i, ph in new}
    for a in adds1.values():
        names = set(
            _pq.ParquetFile(
                _os.path.join(p, _up.unquote(a["path"]))
            ).schema_arrow.names
        )
        assert names == new_phys
    # old version still time-travels under the OLD mapping
    v0 = d.read_delta(spark, p, version=0)
    assert v0.columns == ["id", "v"] and v0.count() == 4


def test_follow_up_dml_and_cdf_after_replacement(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(4)
        .coalesce(1)
        .select(F.col("id"), F.lit("a").alias("v")),
        p,
        configuration={
            "delta.columnMapping.mode": "name",
            "delta.enableChangeDataFeed": "true",
        },
    )
    rv = d.write_delta(
        spark.range(3)
        .coalesce(1)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("w")),
        p,
        mode="overwrite",
        overwrite_schema=True,
    )
    d.write_delta(
        spark.range(3, 5)
        .coalesce(1)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("w")),
        p,
    )
    d.delete_delta_where(spark, p, "k = 0", mode="cow")
    assert sorted(r.k for r in d.read_delta(spark, p).collect()) == [
        1, 2, 3, 4,
    ]
    # CDF over the post-replacement range: insert + delete images
    cdf, _last = d.read_delta_cdf(spark, p, since_version=rv)
    got = sorted(
        (r._change_type, r.k) for r in cdf.collect()
    )
    assert ("insert", 3) in got and ("insert", 4) in got
    assert ("delete", 0) in got


def test_mapped_staging_stamps_parquet_field_ids(spark, tmp_path):
    """late r16: every staged file of a column-mapped table carries
    each column's delta.columnMapping.id as a PARQUET field id —
    id-mode readers bind columns by field id, so files without them
    are unreadable to a by-id foreign reader; name-mode readers
    ignore the footer metadata. Pins the append, DML-rewrite, and
    overwrite staging paths."""
    import json
    import os

    import pyarrow.parquet as pq

    from census_asc5_data_pipeline_spark.sources import delta_io as d
    from census_asc5_data_pipeline_spark.sources.merge import (
        update_where,
    )

    path = str(tmp_path / "t")
    d.write_delta(
        spark.createDataFrame([(1, 10), (2, 20)], "id bigint, v bigint"),
        path,
        configuration={"delta.columnMapping.mode": "name"},
    )
    update_where(spark, "delta", path, "id = 2", {"v": "v + 1"})
    _v, meta, adds, _tx = d._replay(spark, path, None)
    ids = d._mapping_ids(meta)
    phys = d._column_mapping(meta)
    assert ids and phys
    id_of_phys = {phys[k]: v for k, v in ids.items()}
    assert len(adds) >= 2  # original + rewritten file
    for a in adds.values():
        fp = os.path.join(path, a["path"])
        sch = pq.ParquetFile(fp).schema_arrow
        for name in sch.names:
            if name not in id_of_phys:
                continue
            md = sch.field(name).metadata or {}
            got = md.get(b"PARQUET:field_id")
            assert got is not None, (a["path"], name)
            assert int(got) == id_of_phys[name], (a["path"], name)
