"""Iceberg sort orders (r13 — table-spec §Sorting):
`update_sort_order` / `ALTER TABLE … WRITE ORDERED BY` register a
default sort order; writes then cluster rows with a zero-shuffle
in-task sort, stamping `sort_order_id` on the staged data files —
declared-order clustering that tightens manifest bounds for the
skipping evaluator."""

from __future__ import annotations

import random

import pyarrow.parquet as pq
import pytest

from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
from census_asc5_data_pipeline_spark.sources.merge import dml_sql


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_sort_order_registration_and_write(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, [(1, "a")]).coalesce(1), path)
    ice.update_sort_order(path, ["k DESC NULLS LAST"])
    _v, meta = ice._current_metadata(path)
    assert meta["default-sort-order-id"] == 1
    assert meta["sort-orders"][1]["fields"] == [
        {
            "transform": "identity",
            "source-id": 1,
            "direction": "desc",
            "null-order": "nulls-last",
        }
    ]
    rows = [(i, f"v{i}") for i in random.Random(7).sample(range(1000), 200)]
    ice.write_iceberg(_mk(spark, rows).coalesce(1), path, mode="append")
    _v, meta = ice._current_metadata(path)
    data, _dels = ice._snapshot_files(path, meta, None, spark=spark)
    sorted_files = [d for d in data if d.get("sort_order_id") == 1]
    assert sorted_files
    ks = pq.read_table(
        ice._local(sorted_files[0]["file_path"])
    ).column("k").to_pylist()
    assert ks == sorted(ks, reverse=True)  # clustered in-file
    assert ice.read_iceberg(spark, path).count() == 201


def test_sort_orders_survive_writes_and_reset(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, [(1, "a")]).coalesce(1), path)
    cat = {"t": ("iceberg", path)}
    dml_sql(spark, "ALTER TABLE t WRITE ORDERED BY (k ASC, v DESC)", cat)
    ice.write_iceberg(_mk(spark, [(2, "b")]).coalesce(1), path, mode="append")
    _v, meta = ice._current_metadata(path)
    assert len(meta["sort-orders"]) == 2  # survives the write
    assert meta["default-sort-order-id"] == 1
    # identical order is a no-op
    v0 = ice._current_metadata(path)[0]
    assert ice.update_sort_order(path, ["k", "v DESC"]) == v0
    dml_sql(spark, "ALTER TABLE t WRITE UNORDERED", cat)
    _v, meta = ice._current_metadata(path)
    assert meta["default-sort-order-id"] == 0
    ice.write_iceberg(_mk(spark, [(3, "c")]).coalesce(1), path, mode="append")
    _v, meta = ice._current_metadata(path)
    data, _dels = ice._snapshot_files(path, meta, None, spark=spark)
    assert all(not d.get("sort_order_id") for d in data[-1:])


def test_sort_order_defaults_and_errors(spark, tmp_path):
    path = str(tmp_path / "t")
    ice.write_iceberg(_mk(spark, [(1, "a")]).coalesce(1), path)
    ice.update_sort_order(path, ["k"])
    _v, meta = ice._current_metadata(path)
    f = meta["sort-orders"][1]["fields"][0]
    # spec defaults: ASC -> nulls-first
    assert (f["direction"], f["null-order"]) == ("asc", "nulls-first")
    ice.update_sort_order(path, ["v DESC"])
    _v, meta = ice._current_metadata(path)
    f = next(
        o for o in meta["sort-orders"] if o["order-id"] == 2
    )["fields"][0]
    assert (f["direction"], f["null-order"]) == ("desc", "nulls-last")
    with pytest.raises(ValueError, match="not in the table schema"):
        ice.update_sort_order(path, ["nope"])
    with pytest.raises(ValueError, match="Iceberg sort-order"):
        dml_sql(
            spark,
            "ALTER TABLE d WRITE ORDERED BY (k)",
            {"d": ("delta", str(tmp_path / "d"))},
        )
