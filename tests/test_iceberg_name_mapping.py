"""Iceberg name-mapping fallback (round-13 verdict #5, table-spec
§Column Projection): a foreign data file WITHOUT parquet field-id
stamps reads through ``schema.name-mapping.default`` across a rename;
files with neither ids nor mapping still gate."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from census_asc5_data_pipeline_spark.sources.iceberg_io import (
    _parse_name_mapping,
    read_iceberg,
    rename_iceberg_column,
    set_iceberg_properties,
    write_iceberg,
)


def _mk(spark, rows, ddl="id bigint, v bigint"):
    return spark.createDataFrame(rows, ddl)


def _swap_in_unstamped(spark, path, rows, ddl):
    """Replace the table's single live data file with a hand-staged
    UNSTAMPED parquet (plain spark write — no parquet.field.id
    metadata) under the SAME file path, simulating a foreign writer
    that never stamped ids."""
    import pyarrow.parquet as pq

    data_dir = os.path.join(path, "data")
    live = [
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    staging = os.path.join(path, f".unstamped-{uuid.uuid4().hex}")
    _mk(spark, rows, ddl).coalesce(1).write.parquet(staging)
    src = next(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    # exactly one NON-EMPTY live file expected (the table was created
    # from a coalesce(1) frame) — swap the unstamped parquet under it
    non_empty = [
        p for p in live if pq.ParquetFile(p).metadata.num_rows > 0
    ]
    assert len(non_empty) == 1, non_empty
    os.replace(src, non_empty[0])


def test_parse_name_mapping_shapes():
    mapping = _parse_name_mapping(
        {
            "properties": {
                "schema.name-mapping.default": json.dumps(
                    [
                        {"field-id": 1, "names": ["id", "customer_id"]},
                        {"field-id": 2, "names": ["v"]},
                        {
                            "field-id": 3,
                            "names": ["s"],
                            "fields": [
                                {"field-id": 4, "names": ["x"]}
                            ],
                        },
                    ]
                )
            }
        }
    )
    assert mapping == {
        "id": 1, "customer_id": 1, "v": 2, "s": 3, "s.x": 4,
    }
    assert _parse_name_mapping({"properties": {}}) is None


def test_unstamped_file_reads_through_name_mapping(spark, tmp_path):
    """WAP-era foreign table: the data file has NO field-id stamps
    and the column was RENAMED (old physical name 'v' → current
    'amount'); the declared name mapping binds v→2, so the read
    resolves — and without the mapping it gates."""
    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10), (2, 20)]).coalesce(1), path)
    _swap_in_unstamped(
        spark, path, [(1, 10), (2, 20)], "id bigint, v bigint"
    )
    rename_iceberg_column(path, "v", "amount")
    # renamed history + unstamped file + no mapping → gate
    with pytest.raises(NotImplementedError, match="name-mapping"):
        read_iceberg(spark, path).collect()
    set_iceberg_properties(
        path,
        {
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["id"]},
                    {"field-id": 2, "names": ["v", "amount"]},
                ]
            )
        },
    )
    got = sorted(
        (r.id, r.amount) for r in read_iceberg(spark, path).collect()
    )
    assert got == [(1, 10), (2, 20)]


def test_stamped_files_ignore_mapping(spark, tmp_path):
    """Field-id stamps WIN over the mapping (spec rule): a bogus
    mapping must not mis-bind this engine's own stamped files."""
    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, 10)]), path)
    rename_iceberg_column(path, "v", "amount")
    set_iceberg_properties(
        path,
        {
            "schema.name-mapping.default": json.dumps(
                # deliberately WRONG: maps id-column name to field 2
                [{"field-id": 2, "names": ["id"]}]
            )
        },
    )
    got = [(r.id, r.amount) for r in read_iceberg(spark, path).collect()]
    assert got == [(1, 10)]
