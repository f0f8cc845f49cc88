"""SQL catalog introspection verbs (r14 — r13 verdict #6): SHOW
TABLES, DESCRIBE [TABLE|HISTORY|DETAIL], DROP TABLE/VIEW, CREATE
[OR REPLACE] VIEW — the front-end spoke every DML/DDL verb except
introspection; SQL users had to drop to Python to see what they
made."""

from __future__ import annotations

import os

import pytest

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import (
    dml_sql,
    query_sql,
)


@pytest.fixture()
def cat(spark, tmp_path):
    catalog: dict = {}
    dml_sql(
        spark,
        "CREATE TABLE dt (k BIGINT, g INT, v STRING) USING delta "
        f"PARTITIONED BY (g) LOCATION '{tmp_path / 'dt'}'",
        catalog,
    )
    dml_sql(
        spark,
        "INSERT INTO dt VALUES (1, 0, 'a'), (2, 1, 'b'), (3, 0, 'c')",
        catalog,
    )
    dml_sql(
        spark,
        "CREATE TABLE it (k BIGINT, v STRING) USING iceberg "
        f"LOCATION '{tmp_path / 'it'}'",
        catalog,
    )
    dml_sql(spark, "INSERT INTO it VALUES (10, 'x')", catalog)
    return catalog


def test_show_tables(spark, cat):
    rows = query_sql(spark, "SHOW TABLES", cat).collect()
    assert {(r.table_name, r.format) for r in rows} == {
        ("dt", "delta"),
        ("it", "iceberg"),
    }
    assert all(os.path.isdir(r.location) for r in rows)
    only = query_sql(spark, "SHOW TABLES LIKE 'd*'", cat).collect()
    assert [r.table_name for r in only] == ["dt"]


def test_describe_table(spark, cat):
    rows = query_sql(spark, "DESCRIBE TABLE dt", cat).collect()
    byname = {r.col_name: r for r in rows}
    assert set(byname) == {"k", "g", "v"}
    assert byname["k"].data_type == "bigint"
    assert byname["g"].is_partition is True
    assert byname["v"].is_partition is False
    # bare DESCRIBE and iceberg
    rows = query_sql(spark, "DESC it", cat).collect()
    assert {(r.col_name, r.data_type) for r in rows} == {
        ("k", "long"),
        ("v", "string"),
    }


def test_describe_history_and_detail(spark, cat):
    hist = query_sql(spark, "DESCRIBE HISTORY dt", cat).collect()
    ops = [r.operation for r in hist]
    assert ops[0] == "WRITE" and len(ops) >= 2  # create + insert
    det = query_sql(spark, "DESCRIBE DETAIL dt", cat).collect()[0]
    assert det.format == "delta" and det.partition_columns == ["g"]
    assert det.num_files > 0
    ih = query_sql(spark, "DESCRIBE HISTORY it", cat).collect()
    assert any(r.is_current for r in ih)
    idet = query_sql(spark, "DESCRIBE DETAIL it", cat).collect()[0]
    assert idet.format == "iceberg" and idet.num_snapshots >= 1


def test_create_view_and_query(spark, cat):
    dml_sql(
        spark,
        "CREATE VIEW big AS SELECT k, v FROM dt WHERE k >= 2",
        cat,
    )
    got = query_sql(spark, "SELECT * FROM big ORDER BY k", cat).collect()
    assert [(r.k, r.v) for r in got] == [(2, "b"), (3, "c")]
    # views show in SHOW TABLES and DESCRIBE
    rows = query_sql(spark, "SHOW TABLES", cat).collect()
    assert ("big", "view") in {(r.table_name, r.format) for r in rows}
    desc = query_sql(spark, "DESCRIBE big", cat).collect()
    assert {r.col_name for r in desc} == {"k", "v"}
    # views see table WRITES made after creation (not frozen)
    dml_sql(spark, "INSERT INTO dt VALUES (9, 1, 'z')", cat)
    got = query_sql(spark, "SELECT COUNT(*) AS n FROM big", cat).first()
    assert got.n == 3
    # view-on-view
    dml_sql(
        spark, "CREATE VIEW bigger AS SELECT k FROM big WHERE k > 2", cat
    )
    got = query_sql(
        spark, "SELECT k FROM bigger ORDER BY k", cat
    ).collect()
    assert [r.k for r in got] == [3, 9]
    # plain CREATE VIEW refuses to clobber; OR REPLACE succeeds
    with pytest.raises(ValueError, match="already exists"):
        dml_sql(spark, "CREATE VIEW big AS SELECT 1 AS x", cat)
    dml_sql(
        spark,
        "CREATE OR REPLACE VIEW big AS SELECT k FROM dt WHERE k = 1",
        cat,
    )
    assert query_sql(spark, "SELECT * FROM big", cat).count() == 1
    # broken definitions fail at CREATE and leave no entry
    with pytest.raises(Exception):
        dml_sql(
            spark, "CREATE VIEW broke AS SELECT nope FROM dt", cat
        )
    assert "broke" not in cat


def test_views_refuse_write_verbs(spark, cat):
    dml_sql(spark, "CREATE VIEW v1 AS SELECT k FROM dt", cat)
    with pytest.raises(ValueError, match="view"):
        dml_sql(spark, "INSERT INTO v1 VALUES (1)", cat)
    with pytest.raises(ValueError, match="view"):
        dml_sql(spark, "DELETE FROM v1 WHERE k = 1", cat)


def test_drop_table_and_view(spark, cat, tmp_path):
    dml_sql(spark, "CREATE VIEW v2 AS SELECT k FROM dt", cat)
    dml_sql(spark, "DROP VIEW v2", cat)
    assert "v2" not in cat
    # kind mismatch refuses
    with pytest.raises(ValueError, match="DROP TABLE"):
        dml_sql(spark, "DROP VIEW dt", cat)
    path = cat["it"][1]
    dml_sql(spark, "DROP TABLE it", cat)
    assert "it" not in cat
    assert os.path.isdir(path)  # no PURGE: data stays on disk
    # IF EXISTS is a no-op for missing names; plain DROP raises
    dml_sql(spark, "DROP TABLE IF EXISTS it", cat)
    with pytest.raises(ValueError, match="not in catalog"):
        dml_sql(spark, "DROP TABLE it", cat)
    # PURGE removes the files
    dpath = cat["dt"][1]
    dml_sql(spark, "DROP TABLE dt PURGE", cat)
    assert not os.path.exists(dpath)


def test_view_cycle_refuses(spark, cat):
    cat["loop_v"] = ("view", "SELECT * FROM loop_v")
    with pytest.raises(ValueError, match="cycle"):
        query_sql(spark, "SELECT * FROM loop_v", cat)


def test_show_create_table_round_trips(spark, cat, tmp_path):
    """r14: SHOW CREATE TABLE reconstructs a runnable dml_sql CREATE
    — fed back through the router it recreates an equivalent table."""
    stmt = query_sql(spark, "SHOW CREATE TABLE dt", cat).first(
    ).createtab_stmt
    assert "USING delta" in stmt and "PARTITIONED BY (g)" in stmt
    # runnable: re-create at a new location under a new name
    clone_stmt = stmt.replace(
        f"LOCATION '{cat['dt'][1]}'",
        f"LOCATION '{tmp_path / 'dt2'}'",
    ).replace("CREATE TABLE dt (", "CREATE TABLE dt2 (", 1)
    dml_sql(spark, clone_stmt, cat)
    assert cat["dt2"][0] == "delta"
    desc = {
        (r.col_name, r.data_type, r.is_partition)
        for r in query_sql(spark, "DESCRIBE dt2", cat).collect()
    }
    want = {
        (r.col_name, r.data_type, r.is_partition)
        for r in query_sql(spark, "DESCRIBE dt", cat).collect()
    }
    assert desc == want
    # iceberg with a transform renders the DDL vocabulary back
    dml_sql(
        spark,
        "CREATE TABLE bt (k BIGINT, s STRING) USING iceberg "
        "PARTITIONED BY (bucket(4, k)) "
        f"LOCATION '{tmp_path / 'bt'}'",
        cat,
    )
    istmt = query_sql(spark, "SHOW CREATE TABLE bt", cat).first(
    ).createtab_stmt
    assert "USING iceberg" in istmt
    assert "bucket(4, k)" in istmt
    # views render their stored definition
    dml_sql(spark, "CREATE VIEW sv AS SELECT k FROM dt", cat)
    vstmt = query_sql(spark, "SHOW CREATE TABLE sv", cat).first(
    ).createtab_stmt
    assert vstmt == "CREATE VIEW sv AS SELECT k FROM dt"
