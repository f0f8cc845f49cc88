"""SQL time travel + SQL metadata views + column-level NOT NULL DDL
(round-13 verdict #4/#6/#7): the statement front-end accepts the
spellings lakehouse users actually type — ``VERSION AS OF`` /
``TIMESTAMP AS OF`` (delta-spark) and ``FOR SYSTEM_VERSION AS OF`` /
``FOR SYSTEM_TIME AS OF`` (Spark-Iceberg), quoted versions resolving
as Iceberg refs — with output row-identical to the Python readers;
``register_meta_views`` exposes history/snapshots/files to plain SQL;
``CREATE TABLE (col TYPE NOT NULL ...)`` binds non-null enforcement
from version 0 on both formats."""

from __future__ import annotations

import os

import pytest

from census_asc5_data_pipeline_spark.sources.merge import (
    dml_sql,
    query_sql,
)


def _setup_delta(spark, tmp_path):
    cat: dict = {}
    p = str(tmp_path / "td")
    dml_sql(
        spark,
        f"CREATE TABLE td (id BIGINT, v BIGINT) USING delta "
        f"LOCATION '{p}'",
        cat,
    )
    dml_sql(spark, "INSERT INTO td VALUES (1, 10)", cat)
    dml_sql(spark, "INSERT INTO td VALUES (2, 20)", cat)
    return cat, p


def test_delta_version_as_of_sql(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        read_delta,
    )

    cat, p = _setup_delta(spark, tmp_path)
    for v in (0, 1, 2):
        got = sorted(
            r.id
            for r in query_sql(
                spark, f"SELECT id FROM td VERSION AS OF {v}", cat
            ).collect()
        )
        want = sorted(
            r.id for r in read_delta(spark, p, version=v).collect()
        )
        assert got == want, v
    assert sorted(
        r.id for r in query_sql(spark, "SELECT id FROM td", cat).collect()
    ) == [1, 2]


def test_delta_timestamp_as_of_between_commits(spark, tmp_path):
    """An epoch-millis timestamp BETWEEN two commits resolves to the
    earlier version (commitInfo.timestamp semantics), identical to
    read_delta(timestamp_ms=)."""
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        describe_history,
        read_delta,
    )

    cat, p = _setup_delta(spark, tmp_path)
    hist = {
        r.version: r.timestamp_ms
        for r in describe_history(spark, p).collect()
    }
    if hist[2] - hist[1] < 2:
        pytest.skip("commits landed within 1 ms — no between point")
    mid = (hist[1] + hist[2]) // 2
    got = sorted(
        r.id
        for r in query_sql(
            spark, f"SELECT id FROM td TIMESTAMP AS OF {mid}", cat
        ).collect()
    )
    assert got == sorted(
        r.id for r in read_delta(spark, p, timestamp_ms=mid).collect()
    )
    assert got == [1]


def test_asof_joins_current_in_one_statement(spark, tmp_path):
    """One statement may mix an AS-OF reference and the current table
    — the rewrite resolves each mention independently."""
    cat, _p = _setup_delta(spark, tmp_path)
    rows = query_sql(
        spark,
        "SELECT cur.id FROM td cur LEFT ANTI JOIN "
        "(SELECT id FROM td VERSION AS OF 1) old ON cur.id = old.id",
        cat,
    ).collect()
    assert [r.id for r in rows] == [2]  # the row added after v1


def test_iceberg_system_version_and_time_sql(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        iceberg_snapshots,
        read_iceberg,
    )

    cat: dict = {}
    p = str(tmp_path / "ti")
    dml_sql(
        spark,
        f"CREATE TABLE ti (id BIGINT, v BIGINT) USING iceberg "
        f"LOCATION '{p}'",
        cat,
    )
    dml_sql(spark, "INSERT INTO ti VALUES (1, 10)", cat)
    dml_sql(spark, "INSERT INTO ti VALUES (2, 20)", cat)
    snaps = iceberg_snapshots(p)
    s_mid = snaps[1]  # after the first INSERT
    got = sorted(
        r.id
        for r in query_sql(
            spark,
            f"SELECT id FROM ti FOR SYSTEM_VERSION AS OF "
            f"{s_mid['snapshot-id']}",
            cat,
        ).collect()
    )
    assert got == sorted(
        r.id
        for r in read_iceberg(
            spark, p, snapshot_id=s_mid["snapshot-id"]
        ).collect()
    ) == [1]
    if snaps[2]["timestamp-ms"] - s_mid["timestamp-ms"] >= 2:
        mid_ms = (s_mid["timestamp-ms"] + snaps[2]["timestamp-ms"]) // 2
        got_t = sorted(
            r.id
            for r in query_sql(
                spark,
                f"SELECT id FROM ti FOR SYSTEM_TIME AS OF {mid_ms}",
                cat,
            ).collect()
        )
        assert got_t == [1]


def test_iceberg_quoted_version_resolves_ref(spark, tmp_path):
    """VERSION AS OF 'name' (Spark-Iceberg semantics) reads a ref —
    the SQL face of the WAP audit step."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        create_branch,
        write_iceberg,
    )

    cat: dict = {}
    p = str(tmp_path / "ti")
    dml_sql(
        spark,
        f"CREATE TABLE ti (id BIGINT, v BIGINT) USING iceberg "
        f"LOCATION '{p}'",
        cat,
    )
    dml_sql(spark, "INSERT INTO ti VALUES (1, 10)", cat)
    create_branch(p, "audit")
    write_iceberg(
        spark.createDataFrame([(2, 20)], "id bigint, v bigint"),
        p,
        branch="audit",
    )
    assert sorted(
        r.id
        for r in query_sql(
            spark, "SELECT id FROM ti VERSION AS OF 'audit'", cat
        ).collect()
    ) == [1, 2]
    assert sorted(
        r.id for r in query_sql(spark, "SELECT id FROM ti", cat).collect()
    ) == [1]
    # quoted versions are refs — an Iceberg concept; Delta refuses
    cat2, _ = _setup_delta(spark, tmp_path)
    with pytest.raises(ValueError, match="Iceberg feature"):
        query_sql(spark, "SELECT id FROM td VERSION AS OF 'x'", cat2)


def test_register_meta_views_delta(spark, tmp_path):
    from census_asc5_data_pipeline_spark.plans.sql_views import (
        register_meta_views,
    )
    from census_asc5_data_pipeline_spark.sources.delta_io import (
        delta_files_meta,
        describe_history,
    )

    cat, p = _setup_delta(spark, tmp_path)
    views = register_meta_views(spark, "td", "delta", p)
    assert views == ["td__history", "td__detail", "td__files"]
    assert (
        spark.sql("SELECT COUNT(*) c FROM td__history").collect()[0].c
        == describe_history(spark, p).count()
        == 3
    )
    assert (
        spark.sql(
            "SELECT COUNT(*) c FROM td__files "
            "WHERE has_deletion_vector"
        ).collect()[0].c
        == 0
    )
    assert (
        spark.sql("SELECT COUNT(*) c FROM td__files").collect()[0].c
        == delta_files_meta(spark, p).count()
    )
    assert (
        spark.sql("SELECT min_writer_version FROM td__detail")
        .collect()[0][0]
        == 2
    )


def test_register_meta_views_iceberg(spark, tmp_path):
    from census_asc5_data_pipeline_spark.plans.sql_views import (
        register_meta_views,
    )
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        create_branch,
        write_iceberg,
    )

    p = str(tmp_path / "ti")
    write_iceberg(
        spark.createDataFrame([(1, 10)], "id bigint, v bigint"), p
    )
    write_iceberg(
        spark.createDataFrame([(2, 20)], "id bigint, v bigint"), p
    )
    create_branch(p, "dev")
    views = register_meta_views(spark, "ti", "iceberg", p)
    assert views == [
        "ti__snapshots",
        "ti__history",
        "ti__refs",
        "ti__files",
        "ti__manifests",
    ]
    assert spark.sql("SELECT COUNT(*) c FROM ti__snapshots").collect()[0].c == 2
    refs = spark.sql(
        "SELECT name, type, snapshot_id FROM ti__refs"
    ).collect()
    assert [(r.name, r.type) for r in refs] == [("dev", "branch")]
    assert spark.sql("SELECT COUNT(*) c FROM ti__files").collect()[0].c >= 1


def test_create_table_not_null_both_formats(spark, tmp_path):
    """Column-level NOT NULL in the DDL column list binds at birth:
    a violating INSERT refuses on both formats, clean inserts pass
    (delta: nullable=false schema fields → NOT NULL writer checks;
    iceberg: required=true fields → _check_required)."""
    for fmt, msg in (
        ("delta", "NOT NULL id"),
        ("iceberg", "required"),
    ):
        cat: dict = {}
        p = str(tmp_path / f"nn_{fmt}")
        dml_sql(
            spark,
            f"CREATE TABLE nn (id BIGINT NOT NULL, v BIGINT) "
            f"USING {fmt} LOCATION '{p}'",
            cat,
        )
        dml_sql(spark, "INSERT INTO nn VALUES (1, 10)", cat)
        with pytest.raises(ValueError, match=msg):
            dml_sql(spark, "INSERT INTO nn VALUES (NULL, 20)", cat)
        assert sorted(
            r.id
            for r in query_sql(spark, "SELECT id FROM nn", cat).collect()
        ) == [1]


def test_restore_sql_both_formats(spark, tmp_path):
    """RESTORE [TABLE] t TO VERSION AS OF n routes to restore_delta /
    rollback_iceberg; the timestamp spelling resolves through the
    same as-of rules as reads."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        iceberg_snapshots,
    )

    cat, _p = _setup_delta(spark, tmp_path)
    dml_sql(spark, "RESTORE TABLE td TO VERSION AS OF 1", cat)
    assert sorted(
        r.id for r in query_sql(spark, "SELECT id FROM td", cat).collect()
    ) == [1]
    # history preserved: the pre-restore state is still travelable
    assert sorted(
        r.id
        for r in query_sql(
            spark, "SELECT id FROM td VERSION AS OF 2", cat
        ).collect()
    ) == [1, 2]

    pi = str(tmp_path / "ti")
    dml_sql(
        spark,
        f"CREATE TABLE ti (id BIGINT, v BIGINT) USING iceberg "
        f"LOCATION '{pi}'",
        cat,
    )
    dml_sql(spark, "INSERT INTO ti VALUES (1, 10)", cat)
    dml_sql(spark, "INSERT INTO ti VALUES (2, 20)", cat)
    first_ins = iceberg_snapshots(pi)[1]["snapshot-id"]
    dml_sql(spark, f"RESTORE ti TO VERSION AS OF {first_ins}", cat)
    assert sorted(
        r.id for r in query_sql(spark, "SELECT id FROM ti", cat).collect()
    ) == [1]
