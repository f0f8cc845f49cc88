"""Catalog NTZ-normalization contract (ADVICE round 3).

The reference's Athena layer reads naive timestamps as UTC instants
(report.md:368-435); ``read_table`` must preserve that contract even
when (a) a caller resets ``spark.sql.session.timeZone`` after the read
but before the action, and (b) column names contain dots.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ntz_dir(spark, tmp_path_factory):
    """A parquet table with a dotted-name TIMESTAMP_NTZ column."""
    d = tmp_path_factory.mktemp("ntzsf")
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 1, 12, 0, 0))], "id bigint, ts timestamp"
    ).select(
        "id",
        F.col("ts").cast("timestamp_ntz").alias("dotted.ts"),
        F.col("ts").cast("timestamp_ntz").alias("plain_ts"),
    )
    df.write.parquet(str(d / "tzcheck.parquet"))
    return str(d)


def test_ntz_cast_handles_dotted_names_and_utc_epoch(spark, ntz_dir):
    from census_asc5_data_pipeline_spark.catalog import read_table

    df = read_table(spark, ntz_dir, "tzcheck")
    # the dotted column survives as a top-level TIMESTAMP column
    assert dict(df.dtypes)["dotted.ts"] == "timestamp"
    us = df.select(F.unix_micros(F.col("`dotted.ts`")).alias("us")).head().us
    expected = int(
        datetime.datetime(
            2024, 3, 1, 12, 0, 0, tzinfo=datetime.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    assert us == expected


def test_assert_utc_is_loud(spark):
    from census_asc5_data_pipeline_spark.catalog import assert_utc

    assert_utc(spark)  # pinned by read_table/get_spark — passes
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(AssertionError, match="not 'UTC'"):
            assert_utc(spark)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_ntz_filter_still_pushes_down(spark, ntz_dir):
    """The CAST normalization must not block parquet predicate pushdown
    (the reason catalog.py uses CAST, not to_utc_timestamp)."""
    from census_asc5_data_pipeline_spark.catalog import read_table

    df = read_table(spark, ntz_dir, "tzcheck").filter(
        F.col("plain_ts") <= "2024-06-01"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThanOrEqual" in plan


def test_read_table_matches_duckdb_epoch(spark, duck):
    """events.ts normalization agrees with DuckDB reading the same file."""
    from census_asc5_data_pipeline_spark.catalog import read_table

    sf = "/root/testdata/sf0.001"
    got = (
        read_table(spark, sf, "events")
        .select(F.min(F.unix_micros("ts")).alias("us"))
        .head()
        .us
    )
    want = duck.execute(
        "SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) FROM events"
    ).fetchone()[0]
    assert got == want
