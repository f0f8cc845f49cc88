"""Durable-catalog round trip: one JVM persists the census database
(tables + PERSISTENT views), a second, completely fresh JVM reads the
views by name with no registration step — the reference's Quicksight
reconnect scenario (report.md:497-505)."""

from __future__ import annotations

import subprocess
import sys

CSV_DIR = "/root/reference/csv"

_WRITER = """
import sys
sys.path.insert(0, {repo!r})
from census_asc5_data_pipeline_spark.plans.census import load_census_csvs
from census_asc5_data_pipeline_spark.plans.persistent_catalog import (
    durable_session, persist_census_catalog,
)
spark = durable_session({wh!r}, {derby!r}, app="catalog_writer")
t = load_census_csvs(spark, {csv!r})
persist_census_catalog(spark, t["states"], t["incomes"], t["grads"])
print("WROTE", spark.sql(
    "SELECT COUNT(*) AS n FROM censusacs5data.income_vs_graduation_fact"
).collect()[0].n)
spark.stop()
"""

_READER = """
import sys
sys.path.insert(0, {repo!r})
from census_asc5_data_pipeline_spark.plans.persistent_catalog import durable_session
spark = durable_session({wh!r}, {derby!r}, app="catalog_reader")
tables = sorted(
    r.tableName for r in spark.sql("SHOW TABLES IN censusacs5data").collect()
)
print("TABLES", ",".join(tables))
rows = spark.sql(
    "SELECT COUNT(*) AS n, COUNT(DISTINCT State) AS s "
    "FROM censusacs5data.income_vs_graduation_fact"
).collect()[0]
print("FACT", rows.n, rows.s)
serving = spark.sql(
    "SELECT Year, COUNT(*) AS n FROM censusacs5data.income_vs_graduation_fact "
    "GROUP BY Year ORDER BY Year"
).collect()
print("YEARS", ",".join(f"{{r.Year}}:{{r.n}}" for r in serving))
spark.stop()
"""


def _run(code: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_catalog_survives_a_fresh_session(tmp_path):
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    wh = str(tmp_path / "warehouse")
    derby = str(tmp_path / "derby")
    w = _run(_WRITER.format(repo=repo, wh=wh, derby=derby, csv=CSV_DIR))
    assert "WROTE 104" in w  # 52 states x 2 years (report.md's own check)

    r = _run(_READER.format(repo=repo, wh=wh, derby=derby))
    # base tables AND persistent views are all visible by name
    for t in (
        "states",
        "median_household_incomes",
        "graduation_rates",
        "state_dim",
        "year_dim",
        "income_measure",
        "graduation_measure",
        "income_vs_graduation_fact",
    ):
        assert t in r, r
    assert "FACT 104 52" in r
    assert "YEARS 2017:52,2018:52" in r


def test_analyze_catalog_lands_cbo_stats(tmp_path):
    """ANALYZE writes rowCount + column NDV stats the CBO can use."""
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    wh = str(tmp_path / "wh_an")
    derby = str(tmp_path / "derby_an")
    code = _ANALYZER.format(repo=repo, wh=wh, derby=derby, csv=CSV_DIR)
    out = _run(code)
    assert "ROWS graduation_rates=104 median_household_incomes=104 states=104" in out, out
    assert "NDV_OK" in out, out


_ANALYZER = """
import sys
sys.path.insert(0, {repo!r})
from census_asc5_data_pipeline_spark.plans.census import load_census_csvs
from census_asc5_data_pipeline_spark.plans.persistent_catalog import (
    durable_session, persist_census_catalog, analyze_catalog,
)
spark = durable_session({wh!r}, {derby!r}, app="catalog_analyzer")
t = load_census_csvs(spark, {csv!r})
persist_census_catalog(spark, t["states"], t["incomes"], t["grads"])
rows = analyze_catalog(spark)
print("ROWS " + " ".join(f"{{k}}={{v}}" for k, v in sorted(rows.items())))
desc = spark.sql(
    "DESCRIBE EXTENDED censusacs5data.states state_id"
).collect()
kv = {{r.info_name: r.info_value for r in desc}}
if kv.get("distinct_count") not in (None, "NULL"):
    print("NDV_OK", kv["distinct_count"])
spark.stop()
"""
