"""Replay the reference pipeline on the reference's own CSV exports and
assert the same facts report.md verifies by hand (row counts, the
52-states × 2-years shape, spot values from the printed Lambda log)."""

from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.plans.census import (
    census_views,
    load_census_csvs,
    serving_query,
)

CSV_DIR = "/root/reference/csv"


@pytest.fixture(scope="module")
def views(spark):
    return census_views(load_census_csvs(spark, CSV_DIR))


def test_extract_row_counts(spark):
    # extractCensusACS5.py's printed output: 104 rows per dataset
    t = load_census_csvs(spark, CSV_DIR)
    assert t["states"].count() == 104
    assert t["incomes"].count() == 104
    assert t["grads"].count() == 104


def test_state_dim_distinct(views):
    # 52 distinct states (50 + DC + PR), one row each (report.md:451)
    assert views["state_dim"].count() == 52
    assert views["state_dim"].select("state_id").distinct().count() == 52


def test_year_dim(views):
    years = sorted(r.year for r in views["year_dim"].collect())
    assert years == [2017, 2018]


def test_fact_join_shape(views):
    # income ⋈ graduation on (state_id, year) ⋈ state_dim: still 104
    fact = views["income_vs_graduation_fact"]
    assert fact.count() == 104
    assert set(fact.columns) == {"state", "year", "income", "graduation"}


def test_fact_spot_values(views):
    # Lambda log spot-check: Mississippi 2017 → income 42009, grad 21.3
    row = (
        views["income_vs_graduation_fact"]
        .filter("state = 'Mississippi' AND year = 2017")
        .collect()
    )
    assert len(row) == 1
    assert row[0].income == 42009.0
    assert row[0].graduation == 21.3


def test_serving_query(views):
    out = serving_query(views["income_vs_graduation_fact"], year=2018)
    rows = {r.state: r for r in out.collect()}
    assert len(rows) == 52
    assert rows["Maryland"].avg_median_household_income == 81868.0


@pytest.fixture(scope="module")
def sql_views(spark):
    from census_asc5_data_pipeline_spark.plans.sql_views import register_census_views

    t = load_census_csvs(spark, CSV_DIR)
    register_census_views(spark, t["states"], t["incomes"], t["grads"])
    return spark


def test_sql_view_layer_matches_reference_shapes(sql_views):
    spark = sql_views
    assert spark.sql("SELECT * FROM state_dim").count() == 52
    assert spark.sql("SELECT * FROM income_vs_graduation_fact").count() == 104
    cols = spark.sql("SELECT * FROM income_vs_graduation_fact").columns
    # the exact Athena view column names survive
    assert cols == ["Median Household Income", "Graduation Rate", "State", "Year"]


def test_sql_view_layer_matches_dataframe_plan(sql_views, views):
    spark = sql_views
    got = {
        (r.State, r.Year): (r["Median Household Income"], r["Graduation Rate"])
        for r in spark.sql("SELECT * FROM income_vs_graduation_fact").collect()
    }
    want = {
        (r.state, r.year): (r.income, r.graduation)
        for r in views["income_vs_graduation_fact"].collect()
    }
    assert got == want


def test_sql_scalar_functions(spark):
    from census_asc5_data_pipeline_spark.plans.sql_views import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    r = spark.sql(
        "SELECT engine_words('A b  C') AS w, engine_cents(1.005) AS c, "
        "engine_token_count('x y z') AS n, "
        "engine_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos"
    ).collect()[0]
    assert r.w == ["a", "b", "c"]
    assert r.c == 100  # FLOOR(x*100+0.5) — identical to the engine helper
    assert r.n == 3
    assert abs(r.cos - 1.0) < 1e-12


def test_adhoc_sql_over_testdata(spark):
    from census_asc5_data_pipeline_spark.plans.sql_views import run_sql

    out = run_sql(
        spark,
        "/root/testdata/sf0.001",
        """
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3
        """,
    )
    rows = out.collect()
    assert len(rows) == 3 and all(r.n > 0 for r in rows)
