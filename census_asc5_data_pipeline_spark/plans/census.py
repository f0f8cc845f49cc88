"""End-to-end replay of the reference census pipeline, Spark-first.

Reference flow (extractCensusACS5.py + report.md):
  API extract per year → header promotion → rename → CSV on object
  store → external tables → DISTINCT dim views → measure views →
  composite-key fact join → serving aggregate.

Here the same dataflow is a single declarative plan over whichever
source is available (live fetcher, or the CSVs the reference itself
produced). Catalyst fuses the view layers; nothing materializes until
the serving query runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from census_asc5_data_pipeline_spark.plans.star_schema import dim_view, fact_join
from census_asc5_data_pipeline_spark.sources.csv_source import read_csv

STATES_SCHEMA = T.StructType(
    [
        T.StructField("state", T.StringType()),
        T.StructField("state_id", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
    ]
)
INCOME_SCHEMA = T.StructType(
    [
        T.StructField("median_household_income", T.DoubleType()),
        T.StructField("state_id", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
    ]
)
GRAD_SCHEMA = T.StructType(
    [
        T.StructField("graduation_rate", T.DoubleType()),
        T.StructField("state_id", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
    ]
)


def load_census_csvs(spark: SparkSession, csv_dir: str) -> dict[str, DataFrame]:
    """Schema-on-read over the reference's own CSV exports
    (report.md:380-435's Athena DDL, as explicit Spark schemas)."""
    return {
        "states": read_csv(
            spark, f"{csv_dir}/census_acs5_states.csv", STATES_SCHEMA
        ),
        "incomes": read_csv(
            spark,
            f"{csv_dir}/census_acs5_median_household_incomes.csv",
            INCOME_SCHEMA,
        ),
        "grads": read_csv(
            spark, f"{csv_dir}/census_acs5_graduation_rates.csv", GRAD_SCHEMA
        ),
    }


def census_views(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """The reference's Athena view layer (report.md:444-495)."""
    state_dim = dim_view(tables["states"], {"state_id": "state_id", "state": "state"})
    year_dim = dim_view(tables["states"], {"year": "year"})
    income_measure = tables["incomes"].select(
        F.col("median_household_income").alias("income"),
        "state_id",
        F.col("year").alias("year_id"),
    ).distinct()
    grad_measure = tables["grads"].select(
        F.col("graduation_rate").alias("graduation"),
        "state_id",
        F.col("year").alias("year_id"),
    ).distinct()
    # join year_dim too (report.md:489-494 joins it on year_id = Year):
    # a year present in the measures but absent from states must drop,
    # exactly as the SQL view layer (plans/sql_views.py) does.
    year_dim_j = year_dim.withColumnRenamed("year", "year_id")
    fact = fact_join(
        [income_measure, grad_measure],
        ["state_id", "year_id"],
        [(state_dim, ["state_id"]), (year_dim_j, ["year_id"])],
    ).select("state", F.col("year_id").alias("year"), "income", "graduation")
    return {
        "state_dim": state_dim,
        "year_dim": year_dim,
        "income_measure": income_measure,
        "graduation_measure": grad_measure,
        "income_vs_graduation_fact": fact,
    }


def serving_query(fact: DataFrame, year: int = 2018) -> DataFrame:
    """The Quicksight visual (report.md:507-519): averages by state for
    one year."""
    return (
        fact.filter(F.col("year") == year)
        .groupBy("state")
        .agg(
            F.avg("graduation").alias("avg_graduation_rate"),
            F.avg("income").alias("avg_median_household_income"),
        )
    )
