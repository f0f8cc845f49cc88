"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship fact-join query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full SURVEY.md §2 registry
for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from census_asc5_data_pipeline_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's income_vs_graduation_fact analog
    (composite-key measure⋈measure⋈dim star join) at sf0.001."""
    return QUERIES["fact_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
