"""The reference's SQL surface, on Spark.

The reference's users query Athena VIEWs (report.md:450-495); this
module registers the same view layer as Spark temporary views so every
SQL query they run today runs here unchanged (modulo the Athena
``"Quoted Identifier"`` style, which Spark writes with backticks —
the view/column NAMES are kept identical).

Also registers the driver testdata tables as views so ad-hoc
``spark.sql(...)`` works over the whole catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from census_asc5_data_pipeline_spark.catalog import read_table

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Spark-SQL re-expression of the reference's Athena view DDL
# (report.md:450-495). Athena double-quoted identifiers become
# backticks; the qualified censusacs5data.* base tables become the
# temp views registered from the extract outputs.
CENSUS_VIEW_SQL: dict[str, str] = {
    "state_dim": """
        CREATE OR REPLACE TEMPORARY VIEW state_dim AS
        SELECT DISTINCT state_id, state AS State FROM states
    """,
    "year_dim": """
        CREATE OR REPLACE TEMPORARY VIEW year_dim AS
        SELECT DISTINCT year AS Year FROM states
    """,
    "income_measure": """
        CREATE OR REPLACE TEMPORARY VIEW income_measure AS
        SELECT DISTINCT median_household_income AS `Median Household Income`,
               state_id, year AS year_id
        FROM median_household_incomes
    """,
    "graduation_measure": """
        CREATE OR REPLACE TEMPORARY VIEW graduation_measure AS
        SELECT DISTINCT graduation_rate AS `Graduation Rate`,
               state_id, year AS year_id
        FROM graduation_rates
    """,
    "income_vs_graduation_fact": """
        CREATE OR REPLACE TEMPORARY VIEW income_vs_graduation_fact AS
        SELECT income_measure.`Median Household Income`,
               graduation_measure.`Graduation Rate`,
               state_dim.State, year_dim.Year
        FROM income_measure
        JOIN graduation_measure
          ON income_measure.state_id = graduation_measure.state_id
         AND income_measure.year_id = graduation_measure.year_id
        JOIN state_dim ON graduation_measure.state_id = state_dim.state_id
        JOIN year_dim ON graduation_measure.year_id = year_dim.Year
    """,
}


def register_census_views(
    spark: SparkSession,
    states: DataFrame,
    incomes: DataFrame,
    grads: DataFrame,
) -> None:
    """Register base tables + the five reference views. Views are lazy
    — Catalyst fuses the whole layer into each query's plan, so there
    is no materialization cost to stacking them."""
    states.createOrReplaceTempView("states")
    incomes.createOrReplaceTempView("median_household_incomes")
    grads.createOrReplaceTempView("graduation_rates")
    for ddl in CENSUS_VIEW_SQL.values():
        spark.sql(ddl)


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Every driver testdata table as a temp view (ad-hoc SQL surface)."""
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_testdata_views(spark, sf_dir)
    return spark.sql(sql)


# SQL scalar UDFs (CREATE FUNCTION ... RETURN expr): pure expression
# macros, inlined by Catalyst into the calling plan — zero Python, full
# codegen, unlike spark.udf.register.
SQL_FUNCTION_DDL: dict[str, str] = {
    "engine_words": """
        CREATE OR REPLACE TEMPORARY FUNCTION engine_words(s STRING)
        RETURNS ARRAY<STRING> RETURN split(lower(s), '\\\\s+')
    """,
    "engine_cents": """
        CREATE OR REPLACE TEMPORARY FUNCTION engine_cents(x DOUBLE)
        RETURNS BIGINT RETURN CAST(FLOOR(x * 100 + 0.5) AS BIGINT)
    """,
    "engine_token_count": """
        CREATE OR REPLACE TEMPORARY FUNCTION engine_token_count(s STRING)
        RETURNS BIGINT RETURN CAST(size(split(lower(s), '\\\\s+')) AS BIGINT)
    """,
    "engine_cosine": """
        CREATE OR REPLACE TEMPORARY FUNCTION engine_cosine(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
        RETURNS DOUBLE RETURN
            aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
            / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))
               * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)))
    """,
}


def table_changes(
    spark: SparkSession,
    fmt: str,
    path: str,
    start: int,
    end: int | None = None,
) -> DataFrame:
    """delta-spark's ``table_changes(name, start, end)`` TVF as an
    engine function (round-12 verdict #7): the Change Data Feed rows
    of a ``delta`` table for versions ``[start, end]`` (INCLUSIVE
    start, delta-spark semantics; ``read_delta_cdf``'s cursor is
    exclusive, so the translation happens here), or of an ``iceberg``
    table for snapshots strictly after ``start`` (snapshot-id cursor —
    Iceberg ids are not dense versions, so the start is the usual
    exclusive cursor; pass 0/None-equivalent for the full history).
    Columns = table schema + ``_change_type`` + the commit tag
    (``_commit_version`` / ``_snapshot_id``)."""
    if fmt == "delta":
        from census_asc5_data_pipeline_spark.sources.delta_io import (
            read_delta_cdf,
        )

        df, _last = read_delta_cdf(
            spark, path, since_version=int(start) - 1, end_version=end
        )
        return df
    if fmt == "iceberg":
        from census_asc5_data_pipeline_spark.sources.iceberg_io import (
            read_iceberg_changes,
        )

        if end is not None:
            raise ValueError(
                "iceberg table_changes has no end cursor — snapshot "
                "ids are not dense; read up to the current snapshot"
            )
        df, _last = read_iceberg_changes(
            spark, path, since_snapshot_id=int(start) or None
        )
        return df
    raise ValueError(f"unsupported format {fmt!r} (delta|iceberg)")


def register_table_changes_view(
    spark: SparkSession,
    name: str,
    fmt: str,
    path: str,
    start: int,
    end: int | None = None,
) -> str:
    """Register :func:`table_changes` output as a temp view
    ``<name>__changes`` so the change feed is reachable from plain
    SQL exactly like the AS-OF views (``register_delta_views`` /
    ``register_iceberg_views`` twins)::

        register_table_changes_view(spark, "sales", "delta", p, 1)
        spark.sql("SELECT * FROM sales__changes WHERE _change_type = 'delete'")

    The view reads an immutable version range, so concurrent commits
    never change a registered view. Returns the view name."""
    vname = f"{name}__changes"
    table_changes(spark, fmt, path, start, end).createOrReplaceTempView(
        vname
    )
    return vname


def register_meta_views(
    spark: SparkSession, name: str, fmt: str, path: str
) -> list[str]:
    """Expose a table's METADATA tables to plain SQL (round-13
    verdict #6 — the sql_views twin of r12's ``table_changes``):

    - delta: ``<name>__history`` (DESCRIBE HISTORY),
      ``<name>__detail`` (DESCRIBE DETAIL), ``<name>__files``
      (the live add-file set)
    - iceberg: ``<name>__snapshots`` / ``__history`` / ``__refs`` /
      ``__files`` / ``__manifests`` (the spec's metadata-table
      surface, via :func:`iceberg_io.read_iceberg_meta`)

    Each view captures the state AT registration (metadata-scale
    DataFrames, not live subqueries) — re-register after commits, the
    ``table_changes`` discipline. Returns the view names."""
    out: list[str] = []
    if fmt == "delta":
        from census_asc5_data_pipeline_spark.sources.delta_io import (
            delta_files_meta,
            describe_detail,
            describe_history,
        )

        for suffix, df in (
            ("history", describe_history(spark, path)),
            ("detail", describe_detail(spark, path)),
            ("files", delta_files_meta(spark, path)),
        ):
            vname = f"{name}__{suffix}"
            df.createOrReplaceTempView(vname)
            out.append(vname)
        return out
    if fmt == "iceberg":
        from census_asc5_data_pipeline_spark.sources.iceberg_io import (
            read_iceberg_meta,
        )

        for suffix in ("snapshots", "history", "refs", "files",
                       "manifests"):
            vname = f"{name}__{suffix}"
            read_iceberg_meta(spark, path, suffix).createOrReplaceTempView(
                vname
            )
            out.append(vname)
        return out
    raise ValueError(f"unsupported format {fmt!r} (delta|iceberg)")


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the engine's column helpers to SQL users as named scalar
    functions, so the Athena-style SQL surface can call the engine's
    primitives (tokenize, fixed-point cents, cosine) without leaving
    SQL or paying a Python round-trip."""
    for ddl in SQL_FUNCTION_DDL.values():
        spark.sql(ddl)
