"""Durable census catalog — the engine's analog of the reference's
persistent Athena database (report.md:380-495, Quicksight reconnect at
report.md:497-505).

``plans.sql_views`` registers the view layer as TEMPORARY views: ideal
for one-shot pipelines, gone when the session ends. A BI tool that
reconnects (the reference's Quicksight step) needs durable names, so
this module persists the same layer into a metastore-backed database:
base tables via ``saveAsTable`` (parquet in the warehouse dir) and the
reference's five views as PERSISTENT views (``CREATE OR REPLACE VIEW``,
not TEMPORARY) — a fresh session pointing at the same warehouse +
metastore reads everything by name, no registration step.

Locally the metastore is embedded Derby (``durable_session``); on a
real cluster the same code runs against the shared Hive metastore or
Unity-style catalog the cluster provides — only the session builder
changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from census_asc5_data_pipeline_spark.plans.sql_views import CENSUS_VIEW_SQL

DEFAULT_DATABASE = "censusacs5data"

# base-table names the view DDL references (sql_views registers these
# as temp views; here they become metastore tables in the database)
_BASE_TABLES = ("states", "median_household_incomes", "graduation_rates")


def durable_session(
    warehouse_dir: str, derby_dir: str, app: str = "census_catalog"
) -> SparkSession:
    """Metastore-backed local session: catalog state lives in Derby at
    ``derby_dir`` and table data under ``warehouse_dir`` — both survive
    the JVM, which is what makes the catalog durable."""
    return (
        SparkSession.builder.master("local[4]")
        .appName(app)
        .config("spark.sql.warehouse.dir", warehouse_dir)
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={derby_dir}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )


def persist_census_catalog(
    spark: SparkSession,
    states: DataFrame,
    incomes: DataFrame,
    grads: DataFrame,
    database: str = DEFAULT_DATABASE,
) -> None:
    """Write base tables + the reference's five views as a durable
    database (idempotent: overwrites tables, replaces views)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, df in zip(_BASE_TABLES, (states, incomes, grads)):
        df.write.mode("overwrite").saveAsTable(f"{database}.{name}")
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase(database)
    try:
        for view, ddl in CENSUS_VIEW_SQL.items():
            # same view SQL as the temp layer, persisted: drop the
            # TEMPORARY keyword so the definition lands in the metastore
            spark.sql(
                ddl.replace(
                    "CREATE OR REPLACE TEMPORARY VIEW", "CREATE OR REPLACE VIEW"
                )
            )
    finally:
        spark.catalog.setCurrentDatabase(prev)


def analyze_catalog(
    spark: SparkSession, database: str = DEFAULT_DATABASE
) -> dict[str, int]:
    """Collect table + column statistics for every base table —
    the metastore half of cost-based optimization.

    At 100 TB the cost-based optimizer (join reordering,
    broadcast-threshold decisions, ``spark.sql.cbo.enabled``) is only
    as good as its statistics; a catalog without ANALYZE data falls
    back to size-on-disk guesses. One ``ANALYZE TABLE ... COMPUTE
    STATISTICS FOR ALL COLUMNS`` per table writes rowCount/sizeInBytes
    plus per-column NDV/min/max/null counts into the metastore — the
    scan is one pass per table and runs fully distributed.

    Returns {table: rowCount} as read back from the catalog, so
    callers (and the test) can assert the stats actually landed.
    """
    out: dict[str, int] = {}
    for name in _BASE_TABLES:
        spark.sql(
            f"ANALYZE TABLE {database}.{name} COMPUTE STATISTICS FOR ALL COLUMNS"
        )
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {database}.{name}").collect()
        stats = {r.col_name: r.data_type for r in desc}
        # "Statistics" row shape: "<bytes> bytes, <rows> rows"
        stat_line = stats.get("Statistics", "")
        rows = 0
        for tok_i, tok in enumerate(parts := stat_line.split()):
            if tok.startswith("rows") and tok_i > 0:
                rows = int(parts[tok_i - 1])
        out[name] = rows
    return out
