"""Schema-on-read CSV ingest — the engine's analog of the reference's
Athena external tables (report.md:380-435: LazySimpleSerDe CSV with
``skip.header.line.count=1``) and of pandas' header-promotion
(extractCensusACS5.py:32-34).

Always pass an explicit schema in production: ``inferSchema`` is a
full extra pass over the data — at 100 TB that is a second 100 TB scan.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    rename: Mapping[str, str] | None = None,
    **options: str,
) -> DataFrame:
    """Header CSV read with explicit schema and a rename map (the
    reference renames API column codes to readable names,
    extractCensusACS5.py:71-84)."""
    reader = spark.read.option("header", "true").option("encoding", "UTF-8")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # tests/small files only
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    if rename:
        # Simultaneous rename (pandas semantics) — chained renames
        # cascade when an old name equals another entry's new name.
        from pyspark.sql import functions as F

        df = df.select(*[F.col(c).alias(rename.get(c, c)) for c in df.columns])
    return df
