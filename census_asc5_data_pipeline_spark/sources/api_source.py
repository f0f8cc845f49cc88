"""Paginated row-API extract source — the engine's analog of the
reference's Lambda extract (extractCensusACS5.py:17-45): call an API
per year, promote the first row to a header, inject the year column,
union the years.

The HTTP layer is pluggable (``fetcher``) so tests inject a fake and
production injects a real client; the default raises — this container
has no network. Fetching happens on the DRIVER (census-API responses
are small); the returned rows immediately become a distributed
DataFrame, so everything downstream scales. For truly large paginated
APIs, distribute page fetches instead: parallelize the page-id list and
fetch inside ``mapInPandas``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fetcher(columns, year) -> list of rows, row 0 = header (census JSON shape)
Fetcher = Callable[[str, str], list[list[str]]]


def _no_network_fetcher(columns: str, year: str) -> list[list[str]]:
    raise NotImplementedError(
        "no HTTP client in this environment — inject a fetcher(columns, year)"
    )


def extract_api(
    spark: SparkSession,
    columns: str,
    years: Sequence[str],
    fetcher: Fetcher = _no_network_fetcher,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """Multi-year API extract → one DataFrame with a ``year`` column."""
    frames: list[DataFrame] = []
    for year in years:
        rows = fetcher(columns, year)
        header, data = rows[0], rows[1:]
        df = spark.createDataFrame(data, schema=list(header)).withColumn(
            "year", F.lit(int(year)).cast("int")
        )
        frames.append(df)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    if rename:
        # Simultaneous rename (pandas df.rename semantics): a chained
        # withColumnsRenamed would cascade {"NAME": "state",
        # "state": "state_id"} into two state_id columns.
        out = out.select(
            *[F.col(c).alias(rename.get(c, c)) for c in out.columns]
        )
    return out
