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


def census_url(
    columns: str,
    year: str,
    api_key: str,
    base_url: str = "https://api.census.gov/data/",
    dataset: str = "acs/acs5/profile",
    state: str = "*",
) -> str:
    """The reference's exact request-URL shape
    (extractCensusACS5.py:13-27): one GET per year,
    ``{base}{year}/{dataset}?get={columns}&for=state:{state}&key={key}``.
    Split out so the URL construction is unit-testable without any
    network (tests/test_sources.py asserts the loop + URL shape)."""
    return f"{base_url}{year}/{dataset}?get={columns}&for=state:{state}&key={api_key}"


def make_requests_fetcher(
    api_key: str,
    base_url: str = "https://api.census.gov/data/",
    dataset: str = "acs/acs5/profile",
    state: str = "*",
    timeout_s: float = 30.0,
) -> Fetcher:
    """Production fetcher backed by ``requests`` — parity with the
    reference's Lambda loop (extractCensusACS5.py:17-45): GET the
    census JSON (a list of rows, row 0 = header) for one year.

    NOT exercised in this container (no network, and ``requests`` may
    be absent — it is imported lazily so merely constructing pipelines
    never needs it). Usage::

        fetcher = make_requests_fetcher(api_key=os.environ["API_KEY"])
        df = extract_api(spark, COLUMNS, ["2016", "2021"], fetcher)
    """

    def fetch(columns: str, year: str) -> list[list[str]]:
        import requests  # lazy: only needed when actually fetching

        url = census_url(columns, year, api_key, base_url, dataset, state)
        response = requests.get(url, timeout=timeout_s)
        response.raise_for_status()
        return response.json()

    return fetch


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
