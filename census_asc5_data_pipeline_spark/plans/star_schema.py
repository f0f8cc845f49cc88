"""Dimensional-modeling builders — the engine's reference-parity core.

Re-expresses the reference's Athena view layer (report.md:444-495) as
composable DataFrame transforms:

- ``dim_view``       ≈ CREATE VIEW state_dim / year_dim  (DISTINCT + rename)
- ``measure_view``   ≈ CREATE VIEW income_measure / graduation_measure
- ``fact_join``      ≈ CREATE VIEW income_vs_graduation_fact
                       (composite-key measure⋈measure⋈dims join)
- ``multi_year_union`` ≈ the census_api per-year extract loop
                       (extractCensusACS5.py:17-45)

Scale notes: dimension views are tiny at any scale factor — ``fact_join``
broadcast-hints them so the only shuffle is the measure⋈measure join on
the composite key. Measures arrive pre-aggregated (one row per key), so
that join is small even when the underlying fact tables are 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_view(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """DISTINCT projection with renaming: ``{"n_nationkey": "nation_id"}``."""
    cols = [F.col(src).alias(dst) for src, dst in mapping.items()]
    return df.select(*cols).distinct()


def measure_view(
    df: DataFrame,
    keys: Mapping[str, Column | str],
    measures: Mapping[str, Column],
) -> DataFrame:
    """Keyed aggregate with renamed measure columns.

    ``keys``: output-name → source column/expression (the grain).
    ``measures``: output-name → aggregate expression.
    """
    key_cols = [
        (F.col(c) if isinstance(c, str) else c).alias(name) for name, c in keys.items()
    ]
    agg_cols = [m.alias(name) for name, m in measures.items()]
    return df.groupBy(*key_cols).agg(*agg_cols)


def fact_join(
    measures: Iterable[DataFrame],
    key_cols: list[str],
    dims: Iterable[tuple[DataFrame, list[str]]] = (),
) -> DataFrame:
    """Join pre-aggregated measures on a composite key, then decorate
    with (broadcast) dimension tables — the reference's fact view shape.
    """
    it = iter(measures)
    fact = next(it)
    for m in it:
        fact = fact.join(m, on=key_cols, how="inner")
    for dim, on in dims:
        fact = fact.join(F.broadcast(dim), on=on, how="inner")
    return fact


def multi_year_union(
    years: Iterable[int],
    extract: Callable[[int], DataFrame],
    year_col: str = "year",
) -> DataFrame:
    """Per-year extract loop → union with injected year literal.

    Mirrors the reference's ``census_api(columns, years)`` loop, but the
    loop only builds the logical plan — Catalyst sees one union and
    schedules all years' scans in parallel (the Lambda ran them serially).
    """
    frames = [
        extract(y).withColumn(year_col, F.lit(int(y)).cast("int")) for y in years
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
