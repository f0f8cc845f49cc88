from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from census_asc5_data_pipeline_spark import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con


def assert_oracle_match(spark, con, name: str, sf_dir: str = SF_SMALL) -> None:
    """Same comparison the driver applies: row count + column names +
    order-insensitive value equality."""
    from census_asc5_data_pipeline_spark.catalog import assert_utc
    from census_asc5_data_pipeline_spark.queries import ORACLES, QUERIES

    assert_utc(spark)  # epoch comparisons below assume naive-as-UTC
    from census_asc5_data_pipeline_spark.queries import unpersist_deps

    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    # Release operator-persisted intermediates: Spark substitutes
    # cached plans by logical-plan equality, so a leaked cache changes
    # LATER tests' rendered plans (shuffle-budget counts) and
    # accumulates blocks across the parametrized sweep.
    unpersist_deps(sdf)
    rel = con.sql(ORACLES[name])
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns), name
    assert len(srows) == len(drows), f"{name}: {len(srows)} != {len(drows)}"
    order_s = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    order_d = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    ns = sorted(tuple(repr(r[i]) for i in order_s) for r in srows)
    nd = sorted(tuple(repr(r[i]) for i in order_d) for r in drows)
    assert ns == nd, f"{name}: value mismatch, first diff: " + str(
        next((a, b) for a, b in zip(ns, nd) if a != b)
    )
