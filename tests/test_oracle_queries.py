"""Every oracled query in SURVEY.md §2 hash-matches DuckDB at sf0.001
(the same comparison the driver applies at sf0.01)."""

from __future__ import annotations

import pytest

from census_asc5_data_pipeline_spark.queries import ORACLES, QUERIES
from tests.conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
