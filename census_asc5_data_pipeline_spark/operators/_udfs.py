"""Arrow-vectorized pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations``: Spark
infers the UDF eval type from real type hints, and the future import
would turn them into strings it cannot parse.
"""

import zlib

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def zlib_ratio_ppm(texts: pd.Series) -> pd.Series:
    """len(zlib(text)) / len(text) in ppm; 0 for null/empty."""

    def one(t):
        if not t:
            return 0
        raw = t.encode("utf-8")
        return int(len(zlib.compress(raw, 6)) * 1000000 // len(raw))

    return pd.Series([one(t) for t in texts])
