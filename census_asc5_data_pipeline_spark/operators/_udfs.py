"""Arrow-vectorized pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations``: Spark
infers the UDF eval type from real type hints, and the future import
would turn them into strings it cannot parse.
"""

import zlib

import pandas as pd


def _zlib_ratio_impl(texts: pd.Series) -> pd.Series:
    """len(zlib(text)) / len(text) in ppm; 0 for null/empty."""

    def one(t):
        if not t:
            return 0
        raw = t.encode("utf-8")
        return int(len(zlib.compress(raw, 6)) * 1000000 // len(raw))

    return pd.Series([one(t) for t in texts])


def zlib_ratio_ppm():
    """Build the pandas UDF lazily: decorating at module import would
    parse the DDL return type, and executors import this module (for
    the applyInPandas kernels) with no active session."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf("bigint")(_zlib_ratio_impl)


def fit_trend(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: least-squares slope+intercept of value_c
    over ts_ms per group (numpy lstsq — genuinely not a SQL shape).
    Input cols: key, ts_ms, value_c. One output row per group."""
    import numpy as np

    x = pdf["ts_ms"].to_numpy(dtype="float64")
    y = pdf["value_c"].to_numpy(dtype="float64")
    n = len(x)
    if n < 2 or np.all(x == x[0]):
        slope, intercept = 0.0, float(y.mean()) if n else 0.0
    else:
        slope, intercept = np.polyfit(x - x.min(), y, 1)
    return pd.DataFrame(
        {
            "key": [pdf["key"].iloc[0]],
            "n": [n],
            "slope_ppb": [int(slope * 1e9 // 1)],
            "intercept_c": [int(intercept // 1)],
        }
    )
