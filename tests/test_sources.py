from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from census_asc5_data_pipeline_spark.sources.api_source import extract_api
from census_asc5_data_pipeline_spark.sources.csv_source import read_csv
from census_asc5_data_pipeline_spark.sources.sinks import write_csv, write_parquet


def fake_census_fetcher(columns: str, year: str) -> list[list[str]]:
    """Census-API-shaped response: row 0 is the header."""
    base = [[columns, "state"], ["Alpha", "1"], ["Beta", "2"]]
    if year == "2018":
        base.append(["Gamma", "3"])
    return base


def test_extract_api_multi_year(spark):
    df = extract_api(
        spark,
        "NAME",
        ["2017", "2018"],
        fetcher=fake_census_fetcher,
        rename={"NAME": "state", "state": "state_id"},
    )
    assert df.columns == ["state", "state_id", "year"]
    assert df.count() == 5  # 2 + 3
    assert df.filter("year = 2018").count() == 3


def test_csv_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    out = str(tmp_path / "csv_out")
    write_csv(df, out, single_file=True)
    back = read_csv(spark, out, schema=schema, rename={"v": "val"})
    assert back.columns == ["k", "val"]
    assert sorted(r.k for r in back.collect()) == [1, 2]


def test_parquet_partitioned_sink(spark, tmp_path):
    df = spark.range(10).withColumn("p", (F.col("id") % 2).cast("int"))
    out = str(tmp_path / "pq")
    write_parquet(df, out, partition_by=["p"])
    back = spark.read.parquet(out)
    assert back.count() == 10
    # partition pruning: only one directory read
    pruned = back.filter(F.col("p") == 1)
    assert pruned.count() == 5
