"""Capture explain('formatted') for registry queries into plans/r16/.

Usage: python tools/capture_plans.py <suffix> <outdir> <query> [query ...]
Runs each query fn (construct may execute eagerly for write-path rows)
and writes <outdir>/<query>_<suffix>.txt.
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    suffix, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from census_asc5_data_pipeline_spark import get_spark
    from census_asc5_data_pipeline_spark.catalog import assert_utc
    from census_asc5_data_pipeline_spark.queries import QUERIES, unpersist_deps

    spark = get_spark("capture-plans")
    assert_utc(spark)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(p)
        unpersist_deps(df)
        spark.catalog.clearCache()
        print(f"wrote {name}_{suffix}.txt", flush=True)

if __name__ == "__main__":
    main()
