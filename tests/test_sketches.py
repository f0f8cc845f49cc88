"""Approximate-op guarantees: sketches are rows-only at the oracle
gate, so their error/superset properties are asserted here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_approx_quantiles_within_bound(spark):
    got = {
        r.priority: (r.q50_c, r.q90_c, r.q99_c)
        for r in QUERIES["approx_quantiles"](spark, SF).collect()
    }
    from census_asc5_data_pipeline_spark.catalog import read_table
    from census_asc5_data_pipeline_spark.functions import cents

    orders = read_table(spark, SF, "orders").select(
        "o_orderpriority", cents(F.col("o_totalprice")).alias("price_c")
    )
    exact = {
        r.o_orderpriority: r.q
        for r in orders.groupBy("o_orderpriority")
        .agg(F.percentile("price_c", [0.5, 0.9, 0.99]).alias("q"))
        .collect()
    }
    for prio, approx in got.items():
        for a, e in zip(approx, exact[prio]):
            # GK sketch with accuracy 1000 → rank error ≤ n/1000; value
            # error bounded loosely at 5% here
            assert abs(a - e) <= max(0.05 * e, 1), (prio, a, e)


def test_heavy_hitters_superset_of_true(spark):
    got = {r.term for r in QUERIES["heavy_hitters"](spark, SF).collect()}
    from census_asc5_data_pipeline_spark.catalog import read_table
    from census_asc5_data_pipeline_spark.functions import words

    docs = read_table(spark, SF, "documents")
    terms = docs.select(F.explode(words(F.col("text"))).alias("term"))
    total = terms.count()
    true_heavy = {
        r.term
        for r in terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total * 0.01)
        .collect()
    }
    # freqItems guarantees no false negatives at the support level
    assert true_heavy <= got


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag")
    spark.range(0, 10000).repartition(64).write.parquet(path)
    import os

    def count_parts():
        return sum(
            1
            for _, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    assert count_parts() == 64
    before = {r.id for r in spark.read.parquet(path).collect()}
    n = compact_parquet(spark, path, target_file_mb=512)
    assert n == 1 and count_parts() == 1
    assert {r.id for r in spark.read.parquet(path).collect()} == before


def test_hll_rollup_estimates_within_error_envelope(spark):
    from census_asc5_data_pipeline_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_type: r.approx_users
        for r in QUERIES["hll_rollup"](spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    import pyspark.sql.functions as F

    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, n in exact.items():
        # default lgConfigK=12 -> ~1.6% relative standard error; 5% is
        # a generous deterministic envelope at these cardinalities
        assert abs(got[k] - n) <= max(1, int(0.05 * n)), (k, got[k], n)


def test_theta_audience_matches_exact_set_algebra(spark):
    """Every pairwise theta estimate (a, b, both, either, only_a) must
    sit within the theta error envelope of the exact set-algebra
    counts; below sketch capacity (sf0.001's user sets) estimates are
    exact, so the envelope doubles as an exactness pin there."""
    from census_asc5_data_pipeline_spark.catalog import read_table

    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["theta_audience"](spark, SF).collect()
    }
    assert len(got) > 0
    ev = read_table(spark, SF, "events").select("event_type", "user_id")
    sets = {
        r.event_type: set(r.us)
        for r in ev.groupBy("event_type")
        .agg(F.collect_set("user_id").alias("us"))
        .collect()
    }
    # all unordered pairs must be present exactly once
    names = sorted(sets)
    want_pairs = {
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    }
    assert set(got) == want_pairs
    for (ta, tb), r in got.items():
        sa, sb = sets[ta], sets[tb]
        for est, exact in [
            (r.users_a, len(sa)),
            (r.users_b, len(sb)),
            (r.users_both, len(sa & sb)),
            (r.users_either, len(sa | sb)),
            (r.users_only_a, len(sa - sb)),
        ]:
            assert abs(est - exact) <= max(2, int(0.03 * exact))
