from __future__ import annotations

from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.operators.cdc import (
    scd1_upsert,
    scd2_from_snapshots,
)


def test_scd1_update_insert_keep(spark):
    dim = spark.createDataFrame(
        [(1, 100, "a"), (2, 200, "b"), (3, 300, "c")], ["k", "bal", "seg"]
    )
    upd = spark.createDataFrame(
        [(2, 999, None), (4, 400, "d")], dim.schema
    )
    out = {r.k: (r.bal, r.seg) for r in scd1_upsert(dim, upd, "k").collect()}
    assert out[1] == (100, "a")  # untouched
    # MERGE UPDATE SET semantics: the matched row takes the update
    # payload VERBATIM — the explicit NULL seg overwrites "b"
    assert out[2] == (999, None)
    assert out[3] == (300, "c")  # untouched
    assert out[4] == (400, "d")  # inserted
    assert len(out) == 4


def test_scd1_explicit_null_update_lands(spark):
    """Regression: per-column coalesce kept the stale value on an
    intentional NULL update; the matched-flag selection must not."""
    dim = spark.createDataFrame([(1, 100)], "k INT, bal INT")
    upd = spark.createDataFrame([(1, None)], "k INT, bal INT")
    out = scd1_upsert(dim, upd, "k").collect()
    assert len(out) == 1
    assert out[0].bal is None


def test_scd2_collapses_equal_runs(spark):
    snaps = spark.createDataFrame(
        [
            (1, 2015, "x"),
            (1, 2016, "x"),  # same payload — same range
            (1, 2017, "y"),  # change
            (1, 2018, "x"),  # change back — NEW range (not merged with 2015)
            (2, 2016, "z"),
        ],
        ["k", "yr", "val"],
    )
    out = scd2_from_snapshots(snaps, "k", "yr", ["val"])
    rows = sorted(
        ((r.k, r.valid_from, r.valid_to, r.val, r.is_current) for r in out.collect())
    )
    assert rows == [
        (1, 2015, 2017, "x", False),
        (1, 2017, 2018, "y", False),
        (1, 2018, None, "x", True),
        (2, 2016, None, "z", True),
    ]


def test_scd2_null_payload_transitions(spark):
    snaps = spark.createDataFrame(
        [(1, 1, None), (1, 2, None), (1, 3, "a")], "k INT, yr INT, val STRING"
    )
    out = sorted(
        ((r.valid_from, r.valid_to, r.val) for r in
         scd2_from_snapshots(snaps, "k", "yr", ["val"]).collect())
    )
    # null==null is NOT a change (eqNullSafe); null→'a' is
    assert out == [(1, 3, None), (3, None, "a")]


def test_cdc_apply_full_semantics(spark):
    from census_asc5_data_pipeline_spark.operators.cdc import cdc_apply

    snap = spark.createDataFrame(
        [(1, 100, "a"), (2, 200, "b"), (3, 300, "c"), (4, 400, "d")],
        "k bigint, v bigint, s string",
    )
    # key 1: two updates, seq 20 wins; key 2: delete; key 3: untouched;
    # key 5: insert of a NEW key; key 6: delete of an ABSENT key (noop);
    # key 4: update to an explicit NULL payload (must land, not coalesce)
    chg = spark.createDataFrame(
        [
            (1, 10, "U", 111, "x"),
            (1, 20, "U", 122, "y"),
            (2, 11, "D", None, None),
            (5, 12, "I", 555, "new"),
            (6, 13, "D", None, None),
            (4, 14, "U", None, "kept-null-v"),
        ],
        "k bigint, seq bigint, op string, v bigint, s string",
    )
    got = {r.k: (r.v, r.s) for r in cdc_apply(snap, chg, "k").collect()}
    assert got == {
        1: (122, "y"),       # latest seq wins
        3: (300, "c"),       # untouched passthrough
        4: (None, "kept-null-v"),  # explicit NULL update applied
        5: (555, "new"),     # insert
    }  # 2 deleted, 6 never existed


def test_cdc_apply_matches_replay_model(spark):
    """Property test: cdc_apply == a sequential dict replay of the
    changelog in seq order, on randomized op streams."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from census_asc5_data_pipeline_spark.operators.cdc import cdc_apply

    op_st = st.tuples(
        st.integers(0, 6),                      # key
        st.sampled_from("IUD"),                 # op
        st.one_of(st.none(), st.integers(0, 99)),  # payload v
    )

    @settings(max_examples=15, deadline=None)
    @given(st.lists(op_st, min_size=0, max_size=12))
    def check(ops):
        snap_rows = [(k, k * 10) for k in range(4)]
        chg_rows = [(k, seq, op, v) for seq, (k, op, v) in enumerate(ops)]
        # model: replay in seq order over a dict
        model = dict(snap_rows)
        for k, _seq, op, v in sorted(chg_rows, key=lambda r: r[1]):
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = v
        snap = spark.createDataFrame(snap_rows, "k bigint, v bigint")
        chg = spark.createDataFrame(
            chg_rows, "k bigint, seq bigint, op string, v bigint"
        ) if chg_rows else spark.createDataFrame([], "k bigint, seq bigint, op string, v bigint")
        got = {r.k: r.v for r in cdc_apply(snap, chg, "k").collect()}
        assert got == model

    check()


def test_incremental_agg_matches_full_recompute(spark):
    from census_asc5_data_pipeline_spark.operators.cdc import (
        cdc_apply,
        incremental_agg,
    )

    # snapshot: groups a(2 rows), b(1), c(1, will empty out), d untouched
    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40), (5, "d", 50)],
        ["k", "g", "v"],
    )
    base = snap.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("val_sum")
    )
    chg = spark.createDataFrame(
        [
            (1, 1, "U", "a", 11),   # in-place value update
            (2, 1, "U", "e", 21),   # group move a -> e (new group)
            (4, 1, "D", None, None),  # empties group c entirely
            (9, 1, "I", "b", 99),   # brand-new key into b
            (99, 1, "D", None, None),  # delete of an absent key: no-op
            (3, 1, "U", "b", 31),
            (3, 2, "D", None, None),  # later seq wins: key 3 deleted
        ],
        ["k", "seq", "op", "g", "v"],
    )
    got = {
        (r.g, r.n_rows, r.val_sum)
        for r in incremental_agg(
            base,
            snap,
            chg,
            key="k",
            group_col="g",
            value_col="v",
            count_col="n_rows",
            sum_col="val_sum",
        ).collect()
    }
    want = {
        (r.g, r.n_rows, r.val_sum)
        for r in cdc_apply(snap, chg, "k")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("val_sum"))
        .collect()
    }
    assert got == want
    gs = {g for g, _, _ in got}
    assert "c" not in gs      # emptied group dropped
    assert {"d", "e"} <= gs   # untouched group kept; moved-to group present
