from __future__ import annotations

from census_asc5_data_pipeline_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _components(rows):
    return {r.node: r.component for r in rows}


def test_cc_basic_components(spark):
    # {1,2,3} via chain, {10,11}, isolated-in-edges none
    e = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    got = _components(connected_components(e).collect())
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges_in_log_rounds(spark):
    # a 64-node chain needs ~diameter rounds under naive propagation;
    # alternating star must finish inside the max_iter=12 budget
    e = _edges(spark, [(i, i + 1) for i in range(64)])
    got = _components(connected_components(e).collect())
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_cc_duplicate_and_reversed_edges(spark):
    e = _edges(spark, [(2, 1), (1, 2), (2, 1), (5, 4)])
    got = _components(connected_components(e).collect())
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


def test_dedup_clusters_labels_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 3), (3, 5)], ["doc_a", "doc_b"])
    out = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
    assert out[0].component == 0 and out[3].component == 0 and out[5].component == 0
    assert out[0].cluster_size == 3 and out[0].is_keeper
    assert not out[3].is_keeper and not out[5].is_keeper
    for i in (1, 2, 4):
        assert out[i].component == i and out[i].cluster_size == 1 and out[i].is_keeper


def test_label_propagation_splits_bridged_cliques(spark):
    """Two 5-cliques joined by one bridge edge: connected components
    would merge them; deterministic LPA must keep two communities
    (each clique's internal majority beats the single bridge vote),
    and the run must be reproducible."""
    from census_asc5_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4, 5]) + clique([11, 12, 13, 14, 15]) + [(5, 11)]
    df = spark.createDataFrame(edges, ["u", "v"])
    out = {r.node: r.community for r in label_propagation(df).collect()}
    left = {out[n] for n in [1, 2, 3, 4, 5]}
    right = {out[n] for n in [11, 12, 13, 14, 15]}
    assert len(left) == 1 and len(right) == 1, (left, right, out)
    assert left != right, "bridge edge must not merge the cliques"
    out2 = {r.node: r.community for r in label_propagation(df).collect()}
    assert out == out2, "deterministic LPA must be reproducible"


def test_label_propagation_early_exit_equals_full_unroll(spark):
    """The fixpoint early-exit must return output IDENTICAL to running
    every round (a converged round is a no-op) — the invariant that
    keeps the 4-round unrolled SQL oracle hash-exact. The cliques
    converge well before 12 rounds, so a large n_iter exercises the
    exit; n_iter=1 (no chance to exit) pins the probe changes nothing
    on unconverged runs either."""
    from census_asc5_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4, 5]) + clique([11, 12, 13, 14, 15]) + [(5, 11)]
    df = spark.createDataFrame(edges, ["u", "v"])
    four = {r.node: r.community for r in label_propagation(df, n_iter=4).collect()}
    twelve = {r.node: r.community for r in label_propagation(df, n_iter=12).collect()}
    assert four == twelve, "early-exit run must equal the full unroll"
    one = {r.node: r.community for r in label_propagation(df, n_iter=1).collect()}
    assert set(one) == set(four)


def test_k_core_peels_periphery(spark):
    """A 4-clique (3-core) with pendant nodes: k=3 keeps exactly the
    clique; the pendant and its chain peel away — including the
    cascade (node 6 only qualifies before 7 peels)."""
    from census_asc5_data_pipeline_spark.operators.graph import k_core

    clique = [(a, b) for a in [1, 2, 3, 4] for b in [1, 2, 3, 4] if a < b]
    # chain 4-6-7 and pendant 5: all must peel at k=3
    edges = clique + [(4, 5), (4, 6), (6, 7), (7, 1), (6, 1)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r.node: r.core_degree for r in k_core(df, k=3).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == 3 and got[2] == 3 and got[3] == 3 and got[4] == 3
    # k above the densest core -> empty, schema intact
    empty = k_core(df, k=4)
    assert empty.count() == 0 and empty.columns == ["node", "core_degree"]


def test_hits_recovers_planted_hub_and_authority(spark):
    from census_asc5_data_pipeline_spark.operators.graph import hits

    # bipartite purchase graph: buyers 1..6 → items 101..105.
    # item 101 is bought by EVERY buyer (planted authority); buyer 1
    # buys EVERY item (planted hub); the rest each buy {101, one other}.
    edges = [(b, 101) for b in range(1, 7)]
    edges += [(1, i) for i in range(101, 106)]
    edges += [(2, 102), (3, 103), (4, 104), (5, 105), (6, 102)]
    got = hits(_edges(spark, edges), src="src", dst="dst").collect()
    hub = {r.node: r.hub_micro for r in got if r.hub_micro > 0}
    auth = {r.node: r.auth_micro for r in got if r.auth_micro > 0}
    assert max(hub, key=hub.get) == 1
    assert max(auth, key=auth.get) == 101
    # role separation: buyers carry no authority, items no hub score
    assert set(hub) == set(range(1, 7))
    assert set(auth) == set(range(101, 106))
    # L2 invariant: normalized scores sum-of-squares ~ 1 per role
    for scores in (hub, auth):
        ss = sum((s / 1e6) ** 2 for s in scores.values())
        assert abs(ss - 1.0) < 0.01


def test_hits_duplicate_edges_do_not_double_weight(spark):
    from census_asc5_data_pipeline_spark.operators.graph import hits

    base = [(1, 101), (1, 102), (2, 101)]
    dup = base + base + [(1, 101)]
    a = sorted(
        (r.node, r.hub_micro, r.auth_micro)
        for r in hits(_edges(spark, base), src="src", dst="dst").collect()
    )
    b = sorted(
        (r.node, r.hub_micro, r.auth_micro)
        for r in hits(_edges(spark, dup), src="src", dst="dst").collect()
    )
    assert a == b


def test_hits_rejects_zero_iterations(spark):
    """n_iter=0 would leave the authority frame unbuilt and crash with
    an AttributeError deep in plan assembly (advisor round-6 finding);
    the guard must fail fast and explicitly."""
    import pytest

    from census_asc5_data_pipeline_spark.operators.graph import hits

    with pytest.raises(ValueError, match="n_iter >= 1"):
        hits(_edges(spark, [(1, 101)]), src="src", dst="dst", n_iter=0)


def test_hits_early_exit_matches_full_iteration(spark):
    from census_asc5_data_pipeline_spark.operators.graph import hits

    edges = [(b, 101) for b in range(1, 7)]
    edges += [(1, i) for i in range(101, 106)]
    edges += [(2, 102), (3, 103), (4, 104), (5, 105), (6, 102)]
    full = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in hits(_edges(spark, edges), src="src", dst="dst").collect()
    }
    early = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in hits(
            _edges(spark, edges), src="src", dst="dst", tol=1e-7
        ).collect()
    }
    assert set(full) == set(early)
    for n in full:
        assert abs(full[n][0] - early[n][0]) <= 5
        assert abs(full[n][1] - early[n][1]) <= 5
