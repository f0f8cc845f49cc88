"""Pure-python reference oracle for operators/graph.pagerank (the
registered `pagerank` query is rows-only by design — iterative double
sums are reduce-order dependent, so cross-engine hash equality is the
wrong bar; a tolerance compare against an independent implementation
of the same iteration is the right one)."""

from __future__ import annotations

from census_asc5_data_pipeline_spark.operators import graph as G


def _ref_pagerank(edges, n_iter=10, damping=0.85):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    n = len(nodes)
    rank = {x: 1.0 / n for x in nodes}
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        mass = {x: 0.0 for x in nodes}
        for x in nodes:
            share = rank[x] / len(adj[x])
            for y in adj[x]:
                mass[y] += share
        rank = {x: base + damping * mass[x] for x in nodes}
    return rank


EDGES = (
    # a hub star, a triangle, a chain, a duplicate + reversed edge
    [(0, i) for i in range(1, 8)]
    + [(10, 11), (11, 12), (10, 12)]
    + [(20, 21), (21, 22), (22, 23)]
    + [(1, 0), (21, 20)]
)


def test_pagerank_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, ["u", "v"])
    got = {r.node: r.rank_ppb for r in G.pagerank(df).collect()}
    want = {k: round(v * 1e9) for k, v in _ref_pagerank(EDGES).items()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 10, (k, got[k], want[k])


def test_pagerank_hub_outranks_spokes_and_sums_to_one(spark):
    df = spark.createDataFrame(EDGES, ["u", "v"])
    got = {r.node: r.rank_ppb for r in G.pagerank(df).collect()}
    assert got[0] > max(got[i] for i in range(1, 8))
    # ranks are a distribution over the 15 nodes (ppb sums to ~1e9)
    assert abs(sum(got.values()) - 1_000_000_000) < 100


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "u long, v long")
    assert G.pagerank(df).count() == 0


def test_pagerank_tol_converges_to_reference(spark):
    """The early-exit path (registered query uses tol=1e-6) must land
    within tolerance of the full-iteration python reference: a tol
    small enough to never fire early changes nothing, and the
    registered tol stops only once the remaining L1 drift is below
    what a 10 ppb compare can see."""
    df = spark.createDataFrame(EDGES, ["u", "v"])
    want = {k: round(v * 1e9) for k, v in _ref_pagerank(EDGES).items()}
    for tol in (1e-300, 1e-6):
        got = {r.node: r.rank_ppb for r in G.pagerank(df, tol=tol).collect()}
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) <= 50, (tol, k, got[k], want[k])


def test_pagerank_tol_early_exit_still_full_distribution(spark):
    """A huge tol exits after round 1 yet still returns every node
    with a valid distribution (ppb sums to ~1e9) — the exit breaks
    the LOOP, never the output contract."""
    df = spark.createDataFrame(EDGES, ["u", "v"])
    got = {r.node: r.rank_ppb for r in G.pagerank(df, tol=1e9).collect()}
    assert len(got) == 15
    assert abs(sum(got.values()) - 1_000_000_000) < 100
