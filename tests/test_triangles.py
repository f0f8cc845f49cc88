"""Planted-hub tests for operators/graph.triangles — the
degree-oriented triangle enumeration (round-4 verdict item 2).

The hub gate: a star hub of degree d yields d(d-1)/2 wedge rows under
id orientation (hub gets the lowest id, so every edge points out of
it); degree orientation must yield ZERO hub-centered wedges — all hub
edges point inward.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.operators import graph as G


def _brute_triangles(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = set()
    for u in adj:
        for v, w in itertools.combinations(sorted(adj[u]), 2):
            if u < v and w in adj[v]:
                out.add((u, v, w))
    return out


def test_hub_star_produces_zero_wedges(spark):
    """Hub node 0 connected to 200 spokes, no spoke-spoke edges: the
    id-oriented two-hop join would build 200*199/2 = 19900 wedge rows
    on the hub; degree orientation builds none (and a handful among
    degree-1 spokes is impossible — outdeg <= 1 everywhere)."""
    edges = [(0, i) for i in range(1, 201)]
    df = spark.createDataFrame(edges, ["u", "v"])
    assert G.oriented_wedges(df).count() == 0
    assert G.triangles(df).count() == 0


def test_hub_plus_planted_triangles_bounded_and_exact(spark):
    """Hub of degree 300 + 10 planted disjoint triangles + a chain.
    Wedge count must stay O(edges) (planted triangles contribute one
    wedge each; the hub none), and the triangle set must equal brute
    force."""
    edges = [(0, i) for i in range(1, 301)]
    base = 1000
    for t in range(10):
        a, b, c = base + 3 * t, base + 3 * t + 1, base + 3 * t + 2
        edges += [(a, b), (b, c), (a, c)]
    edges += [(2000 + i, 2000 + i + 1) for i in range(50)]  # chain
    df = spark.createDataFrame(edges, ["u", "v"])

    wedges = G.oriented_wedges(df).count()
    assert wedges <= len(edges), f"wedges {wedges} not O(m) for m={len(edges)}"

    got = {(r.u, r.v, r.w) for r in G.triangles(df).collect()}
    assert got == _brute_triangles(edges)
    assert len(got) == 10


def test_triangles_match_bruteforce_on_dense_blob(spark):
    """K7 plus noise: every 3-subset of the clique is a triangle
    (35 of them), each emitted exactly once in canonical order."""
    edges = [(a, b) for a, b in itertools.combinations(range(7), 2)]
    edges += [(100, 101), (101, 102), (7, 100)]
    # duplicate + reversed edges must not double-count
    edges += [(1, 0), (2, 1)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = sorted((r.u, r.v, r.w) for r in G.triangles(df).collect())
    assert got == sorted(_brute_triangles(edges))
    assert len(got) == len(set(got))


def test_hub_attached_to_clique(spark):
    """Hub adjacent to every vertex of a K5 — triangles through the
    hub exist (hub + each clique edge) and must all be found despite
    the hub having the highest degree (it is never a wedge center)."""
    clique = [(a, b) for a, b in itertools.combinations(range(1, 6), 2)]
    hub = [(0, i) for i in range(1, 6)] + [(0, i) for i in range(10, 200)]
    df = spark.createDataFrame(clique + hub, ["u", "v"])
    got = {(r.u, r.v, r.w) for r in G.triangles(df).collect()}
    assert got == _brute_triangles(clique + hub)
    # K5 interior: C(5,3)=10; through-hub: one per clique edge = 10
    assert len(got) == 20
