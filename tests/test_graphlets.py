"""4-node graphlet census vs exhaustive python enumeration.

Non-induced subgraph counts (ESCAPE contract, Pinar et al. WWW'17).
"""

from __future__ import annotations

import itertools
import random

from smatchpp_spark.operators.graphlets import graphlet_census


def _df(spark, pairs):
    return spark.createDataFrame(
        [(f"v{a}", f"v{b}") for a, b in pairs], "src string, dst string"
    )


def _py_census(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    edges = {(a, b) for a in adj for b in adj[a] if a < b}
    d = {v: len(adj[v]) for v in verts}

    def c(n, k):
        from math import comb

        return comb(n, k)

    wedges = sum(c(d[v], 2) for v in verts)
    stars = sum(c(d[v], 3) for v in verts)
    tris = {
        t
        for a, b in edges
        for x in adj[a] & adj[b]
        for t in [tuple(sorted((a, b, x)))]
    }
    # tailed: triangle + pendant edge off one corner to a 4th vertex
    tailed = sum(
        len(adj[v] - set(t)) for t in tris for v in t
    )
    # 4-paths: ordered simple 4-vertex paths / 2
    p4 = 0
    for a in verts:
        for b in adj[a]:
            for cc in adj[b] - {a}:
                p4 += len(adj[cc] - {a, b})
    p4 //= 2
    # 4-cycles: ordered cyclic tuples / 8
    c4 = 0
    for a in verts:
        for b in adj[a]:
            for cc in adj[b] - {a}:
                c4 += len(adj[cc] & adj[a] - {b})
    c4 //= 8
    # diamonds: unordered pairs of distinct triangles sharing an edge
    tl = sorted(tris)
    dia = sum(
        1
        for t1, t2 in itertools.combinations(tl, 2)
        if len(set(t1) & set(t2)) == 2
    )
    k4 = sum(
        1
        for q in itertools.combinations(verts, 4)
        if all((x, y) in edges for x, y in itertools.combinations(q, 2))
    )
    return {
        "n_vertices": len(verts),
        "n_edges": len(edges),
        "wedges": wedges,
        "triangles": len(tris),
        "three_stars": stars,
        "four_paths": p4,
        "tailed_triangles": tailed,
        "four_cycles": c4,
        "diamonds": dia,
        "four_cliques": k4,
    }


def _check(spark, pairs):
    got = graphlet_census(_df(spark, pairs)).collect()[0].asDict()
    want = _py_census(pairs)
    assert got == want, (got, want)


def test_census_small_known(spark):
    # K4: 6 edges, 12 wedges, 4 triangles, 4 stars, 3 four-cycles,
    # 6 diamonds, 1 K4, 12 tailed, 3 paths (each C4 contains ... checked
    # against the exhaustive oracle rather than by hand)
    _check(spark, set(itertools.combinations(range(4), 2)))


def test_census_star_hub(spark):
    # pure star: wedges/stars only — C4/K4/triangles all zero, and the
    # order-max wedge rule must not enumerate the hub's quadratic wedges
    _check(spark, {(0, i) for i in range(1, 12)})


def test_census_cycle_and_path(spark):
    _check(spark, {(i, (i + 1) % 8) for i in range(8)})  # C8
    _check(spark, {(i, i + 1) for i in range(7)})  # P8


def test_census_random_vs_python(spark):
    rng = random.Random(23)
    for seed_round in range(3):
        pairs = {
            (rng.randrange(11), rng.randrange(11)) for _ in range(28 + seed_round * 8)
        }
        _check(spark, pairs)
