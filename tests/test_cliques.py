"""4-clique counting and clique-percolation vs brute-force oracles.

Clique semantics are the public textbook definitions (Danisch et al.
WWW'18 k-clique listing; Palla et al. 2005 clique percolation); the
degree-orientation substrate is shared with operators/triangles.py,
which is itself differentially tested against brute force.
"""

from __future__ import annotations

import itertools
import random

from smatchpp_spark.operators.cliques import (
    clique_percolation,
    four_clique_count,
    oriented_triangles,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(f"v{a}", f"v{b}") for a, b in pairs], "src string, dst string"
    )


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(f"v{a}", set()).add(f"v{b}")
        adj.setdefault(f"v{b}", set()).add(f"v{a}")
    return adj


def _py_triangles(adj):
    return {
        tuple(sorted(t))
        for v, nbrs in adj.items()
        for u, w in itertools.combinations(sorted(nbrs), 2)
        if w in adj.get(u, ())
        for t in [(v, u, w)]
    }


def _py_four_cliques(adj):
    out = set()
    for quad in itertools.combinations(sorted(adj), 4):
        if all(b in adj[a] for a, b in itertools.combinations(quad, 2)):
            out.add(quad)
    return out


def test_oriented_triangles_exactly_once(spark):
    rng = random.Random(11)
    pairs = {(rng.randrange(14), rng.randrange(14)) for _ in range(60)}
    rows = oriented_triangles(_df(spark, pairs)).collect()
    got = sorted(tuple(sorted((r["u"], r["v"], r["w"]))) for r in rows)
    want = sorted(_py_triangles(_adj(pairs)))
    assert got == want  # each triangle exactly once, no dedup needed


def test_four_clique_count_vs_python(spark):
    rng = random.Random(3)
    # dense-ish so 4-cliques actually exist
    pairs = {(rng.randrange(10), rng.randrange(10)) for _ in range(55)}
    adj = _adj(pairs)
    want = _py_four_cliques(adj)
    res = four_clique_count(_df(spark, pairs))
    assert res.total == len(want)
    per_v = {}
    for quad in want:
        for v in quad:
            per_v[v] = per_v.get(v, 0) + 1
    got = {r["vertex"]: r["four_cliques"] for r in res.per_vertex.collect()}
    assert got == per_v


def test_four_clique_k5_explosion(spark):
    # K5 contains C(5,4)=5 four-cliques, each vertex in C(4,3)=4 of them
    pairs = set(itertools.combinations(range(5), 2))
    res = four_clique_count(_df(spark, pairs))
    assert res.total == 5
    got = {r["vertex"]: r["four_cliques"] for r in res.per_vertex.collect()}
    assert got == {f"v{i}": 4 for i in range(5)}


def _py_percolation(adj):
    """Brute-force CPM k=3: union-find over triangles sharing an edge."""
    tris = sorted(_py_triangles(adj))
    tid = ["|".join(t) for t in tris]
    parent = list(range(len(tris)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    by_edge = {}
    for i, t in enumerate(tris):
        for e in itertools.combinations(t, 2):
            by_edge.setdefault(e, []).append(i)
    for members in by_edge.values():
        for j in members[1:]:
            a, b = find(members[0]), find(j)
            if a != b:
                parent[max(a, b)] = min(a, b)
    comm = {}
    for i, t in enumerate(tris):
        root = find(i)
        label = min(tid[j] for j in range(len(tris)) if find(j) == root)
        for v in t:
            comm.setdefault(v, set()).add(label)
    return {(v, c) for v, cs in comm.items() for c in cs}


def test_clique_percolation_vs_python(spark):
    rng = random.Random(19)
    pairs = {(rng.randrange(16), rng.randrange(16)) for _ in range(50)}
    r = clique_percolation(_df(spark, pairs))
    assert r.converged
    got = {(row["vertex"], row["community"]) for row in r.membership.collect()}
    assert got == _py_percolation(_adj(pairs))


def test_clique_percolation_overlap_and_singletons(spark):
    # two triangles sharing ONE VERTEX (not an edge) stay separate
    # communities; the shared vertex belongs to both (overlap); an
    # edge-disjoint lone triangle is its own singleton community.
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (7, 8), (8, 9), (7, 9)]
    r = clique_percolation(_df(spark, pairs))
    assert r.converged
    got = {(row["vertex"], row["community"]) for row in r.membership.collect()}
    assert got == _py_percolation(_adj(pairs))
    # v2 sits in two communities
    assert len({c for v, c in got if v == "v2"}) == 2
