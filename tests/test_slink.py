"""Single-linkage clustering (operators/slink.py): planted-structure,
python union-find replay, k-cut, dendrogram, and msf-reuse checks."""

from __future__ import annotations

import random

from smatchpp_spark.operators.msf import minimum_spanning_forest
from smatchpp_spark.operators.slink import (
    dendrogram,
    single_linkage,
    single_linkage_k,
)


def _wdf(spark, triples):
    return spark.createDataFrame(
        [(str(a), str(b), float(w)) for a, b, w in triples],
        "src string, dst string, weight double",
    )


def _partition(df):
    """clusters DataFrame -> frozenset of frozenset cluster members."""
    groups = {}
    for r in df.collect():
        groups.setdefault(r.cluster, set()).add(r.vertex)
    return frozenset(frozenset(g) for g in groups.values())


def _python_single_linkage(triples, threshold):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    verts = set()
    for a, b, w in triples:
        a, b = str(a), str(b)
        verts |= {a, b}
        if a != b and w <= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    groups = {}
    for v in verts:
        groups.setdefault(find(v), set()).add(v)
    return frozenset(frozenset(g) for g in groups.values())


def test_two_cliques_bridge(spark):
    cl1 = [(a, b, 1.0) for a in range(1, 5) for b in range(a + 1, 5)]
    cl2 = [(a, b, 1.0) for a in range(10, 14) for b in range(a + 1, 14)]
    bridge = [(4, 10, 9.0)]
    edges = _wdf(spark, cl1 + cl2 + bridge)
    below = single_linkage(edges, threshold=5.0)
    assert below.n_clusters == 2
    assert _partition(below.clusters) == frozenset(
        {
            frozenset({"1", "2", "3", "4"}),
            frozenset({"10", "11", "12", "13"}),
        }
    )
    # inclusive threshold: weight == t merges
    joined = single_linkage(edges, threshold=9.0)
    assert joined.n_clusters == 1


def test_matches_python_union_find(spark):
    rng = random.Random(7)
    triples = [
        (rng.randrange(30), rng.randrange(30), rng.randrange(1, 20))
        for _ in range(120)
    ]
    triples = [(a, b, w) for a, b, w in triples if a != b]
    edges = _wdf(spark, triples)
    msf = minimum_spanning_forest(edges)
    for t in (2.0, 6.0, 12.0, 19.0):
        got = single_linkage(edges, threshold=t, msf=msf)
        want = _python_single_linkage(triples, t)
        assert _partition(got.clusters) == want, f"threshold {t}"
        assert got.n_clusters == len(want)


def test_singletons_labeled_self(spark):
    edges = _wdf(spark, [(1, 2, 1.0), (3, 4, 8.0)])
    r = single_linkage(edges, threshold=2.0)
    labels = {row.vertex: row.cluster for row in r.clusters.collect()}
    assert labels["3"] == "3" and labels["4"] == "4"
    assert labels["1"] == labels["2"] == "1"
    assert r.n_clusters == 3


def test_k_cut_chain(spark):
    # path a-b-c-d-e with strictly increasing weights: k=3 drops the
    # two heaviest edges -> segments {a,b,c}, {d}, {e}
    chain = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 3.0),
             ("d", "e", 4.0)]
    edges = _wdf(spark, chain)
    r = single_linkage_k(edges, k=3)
    assert r.n_clusters == 3
    assert _partition(r.clusters) == frozenset(
        {frozenset({"a", "b", "c"}), frozenset({"d"}), frozenset({"e"})}
    )
    # k below the component count: full forest kept
    r1 = single_linkage_k(edges, k=1)
    assert r1.n_clusters == 1
    # k above |V| is capped by the forest size: all singletons
    r9 = single_linkage_k(edges, k=5)
    assert r9.n_clusters == 5


def test_k_cut_tie_break_deterministic(spark):
    # three equal-weight heaviest edges: the (weight desc, a desc,
    # b desc) order drops ('x','y') before ('p','q')
    edges = _wdf(
        spark,
        [("a", "b", 1.0), ("p", "q", 5.0), ("x", "y", 5.0), ("b", "p", 2.0),
         ("q", "x", 2.0)],
    )
    r = single_linkage_k(edges, k=2)
    part = _partition(r.clusters)
    # dropping ('x','y') splits y off; everything else stays merged
    assert part == frozenset(
        {frozenset({"a", "b", "p", "q", "x"}), frozenset({"y"})}
    )


def test_dendrogram_order(spark):
    chain = [("a", "b", 3.0), ("b", "c", 1.0), ("c", "d", 2.0)]
    r = minimum_spanning_forest(_wdf(spark, chain))
    rows = dendrogram(r.forest).collect()
    assert [(x.merge_idx, x.a, x.b, x.weight) for x in rows] == [
        (1, "b", "c", 1.0),
        (2, "c", "d", 2.0),
        (3, "a", "b", 3.0),
    ]


def test_msf_reuse_identical(spark):
    rng = random.Random(3)
    triples = [
        (rng.randrange(20), rng.randrange(20), rng.randrange(1, 10))
        for _ in range(60)
    ]
    triples = [(a, b, w) for a, b, w in triples if a != b]
    edges = _wdf(spark, triples)
    msf = minimum_spanning_forest(edges)
    direct = single_linkage(edges, threshold=4.0)
    reused = single_linkage(edges, threshold=4.0, msf=msf)
    assert _partition(direct.clusters) == _partition(reused.clusters)
