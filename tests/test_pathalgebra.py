"""Semiring path algebra (operators/pathalgebra.py): python replays,
closed forms, degeneracy equivalences, and guards."""

from __future__ import annotations

import random

import pytest

from smatchpp_spark.operators.pathalgebra import (
    most_reliable_path,
    widest_path,
)


def _wdf(spark, triples, col="weight", typ="long"):
    return spark.createDataFrame(
        [(str(a), str(b), w) for a, b, w in triples],
        f"src string, dst string, {col} {typ}",
    )


def _python_semiring(triples, sources, extend, seed_val, directed=True):
    adj = {}
    verts = set()
    for a, b, w in triples:
        a, b = str(a), str(b)
        verts |= {a, b}
        adj.setdefault(a, []).append((b, w))
        if not directed:
            adj.setdefault(b, []).append((a, w))
    val = {str(s): seed_val for s in sources if str(s) in verts}
    changed = True
    while changed:
        changed = False
        for u in list(val):
            for v, w in adj.get(u, []):
                c = extend(val[u], w)
                if v not in val or c > val[v]:
                    val[v] = c
                    changed = True
    return val


def test_widest_matches_python(spark):
    rng = random.Random(13)
    triples = [
        (rng.randrange(25), rng.randrange(25), rng.randrange(1, 50))
        for _ in range(100)
    ]
    triples = [(a, b, w) for a, b, w in triples if a != b]
    got = {
        r.vertex: r.capacity
        for r in widest_path(
            _wdf(spark, triples), ["0", "1"], max_supersteps=30
        ).values.collect()
    }
    want = _python_semiring(triples, ["0", "1"], min, (1 << 63) - 1)
    assert got == want


def test_widest_closed_form_diamond(spark):
    # s->a->t (bottleneck 3) vs s->b->t (bottleneck 4): capacity(t) = 4
    triples = [("s", "a", 3), ("a", "t", 9), ("s", "b", 7), ("b", "t", 4)]
    got = {
        r.vertex: r.capacity
        for r in widest_path(_wdf(spark, triples), ["s"]).values.collect()
    }
    assert got["t"] == 4 and got["a"] == 3 and got["b"] == 7
    assert got["s"] == (1 << 63) - 1  # seed identity


def test_reliable_matches_python_and_is_exact(spark):
    rng = random.Random(3)
    triples = [
        (rng.randrange(20), rng.randrange(20),
         0.5 + rng.randrange(0, 50) / 100.0)
        for _ in range(80)
    ]
    triples = [(a, b, w) for a, b, w in triples if a != b]
    df = _wdf(spark, triples, col="prob", typ="double")
    got = {
        r.vertex: r.reliability
        for r in most_reliable_path(
            df, ["0"], max_supersteps=30
        ).values.collect()
    }
    want = _python_semiring(triples, ["0"], lambda d, w: d * w, 1.0)
    assert got.keys() == want.keys()
    # products along identical relaxation paths: bit-exact, not approx
    for v in want:
        assert got[v] == want[v], v


def test_reliable_range_guard(spark):
    df = _wdf(spark, [("a", "b", 1.5)], col="prob", typ="double")
    with pytest.raises(ValueError, match="probabilities in"):
        most_reliable_path(df, ["a"])
    # validated-upstream escape hatch converges anyway on a DAG
    r = most_reliable_path(df, ["a"], check_range=False)
    assert {x.vertex: x.reliability for x in r.values.collect()}["b"] == 1.5


def test_widest_undirected_and_unit_weights_reachability(spark):
    # unit weights: capacity 1 for every reached vertex == reachability
    chain = [("a", "b", 1), ("b", "c", 1), ("x", "y", 1)]
    got = {
        r.vertex: r.capacity
        for r in widest_path(
            _wdf(spark, chain), ["a"], directed=False
        ).values.collect()
    }
    assert set(got) == {"a", "b", "c"}
    assert got["b"] == got["c"] == 1
