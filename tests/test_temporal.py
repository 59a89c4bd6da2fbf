"""Temporal earliest-arrival vs python replay."""

from __future__ import annotations

import random

import pytest

from smatchpp_spark.operators.temporal import temporal_earliest_arrival


def _df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(t)) for a, b, t in triples],
        "src long, dst long, t long",
    )


def _py_earliest(triples, sources, start, rounds, directed=True):
    es = [(a, b, t) for a, b, t in triples if t >= start]
    if not directed:
        es += [(b, a, t) for a, b, t in triples if t >= start]
    verts = {v for a, b, _ in es for v in (a, b)}
    arr = {s: start for s in sources if s in verts}
    for _ in range(rounds):
        cand = {}
        for a, b, t in es:
            if a in arr and t >= arr[a]:
                if b not in cand or t < cand[b]:
                    cand[b] = t
        changed = False
        for v, t in cand.items():
            if v not in arr or t < arr[v]:
                arr[v] = t
                changed = True
        if not changed:
            break
    return arr


def test_time_respecting_semantics(spark):
    # A->B at 5, B->C at 3: C unreachable; B->D at 7 reachable at 7
    r = temporal_earliest_arrival(
        _df(spark, [(1, 2, 5), (2, 3, 3), (2, 4, 7)]), [1], max_supersteps=5
    )
    got = {x["vertex"]: x["arrival"] for x in r.arrivals.collect()}
    assert got == {1: 0, 2: 5, 4: 7}
    assert r.converged


def test_earliest_picks_min_over_paths(spark):
    # two temporal routes to 4: via 2 arrives at 6, via 3 arrives at 4
    tri = [(1, 2, 1), (2, 4, 6), (1, 3, 2), (3, 4, 4)]
    r = temporal_earliest_arrival(_df(spark, tri), [1], max_supersteps=5)
    got = {x["vertex"]: x["arrival"] for x in r.arrivals.collect()}
    assert got[4] == 4


@pytest.mark.parametrize("directed", [True, False])
def test_temporal_vs_python_random(spark, directed):
    rng = random.Random(17)
    tri = [
        (rng.randrange(12), rng.randrange(12), rng.randrange(1, 30))
        for _ in range(80)
    ]
    tri = [(a, b, t) for a, b, t in tri if a != b]
    seeds, start = [0, 5], 3
    r = temporal_earliest_arrival(
        _df(spark, tri), seeds, start_time=start,
        max_supersteps=15, directed=directed,
    )
    got = {x["vertex"]: x["arrival"] for x in r.arrivals.collect()}
    want = _py_earliest(tri, seeds, start, rounds=15, directed=directed)
    assert got == want


def test_temporal_truncation_invariant(spark):
    """k rounds == exact min over temporal paths of <= k edges."""
    chain = [(i, i + 1, 10 + i) for i in range(6)]
    r2 = temporal_earliest_arrival(_df(spark, chain), [0], max_supersteps=2)
    got2 = {x["vertex"]: x["arrival"] for x in r2.arrivals.collect()}
    want2 = _py_earliest(chain, [0], 0, rounds=2)
    assert got2 == want2
    assert not r2.converged
    assert 3 not in got2  # 3 needs a 3-edge path

    r_full = temporal_earliest_arrival(_df(spark, chain), [0], max_supersteps=10)
    gotf = {x["vertex"]: x["arrival"] for x in r_full.arrivals.collect()}
    assert gotf == {i: (10 + i - 1 if i else 0) for i in range(7)}
    assert r_full.converged
