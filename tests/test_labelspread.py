"""Harmonic label spreading vs python replay + closed forms."""

from __future__ import annotations

import random

import pytest

from smatchpp_spark.operators.labelspread import harmonic_label_spread


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _py_spread(pairs, pos, neg, steps, init=0.5):
    nbr = {}
    for a, b in pairs:
        if a == b:
            continue
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    x = {v: init for v in nbr}
    for s in pos:
        if s in nbr:
            x[s] = 1.0
    for s in neg:
        if s in nbr:
            x[s] = 0.0
    for _ in range(steps):
        nx = {}
        for v in nbr:
            if v in pos:
                nx[v] = 1.0
            elif v in neg:
                nx[v] = 0.0
            else:
                nx[v] = sum(x[u] / len(nbr[v]) for u in sorted(nbr[v]))
        x = nx
    return x


def test_path_graph_linear_interpolation(spark):
    """path 0-1-2-3, seeds at the ends: the harmonic fixpoint is the
    linear interpolation 1, 2/3, 1/3, 0."""
    r = harmonic_label_spread(
        _df(spark, [(0, 1), (1, 2), (2, 3)]), [0], [3],
        max_supersteps=200, tol=1e-12,
    )
    assert r.converged
    got = {x["vertex"]: x for x in r.scores.collect()}
    assert got[0]["score"] == 1.0 and got[0]["is_seed"]
    assert got[3]["score"] == 0.0 and got[3]["is_seed"]
    assert got[1]["score"] == pytest.approx(2 / 3, abs=1e-9)
    assert got[2]["score"] == pytest.approx(1 / 3, abs=1e-9)
    assert not got[1]["is_seed"]


def test_spread_vs_python_fixed_rounds(spark):
    rng = random.Random(23)
    pairs = sorted(
        {(rng.randrange(15), rng.randrange(15)) for _ in range(60)}
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    pos, neg = {0, 1}, {13, 14}
    steps = 7
    r = harmonic_label_spread(
        _df(spark, pairs), sorted(pos), sorted(neg),
        max_supersteps=steps, tol=-1.0,
    )
    assert r.supersteps == steps
    got = {x["vertex"]: x["score"] for x in r.scores.collect()}
    want = _py_spread(pairs, pos, neg, steps)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_spread_guards(spark):
    df = _df(spark, [(0, 1)])
    with pytest.raises(ValueError, match="both seed sets"):
        harmonic_label_spread(df, [0], [0], max_supersteps=2)
    # seeds absent from the graph are ignored
    r = harmonic_label_spread(df, [0, 99], [1], max_supersteps=5)
    got = {x["vertex"]: x["score"] for x in r.scores.collect()}
    assert got == {0: 1.0, 1: 0.0}
