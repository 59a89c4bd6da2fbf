"""Maximal matching vs python handshake replay + properties."""

from __future__ import annotations

import hashlib
import itertools
import random

import pytest

from smatchpp_spark.operators.matching import maximal_matching


def _df(spark, pairs, weights=None):
    if weights is None:
        return spark.createDataFrame(
            [(int(x), int(y)) for x, y in pairs], "src long, dst long"
        )
    return spark.createDataFrame(
        [(int(x), int(y), float(w)) for (x, y), w in zip(pairs, weights)],
        "src long, dst long, weight double",
    )


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_handshake(pairs, rounds, weights=None):
    """replay of the locally-dominant handshake with the operator's
    (-w, portable_hash(a#b#k), a, b) key."""
    edges = {}
    for i, (x, y) in enumerate(pairs):
        if x == y:
            continue
        a, b = min(x, y), max(x, y)
        w = weights[i] if weights else 1.0
        edges[(a, b)] = max(edges.get((a, b), float("-inf")), w)
    active = dict(edges)
    matched = {}
    for k in range(1, rounds + 1):
        if not active:
            break
        key = {
            (a, b): (-w, _h(f"{a}#{b}#{k}"), a, b)
            for (a, b), w in active.items()
        }
        best = {}
        for (a, b), kk in key.items():
            for v in (a, b):
                if v not in best or kk < best[v]:
                    best[v] = kk
        m = [
            (a, b)
            for (a, b), kk in key.items()
            if best[a] == kk and best[b] == kk
        ]
        mv = {v for e in m for v in e}
        for e in m:
            matched[e] = k
        active = {
            e: w for e, w in active.items()
            if e not in m and e[0] not in mv and e[1] not in mv
        }
    return matched, active


def test_matching_fixed_rounds_vs_python(spark):
    rng = random.Random(5)
    pairs = sorted({(rng.randrange(18), rng.randrange(18)) for _ in range(60)})
    res = maximal_matching(
        _df(spark, pairs), max_supersteps=2, tol=-1.0, portable=True
    )
    got = {(r["a"], r["b"]): r["round"] for r in res.matched.collect()}
    want, _ = _py_handshake(pairs, 2)
    assert got == want


def test_matching_is_maximal_and_disjoint(spark):
    rng = random.Random(9)
    pairs = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    res = maximal_matching(_df(spark, pairs), portable=True)
    assert res.converged
    m = [(r["a"], r["b"]) for r in res.matched.collect()]
    used = [v for e in m for v in e]
    assert len(used) == len(set(used))  # vertex-disjoint
    mset = set(used)
    for x, y in pairs:
        if x != y:
            # maximality: every edge touches a matched vertex
            assert x in mset or y in mset, (x, y)


def test_weighted_matching_half_approx(spark):
    rng = random.Random(3)
    pairs = sorted({(rng.randrange(10), rng.randrange(10)) for _ in range(30)})
    pairs = [p for p in pairs if p[0] != p[1]]
    weights = [rng.uniform(1, 10) for _ in pairs]
    res = maximal_matching(
        _df(spark, pairs, weights), weight_col="weight", portable=True
    )
    assert res.converged
    got_w = sum(r["weight"] for r in res.matched.collect())

    # brute-force maximum weight matching on the small canonical graph
    edges = {}
    for (x, y), w in zip(pairs, weights):
        a, b = min(x, y), max(x, y)
        edges[(a, b)] = max(edges.get((a, b), 0.0), w)
    best = 0.0
    elist = list(edges.items())

    def rec(i, used, acc):
        nonlocal best
        if acc + sum(w for (e, w) in elist[i:]) <= best:
            return
        if i == len(elist):
            best = max(best, acc)
            return
        (a, b), w = elist[i]
        rec(i + 1, used, acc)
        if a not in used and b not in used:
            rec(i + 1, used | {a, b}, acc + w)

    rec(0, frozenset(), 0.0)
    assert got_w >= 0.5 * best - 1e-9
    # heaviest-first handshake: the single heaviest edge is always matched
    heavy = max(edges, key=lambda e: (edges[e], ))
    m = {(r["a"], r["b"]) for r in res.matched.collect()}
    hv = {v for e in m for v in e}
    assert heavy in m or (edges[heavy] == max(edges.values()) and heavy[0] in hv)


def test_matching_checkpoint_resume_identical(spark, tmp_path):
    rng = random.Random(11)
    pairs = sorted({(rng.randrange(16), rng.randrange(16)) for _ in range(50)})
    full = maximal_matching(_df(spark, pairs), portable=True)
    want = sorted((r["a"], r["b"], r["round"]) for r in full.matched.collect())

    ck = str(tmp_path / "match_ck")
    # run 2 rounds, then resume to convergence from the checkpoint
    maximal_matching(
        _df(spark, pairs), max_supersteps=2, tol=-1.0, portable=True,
        checkpoint_dir=ck,
    )
    res = maximal_matching(
        _df(spark, pairs), portable=True, checkpoint_dir=ck, resume=True
    )
    got = sorted((r["a"], r["b"], r["round"]) for r in res.matched.collect())
    assert got == want
