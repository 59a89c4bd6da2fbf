"""MC SimRank: exact closed forms, convergence to iterative SimRank,
determinism, and the restricted-starts walk parity it relies on."""

from __future__ import annotations

import itertools
import math
import random

from pyspark.sql import functions as F

from smatchpp_spark.operators.simrank import simrank_scores
from smatchpp_spark.operators.walks import random_walks


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(f"v{a}", f"v{b}") for a, b in pairs], "src string, dst string"
    )


def _pairs(spark, ps):
    return spark.createDataFrame(
        [(f"v{a}", f"v{b}") for a, b in ps], "id_a string, id_b string"
    )


def test_single_shared_in_neighbor_exact(spark):
    # I(a) = I(b) = {x}: both reverse walks step to x deterministically
    # and meet at tau=1 in EVERY walk -> simrank == c exactly
    e = _edges(spark, [(9, 1), (9, 2)])
    row = simrank_scores(
        e, _pairs(spark, [(1, 2)]), c=0.5, walks_per_vertex=8
    ).collect()[0]
    assert row["n_meet"] == 8
    assert row["simrank"] == 0.5


def test_no_in_neighbors_zero(spark):
    e = _edges(spark, [(1, 2), (3, 4)])
    row = simrank_scores(e, _pairs(spark, [(1, 3)])).collect()[0]
    assert (row["n_meet"], row["simrank"]) == (0, 0.0)


def _py_simrank(pairs, c, iters=30):
    inn = {}
    nodes = set()
    for a, b in pairs:
        inn.setdefault(b, []).append(a)
        nodes.update((a, b))
    s = {}

    def get(x, y):
        if x == y:
            return 1.0
        return s.get((min(x, y), max(x, y)), 0.0)

    for _ in range(iters):
        new = {}
        for x, y in itertools.combinations(sorted(nodes), 2):
            ix, iy = inn.get(x, []), inn.get(y, [])
            if ix and iy:
                tot = sum(get(u, v) for u in ix for v in iy)
                new[(x, y)] = c * tot / (len(ix) * len(iy))
        s = new
    return get


def test_mc_converges_to_iterative_simrank(spark):
    rng = random.Random(17)
    pairs = {(rng.randrange(10), rng.randrange(10)) for _ in range(25)}
    pairs = {(a, b) for a, b in pairs if a != b}
    get = _py_simrank([(f"v{a}", f"v{b}") for a, b in pairs], c=0.5)
    probe = [(0, 1), (2, 5), (3, 7), (4, 8)]
    rows = simrank_scores(
        _edges(spark, pairs),
        _pairs(spark, probe),
        c=0.5,
        walk_length=7,
        walks_per_vertex=512,
        seed=3,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["simrank"] for r in rows}
    for a, b in probe:
        want = get(f"v{a}", f"v{b}")
        # truncation bias <= c^(L+1)/(1-c) ~ 0.008 plus MC noise at W=512
        assert abs(got[(f"v{a}", f"v{b}")] - want) < 0.08, (a, b, want)


def test_simrank_deterministic_rerun(spark):
    rng = random.Random(29)
    pairs = {(rng.randrange(8), rng.randrange(8)) for _ in range(20)}
    e = _edges(spark, pairs)
    p = _pairs(spark, [(0, 1), (2, 3)])
    r1 = {tuple(r) for r in simrank_scores(e, p).collect()}
    r2 = {tuple(r) for r in simrank_scores(e, p).collect()}
    assert r1 == r2


def test_restricted_starts_walk_parity(spark):
    rng = random.Random(37)
    pairs = {(rng.randrange(8), rng.randrange(8)) for _ in range(24)}
    e = _edges(spark, pairs)
    full = {
        r["walk_id"]: list(r["path"])
        for r in random_walks(
            e, walk_length=4, walks_per_vertex=2, portable=True
        ).collect()
    }
    sub = spark.createDataFrame([("v1",), ("v3",)], "v string")
    restricted = {
        r["walk_id"]: list(r["path"])
        for r in random_walks(
            e, walk_length=4, walks_per_vertex=2, portable=True, starts=sub
        ).collect()
    }
    assert set(restricted) == {
        k for k in full if k.split("#")[0] in ("v1", "v3")
    }
    for k, path in restricted.items():
        assert path == full[k], k
