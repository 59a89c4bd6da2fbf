"""Graph statistics + link prediction vs pure-python oracles."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _und(pairs):
    nbrs = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return nbrs


def _rand_pairs(n, m, seed):
    rng = random.Random(seed)
    return sorted(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    )


def test_clustering_coefficient_vs_python(spark):
    from smatchpp_spark.operators.graphstats import clustering_coefficient

    pairs = _rand_pairs(40, 260, seed=5)
    nbrs = _und(pairs)
    got = {
        r.vertex: (r.degree, r.triangles, r.coefficient)
        for r in clustering_coefficient(_edges_df(spark, pairs)).collect()
    }
    assert set(got) == {str(v) for v in nbrs}
    for v, nb in nbrs.items():
        d = len(nb)
        t = sum(len(nbrs[x] & nb) for x in nb) // 2
        coef = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
        gd, gt, gc = got[str(v)]
        assert gd == d and gt == t, v
        assert gc == pytest.approx(coef, abs=1e-9), v
    # a triangle's corners have coefficient 1; a path midpoint 0
    tri = clustering_coefficient(
        _edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    ).collect()
    by_v = {r.vertex: r.coefficient for r in tri}
    assert by_v["1"] == by_v["2"] == 1.0
    assert by_v["4"] == 0.0


def test_degree_assortativity_vs_numpy(spark):
    from smatchpp_spark.operators.graphstats import degree_assortativity

    pairs = _rand_pairs(30, 160, seed=9)
    nbrs = _und(pairs)
    xs, ys = [], []
    for a, nb in nbrs.items():
        for b in nb:  # both stub directions, matching the operator
            xs.append(len(nbrs[a]))
            ys.append(len(nbrs[b]))
    want = float(np.corrcoef(xs, ys)[0, 1])
    row = degree_assortativity(_edges_df(spark, pairs)).collect()[0]
    assert row.n_stubs == len(xs)
    assert row.assortativity == pytest.approx(want, abs=1e-6)

    # degree-regular graph (ring): zero variance -> null
    ring = [(i, (i + 1) % 10) for i in range(10)]
    assert degree_assortativity(_edges_df(spark, ring)).collect()[0].assortativity is None

    # star: perfectly disassortative (r = -1)
    star = [(0, i) for i in range(1, 8)]
    r = degree_assortativity(_edges_df(spark, star)).collect()[0].assortativity
    assert r == pytest.approx(-1.0, abs=1e-9)


def test_reciprocity(spark):
    from smatchpp_spark.operators.graphstats import reciprocity

    pairs = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 4), (1, 2)]
    row = reciprocity(_edges_df(spark, pairs)).collect()[0]
    # distinct non-loop edges: (1,2),(2,1),(2,3),(3,4),(4,3) -> 5
    assert row.n_edges == 5
    assert row.n_reciprocal == 4  # (1,2),(2,1),(3,4),(4,3)
    assert row.reciprocity == pytest.approx(0.8)


def test_modularity_vs_python(spark):
    from smatchpp_spark.operators.graphstats import modularity

    # two 4-cliques joined by one bridge edge
    pairs = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                pairs.append((base + i, base + j))
    pairs.append((0, 10))
    edges = _edges_df(spark, pairs)
    labels = spark.createDataFrame(
        [(str(v + b), "c" + str(b)) for b in (0, 10) for v in range(4)],
        "vertex string, label string",
    )
    row = modularity(edges, labels).collect()[0]

    nbrs = _und(pairs)
    m = sum(len(nb) for nb in nbrs.values()) / 2
    lab = {str(v + b): "c" + str(b) for b in (0, 10) for v in range(4)}
    q = 0.0
    for c in set(lab.values()):
        members = {v for v, l in lab.items() if l == c}
        dc = sum(len(nbrs[int(v)]) for v in members)
        mc = (
            sum(
                1
                for v in members
                for w in nbrs[int(v)]
                if str(w) in members
            )
            / 2
        )
        q += mc / m - (dc / (2 * m)) ** 2
    assert row.n_edges == int(m)
    assert row.n_communities == 2
    assert row.modularity == pytest.approx(q, abs=1e-9)

    # perfect partition of disconnected cliques scores higher than the
    # everything-in-one-community partition
    one = spark.createDataFrame(
        [(str(v + b), "all") for b in (0, 10) for v in range(4)],
        "vertex string, label string",
    )
    q_one = modularity(edges, one).collect()[0].modularity
    assert row.modularity > q_one
    # vertices missing from the label table become singleton communities
    empty = spark.createDataFrame([], "vertex string, label string")
    q_sing = modularity(edges, empty).collect()[0]
    assert q_sing.n_communities == 8


def _py_linkpred(pairs, method, exclude_existing=True, max_pivot=None):
    nbrs = _und(pairs)
    scores = {}
    for z, nb in nbrs.items():
        dz = len(nb)
        if dz < 2 or (max_pivot is not None and dz > max_pivot):
            continue
        w = (
            1.0
            if method == "common_neighbors"
            else (1.0 / math.log(dz) if method == "adamic_adar" else 1.0 / dz)
        )
        snb = sorted(nb, key=str)
        for i, u in enumerate(snb):
            for v in snb[i + 1 :]:
                if str(u) < str(v):
                    key = (str(u), str(v))
                else:
                    key = (str(v), str(u))
                scores[key] = scores.get(key, 0.0) + w
    if exclude_existing:
        existing = set()
        for a, b in pairs:
            if a == b:
                continue
            existing.add(tuple(sorted((str(a), str(b)))))
        scores = {k: v for k, v in scores.items() if k not in existing}
    return scores


def test_linkpred_all_methods_vs_python(spark):
    from smatchpp_spark.operators.linkpred import linkpred_scores

    pairs = _rand_pairs(30, 140, seed=3)
    edges = _edges_df(spark, pairs)
    for method in ("common_neighbors", "adamic_adar", "resource_allocation"):
        got = {
            (r.u, r.v): r.score
            for r in linkpred_scores(edges, method=method).collect()
        }
        want = _py_linkpred(pairs, method)
        assert set(got) == set(want), method
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-8), (method, k)

    with pytest.raises(ValueError):
        linkpred_scores(edges, method="nope")


def test_linkpred_topk_and_pivot_cap(spark):
    from smatchpp_spark.operators.linkpred import linkpred_scores

    pairs = _rand_pairs(25, 120, seed=8)
    edges = _edges_df(spark, pairs)
    allrows = linkpred_scores(edges, method="adamic_adar").collect()
    top = linkpred_scores(edges, method="adamic_adar", top_k=5).collect()
    want = sorted(allrows, key=lambda r: (-r.score, r.u, r.v))[:5]
    assert [(r.u, r.v, r.score) for r in top] == [
        (r.u, r.v, r.score) for r in want
    ]

    # pivot cap: dropping hub pivots only removes their contributions
    capped = {
        (r.u, r.v): r.score
        for r in linkpred_scores(
            edges, method="adamic_adar", max_pivot_degree=6
        ).collect()
    }
    want_capped = _py_linkpred(pairs, "adamic_adar", max_pivot=6)
    assert set(capped) == set(want_capped)
    for k in want_capped:
        assert capped[k] == pytest.approx(want_capped[k], abs=1e-8)

    # keep-existing mode scores adjacent pairs too
    withex = linkpred_scores(
        edges, method="common_neighbors", exclude_existing=False
    ).collect()
    want_all = _py_linkpred(pairs, "common_neighbors", exclude_existing=False)
    assert {(r.u, r.v) for r in withex} == set(want_all)


def _py_tarjan(pairs):
    """SCC oracle: iterative Tarjan; returns {vertex: min-id of its SCC}."""
    adj = {}
    verts = set()
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        verts.add(a)
        verts.add(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]

    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recursed = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recursed = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    out = {}
    for comp in sccs:
        m = min(str(x) for x in comp)
        for x in comp:
            out[str(x)] = m
    return out


def test_scc_vs_tarjan(spark):
    from smatchpp_spark.operators.scc import strongly_connected_components

    # hand case: two 3-cycles bridged by a one-way edge + a DAG tail
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    res = strongly_connected_components(_edges_df(spark, pairs))
    got = {r.vertex: r.scc for r in res.components.collect()}
    assert res.converged
    assert got == _py_tarjan(pairs)
    assert got["1"] == got["2"] == got["3"] == "1"
    assert got["4"] == got["5"] == got["6"] == "4"
    assert got["7"] == "7"

    # random sparse digraph (cycles + DAG parts)
    for seed in (2, 4):
        pairs = _rand_pairs(28, 90, seed=seed)
        res = strongly_connected_components(
            _edges_df(spark, pairs), max_rounds=30
        )
        assert res.converged
        got = {r.vertex: r.scc for r in res.components.collect()}
        assert got == _py_tarjan(pairs), seed


def test_scc_round_cap_reports_partial(spark):
    from smatchpp_spark.operators.scc import strongly_connected_components

    # a directed path peels one basin per round: 1 round cannot finish
    path = [(i, i + 1) for i in range(6)]
    res = strongly_connected_components(_edges_df(spark, path), max_rounds=1)
    assert not res.converged
    rows = {r.vertex: r.scc for r in res.components.collect()}
    assert rows["0"] == "0"  # global min always peels
    assert sum(1 for v in rows.values() if v is None) > 0
    assert len(rows) == 7  # every vertex present, labelled or null


def _py_neighborhood_function(pairs, directed=True):
    """Exact NF(r) = Σ_v |B(v, r)| via BFS from every vertex."""
    adj = {}
    verts = set()
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
        verts.add(a)
        verts.add(b)
    curves = {}
    for v in verts:
        dist = {v: 0}
        frontier = [v]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        curves[v] = dist
    nf = []
    r = 0
    while True:
        total = sum(
            sum(1 for d in c.values() if d <= r) for c in curves.values()
        )
        nf.append(total)
        if nf[-1] == nf[-2] if len(nf) > 1 else False:
            nf.pop()
            break
        r += 1
    return nf


def test_hyperball_nf_vs_exact_bfs(spark):
    """HyperBall NF(r) within the single-sketch HLL error bound of the
    exact BFS neighborhood function at every r (the per-ball errors
    CORRELATE across vertices — every ball shares the same element
    hash — so the sum does NOT get a √V reduction; the honest bound is
    the per-sketch 1.04/√m — the test runs m=256 ≈ 6.5%, and the
    operator's p=6 default is the documented 13% cheap mode), effective
    diameter within ±1
    round, and the run is deterministic (hash registers, no RNG)."""
    from smatchpp_spark.operators.hyperball import hyperball

    pairs = _rand_pairs(60, 240, seed=21)
    edges = _edges_df(spark, pairs)
    res = hyperball(edges, p=8, max_rounds=30, directed=True)
    assert res.converged
    got = {int(r.r): r.nf_estimate for r in res.neighborhood_function.collect()}

    exact = _py_neighborhood_function(pairs, directed=True)
    for r, want in enumerate(exact):
        assert got[r] == pytest.approx(want, rel=0.10), (r, got[r], want)
    # the curve settles at the exact curve's length (±1: the sketch
    # needs one extra round to certify its own fixpoint)
    assert abs(res.rounds - len(exact)) <= 1

    # effective diameter vs exact
    final = exact[-1]
    want_eff = next(r for r, v in enumerate(exact) if v >= 0.9 * final)
    assert res.effective_diameter is not None
    assert abs(res.effective_diameter - want_eff) <= 1

    # determinism
    res2 = hyperball(edges, p=8, max_rounds=30, directed=True)
    got2 = {int(r.r): r.nf_estimate for r in res2.neighborhood_function.collect()}
    assert got == got2


def test_hyperball_undirected_ball_sizes(spark):
    """Undirected HyperBall on two disjoint cliques: every ball
    converges to its component size (within HLL error)."""
    from smatchpp_spark.operators.hyperball import hyperball

    pairs = []
    for base, k in ((0, 8), (100, 5)):
        for i in range(k):
            for j in range(i + 1, k):
                pairs.append((base + i, base + j))
    res = hyperball(_edges_df(spark, pairs), p=6, directed=False)
    assert res.converged
    for r in res.balls.collect():
        want = 8 if int(r.vertex) < 100 else 5
        assert r.ball_size == pytest.approx(want, rel=0.25), r


def test_hyperball_harmonic_centrality_vs_exact(spark):
    """centrality=True accumulates harmonic centrality H(v) = Σ 1/d(v,u);
    compared against the exact BFS value with sketch-level tolerance,
    and the ranking of the clear top vertex must match."""
    from smatchpp_spark.operators.hyperball import hyperball

    # star core + path tail: hub 0 has clearly dominant centrality
    pairs = [(0, i) for i in range(1, 10)] + [(9, 10), (10, 11), (11, 12)]
    res = hyperball(
        _edges_df(spark, pairs), p=8, directed=True, centrality=True
    )
    assert res.converged
    got = {r.vertex: r.harmonic_centrality for r in res.balls.collect()}

    adj = {}
    verts = set()
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        verts.add(a)
        verts.add(b)
    exact = {}
    for v in verts:
        dist = {v: 0}
        frontier = [v]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        exact[str(v)] = sum(1.0 / dd for u, dd in dist.items() if dd > 0)

    assert set(got) == set(exact)
    for v in exact:
        assert got[v] == pytest.approx(exact[v], rel=0.15, abs=0.3), (
            v, got[v], exact[v],
        )
    assert max(got, key=got.get) == max(exact, key=exact.get) == "0"


def test_hyperball_checkpoint_resume_identical(spark, tmp_path):
    """hyperball through SuperstepRunner: a resumed run reproduces the
    fresh run's NF curve, ball sizes, and effective diameter exactly,
    and the metrics sink records every superstep."""
    import os

    from smatchpp_spark.operators.hyperball import hyperball

    pairs = _rand_pairs(40, 150, seed=6)
    edges = _edges_df(spark, pairs)
    ckpt = str(tmp_path / "hb_ckpt")

    fresh = hyperball(edges, p=6, max_rounds=20)
    assert fresh.converged
    curve1 = sorted(map(tuple, fresh.neighborhood_function.collect()))
    balls1 = sorted(map(tuple, fresh.balls.collect()))

    # interrupted run: 2 rounds committed, then resume to convergence
    partial = hyperball(edges, p=6, max_rounds=2, checkpoint_dir=ckpt)
    assert not partial.converged
    assert os.path.exists(f"{ckpt}/hyperball/metrics.jsonl")
    resumed = hyperball(
        edges, p=6, max_rounds=20, checkpoint_dir=ckpt, resume=True
    )
    curve2 = sorted(map(tuple, resumed.neighborhood_function.collect()))
    balls2 = sorted(map(tuple, resumed.balls.collect()))
    assert curve1 == curve2
    assert balls1 == balls2
    assert resumed.effective_diameter == fresh.effective_diameter
    assert resumed.converged


def test_scc_checkpoint_resume_identical(spark, tmp_path):
    """SCC through SuperstepRunner: a 1-round-interrupted run resumed
    from checkpoint reproduces the fresh run's components exactly."""
    import os

    from smatchpp_spark.operators.scc import strongly_connected_components

    pairs = _rand_pairs(24, 80, seed=14)
    edges = _edges_df(spark, pairs)
    ckpt = str(tmp_path / "scc_ckpt")

    fresh = strongly_connected_components(edges, max_rounds=30)
    assert fresh.converged
    want = {r.vertex: r.scc for r in fresh.components.collect()}

    partial = strongly_connected_components(
        edges, max_rounds=1, checkpoint_dir=ckpt
    )
    assert os.path.exists(f"{ckpt}/scc/metrics.jsonl")
    resumed = strongly_connected_components(
        edges, max_rounds=30, checkpoint_dir=ckpt, resume=True
    )
    got = {r.vertex: r.scc for r in resumed.components.collect()}
    assert resumed.converged
    assert got == want
    assert got == _py_tarjan(pairs)


def test_degree_histogram_and_contraction(spark):
    from smatchpp_spark.operators.graphstats import (
        contract_graph,
        degree_histogram,
    )

    pairs = _rand_pairs(30, 120, seed=2)
    edges = _edges_df(spark, pairs)
    nbrs = _und(pairs)

    hist = {r.bucket: (r.min_degree, r.n_vertices)
            for r in degree_histogram(edges).collect()}
    want = {}
    for v, nb in nbrs.items():
        d = len(nb)
        b = math.floor(math.log(d) / math.log(2.0))
        lo, n = want.get(b, (d, 0))
        want[b] = (min(lo, d), n + 1)
    assert hist == want
    assert sum(n for _, n in hist.values()) == len(nbrs)

    # contraction over a 2-coloring: endpoint labels map through,
    # missing labels fall back to the vertex itself
    labels = spark.createDataFrame(
        [(str(v), f"c{int(v) % 2}") for v in nbrs if int(v) != 0],
        "vertex string, label string",
    )
    out = {(r.src, r.dst): r.n_edges for r in contract_graph(edges, labels).collect()}
    want_c = {}
    for a, b in pairs:
        # the operator keeps self-loops: they contract to (c, c) rows
        la = "0" if a == 0 else f"c{a % 2}"
        lb = "0" if b == 0 else f"c{b % 2}"
        want_c[(la, lb)] = want_c.get((la, lb), 0) + 1
    assert out == want_c
    assert sum(out.values()) == len(pairs)


# ---------------------------------------------------------------------------
# Louvain community detection
# ---------------------------------------------------------------------------

def _py_portable_hash(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_louvain(pairs, sweeps, levels):
    """Pure-python mirror of louvain_communities(portable=True) on an
    unweighted edge list: canonical undirected weight-1 graph, fixed
    synchronous sweeps with integer gains, min-label tie-break, hash-
    parity move gating, contraction between levels."""
    und = {}
    for s, d in pairs:
        a, b = (s, d) if s <= d else (d, s)
        und[(a, b)] = 1

    def level(und, sweeps):
        loops = {}
        stubs = {}
        verts = set()
        for (a, b), w in und.items():
            verts.add(a)
            verts.add(b)
            if a == b:
                loops[a] = loops.get(a, 0) + w
            else:
                stubs.setdefault(a, {})[b] = stubs.setdefault(a, {}).get(b, 0) + w
                stubs.setdefault(b, {})[a] = stubs.setdefault(b, {}).get(a, 0) + w
        k = {
            v: sum(stubs.get(v, {}).values()) + 2 * loops.get(v, 0)
            for v in verts
        }
        two_m = sum(k.values())
        lbl = {v: v for v in verts}
        if two_m == 0:
            return lbl
        for t in range(1, sweeps + 1):
            tot = {}
            for v in verts:
                tot[lbl[v]] = tot.get(lbl[v], 0) + k[v]
            new = {}
            for v in verts:
                vc = {}
                for u, w in stubs.get(v, {}).items():
                    vc[lbl[u]] = vc.get(lbl[u], 0) + w
                cur = lbl[v]
                g_cur = two_m * vc.get(cur, 0) - k[v] * (tot[cur] - k[v])
                best = None
                for c, wvc in vc.items():
                    if c == cur:
                        continue
                    g = two_m * wvc - k[v] * tot[c]
                    if g > g_cur and (
                        best is None
                        or g > best[0]
                        or (g == best[0] and c < best[1])
                    ):
                        best = (g, c)
                eligible = _py_portable_hash(str(v)) % 2 == t % 2
                new[v] = best[1] if (best and eligible) else cur
            lbl = new
        return lbl

    mapping = None
    for _ in range(levels):
        final = level(und, sweeps)
        if mapping is None:
            mapping = dict(final)
        else:
            mapping = {v: final[c] for v, c in mapping.items()}
        nxt = {}
        for (a, b), w in und.items():
            la, lb = final[a], final[b]
            key = (la, lb) if la <= lb else (lb, la)
            nxt[key] = nxt.get(key, 0) + w
        und = nxt
    return mapping


def test_louvain_two_cliques(spark):
    """Two 5-cliques joined by one bridge edge → exactly two
    communities, one per clique."""
    from smatchpp_spark.operators.louvain import louvain_communities

    pairs = []
    for grp, names in (
        (0, [f"a{i}" for i in range(5)]),
        (1, [f"b{i}" for i in range(5)]),
    ):
        for i in range(5):
            for j in range(i + 1, 5):
                pairs.append((names[i], names[j]))
    pairs.append(("a0", "b0"))
    e = spark.createDataFrame(pairs, "src string, dst string")
    res = louvain_communities(e, sweeps_per_level=4, levels=2, portable=True)
    got = {r.vertex: r.community for r in res.communities.collect()}
    acomm = {got[f"a{i}"] for i in range(5)}
    bcomm = {got[f"b{i}"] for i in range(5)}
    assert len(acomm) == 1 and len(bcomm) == 1 and acomm != bcomm


def test_louvain_matches_python_replay(spark):
    """Exact differential vs the pure-python mirror on a random sparse
    graph (same gains, tie-breaks, parity gating, contraction)."""
    from smatchpp_spark.operators.louvain import louvain_communities

    rng = random.Random(17)
    verts = [f"v{i:02d}" for i in range(40)]
    pairs = set()
    for _ in range(120):
        a, b = rng.sample(verts, 2)
        pairs.add((a, b))
    pairs = sorted(pairs)
    e = spark.createDataFrame(pairs, "src string, dst string")
    res = louvain_communities(e, sweeps_per_level=3, levels=2, portable=True)
    got = {r.vertex: r.community for r in res.communities.collect()}
    want = _py_louvain(pairs, sweeps=3, levels=2)
    assert got == want


def test_louvain_beats_lpa_modularity(spark):
    """On a planted-partition graph the Louvain partition's modularity
    is at least the LPA partition's (the point of gain-driven moves)."""
    from smatchpp_spark.operators.graphstats import modularity
    from smatchpp_spark.operators.labelprop import label_propagation
    from smatchpp_spark.operators.louvain import louvain_communities

    rng = random.Random(5)
    pairs = set()
    groups = [[f"g{g}v{i}" for i in range(8)] for g in range(4)]
    for grp in groups:
        for i in range(8):
            for j in range(i + 1, 8):
                if rng.random() < 0.8:
                    pairs.add((grp[i], grp[j]))
    allv = [v for grp in groups for v in grp]
    for _ in range(12):
        a, b = rng.sample(allv, 2)
        if a != b:
            pairs.add((a, b))
    e = spark.createDataFrame(sorted(pairs), "src string, dst string")
    lou = louvain_communities(e, sweeps_per_level=8, levels=2, portable=True)
    lpa = label_propagation(e, max_supersteps=5)
    q_lou = modularity(e, lou.communities).collect()[0]["modularity"]
    q_lpa = modularity(e, lpa.labels).collect()[0]["modularity"]
    assert q_lou >= q_lpa - 1e-12, (q_lou, q_lpa)
    assert q_lou > 0.3, q_lou


def test_louvain_checkpoint_resume_identical(spark, tmp_path):
    """A run interrupted after level 1 resumes and produces the
    identical community table (fixed sweep schedule + committed
    per-sweep state)."""
    import shutil

    from smatchpp_spark.operators.louvain import louvain_communities

    rng = random.Random(23)
    verts = [f"v{i:02d}" for i in range(25)]
    pairs = sorted({tuple(rng.sample(verts, 2)) for _ in range(70)})
    e = spark.createDataFrame(pairs, "src string, dst string")
    d = str(tmp_path / "lou")
    full = louvain_communities(
        e, sweeps_per_level=3, levels=2, portable=True, checkpoint_dir=d
    )
    want = sorted(map(tuple, full.communities.collect()))
    # wipe level 2 entirely and the last sweep of level 1, then resume
    shutil.rmtree(f"{d}/louvain_level2")
    shutil.rmtree(f"{d}/louvain_level1/state/superstep=3")
    res = louvain_communities(
        e, sweeps_per_level=3, levels=2, portable=True,
        checkpoint_dir=d, resume=True,
    )
    assert sorted(map(tuple, res.communities.collect())) == want


def test_linkpred_ppr_vs_python(spark):
    """Fixed-step PPR link scores match an exact python power-iteration
    replay; existing neighbors and the seed are excluded; top_k is
    deterministic."""
    from smatchpp_spark.operators.linkpred import linkpred_ppr

    rng = random.Random(13)
    verts = [f"v{i:02d}" for i in range(30)]
    pairs = sorted({tuple(rng.sample(verts, 2)) for _ in range(70)})
    e = spark.createDataFrame(pairs, "src string, dst string")
    seeds = ["v00", "v05", "v11"]
    steps, alpha = 3, 0.85

    nbrs = {}
    for a, b in pairs:
        if a != b:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    want = {}
    for s in seeds:
        r = {s: 1.0}
        for _ in range(steps):
            nxt = {}
            for u, ru in r.items():
                for v in nbrs.get(u, ()):
                    nxt[v] = nxt.get(v, 0.0) + alpha * ru / len(nbrs[u])
            nxt[s] = nxt.get(s, 0.0) + (1.0 - alpha)
            r = nxt
        for v, sc in r.items():
            if v != s and v not in nbrs.get(s, ()):
                want[(s, v)] = sc

    out = linkpred_ppr(e, seeds, steps=steps, alpha=alpha).collect()
    got = {(r.seed, r.candidate): r.score for r in out}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])

    topk = linkpred_ppr(e, seeds, steps=steps, alpha=alpha, top_k=3).collect()
    by_seed = {}
    for r in topk:
        by_seed.setdefault(r.seed, []).append((r.score, r.candidate))
    for s, rows in by_seed.items():
        assert len(rows) <= 3
        best = sorted(
            ((sc, c) for (ss, c), sc in want.items() if ss == s),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        assert sorted(rows, key=lambda t: (-t[0], t[1])) == [
            (round(sc, 9), c) for sc, c in best
        ]


def test_linkpred_ppr_numeric_vertex_string_seeds(spark):
    """CLI-style string seeds work against numeric vertex ids (the
    seeds are cast to the graph's vertex type); malformed seed values
    raise under ANSI cast."""
    from smatchpp_spark.operators.linkpred import linkpred_ppr

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 5), (5, 6)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    out = linkpred_ppr(e, ["1", "5"], steps=3).collect()
    assert out, "string seeds on a bigint graph must score candidates"
    assert all(isinstance(r.seed, int) for r in out)
    # native-typed seeds give the identical result
    out2 = linkpred_ppr(e, [1, 5], steps=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_linkpred_jaccard_vs_python(spark):
    from smatchpp_spark.operators.linkpred import linkpred_scores

    pairs = _rand_pairs(30, 140, seed=5)
    edges = _edges_df(spark, pairs)
    got = {
        (r.u, r.v): r.score
        for r in linkpred_scores(edges, method="jaccard").collect()
    }
    cn = _py_linkpred(pairs, "common_neighbors")
    nbrs = _und(pairs)
    deg = {str(v): len(nb) for v, nb in nbrs.items()}
    want = {
        k: c / (deg[k[0]] + deg[k[1]] - c) for k, c in cn.items()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-8), k
        assert 0.0 < got[k] <= 1.0


def test_community_conductance_vs_python(spark):
    from smatchpp_spark.operators.graphstats import community_conductance

    pairs = _rand_pairs(40, 160, seed=11)
    edges = _edges_df(spark, pairs)
    # labels: vertex id parity (strings), some vertices left unlabeled
    nbrs = _und(pairs)
    verts = sorted(nbrs, key=str)
    lab_rows = [(str(v), f"p{int(str(v)) % 2}") for v in verts if int(str(v)) < 30]
    labels = spark.createDataFrame(lab_rows, "vertex string, label string")
    got = {
        r["label"]: (r["n_vertices"], r["volume"], r["cut"], r["conductance"])
        for r in community_conductance(edges, labels).collect()
    }

    lab = {str(v): f"p{int(str(v)) % 2}" for v in verts if int(str(v)) < 30}
    und = set()
    for a, b in pairs:
        if a != b:
            und.add(tuple(sorted((str(a), str(b)))))
    two_m = 2 * len(und)
    vol, cut, members = {}, {}, {}
    for a, b in und:
        la, lb = lab.get(a, a), lab.get(b, b)
        for v, lv in ((a, la), (b, lb)):
            vol[lv] = vol.get(lv, 0) + 1
            members.setdefault(lv, set()).add(v)
        if la != lb:
            cut[la] = cut.get(la, 0) + 1
            cut[lb] = cut.get(lb, 0) + 1
    want = {}
    for c, v in vol.items():
        denom = min(v, two_m - v)
        phi = 0.0 if denom <= 0 else round(cut.get(c, 0) / denom, 9)
        want[c] = (len(members[c]), v, cut.get(c, 0), phi)
    assert got == want


def test_transitivity_vs_python(spark):
    from smatchpp_spark.operators.graphstats import transitivity

    pairs = _rand_pairs(30, 130, seed=13)
    edges = _edges_df(spark, pairs)
    row = transitivity(edges).collect()[0]

    nbrs = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(str(a), set()).add(str(b))
        nbrs.setdefault(str(b), set()).add(str(a))
    tri = sum(
        1
        for v, ns in nbrs.items()
        for u in ns
        for w in ns
        if u < w and w in nbrs.get(u, ())
    ) // 1  # per-pivot count of closed wedges = 3 * triangles
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in nbrs.values())
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] * 3 == tri
    expect = 0.0 if wedges == 0 else round(tri / wedges, 9)
    assert row["transitivity"] == pytest.approx(expect, abs=1e-9)


# ---- power-law MLE ----


def test_powerlaw_fit_vs_python(spark):
    """alpha replay on a disjoint-star construction with known degrees."""
    import math

    # hubs with degrees 8, 5, 4, 3 (disjoint stars); leaves all degree 1
    edges = []
    base = 0
    hub_degs = [8, 5, 4, 3]
    for hd in hub_degs:
        hub = base
        for j in range(hd):
            edges.append((hub, base + 1 + j))
        base += hd + 1
    df = spark.createDataFrame(edges, "src long, dst long")

    from smatchpp_spark.operators.graphstats import powerlaw_fit

    d_min = 2
    row = powerlaw_fit(df, d_min=d_min).collect()[0]
    n_leaves = sum(hub_degs)
    assert row["n_vertices"] == n_leaves + len(hub_degs)
    assert row["n_tail"] == len(hub_degs)
    lnsum = sum(math.log(d / (d_min - 0.5)) for d in hub_degs)
    want_alpha = 1.0 + len(hub_degs) / lnsum
    assert row["alpha"] == pytest.approx(want_alpha, abs=1e-12)
    assert row["sigma"] == pytest.approx(
        (want_alpha - 1) / math.sqrt(len(hub_degs)), abs=1e-12
    )

    # d_min above every degree: empty tail, null alpha/sigma
    row = powerlaw_fit(df, d_min=100).collect()[0]
    assert row["n_tail"] == 0
    assert row["alpha"] is None and row["sigma"] is None

    with pytest.raises(ValueError, match="d_min"):
        powerlaw_fit(df, d_min=0)


def test_powerlaw_fit_recovers_exponent(spark):
    """degrees drawn as round(d_min·u^(-1/(alpha-1))) inverse-CDF from a
    planted alpha=2.5 tail: the MLE lands near the planted value.

    d_min=16, NOT 2: the estimator uses CSN's continuous-approximation
    shift (d_min − ½), whose discretization bias is large at tiny d_min
    (planted 2.5 estimates as ~2.07 at d_min=2 — a property of the
    published formula, not an implementation error; CSN §3.4 recommend
    the approximation only for d_min ≳ 6).  At d_min=16 the bias is
    ~0.06 on this construction (python replay of the same formula)."""
    alpha, d_min = 2.5, 16
    rnd_degs = []
    n = 400
    for i in range(n):
        u = (i + 0.5) / n
        d = max(d_min, int(round(d_min * u ** (-1.0 / (alpha - 1.0)))))
        rnd_degs.append(min(d, 500))
    edges = []
    base = 0
    for d in rnd_degs:
        for j in range(d):
            edges.append((base, base + 1 + j))
        base += d + 1
    df = spark.createDataFrame(edges, "src long, dst long")

    from smatchpp_spark.operators.graphstats import powerlaw_fit

    row = powerlaw_fit(df, d_min=d_min).collect()[0]
    assert abs(row["alpha"] - alpha) < 0.15
