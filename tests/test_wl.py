"""Weisfeiler–Leman refinement: isomorphism invariance, discrimination,
and an exact python replay of the portable-hash color chain."""

from __future__ import annotations

import hashlib

import pytest

from smatchpp_spark.operators.wl import MOD, wl_refinement

SEP = "\x1f"


def _t(spark, rows):
    return spark.createDataFrame(
        [(g, s, r, d) for g, s, r, d in rows],
        "graph_id string, src string, rel string, dst string",
    )


def _h(*parts):
    s = SEP.join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_wl(rows, rounds):
    """Exact replay of the operator's hash chain."""
    edges = {}
    verts = {}
    for g, s, r, d in rows:
        edges.setdefault(g, []).append((s, d, r))
        verts.setdefault(g, set()).update([s, d])
    colors = {
        (g, v): _h("init") for g, vs in verts.items() for v in vs
    }
    for _ in range(rounds):
        nxt = {}
        for g, es in edges.items():
            msgs = {v: 0 for v in verts[g]}
            for s, d, r in es:
                msgs[s] = (msgs[s] + _h("out:" + r, colors[(g, d)]) % MOD) % MOD
                msgs[d] = (msgs[d] + _h("in:" + r, colors[(g, s)]) % MOD) % MOD
            for v in verts[g]:
                nxt[(g, v)] = _h(colors[(g, v)], msgs[v])
        colors = nxt
    fps = {}
    for g, vs in verts.items():
        csum = sum(colors[(g, v)] % MOD for v in sorted(vs)) % MOD
        fps[g] = _h(len(vs), csum)
    return colors, fps


PATH = [("g1", "a", "e", "b"), ("g1", "b", "e", "c")]
PATH_RENAMED = [("g2", "x", "e", "y"), ("g2", "y", "e", "z")]
STAR = [("g3", "h", "e", "u"), ("g3", "h", "e", "v")]


def test_wl_isomorphic_graphs_share_fingerprint(spark):
    r = wl_refinement(_t(spark, PATH + PATH_RENAMED + STAR), rounds=3)
    fps = {x["graph_id"]: x["fingerprint"] for x in r.fingerprints.collect()}
    assert fps["g1"] == fps["g2"]  # renaming-invariant
    assert fps["g1"] != fps["g3"]  # path != out-star (same sizes)


def test_wl_colors_distinguish_roles_and_match_replay(spark):
    rows = PATH + STAR
    r = wl_refinement(_t(spark, rows), rounds=2)
    got = {(x["graph_id"], x["vertex"]): x["color"] for x in r.colors.collect()}
    want, want_fps = _py_wl(rows, 2)
    assert got == want
    # path: middle vertex b differs from the (mutually distinct) ends
    assert got[("g1", "a")] != got[("g1", "b")]
    assert got[("g1", "a")] != got[("g1", "c")]  # direction tags split ends
    # star leaves are equivalent
    assert got[("g3", "u")] == got[("g3", "v")]
    fps = {x["graph_id"]: x["fingerprint"] for x in r.fingerprints.collect()}
    assert fps == want_fps


def test_wl_edge_labels_refine(spark):
    a = [("g1", "a", "ARG0", "b")]
    b = [("g2", "a", "ARG1", "b")]
    r = wl_refinement(_t(spark, a + b), rounds=1)
    fps = {x["graph_id"]: x["fingerprint"] for x in r.fingerprints.collect()}
    assert fps["g1"] != fps["g2"]


def test_wl_guard(spark):
    with pytest.raises(ValueError):
        wl_refinement(_t(spark, PATH), rounds=0)
