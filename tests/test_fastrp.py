"""FastRP embeddings (operators/fastrp.py): exact numpy replay,
partitioning invariance, the structural-twin property, and guards."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from smatchpp_spark.operators.fastrp import fastrp_embeddings


def _df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _h(x: str) -> int:
    return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)


def _python_fastrp(pairs, dims, s, weights, normalize=True):
    nbrs = {}
    for a, b in pairs:
        a, b = str(a), str(b)
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    val = math.sqrt(float(s))

    def seed(v):
        out = []
        for i in range(dims):
            r = _h(f"{v}:{i}") % (2 * s)
            out.append(val if r == 0 else (-val if r == 1 else 0.0))
        return out

    e = {v: seed(v) for v in nbrs}
    acc = {v: [0.0] * dims for v in nbrs}
    for w in weights:
        new = {}
        for v in nbrs:
            row = [0.0] * dims
            for u in sorted(nbrs[v]):
                wu = 1.0 / len(nbrs[u])
                for i in range(dims):
                    row[i] += e[u][i] * wu
            new[v] = row
        e = new
        for v in nbrs:
            for i in range(dims):
                acc[v][i] += w * e[v][i]
    if normalize:
        for v in nbrs:
            n = math.sqrt(sum(x * x for x in acc[v]))
            if n > 0:
                acc[v] = [x / n for x in acc[v]]
    return acc


def test_matches_python_replay(spark):
    rng = random.Random(5)
    pairs = list(
        {(rng.randrange(25), rng.randrange(25)) for _ in range(80)}
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    weights = [1.0, 0.5]
    got = {
        r.vertex: list(r.embedding)
        for r in fastrp_embeddings(
            _df(spark, pairs), dims=6, s=2, weights=weights
        ).embeddings.collect()
    }
    want = _python_fastrp(pairs, dims=6, s=2, weights=weights)
    assert got.keys() == want.keys()
    for v in want:
        # float-sum order differs (python sorts neighbors) — tolerance,
        # not equality; values are O(1) after L2 norm
        assert max(
            abs(x - y) for x, y in zip(got[v], want[v])
        ) < 1e-9, v


def test_partitioning_invariant(spark):
    pairs = [(i, (i * 7 + 3) % 40) for i in range(40)]
    pairs = [(a, b) for a, b in pairs if a != b]
    a = {
        r.vertex: list(r.embedding)
        for r in fastrp_embeddings(
            _df(spark, pairs), dims=4, s=2
        ).embeddings.collect()
    }
    b = {
        r.vertex: list(r.embedding)
        for r in fastrp_embeddings(
            _df(spark, pairs).repartition(7), dims=4, s=2
        ).embeddings.collect()
    }
    assert a.keys() == b.keys()
    for v in a:
        assert max(abs(x - y) for x, y in zip(a[v], b[v])) < 1e-12


def test_structural_twins_identical(spark):
    # u and v share the exact neighbor set and hop 0 is dropped, so
    # every E_k (k >= 1) — hence the embedding — is IDENTICAL for them
    hub = [(u, w) for u in ("u", "v") for w in ("a", "b", "c")]
    extra = [("a", "b"), ("b", "c")]
    emb = {
        r.vertex: list(r.embedding)
        for r in fastrp_embeddings(
            _df(spark, hub + extra), dims=8, s=2, weights=[1.0, 0.7, 0.3]
        ).embeddings.collect()
    }
    assert emb["u"] == emb["v"]
    assert emb["u"] != emb["a"]


def test_guards(spark):
    e = _df(spark, [(1, 2)])
    with pytest.raises(ValueError, match="dims"):
        fastrp_embeddings(e, dims=65)
    with pytest.raises(ValueError, match="s must"):
        fastrp_embeddings(e, s=0)
    with pytest.raises(ValueError, match="weights"):
        fastrp_embeddings(e, weights=[])
