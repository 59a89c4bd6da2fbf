"""Neighborhood feature aggregation (operators/nbragg.py)."""

from __future__ import annotations

import pytest

from smatchpp_spark.operators.nbragg import aggregate_neighbor_features


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _feats(spark, m):
    return spark.createDataFrame(
        [(str(v), [float(x) for x in vec]) for v, vec in m.items()],
        "vertex string, features array<double>",
    )


def test_mean_max_python_replay(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4)]
    fm = {1: [1, 10], 2: [2, 20], 3: [3, 30], 4: [4, 40]}
    r = aggregate_neighbor_features(
        _edges(spark, pairs), _feats(spark, fm), dims=2
    )
    got = {x.vertex: x for x in r.features.collect()}
    nbrs = {1: [2, 3], 2: [1, 3], 3: [1, 2, 4], 4: [3]}
    for v, ns in nbrs.items():
        vecs = [fm[n] for n in ns]
        assert got[str(v)].n_neighbors == len(ns)
        assert list(got[str(v)].mean) == [
            sum(x[i] for x in vecs) / len(ns) for i in range(2)
        ]
        assert list(got[str(v)].max) == [
            max(x[i] for x in vecs) for i in range(2)
        ]


def test_include_self_and_missing_features(spark):
    pairs = [(1, 2), (2, 3)]
    fm = {1: [6.0], 2: [2.0]}  # vertex 3 has NO features
    r = aggregate_neighbor_features(
        _edges(spark, pairs), _feats(spark, fm), dims=1, include_self=True
    )
    got = {x.vertex: x for x in r.features.collect()}
    # vertex 2: neighbors {1 (featured), 3 (skipped)} + self -> {6, 2}
    assert got["2"].n_neighbors == 2 and list(got["2"].mean) == [4.0]
    # vertex 3: one featured neighbor (2) and no self feature
    assert got["3"].n_neighbors == 1 and list(got["3"].max) == [2.0]


def test_dims_guard(spark):
    with pytest.raises(ValueError, match="dims"):
        aggregate_neighbor_features(
            _edges(spark, [(1, 2)]), _feats(spark, {1: [1.0]}), dims=65
        )


def test_composes_with_fastrp(spark):
    from smatchpp_spark.operators.fastrp import fastrp_embeddings

    pairs = [(i, (i * 3 + 1) % 12) for i in range(12)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    emb = fastrp_embeddings(e, dims=4, s=2).embeddings.withColumnRenamed(
        "embedding", "features"
    )
    r = aggregate_neighbor_features(e, emb, dims=4)
    rows = r.features.collect()
    assert len(rows) == len({str(v) for p in pairs for v in p})
    assert all(len(x.mean) == 4 and len(x.max) == 4 for x in rows)
