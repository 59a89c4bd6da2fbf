"""R-MAT generator: determinism, quadrant semantics, python replay."""

from __future__ import annotations

import hashlib

import pytest

from smatchpp_spark.sources.rmat import rmat_edges

_TWO60 = 1 << 60


def test_rmat_deterministic_and_bounded(spark):
    a = rmat_edges(spark, scale=6, n_edges=500, seed=3).collect()
    b = rmat_edges(spark, scale=6, n_edges=500, seed=3, num_partitions=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 500
    for r in a:
        assert 0 <= r["src"] < 64 and 0 <= r["dst"] < 64
    # different seed -> different graph
    c = rmat_edges(spark, scale=6, n_edges=500, seed=4).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_rmat_degenerate_quadrants(spark):
    # a=1: every level picks quadrant (0,0) -> all edges are (0,0)
    rows = rmat_edges(spark, scale=5, n_edges=50, a=1.0, b=0.0, c=0.0, d=0.0).collect()
    assert all(r["src"] == 0 and r["dst"] == 0 for r in rows)
    # a=d=0.5: src bit == dst bit every level -> diagonal edges
    rows = rmat_edges(spark, scale=5, n_edges=200, a=0.5, b=0.0, c=0.0, d=0.5).collect()
    assert all(r["src"] == r["dst"] for r in rows)


def test_rmat_python_replay_portable(spark):
    scale, n, seed = 7, 120, 11
    a, b, c, d = 0.57, 0.19, 0.19, 0.05
    ta = round(a * _TWO60)
    tb = round((a + b) * _TWO60)
    tc = round((a + b + c) * _TWO60)
    got = {
        r["edge_id"]: (r["src"], r["dst"])
        for r in rmat_edges(
            spark, scale=scale, n_edges=n,
            a=a, b=b, c=c, d=d, seed=seed, portable=True,
        ).collect()
    }
    for i in range(n):
        src = dst = 0
        for level in range(scale):
            h = int(
                hashlib.md5(f"{i}:{level}:{seed}".encode()).hexdigest()[:15], 16
            )
            sbit = 0 if h < tb else 1
            dbit = 0 if h < ta else (1 if h < tb else (0 if h < tc else 1))
            shift = scale - 1 - level
            src += sbit << shift
            dst += dbit << shift
        assert got[i] == (src, dst), i


def test_rmat_hub_skew(spark):
    """Graph500 parameters concentrate mass in the low-id quadrant:
    the max out-degree dwarfs the median."""
    df = rmat_edges(spark, scale=8, n_edges=4096, seed=5)
    degs = sorted(
        r["n"]
        for r in df.groupBy("src").count().withColumnRenamed("count", "n").collect()
    )
    assert degs[-1] >= 8 * degs[len(degs) // 2]


def test_rmat_bad_args(spark):
    with pytest.raises(ValueError, match="sum to 1"):
        rmat_edges(spark, scale=4, n_edges=10, a=0.9, b=0.2, c=0.0, d=0.0)
    with pytest.raises(ValueError, match="scale"):
        rmat_edges(spark, scale=0, n_edges=10)
    with pytest.raises(ValueError, match="n_edges"):
        rmat_edges(spark, scale=4, n_edges=0)
