"""Truncated hitting time: numpy replay, conventions, resume."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from smatchpp_spark.operators.hitting import hitting_times

E = [
    ("a", "b"), ("b", "t"), ("c", "d"), ("d", "c"),
    ("a", "e"), ("f", "t"), ("f", "t"), ("f", "a"),
]


def _replay(K):
    verts = sorted({x for p in E for x in p})
    outs: dict[str, list] = {}
    for s, d in E:
        outs.setdefault(s, []).append(d)
    h = {v: 0.0 for v in verts}
    for _ in range(K):
        nh = {}
        for v in verts:
            if v == "t":
                nh[v] = 0.0
            elif v not in outs:
                nh[v] = 1.0 + h[v]
            else:
                nh[v] = 1.0 + sum(h[d] for d in outs[v]) / len(outs[v])
        h = nh
    return h


def test_matches_replay_and_conventions(spark):
    edges = spark.createDataFrame(E, "src string, dst string")
    targets = spark.createDataFrame([("t",), ("zz_absent",)], "v string")
    K = 8
    got = {
        r.vertex: r.hitting_time
        for r in hitting_times(edges, targets, horizon=K).times.collect()
    }
    exp = _replay(K)
    assert set(got) == set(exp)  # absent target ignored
    assert all(abs(got[v] - exp[v]) < 1e-12 for v in exp)
    # conventions: target 0; unreachable cycle and stuck vertex pin at K;
    # multi-edge multiplicity (f has 2/3 mass to t): one value-iteration
    # step behind a, so h_K(f) = 1 + h_{K-1}(a)/3
    assert got["t"] == 0.0
    assert got["c"] == got["d"] == got["e"] == float(K)
    assert abs(got["f"] - (1.0 + _replay(K - 1)["a"] / 3.0)) < 1e-12


def test_monotone_in_horizon(spark):
    edges = spark.createDataFrame(E, "src string, dst string")
    targets = spark.createDataFrame([("t",)], "v string")
    h4 = {r.vertex: r.hitting_time
          for r in hitting_times(edges, targets, horizon=4).times.collect()}
    h8 = {r.vertex: r.hitting_time
          for r in hitting_times(edges, targets, horizon=8).times.collect()}
    assert all(h8[v] >= h4[v] - 1e-12 for v in h4)
    assert all(h4[v] <= 4.0 + 1e-12 for v in h4)


def test_resume_identical(spark, tmp_path):
    edges = spark.createDataFrame(E, "src string, dst string")
    targets = spark.createDataFrame([("t",)], "v string")
    ck = str(tmp_path / "ck")
    full = hitting_times(edges, targets, horizon=6, checkpoint_dir=ck).times
    resumed = hitting_times(
        edges, targets, horizon=6, checkpoint_dir=ck, resume=True
    ).times
    j = full.withColumnRenamed("hitting_time", "a").join(
        resumed.withColumnRenamed("hitting_time", "b"), "vertex"
    )
    assert j.filter(F.col("a") != F.col("b")).count() == 0
