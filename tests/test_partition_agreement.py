"""ARI + NMI partition agreement vs python replays."""

from __future__ import annotations

import math
import random
from collections import Counter

from smatchpp_spark.operators.graphstats import partition_agreement


def _df(spark, lab):
    return spark.createDataFrame(
        [(f"v{v}", l) for v, l in lab.items()], "vertex string, label string"
    )


def _py_ari(la, lb):
    keys = sorted(set(la) & set(lb))
    cont = Counter((la[k], lb[k]) for k in keys)
    ai = Counter(la[k] for k in keys)
    bj = Counter(lb[k] for k in keys)

    def c2(x):
        return x * (x - 1) // 2

    n = len(keys)
    sij = sum(c2(v) for v in cont.values())
    sa = sum(c2(v) for v in ai.values())
    sb = sum(c2(v) for v in bj.values())
    c = c2(n)
    den = c * (sa + sb) - 2 * sa * sb
    return 1.0 if den == 0 else 2 * (c * sij - sa * sb) / den


def _py_nmi(la, lb):
    keys = sorted(set(la) & set(lb))
    n = len(keys)
    cont = Counter((la[k], lb[k]) for k in keys)
    ai = Counter(la[k] for k in keys)
    bj = Counter(lb[k] for k in keys)
    mi = sum(
        (v / n) * math.log(n * v / (ai[x] * bj[y]))
        for (x, y), v in cont.items()
    )
    ha = -sum((v / n) * math.log(v / n) for v in ai.values())
    hb = -sum((v / n) * math.log(v / n) for v in bj.values())
    return 0.0 if ha <= 0 or hb <= 0 else 2 * mi / (ha + hb)


def test_identical_partitions(spark):
    lab = {v: f"c{v % 4}" for v in range(40)}
    row = partition_agreement(_df(spark, lab), _df(spark, lab)).collect()[0]
    assert row["n"] == 40
    assert math.isclose(row["ari"], 1.0)
    assert math.isclose(row["nmi"], 1.0, abs_tol=1e-6)


def test_label_permutation_invariance(spark):
    la = {v: f"c{v % 3}" for v in range(30)}
    renamed = {v: {"c0": "x", "c1": "y", "c2": "z"}[l] for v, l in la.items()}
    row = partition_agreement(_df(spark, la), _df(spark, renamed)).collect()[0]
    assert math.isclose(row["ari"], 1.0)


def test_vs_python_random(spark):
    rng = random.Random(61)
    la = {v: f"a{rng.randrange(4)}" for v in range(60)}
    lb = {v: f"b{rng.randrange(5)}" for v in range(60)}
    row = partition_agreement(_df(spark, la), _df(spark, lb)).collect()[0]
    assert math.isclose(row["ari"], _py_ari(la, lb), abs_tol=1e-12)
    assert math.isclose(row["nmi"], _py_nmi(la, lb), abs_tol=1e-5)


def test_degenerate_single_clusters(spark):
    la = {v: "one" for v in range(10)}
    lb = {v: "uno" for v in range(10)}
    row = partition_agreement(_df(spark, la), _df(spark, lb)).collect()[0]
    assert row["ari"] == 1.0  # identical (trivial) partitions
    assert row["nmi"] == 0.0  # zero entropy convention
