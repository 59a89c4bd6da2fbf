"""Configuration-model generator + wedge-sampling transitivity."""

from __future__ import annotations

import itertools
import math
import random
from collections import Counter

from pyspark.sql import functions as F

from smatchpp_spark.operators.graphstats import (
    transitivity,
    transitivity_approx,
)
from smatchpp_spark.sources.configmodel import configuration_model


def _deg_df(spark, degs):
    return spark.createDataFrame(
        [(f"v{v}", d) for v, d in degs.items()], "vertex string, deg int"
    )


def test_config_model_degree_preservation_multigraph(spark):
    # raw (non-erased) multigraph preserves every stub: per-vertex stub
    # count == requested degree (up to the documented odd-stub drop)
    degs = {0: 3, 1: 2, 2: 4, 3: 1, 4: 2}  # sum = 12, even
    e = configuration_model(_deg_df(spark, degs), seed=5, erased=False)
    rows = e.collect()
    assert len(rows) == sum(degs.values()) // 2
    stubs = Counter()
    for r in rows:
        stubs[r["src"]] += 1
        stubs[r["dst"]] += 1
    assert stubs == Counter({f"v{v}": d for v, d in degs.items()})


def test_config_model_odd_total_drops_one_stub(spark):
    degs = {0: 2, 1: 2, 2: 1}  # sum = 5 -> one stub dropped
    e = configuration_model(_deg_df(spark, degs), seed=5, erased=False)
    assert e.count() == 2


def test_config_model_deterministic_and_seed_sensitive(spark):
    degs = {v: (v % 3) + 1 for v in range(20)}
    df = _deg_df(spark, degs)
    a1 = {tuple(r) for r in configuration_model(df, seed=9).collect()}
    a2 = {tuple(r) for r in configuration_model(df, seed=9).collect()}
    b = {tuple(r) for r in configuration_model(df, seed=10).collect()}
    assert a1 == a2
    assert a1 != b  # 20 vertices, 40 stubs: a seed collision would be
    # a portable-hash failure, not luck


def test_config_model_erased_simple(spark):
    degs = {v: 4 for v in range(10)}
    e = configuration_model(_deg_df(spark, degs), seed=3, erased=True)
    rows = [(r["src"], r["dst"]) for r in e.collect()]
    assert len(rows) == len(set(rows))  # no multi-edges
    assert all(a < b for a, b in rows)  # canonical, no self-loops


def _graph(spark, pairs):
    return spark.createDataFrame(
        [(f"v{a}", f"v{b}") for a, b in pairs], "src string, dst string"
    )


def test_transitivity_approx_complete_graph_exact_one(spark):
    # every wedge closed -> estimator is exactly 1.0 regardless of draws
    e = _graph(spark, set(itertools.combinations(range(7), 2)))
    row = transitivity_approx(e, draws_per_vertex=2, portable=True).collect()[0]
    assert row["transitivity_approx"] == 1.0
    assert row["n_wedges"] == 7 * 15  # 7 vertices, C(6,2) wedges each


def test_transitivity_approx_star_zero(spark):
    e = _graph(spark, {(0, i) for i in range(1, 9)})
    row = transitivity_approx(e, draws_per_vertex=3).collect()[0]
    assert row["transitivity_approx"] == 0.0


def test_transitivity_approx_converges(spark):
    rng = random.Random(51)
    pairs = {(rng.randrange(14), rng.randrange(14)) for _ in range(60)}
    e = _graph(spark, pairs)
    exact = transitivity(e).collect()[0]["transitivity"]
    row = transitivity_approx(e, draws_per_vertex=64, seed=8).collect()[0]
    assert math.isclose(row["transitivity_approx"], exact, abs_tol=0.1)


def test_transitivity_approx_deterministic(spark):
    rng = random.Random(53)
    pairs = {(rng.randrange(10), rng.randrange(10)) for _ in range(30)}
    e = _graph(spark, pairs)
    r1 = transitivity_approx(e, draws_per_vertex=4, portable=True).collect()[0]
    r2 = transitivity_approx(e, draws_per_vertex=4, portable=True).collect()[0]
    assert tuple(r1) == tuple(r2)
