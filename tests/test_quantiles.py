"""Exact distributed quantiles: python-sort parity, ties, edge ranks."""

from __future__ import annotations

import math
import random

import pytest

from smatchpp_spark.operators.quantiles import kth_smallest, quantiles_exact


def test_matches_python_sort(spark):
    random.seed(3)
    data = (
        [(random.choice([1.0, 1.0, 2.0, 5.0]),) for _ in range(1500)]
        + [(random.gauss(100, 25),) for _ in range(2500)]
        + [(1e9,), (-1e9,)]
    )
    df = spark.createDataFrame(data, "x double")
    vals = sorted(v for (v,) in data)
    qs = [0.0, 0.01, 0.1, 0.5, 0.9, 0.99, 1.0]
    got = {r.q: (r.k, r.value) for r in quantiles_exact(df, "x", qs).collect()}
    for q in qs:
        k = int(math.floor(q * (len(vals) - 1))) + 1
        assert got[q] == (k, vals[k - 1]), q


def test_integer_column_heavy_ties(spark):
    # degree-like column: long dtype, massive ties
    data = [(i % 7,) for i in range(5000)] + [(1000,)]
    df = spark.createDataFrame(data, "d long")
    vals = sorted(v for (v,) in data)
    got = {r.q: r.value for r in quantiles_exact(df, "d", [0.5, 1.0]).collect()}
    assert got[0.5] == float(vals[int(math.floor(0.5 * (len(vals) - 1)))])
    assert got[1.0] == 1000.0


def test_all_equal_resolves_first_pass(spark):
    df = spark.createDataFrame([(7.0,)] * 100, "x double")
    assert quantiles_exact(df, "x", [0.5]).collect()[0].value == 7.0


def test_kth_bounds_and_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (3.0,)], "x double"
    )
    ks = kth_smallest(df, "x", [1, 3])
    assert ks == {1: 1.0, 3: 3.0}  # null dropped
    with pytest.raises(ValueError):
        kth_smallest(df, "x", [4])
    with pytest.raises(ValueError):
        kth_smallest(spark.createDataFrame([], "x double"), "x", [1])
