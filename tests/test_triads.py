"""Triad census vs brute-force C(n,3) python enumeration."""

from __future__ import annotations

import itertools
import random

import pytest

from smatchpp_spark.operators.triads import (
    TRIAD_TYPES,
    triad_census,
    triad_mask_table,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _py_census(edges, verts=None):
    es = {(a, b) for a, b in edges if a != b}
    vs = sorted(verts or {v for e in es for v in e})
    table = triad_mask_table()
    counts = dict.fromkeys(TRIAD_TYPES, 0)
    for u, v, w in itertools.combinations(vs, 3):
        mask = (
            ((u, v) in es) * 1
            + ((v, u) in es) * 2
            + ((u, w) in es) * 4
            + ((w, u) in es) * 8
            + ((v, w) in es) * 16
            + ((w, v) in es) * 32
        )
        counts[table[mask]] += 1
    return counts


def test_mask_table_is_complete_and_consistent():
    table = triad_mask_table()
    assert len(table) == 64
    assert set(table.values()) == set(TRIAD_TYPES)
    # edge-count invariance: type's digit sum MAN decodes the mask bits
    import re

    for mask, name in table.items():
        n_arcs = bin(mask).count("1")
        m, a = int(name[0]), int(name[1])
        assert n_arcs == 2 * m + a, (mask, name)


def test_triad_census_known_small_graphs(spark):
    # directed 3-cycle → one 030C
    rows = {
        r["triad_type"]: r["count"]
        for r in triad_census(_edges_df(spark, [(1, 2), (2, 3), (3, 1)])).collect()
    }
    assert rows["030C"] == 1
    assert sum(rows.values()) == 1

    # transitive triangle → one 030T
    rows = {
        r["triad_type"]: r["count"]
        for r in triad_census(_edges_df(spark, [(1, 2), (2, 3), (1, 3)])).collect()
    }
    assert rows["030T"] == 1

    # complete mutual triangle → 300
    es = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    rows = {
        r["triad_type"]: r["count"]
        for r in triad_census(_edges_df(spark, es)).collect()
    }
    assert rows["300"] == 1

    # path 1→2, 3 isolated-ish via dyad 3-4: types 012 appear
    rows = {
        r["triad_type"]: r["count"]
        for r in triad_census(_edges_df(spark, [(1, 2), (3, 4)])).collect()
    }
    want = _py_census([(1, 2), (3, 4)])
    assert rows == want


@pytest.mark.parametrize("seed,n,m", [(3, 10, 30), (7, 14, 60), (11, 18, 50)])
def test_triad_census_vs_bruteforce(spark, seed, n, m):
    rng = random.Random(seed)
    edges = {
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    }
    edges = {(a, b) for a, b in edges if a != b}
    # duplicate some edges: operator must collapse multiplicity
    dup = list(edges) + list(edges)[: len(edges) // 3]
    got = {
        r["triad_type"]: r["count"]
        for r in triad_census(_edges_df(spark, dup)).collect()
    }
    want = _py_census(edges)
    assert got == want
    assert sum(got.values()) == (
        len({v for e in edges for v in e}) * (len({v for e in edges for v in e}) - 1)
        * (len({v for e in edges for v in e}) - 2) // 6
    )


def test_triad_census_hub_guard(spark):
    # star hub with out-edges to 10 leaves + a mutual pair off to the
    # side; capping center degree below 10 drops the hub's wedges
    es = [(0, i) for i in range(1, 11)] + [(20, 21), (21, 20)]
    full = {
        r["triad_type"]: r["count"]
        for r in triad_census(_edges_df(spark, es)).collect()
    }
    want = _py_census(es)
    assert full == want
    assert full["021D"] == 45  # C(10,2) diverging pairs at the hub

    capped_df = triad_census(_edges_df(spark, es), max_center_degree=5)
    capped = {r["triad_type"]: r["count"] for r in capped_df.collect()}
    assert capped["021D"] == 0  # hub wedges gone (documented undercount)
    assert capped["012"] == want["012"]  # arithmetic types stay exact
    assert capped["102"] == want["102"]
    assert "dropped_centers" in capped_df.columns
