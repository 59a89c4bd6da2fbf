"""Test helpers: triples ↔ edge-table conversion and multiset compare."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F  # noqa: F401

EDGES_DDL = "graph_id string, pos long, src string, rel string, dst string"


def edges_df(spark, graphs: dict[str, list[tuple[str, str, str]]]):
    rows = [
        (gid, pos, s, r, t)
        for gid, triples in graphs.items()
        for pos, (s, r, t) in enumerate(triples)
    ]
    return spark.createDataFrame(rows, EDGES_DDL)


def collect_graphs(edges) -> dict[str, list[tuple[str, str, str]]]:
    out: dict[str, list] = {}
    for row in edges.orderBy("graph_id", "pos").collect():
        out.setdefault(row.graph_id, []).append((row.src, row.rel, row.dst))
    return out


def assert_same_multisets(actual: dict, expected: dict, context=""):
    assert set(actual) == set(expected), (
        f"graph id sets differ {context}: {set(actual) ^ set(expected)}"
    )
    for gid in expected:
        assert Counter(actual[gid]) == Counter(expected[gid]), (
            f"graph {gid} differs {context}:\n"
            f"  got     : {sorted(actual[gid])}\n"
            f"  expected: {sorted(expected[gid])}"
        )
