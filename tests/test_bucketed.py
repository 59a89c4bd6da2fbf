"""Bucketed co-located joins: the no-exchange contract, plan-verified.

Auto-broadcast is disabled inside each test — at the 100 TB scale this
layout targets, neither join side is broadcastable, so the honest
comparison is sort-merge-with-shuffle vs bucket-to-bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smatchpp_spark.sources.bucketed import (
    plan_has_exchange,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def edges(spark):
    return spark.createDataFrame(
        [(str(i % 40), str((i * 7 + 3) % 40)) for i in range(400)],
        "src string, dst string",
    )


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_self_join_has_no_exchange(spark, edges, tmp_path, no_broadcast):
    write_bucketed(
        edges, "t_edges_bkt", ["src"], n_buckets=8, path=str(tmp_path / "e")
    )
    try:
        b = read_bucketed(spark, "t_edges_bkt")
        joined = b.alias("a").join(b.alias("b"), "src")
        # both sides share the bucket layout: zero shuffle in the plan
        assert not plan_has_exchange(joined)
        # ...and the result is still correct
        expect = edges.alias("a").join(edges.alias("b"), "src").count()
        assert joined.count() == expect

        # a raw parquet read of the same files LOSES the layout — the
        # exchange comes back (this is why read_bucketed uses the catalog)
        raw = spark.read.parquet(str(tmp_path / "e"))
        assert plan_has_exchange(raw.alias("a").join(raw.alias("b"), "src"))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_edges_bkt")


def test_bucketed_aggregation_has_no_exchange(spark, edges, tmp_path, no_broadcast):
    write_bucketed(
        edges, "t_edges_bkt2", ["src"], n_buckets=8, path=str(tmp_path / "e2")
    )
    try:
        b = read_bucketed(spark, "t_edges_bkt2")
        agg = b.groupBy("src").agg(F.count(F.lit(1)).alias("fanout"))
        assert not plan_has_exchange(agg)
        got = {r["src"]: r["fanout"] for r in agg.collect()}
        want = {
            r["src"]: r["n"]
            for r in edges.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_edges_bkt2")


def test_bucketed_triangle_wedge_join_has_no_exchange(
    spark, edges, tmp_path, no_broadcast
):
    """Triangle counting over a pre-oriented edge table stored bucketed
    by the wedge pivot (lo): the wedge self-join plans ZERO exchange on
    its inputs (bucket-to-bucket), and triangle_count_prepared over the
    bucketed layout matches the one-shot triangle_count exactly."""
    from smatchpp_spark.operators.triangles import (
        _canonical_undirected,
        oriented_edges,
        triangle_count,
        triangle_count_prepared,
    )

    oriented = oriented_edges(edges)
    canonical = _canonical_undirected(edges)
    write_bucketed(
        oriented, "t_tri_oriented", ["lo"], n_buckets=8,
        path=str(tmp_path / "ori"),
    )
    try:
        b = read_bucketed(spark, "t_tri_oriented")
        e1 = b.select(F.col("lo").alias("pivot"), F.col("hi").alias("v"))
        e2 = b.select(F.col("lo").alias("pivot"), F.col("hi").alias("w"))
        wedge = e1.join(e2, "pivot").filter(F.col("v") < F.col("w"))
        assert not plan_has_exchange(wedge)

        got = triangle_count_prepared(b, canonical)
        want = triangle_count(edges)
        assert got.total == want.total
        g = {(r.vertex, r.triangles) for r in got.per_vertex.collect()}
        w = {(r.vertex, r.triangles) for r in want.per_vertex.collect()}
        assert g == w
    finally:
        spark.sql("DROP TABLE IF EXISTS t_tri_oriented")
