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
