"""CSR-blocked PageRank: parity with the join dataflow, hub-salted
block bounds, long-id path, resume identity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from smatchpp_spark.operators.csr import build_csr_blocks, pagerank_csr
from smatchpp_spark.operators.pagerank import pagerank
from smatchpp_spark.sources.encode import encode_edges, vertex_dictionary


def _graph(spark):
    random.seed(7)
    pairs = [
        (f"v{random.randrange(60)}", f"v{random.randrange(80)}")
        for _ in range(400)
    ]
    # hub, multi-edges, dangling targets (v60..v79 have no out-edges)
    pairs += [("hub", f"v{i}") for i in range(50)] + [("v1", "v2")] * 5
    return spark.createDataFrame(pairs, "src string, dst string")


def test_csr_matches_join_pagerank(spark):
    e = _graph(spark)
    a = pagerank(e, alpha=0.85, tol=-1.0, max_supersteps=8).ranks
    b = pagerank_csr(e, alpha=0.85, tol=-1.0, max_supersteps=8).ranks
    j = a.withColumnRenamed("rank", "ra").join(
        b.withColumnRenamed("rank", "rb"), "vertex", "full"
    )
    row = j.agg(
        F.sum(F.col("ra").isNull().cast("int")).alias("na"),
        F.sum(F.col("rb").isNull().cast("int")).alias("nb"),
        F.max(F.abs(F.col("ra") - F.col("rb"))).alias("d"),
    ).collect()[0]
    assert row.na == 0 and row.nb == 0 and row.d < 1e-12


def test_csr_long_vid_input(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)], "src long, dst long"
    )
    a = pagerank(e, alpha=0.85, tol=-1.0, max_supersteps=6).ranks
    b = pagerank_csr(e, alpha=0.85, tol=-1.0, max_supersteps=6).ranks
    j = a.withColumnRenamed("rank", "ra").join(
        b.withColumnRenamed("rank", "rb"), "vertex"
    )
    assert j.count() == 4
    assert (
        j.agg(F.max(F.abs(F.col("ra") - F.col("rb")))).collect()[0][0]
        < 1e-14
    )


def test_hub_salting_bounds_block_rows(spark):
    # one hub with 600 out-edges, max_fanout=100 → its CSR rows are
    # spread over ≥2 salted blocks and no block holds >~2x the fanout
    pairs = [("hub", f"t{i}") for i in range(600)] + [("a", "b")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    d = vertex_dictionary(e)
    blocks = build_csr_blocks(encode_edges(e, d), n_parts=4, max_fanout=100)
    sizes = [
        r.n for r in blocks.select(F.size("dst_local").alias("n")).collect()
    ]
    assert sum(sizes) == 601
    assert len(sizes) >= 3  # hub split across salts
    assert max(sizes) < 300  # no block row scales with the hub degree
    # global out-degree survives salting: every hub slice carries 1/600
    invs = {
        round(v, 12)
        for r in blocks.select("inv_deg").collect()
        for v in r.inv_deg
    }
    assert round(1.0 / 600, 12) in invs


def test_csr_resume_identical(spark, tmp_path):
    e = _graph(spark)
    ck = str(tmp_path / "ck")
    full = pagerank_csr(
        e, alpha=0.85, tol=-1.0, max_supersteps=6, checkpoint_dir=ck
    ).ranks
    resumed = pagerank_csr(
        e, alpha=0.85, tol=-1.0, max_supersteps=6, checkpoint_dir=ck,
        resume=True,
    )
    j = full.withColumnRenamed("rank", "ra").join(
        resumed.ranks.withColumnRenamed("rank", "rb"), "vertex"
    )
    assert (
        j.agg(F.max(F.abs(F.col("ra") - F.col("rb")))).collect()[0][0]
        == pytest.approx(0.0, abs=0.0)
    )


def test_csr_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    r = pagerank_csr(e, max_supersteps=3)
    assert r.ranks.count() == 0 and r.converged
