"""Streaming/batch parity: the streaming rollup over a file source must
produce the same finalized rows as the batch operator."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from smatchpp_spark.pipeline.events import minute_rollup, sessionize
from smatchpp_spark.streaming import stream_minute_rollup, stream_sessionize


def _stream_to_memory(spark, src_dir, schema, transform, name):
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_minute_rollup_matches_batch(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        events.write.parquet(src)
        got = _stream_to_memory(
            spark, src, events.schema, stream_minute_rollup, "rollup_mem"
        )
        got_rows = {
            (r["minute_ep"], r["event_type"]): (r["n_events"], r["value_sum"])
            for r in got.collect()
        }
    expect = {
        (r["minute_ep"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in minute_rollup(events).collect()
    }
    # append mode only emits windows the final watermark passed: windows
    # still open at end-of-stream (within 10 min of the max event time)
    # are withheld — correct streaming semantics, excluded from parity
    max_ep = events.agg(F.max(F.unix_timestamp(F.col("ts").cast("timestamp")))).collect()[0][0]
    wm = max_ep - 600
    expect_emitted = {k: v for k, v in expect.items() if k[0] + 60 <= wm}
    assert set(got_rows) >= set(expect_emitted)
    for k in got_rows:
        assert got_rows[k] == expect[k], k


def test_stream_sessionize_matches_batch_bounds(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        events.write.parquet(src)
        got = _stream_to_memory(
            spark, src, events.schema, stream_sessionize, "sessions_mem"
        )
        got_rows = {
            (r["user_id"], r["t_start"]): r["n_events"] for r in got.collect()
        }
    # batch sessionize keys sessions differently; compare (user, start)
    # -> count — starts coincide because the gap semantics coincide.
    # Sessions still open at the final watermark are withheld in append
    # mode, so assert emitted ⊆ batch with equal counts plus coverage of
    # everything that closed a watermark-width before end-of-stream.
    expect = {
        (r["user_id"], r["t_start"]): r["n_events"]
        for r in sessionize(events).collect()
    }
    max_ep = events.agg(F.max(F.unix_timestamp(F.col("ts").cast("timestamp")))).collect()[0][0]
    for k, v in got_rows.items():
        assert expect[k] == v, k
    closed = {k for k, v in expect.items() if k[1] < max_ep - 3600 - 1800}
    assert closed <= set(got_rows)


def test_stream_degrees_stateful_matches_batch(spark):
    """applyInPandasWithState custom operator: two micro-batches of edges
    update per-vertex state; final totals equal the batch degrees()."""
    import time

    from smatchpp_spark.operators.degrees import degrees
    from smatchpp_spark.streaming.degrees import stream_degrees

    batch1 = [("a", "b"), ("a", "c"), ("b", "c")]
    batch2 = [("c", "a"), ("a", "b"), ("d", "a")]
    schema = "src string, dst string"
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "edges")
        ckpt = os.path.join(tmp, "ckpt")
        spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_degrees(stream)
            .writeStream.format("memory")
            .queryName("deg_mem")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            mid = {
                r["vertex"]: (r["in_deg"], r["out_deg"])
                for r in spark.table("deg_mem").collect()
            }
            assert mid["a"] == (0, 2) and mid["c"] == (2, 0)
            spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        # counters are monotone: max per vertex == final state
        rows = spark.table("deg_mem").collect()
        got: dict = {}
        for r in rows:
            cur = got.get(r["vertex"], (0, 0))
            got[r["vertex"]] = (max(cur[0], r["in_deg"]), max(cur[1], r["out_deg"]))

    both = spark.createDataFrame(batch1 + batch2, schema)
    expect = {
        r["vertex"]: (r["in_deg"], r["out_deg"]) for r in degrees(both).collect()
    }
    assert got == expect


def test_stream_window_indegree_matches_batch(spark):
    """Windowed trending: the streaming aggregation (watermarked, two
    micro-batches) finalizes the same (window, vertex, in_deg) rows as
    the batch form, and trending_topk ranks deterministically."""
    from smatchpp_spark.streaming.degrees import trending_topk, window_indegree

    def ts(m, s):
        return f"2026-01-01 10:{m:02d}:{s:02d}"

    batch1 = [("a", "x", ts(0, 5)), ("b", "x", ts(0, 20)), ("c", "y", ts(0, 40))]
    batch2 = [("d", "x", ts(1, 10)), ("e", "y", ts(1, 30)), ("f", "y", ts(1, 50)),
              # late arrival inside the watermark for window 10:00
              ("g", "y", ts(0, 59))]
    schema = "src string, dst string, ts string"
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "edges")
        ckpt = os.path.join(tmp, "ckpt")
        spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            window_indegree(stream)
            .writeStream.format("memory")
            .queryName("trend_mem")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.table("trend_mem").collect()
        # update mode re-emits windows; the max per key is the final count
        got: dict = {}
        for r in rows:
            key = (r["window_ep"], r["vertex"])
            got[key] = max(got.get(key, 0), r["in_deg"])

    both = spark.createDataFrame(batch1 + batch2, schema)
    expect = {
        (r["window_ep"], r["vertex"]): r["in_deg"]
        for r in window_indegree(both, watermark=None).collect()
    }
    assert got == expect

    top = trending_topk(window_indegree(both, watermark=None), k=1).collect()
    by_window = {r["window_ep"]: (r["vertex"], r["in_deg"]) for r in top}
    wins = sorted(by_window)
    # window 10:00: x (a,b) and y (c + late g) tie at 2 → vertex-id tie-break
    assert by_window[wins[0]] == ("x", 2)
    # window 10:01: y (e,f) beats x (d)
    assert by_window[wins[1]] == ("y", 2)


def test_stream_dedup_exact_matches_batch(spark):
    """Streaming exact dedup (watermark-bounded state) keeps exactly one
    row per content key and agrees with the batch dropDuplicates form
    when duplicates arrive within one watermark span."""
    import datetime as dt

    from smatchpp_spark.streaming.dedup import stream_dedup_exact

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    texts = ["alpha doc", "beta doc", "gamma doc"]
    for i in range(30):
        rows.append((i, t0 + dt.timedelta(seconds=10 * i), texts[i % 3]))
    df = spark.createDataFrame(rows, "row_id long, ts timestamp, text string")

    batch = stream_dedup_exact(df, text_col="text")
    assert batch.count() == 3
    assert {r.text for r in batch.collect()} == set(texts)

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "docs")
        df.write.parquet(src)
        got = _stream_to_memory(
            spark, src, df.schema,
            lambda s: stream_dedup_exact(s, text_col="text"),
            "dedup_mem",
        )
        out = got.collect()
    assert len(out) == 3
    assert {r.text for r in out} == set(texts)

    # explicit key columns work too; missing both raises
    byid = stream_dedup_exact(df.withColumn("k", F.col("row_id") % 5), ["k"])
    assert byid.count() == 5
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stream_dedup_exact(df)


def test_stream_sketches_match_batch(spark):
    """Two micro-batches through the CMS and HLL-register aggregations
    in complete mode equal the batch sketches of the concatenated
    input (sketches are order-insensitive monoids)."""
    from smatchpp_spark.pipeline.sketches import (
        cms_estimate,
        count_min_sketch,
        hll_distinct,
    )
    from smatchpp_spark.streaming.sketches import (
        hll_estimate_from_registers,
        stream_count_min,
        stream_hll_registers,
    )

    batch1 = [(f"w{i % 7}",) for i in range(40)]
    batch2 = [(f"w{i % 11}",) for i in range(60)]
    schema = "key string"
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "keys")
        ck1 = os.path.join(tmp, "ck1")
        ck2 = os.path.join(tmp, "ck2")
        spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q1 = (
            stream_count_min(stream, "key", depth=3, width=32, portable=True)
            .writeStream.format("memory")
            .queryName("cms_mem")
            .outputMode("complete")
            .option("checkpointLocation", ck1)
            .start()
        )
        q2 = (
            stream_hll_registers(stream, "key", p=4, portable=True)
            .writeStream.format("memory")
            .queryName("hll_mem")
            .outputMode("complete")
            .option("checkpointLocation", ck2)
            .start()
        )
        try:
            q1.processAllAvailable()
            q2.processAllAvailable()
            mid = {
                (r["row"], r["col"]): r["cnt"]
                for r in spark.table("cms_mem").collect()
            }
            spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
            q1.processAllAvailable()
            q2.processAllAvailable()
        finally:
            q1.stop()
            q2.stop()

        both = spark.createDataFrame(batch1 + batch2, schema)
        want_cms = {
            (r["row"], r["col"]): r["cnt"]
            for r in count_min_sketch(
                both, "key", depth=3, width=32, portable=True
            ).collect()
        }
        got_cms = {
            (r["row"], r["col"]): r["cnt"]
            for r in spark.table("cms_mem").collect()
        }
        assert got_cms == want_cms
        # counters only grew between micro-batches
        assert all(got_cms[k] >= v for k, v in mid.items())

        # estimates off the streamed sketch == estimates off the batch one
        keys = both.distinct()
        streamed_est = {
            r["key"]: r["est"]
            for r in cms_estimate(
                spark.table("cms_mem"), keys, "key", 3, 32, portable=True
            ).collect()
        }
        import collections

        truth = collections.Counter(k for k, in batch1 + batch2)
        for k, c in truth.items():
            assert streamed_est[k] >= c

        got_hll = hll_estimate_from_registers(
            spark.table("hll_mem"), p=4
        ).collect()[0]
        want_hll = hll_distinct(both, "key", p=4, portable=True).collect()[0]
        assert got_hll.asDict() == want_hll.asDict()


def test_stream_pagerank_incremental_matches_batch(spark):
    """foreachBatch streaming PageRank: after each micro-batch the
    committed ranks equal a batch pagerank run on the accumulated edge
    set; batch 2 warm-starts from batch 1 (streaming/ranks.py)."""
    from smatchpp_spark.operators.pagerank import pagerank
    from smatchpp_spark.streaming.ranks import (
        latest_ranks,
        stream_pagerank_incremental,
    )

    batch1 = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    batch2 = [("d", "e"), ("e", "a"), ("b", "d")]
    schema = "src string, dst string"
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in_edges")
        work = os.path.join(tmp, "work")
        spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_pagerank_incremental(
            stream, work, tol=1e-12, max_supersteps=300
        ).start()
        try:
            q.processAllAvailable()
            got1 = {
                r.vertex: r.rank for r in latest_ranks(spark, work).collect()
            }
            want1 = {
                r.vertex: r.rank
                for r in pagerank(
                    spark.createDataFrame(batch1, schema),
                    tol=1e-13, max_supersteps=300,
                ).ranks.collect()
            }
            assert got1.keys() == want1.keys()
            assert max(abs(got1[v] - want1[v]) for v in want1) < 1e-9
            spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        got2 = {
            r.vertex: r.rank for r in latest_ranks(spark, work).collect()
        }
        want2 = {
            r.vertex: r.rank
            for r in pagerank(
                spark.createDataFrame(batch1 + batch2, schema),
                tol=1e-13, max_supersteps=300,
            ).ranks.collect()
        }
        assert got2.keys() == want2.keys()
        assert max(abs(got2[v] - want2[v]) for v in want2) < 1e-9
