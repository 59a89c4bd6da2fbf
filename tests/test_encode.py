"""Vertex-id dictionary encoding: dense, deterministic, round-trippable."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from smatchpp_spark.sources.encode import (
    decode_vertices,
    encode_edges,
    vertex_dictionary,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _py_vid_order(vertices, seed=42, n_buckets=256):
    """Python replay of the (bucket, hash, vertex) total order."""

    def h(v):
        return int(hashlib.md5(f"{v}#{seed}".encode()).hexdigest()[:15], 16)

    return sorted(vertices, key=lambda v: (h(v) % n_buckets, h(v), v))


def test_dictionary_dense_and_matches_python_replay(spark):
    pairs = [(f"a{i}", f"b{i % 7}") for i in range(50)] + [("hub", f"a{i}") for i in range(20)]
    e = _edges(spark, pairs)
    d = vertex_dictionary(e)
    rows = {r.vertex: r.vid for r in d.collect()}
    verts = {s for s, _ in pairs} | {t for _, t in pairs}
    assert set(rows) == verts
    # dense [0, V)
    assert sorted(rows.values()) == list(range(len(verts)))
    # exact assignment matches the documented total order
    expected = {v: i for i, v in enumerate(_py_vid_order(verts))}
    assert rows == expected


def test_dictionary_deterministic_across_partitionings(spark):
    pairs = [(f"v{i}", f"v{(i * 17) % 40}") for i in range(200)]
    e1 = _edges(spark, pairs).repartition(1)
    e2 = _edges(spark, pairs).repartition(13, "dst")
    d1 = {r.vertex: r.vid for r in vertex_dictionary(e1).collect()}
    d2 = {r.vertex: r.vid for r in vertex_dictionary(e2).collect()}
    assert d1 == d2


def test_encode_decode_round_trip(spark):
    pairs = [("x", "y"), ("y", "z"), ("z", "x"), ("x", "z")]
    e = _edges(spark, pairs).withColumn("w", F.length("src").cast("double"))
    d = vertex_dictionary(e)
    enc = encode_edges(e, d)
    assert dict(enc.dtypes)["src"] == "bigint"
    assert dict(enc.dtypes)["dst"] == "bigint"
    assert enc.count() == len(pairs)  # joins drop / duplicate nothing
    # extra columns pass through
    assert "w" in enc.columns
    # decode both endpoints and compare multisets
    dec = decode_vertices(
        decode_vertices(enc.withColumnRenamed("src", "vertex"), d)
        .withColumnRenamed("vertex", "src")
        .withColumnRenamed("dst", "vertex"),
        d,
    ).withColumnRenamed("vertex", "dst")
    got = sorted((r.src, r.dst) for r in dec.collect())
    assert got == sorted(pairs)


def test_encoded_degrees_match_string_degrees(spark):
    """End-to-end: an operator run on encoded longs decodes to the same
    answer it gives on raw strings."""
    from smatchpp_spark.operators.degrees import degrees

    pairs = [(f"n{i}", f"n{(i * 3) % 25}") for i in range(120)]
    e = _edges(spark, pairs)
    d = vertex_dictionary(e)
    on_strings = {
        (r.vertex, r.in_deg, r.out_deg) for r in degrees(e).collect()
    }
    enc = encode_edges(e, d).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    dec = decode_vertices(
        degrees(enc).withColumn("vertex", F.col("vertex").cast("long")), d
    )
    on_longs = {(r.vertex, r.in_deg, r.out_deg) for r in dec.collect()}
    assert on_longs == on_strings
