"""Vertex-id dictionary encoding: string ids → dense longs.

At 10^12-edge scale, string vertex ids ('p1042998', repo/path/commit
composites) dominate shuffle width and hash cost in every iterative
operator.  The standard fix is a one-time densification pass: build a
(vertex → vid) dictionary with vids dense in [0, V), re-key the edge
table to longs, run the iterations on longs, decode at the end.
Narrower shuffles (8-byte keys), faster hashing, and array-indexable
vertex state downstream.

Determinism: vids follow the (bucket = h % n_buckets, h, vertex) total
order of the portable vertex hash — assigned with the two-level
dense-index pattern (per-bucket row_numbers + a broadcast bucket-offset
spine, functions/indexing.py), so NO single-partition window ever sees
the V-row dictionary, and any engine replays the identical assignment
(one ORDER BY in the SQL oracle).  Hash-order (rather than
lexicographic) assignment also RANGE-BALANCES the ids: consecutive vid
ranges hold hash-random vertices, so downstream range partitions carry
uniform degree mass instead of whatever lexicographic locality the raw
ids had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64


def vertex_dictionary(
    edges: DataFrame, seed: int = 42, n_buckets: int = 256
) -> DataFrame:
    """(vertex string, vid long) — dense [0, V) over the distinct
    vertices of ``edges`` (src ∪ dst)."""
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .withColumn(
            "h",
            hash64(
                F.concat_ws("#", F.col("vertex"), F.lit(str(seed))),
                portable=True,
            ),
        )
        .withColumn("b", F.pmod(F.col("h"), F.lit(n_buckets)))
    )
    w_rn = Window.partitionBy("b").orderBy("h", "vertex")
    rn = verts.withColumn("_rn", F.row_number().over(w_rn) - 1)
    counts = verts.groupBy("b").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "b", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return rn.join(F.broadcast(offsets), "b").select(
        "vertex", (F.col("_off") + F.col("_rn")).cast("long").alias("vid")
    )


def encode_edges(
    edges: DataFrame, dictionary: DataFrame
) -> DataFrame:
    """Re-key (src, dst [, extra cols]) to (src long, dst long) via two
    dictionary equi-joins; all non-endpoint columns pass through."""
    extra = [c for c in edges.columns if c not in ("src", "dst")]
    d_src = dictionary.select(
        F.col("vertex").alias("src"), F.col("vid").alias("_svid")
    )
    d_dst = dictionary.select(
        F.col("vertex").alias("dst"), F.col("vid").alias("_dvid")
    )
    return (
        edges.join(d_src, "src")
        .join(d_dst, "dst")
        .select(
            F.col("_svid").alias("src"), F.col("_dvid").alias("dst"), *extra
        )
    )


def decode_vertices(
    df: DataFrame, dictionary: DataFrame, vid_col: str = "vertex"
) -> DataFrame:
    """Replace a long ``vid_col`` with the original string id (one
    equi-join; remaining columns pass through)."""
    extra = [c for c in df.columns if c != vid_col]
    d = dictionary.select(
        F.col("vid").alias(vid_col), F.col("vertex").alias("_v")
    )
    return df.join(d, vid_col).select(
        F.col("_v").alias(vid_col), *extra
    )
