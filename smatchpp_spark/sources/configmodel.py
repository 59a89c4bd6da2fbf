"""Configuration-model null graphs: degree-preserving random rewiring.

The standard null model for motif/assortativity significance (Newman
2003, public): expand each vertex into ``deg`` stubs, shuffle the stub
list, pair consecutive stubs.  Against it, an observed graph's triangle
count / assortativity / mixing matrix gets a "vs degree-preserving
chance" baseline — the companion to the R-MAT generator (sources/
rmat.py) on the null-model side.

Determinism (engine contract): the "shuffle" is a SORT by the portable
64-bit hash of (vertex, stub-index, seed) — a fixed total order any
engine reproduces bit-for-bit.  The global pairing index comes from the
two-level dense-index pattern (functions/indexing.py): per-bucket
row_numbers + a broadcast bucket-offset spine, so NO single-partition
window ever sees the full stub table.  The order is
(bucket = h % n_buckets, h, vertex, i) — ``n_buckets`` is part of the
draw, documented, and replayed by the SQL oracle as one ORDER BY.

Scale shape at 100 TB: stubs = one explode of the degree table (2m
rows), the index = one bucket-keyed window + a broadcast spine, the
pairing = one self-equi-join on ``pair_id`` — no iteration, no driver
state, skew-free by construction (buckets are hash-uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64


def configuration_model(
    degrees: DataFrame,
    seed: int = 42,
    erased: bool = True,
    n_buckets: int = 256,
) -> DataFrame:
    """Generate one configuration-model graph from ``degrees``
    (columns: vertex, deg).  Returns canonical undirected edges
    ``(src, dst)`` with src ≤ dst.

    ``erased=True`` (the "erased configuration model", standard for
    simple-graph comparisons) drops self-loops and collapses
    multi-edges; ``erased=False`` keeps the raw multigraph rows (one
    row per stub pair).  An odd total stub count drops the single
    highest-index stub (documented, deterministic).
    """
    v, d = degrees.columns[0], degrees.columns[1]
    stubs = degrees.select(
        F.col(v).alias("vertex"),
        F.explode(
            F.sequence(F.lit(0), F.col(d).cast("int") - 1)
        ).alias("i"),
    ).withColumn(
        "h",
        hash64(
            F.concat_ws(
                "#",
                F.col("vertex"),
                F.col("i").cast("string"),
                F.lit(str(seed)),
            ),
            portable=True,
        ),
    ).withColumn("b", F.pmod(F.col("h"), F.lit(n_buckets)))

    # two-level dense index over the (b, h, vertex, i) total order
    w_rn = Window.partitionBy("b").orderBy("h", "vertex", "i")
    rn = stubs.withColumn("_rn", F.row_number().over(w_rn) - 1)
    counts = stubs.groupBy("b").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "b", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    indexed = rn.join(F.broadcast(offsets), "b").select(
        "vertex", (F.col("_off") + F.col("_rn")).alias("idx")
    )
    lo = indexed.filter(F.col("idx") % 2 == 0).select(
        (F.col("idx") / 2).cast("long").alias("pair_id"),
        F.col("vertex").alias("va"),
    )
    hi = indexed.filter(F.col("idx") % 2 == 1).select(
        ((F.col("idx") - 1) / 2).cast("long").alias("pair_id"),
        F.col("vertex").alias("vb"),
    )
    edges = lo.join(hi, "pair_id").select(
        F.least("va", "vb").alias("src"), F.greatest("va", "vb").alias("dst")
    )
    if erased:
        edges = edges.filter(F.col("src") != F.col("dst")).distinct()
    return edges
