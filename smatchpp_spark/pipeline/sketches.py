"""Mergeable frequency sketches — count-min over arbitrary key streams.

Count-min sketch (Cormode & Muthukrishnan 2005, public): a depth×width
counter grid; every item increments one counter per row (column =
row-salted hash mod width); a point estimate is the MIN over the
item's depth cells.  Guarantees: the estimate never undercounts, and
overcounts by more than ``ε·N`` (``width = ⌈e/ε⌉``) with probability
at most ``δ`` (``depth = ⌈ln 1/δ⌉``).

Why this shape on Spark: the sketch IS a DataFrame aggregation —
explode each item into its ``depth`` (row, col) cells, then one
map-side-combined groupBy.  The shuffle carries at most
``depth × width`` distinct cells per map partition regardless of input
size, so a 100 TB key stream reduces to a ≤ depth×width-row table: the
sketch is the textbook example of a bounded-state streaming aggregate
(it drops into ``readStream`` unchanged).  Sketches over different
corpus shards union+re-aggregate to the merged sketch (counter-wise
addition — the CMS merge law).

Hashes route through ``functions.hashing``: ``portable=True`` makes
every cell index bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64


def _cell(key: Column, d: int, width: int, portable: bool) -> Column:
    """Column index of row ``d``: row-salted hash mod width (pmod —
    xxhash64 is signed)."""
    return F.pmod(
        hash64(F.concat(key.cast("string"), F.lit(f"#cms{d}")), portable),
        F.lit(width),
    )


def count_min_sketch(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    count_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` — at most depth×width rows.

    ``count_col`` weights each item (e.g. pre-aggregated term counts);
    default weight 1.  Merging shards = union of sketches + the same
    groupBy/sum.
    """
    if depth <= 0 or width <= 0:
        raise ValueError(f"count_min_sketch: depth/width must be positive, got {depth}x{width}")
    key = F.col(key_col)
    cells = [
        F.struct(
            F.lit(d).alias("row"), _cell(key, d, width, portable).alias("col")
        )
        for d in range(depth)
    ]
    cnt = (
        F.lit(1).cast("long")
        if count_col is None
        else F.col(count_col).cast("long")
    )
    return (
        items.select(F.explode(F.array(*cells)).alias("rc"), cnt.alias("c"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.sum("c").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    portable: bool = False,
) -> DataFrame:
    """Point estimates ``(key, est)`` for every row of ``keys``:
    min over the key's depth cells (missing cell → 0 — the key was
    never inserted there).  ``depth``/``width``/``portable`` must match
    the sketch's build parameters.

    Plan: keys × depth probe rows (a ``depth``-way explode), one
    broadcast-sized equi-join on (row, col) against the ≤ depth×width
    sketch, one min-groupBy back to key grain.
    """
    key = F.col(key_col)
    probes = keys.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cell(key, d, width, portable).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("key", "rc.row", "rc.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est")
        )
    )
