"""Bucketed edge-table storage: co-located equi-joins with no exchange.

At 100 TB the static edge table is the biggest join input every iterative
operator (PageRank contribs, CC/LPA messages, k-hop expansion) touches.
Hash-bucketing it on the join key at WRITE time (Spark ``bucketBy`` —
bucket files pre-partitioned and pre-sorted by key) means every
subsequent equi-join or aggregation on that key reads co-located buckets:
Catalyst drops the Exchange on the bucketed side(s) entirely, so a
superstep's join costs zero shuffle of the big table — the 100 TB analog
of the reference loading its triple store once into an in-memory index
(graph_transforms.py builds per-graph dicts; here the "index" is the
bucket layout).

Two bucketed tables with the same key and bucket count co-locate with
each other (bucket-to-bucket joins, no exchange on EITHER side) — the
layout to use for edge-with-edge joins (triangles' wedge join, k-hop).

Local testing note: bucketed tables live in the session catalog
(``saveAsTable``); an explicit ``path`` keeps the data under the
caller's directory instead of the global warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by
    ``bucket_cols``.  ``n_buckets`` should be sized so one bucket of the
    LARGEST future join input fits in an executor core's memory slice —
    at 100 TB that means thousands of buckets; locally 32 matches the
    core count."""
    w = df.write.format("parquet").mode("overwrite")
    w = w.bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (``spark.table``,
    not ``read.parquet`` — a raw parquet scan of the same files would
    lose the layout and reintroduce the exchange)."""
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle exchange —
    the testable contract of bucketed co-location.  Matches the
    ``Exchange`` operator NAME at its tree position (hash, range, AND
    single-partition exchanges all break co-location), so neither
    ``BroadcastExchange`` (a broadcast, not a shuffle) nor a
    ``ReusedExchange`` row whose referenced node happens to mention
    "Exchange" in its description produces a false positive; a reused
    *shuffle* still counts once, at its original ``Exchange`` line."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    # tree prefixes look like "   :  +- Exchange hashpartitioning(...)"
    op = re.compile(r"^[\s:+*\-()0-9]*Exchange\b")
    return any(op.match(line) for line in plan.splitlines())
