"""Loaders for the driver-generated parquet tables and edge-table derivations.

The TPC-H-ish tables double as a link graph for the SQL-checkable operator
surface: we derive a heterogeneous edge table (customer→order from
``orders``, order→part and part→supplier from ``lineitem``) with a pure
*arithmetic* vertex-id namespace (``4*key + class``) so the exact same
derivation is expressible in ANSI SQL for the DuckDB oracle — no
engine-specific hash functions in anything the oracle must reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# vertex-class tags for the arithmetic namespace
CUSTOMER, ORDER, PART, SUPPLIER = 0, 1, 2, 3


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def _vid(col, klass: int):
    return (col.cast("long") * 4 + klass).alias


def tpch_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous link graph over the TPC-H-ish tables.

    Edges: customer→order, order→part, part→supplier.  Vertex ids are
    ``4*key + class`` (class: customer=0, order=1, part=2, supplier=3).
    Unioned scans, zero joins, fully SQL-reproducible.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey").cast("long") * 4 + CUSTOMER).alias("src"),
        (F.col("o_orderkey").cast("long") * 4 + ORDER).alias("dst"),
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    order_part = lineitem.select(
        (F.col("l_orderkey").cast("long") * 4 + ORDER).alias("src"),
        (F.col("l_partkey").cast("long") * 4 + PART).alias("dst"),
    )
    part_supp = lineitem.select(
        (F.col("l_partkey").cast("long") * 4 + PART).alias("src"),
        (F.col("l_suppkey").cast("long") * 4 + SUPPLIER).alias("dst"),
    )
    return orders.unionByName(order_part).unionByName(part_supp)


TPCH_EDGES_SQL = """
    SELECT CAST(o_custkey AS BIGINT) * 4 + 0 AS src,
           CAST(o_orderkey AS BIGINT) * 4 + 1 AS dst
    FROM orders
    UNION ALL
    SELECT CAST(l_orderkey AS BIGINT) * 4 + 1 AS src,
           CAST(l_partkey AS BIGINT) * 4 + 2 AS dst
    FROM lineitem
    UNION ALL
    SELECT CAST(l_partkey AS BIGINT) * 4 + 2 AS src,
           CAST(l_suppkey AS BIGINT) * 4 + 3 AS dst
    FROM lineitem
"""
