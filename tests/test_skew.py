"""Salted-join equivalence on a power-law (hub-skewed) key distribution."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from smatchpp_spark.operators.skew import salted_hot_join, salted_join, top_hot_keys


def _skewed_fact(spark):
    # key 0 is a hub holding half the rows; keys 1..99 share the rest
    return spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(99)) + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )


def _dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("label")
    )


def _counted(df):
    return Counter((r["k"], r["payload"], r["label"]) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = _counted(fact.join(dim, "k"))
    salted = _counted(salted_join(fact, dim, "k", n_salts=8))
    assert salted == plain


def test_salted_hot_join_equals_plain_join(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = _counted(fact.join(dim, "k"))
    hybrid = _counted(salted_hot_join(fact, dim, "k", hot_threshold=1000, n_salts=8))
    assert hybrid == plain


def test_top_hot_keys(spark):
    fact = _skewed_fact(spark)
    hot = {r["k"] for r in top_hot_keys(fact, "k", 1000).collect()}
    assert hot == {0}


def test_salt_spreads_hub_rows(spark):
    fact = _skewed_fact(spark)
    salt = F.pmod(F.xxhash64(*fact.columns), F.lit(8))
    per_salt = (
        fact.filter(F.col("k") == 0)
        .select(salt.alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    counts = [r["count"] for r in per_salt]
    assert len(counts) == 8
    assert max(counts) < 2 * min(counts)  # roughly uniform scatter
