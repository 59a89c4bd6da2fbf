"""Hub-vertex skew handling (SURVEY §2.14).

Three layers, used in this order at scale:

1. **Partial aggregation** — every groupBy in this engine aggregates
   map-side (Catalyst default), so a 10^8-degree hub costs one row per
   partition in the shuffle, not one per edge.  Nothing to do.
2. **AQE skew-join splitting** — on (session.py enables it): oversized
   sort-merge join partitions are split at runtime.
3. **Explicit salting** — this module: when a join key is so hot that a
   single key's rows overflow one task (AQE splits partitions, not
   keys), replicate the small side per salt and scatter the big side's
   hot keys across salts.  Deterministic (hash-salted, no rand()), so
   plans are reproducible across retries and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` — the salting set."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated across ``n_salts`` salts.

    The big side gets a deterministic salt from a row-content hash (all
    columns), spreading any single hot key over ``n_salts`` tasks; the
    small side is exploded ×n_salts (it must be small — typically a dim
    or degree table).  Result == ``big.join(small, key, how)``.
    """
    salt = F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def salted_hot_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_threshold: int = 1_000_000,
    n_salts: int = 16,
) -> DataFrame:
    """Hybrid: only rows with hot keys take the salted path; the rest
    join normally.  Keeps the small side's replication factor bounded by
    |hot keys| × n_salts instead of |small| × n_salts."""
    hot = F.broadcast(top_hot_keys(big, key, hot_threshold))
    big_hot = big.join(hot, key, "left_semi")
    big_cold = big.join(hot, key, "left_anti")
    small_hot = small.join(hot, key, "left_semi")
    cold = big_cold.join(small, key)
    hot_joined = salted_join(big_hot, small_hot, key, n_salts)
    return cold.unionByName(hot_joined)
