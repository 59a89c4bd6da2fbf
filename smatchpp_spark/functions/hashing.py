"""Hash helpers shared by dedup / fingerprint / similarity operators.

Two tiers:

* ``fast_hash64`` — ``xxhash64``: JVM-side, whole-stage-codegen, the
  production default for 100 TB runs.
* ``portable_hash64`` — first 15 hex chars of md5 → 60-bit non-negative
  int.  Bit-identical in Spark and DuckDB (and most engines), so every
  hash-derived operator (minhash, simhash, LSH bands, fingerprints) can be
  cross-checked by the driver's DuckDB oracle.  ~2-3× slower than xxhash64
  but still JVM-side and codegen-friendly.

The DuckDB mirror of ``portable_hash64(x)`` is::

    CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fast_hash64(*cols: Column | str) -> Column:
    return F.xxhash64(*cols)


def portable_hash64(col: Column | str) -> Column:
    """60-bit non-negative content hash, reproducible across engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64(col: Column | str, portable: bool = False) -> Column:
    return portable_hash64(col) if portable else fast_hash64(col)


def duckdb_hash64_sql(expr: str) -> str:
    """The DuckDB SQL string equivalent of ``portable_hash64(expr)``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
