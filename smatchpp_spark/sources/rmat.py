"""Deterministic distributed R-MAT graph generation.

Benchmarking a link-graph engine at 10^12-edge scale needs input the
cluster can synthesize in parallel — shipping a pre-built edge list is
the bottleneck long before the algorithms are.  R-MAT (Chakrabarti,
Zhan & Faloutsos, SDM 2004 — public) generates power-law, community-
structured graphs by recursively choosing adjacency-matrix quadrants
with probabilities (a, b, c, d); it is the Graph500 generator family.

Spark-native shape: ``spark.range(n_edges)`` gives a distributed,
deterministic edge-id spine; each of the ``scale`` recursion levels is
ONE column expression — a portable-hash draw on ``(edge_id, level,
seed)`` compared against integer thresholds, accumulating one src bit
and one dst bit.  The whole generator is a stateless scan projection:
no shuffle, no driver loop, no randomness service — every executor
materializes exactly its slice, and re-runs/repartitions produce the
identical graph (the property a resumable 100 TB benchmark needs).

Cross-engine exactness: the quadrant decision compares the raw 60-bit
hash against PRE-COMPUTED INTEGER thresholds ``round(p · 2^60)``
(plan literals) — no float arithmetic anywhere, so the DuckDB oracle
replays the generator bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64

_TWO60 = 1 << 60


def _thresholds(a: float, b: float, c: float, d: float) -> tuple[int, int, int]:
    s = a + b + c + d
    if abs(s - 1.0) > 1e-9:
        raise ValueError(f"rmat: a+b+c+d must sum to 1, got {s}")
    if min(a, b, c, d) < 0:
        raise ValueError("rmat: probabilities must be non-negative")
    ta = round(a * _TWO60)
    tb = round((a + b) * _TWO60)
    tc = round((a + b + c) * _TWO60)
    return ta, tb, tc


def rmat_edges(
    spark: SparkSession,
    scale: int,
    n_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 1,
    portable: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """``(edge_id, src, dst)`` — ``n_edges`` R-MAT edges over
    ``2^scale`` vertices (Graph500 defaults a=0.57, b=c=0.19, d=0.05).
    Self-loops and duplicate edges occur as in the model (dedup
    downstream if simple-graph semantics are needed).  ``portable=True``
    uses the md5 hash the DuckDB oracle replays; the default xxhash64
    path is the fast production generator."""
    if scale <= 0 or scale > 40:
        raise ValueError(f"rmat: scale must be in 1..40, got {scale}")
    if n_edges <= 0:
        raise ValueError(f"rmat: n_edges must be positive, got {n_edges}")
    ta, tb, tc = _thresholds(a, b, c, d)

    ids = spark.range(0, n_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        h = F.pmod(
            hash64(
                F.concat(
                    F.col("id").cast("string"),
                    F.lit(f":{level}:{seed}"),
                ),
                portable=portable,
            ),
            F.lit(_TWO60),
        )
        src_bit = F.when(h < F.lit(tb), F.lit(0)).otherwise(F.lit(1))
        dst_bit = (
            F.when(h < F.lit(ta), F.lit(0))
            .when(h < F.lit(tb), F.lit(1))
            .when(h < F.lit(tc), F.lit(0))
            .otherwise(F.lit(1))
        )
        shift = scale - 1 - level
        src = src + (src_bit.cast("long") * F.lit(1 << shift))
        dst = dst + (dst_bit.cast("long") * F.lit(1 << shift))
    return ids.select(
        F.col("id").alias("edge_id"),
        src.alias("src"),
        dst.alias("dst"),
    )
