"""Exact distributed quantiles by iterative histogram refinement.

``approx_percentile`` trades accuracy for a single pass; a full
``orderBy`` sorts 10^12 rows to answer a 5-number question.  This
operator computes EXACT order statistics in O(log_B(range/ulp)) cheap
passes (3-5 in practice, B = 1024 buckets):

  round: bucket the active value range uniformly (``width_bucket`` —
  JVM-side, whole-stage codegen), aggregate per bucket (count, min,
  max) map-side-combined, pull B rows to the driver, walk the
  cumulative counts to the bucket containing each target rank, recurse
  into that bucket's [min, max] (the DATA extent, not the bucket
  bounds — guarantees strict progress even under heavy ties).

A bucket whose min == max resolves immediately (all remaining values
equal).  When few enough rows remain, the k-th element is taken with a
``TakeOrdered`` (orderBy + limit ≤ threshold — never a full sort).
All K requested quantiles share each pass: one scan emits K tagged
histograms via a single explode (fan-out ≤ K rows per input row,
consumed by the map-side combine).  Deterministic — no sampling.

Rank convention: quantile q of n values = the element at 0-based index
``floor(q·(n-1))`` of the sorted multiset (numpy 'lower'), i.e. 1-based
rank ``floor(q·(n-1)) + 1``.  Nulls are dropped; NaN is unsupported
(document your column).  Exact for integral and float columns alike.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import floor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_N_BUCKETS = 1024
_COLLECT_THRESHOLD = 8192
_MAX_ROUNDS = 64


@dataclass
class _Probe:
    q: float
    k: int          # 1-based global rank still to find
    lo: float
    hi: float
    below: int      # rows strictly below lo (already accounted)
    value: float | None = None


def kth_smallest(
    df: DataFrame, col: str, ks: list[int]
) -> dict[int, float]:
    """Exact k-th smallest (1-based) for each k, in shared passes."""
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    row = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n = row["n"]
    if n == 0:
        raise ValueError("kth_smallest on an empty column")
    import math

    if math.isinf(row["lo"]) or math.isinf(row["hi"]):
        # same contract as NaN (module docstring): non-finite values have
        # no usable bucket bounds — repr-formatting ±inf into the
        # width_bucket SQL below would fail at analysis anyway, so
        # reject them up front with a clear error
        raise ValueError("kth_smallest: column contains +/-infinity")
    bad = [k for k in ks if not (1 <= k <= n)]
    if bad:
        raise ValueError(f"ranks out of [1, {n}]: {bad}")

    probes = [_Probe(q=0.0, k=k, lo=row["lo"], hi=row["hi"], below=0)
              for k in sorted(set(ks))]
    for p in probes:
        if p.lo == p.hi:
            p.value = p.lo

    for _ in range(_MAX_ROUNDS):
        active = [p for p in probes if p.value is None]
        if not active:
            break
        # resolve small ranges with a TakeOrdered instead of a pass
        for p in active:
            residual = p.k - p.below
            if residual <= 0:
                p.value = p.lo
        active = [p for p in probes if p.value is None]

        tags = []
        for i, p in enumerate(active):
            v = F.col("v")
            in_range = (v >= F.lit(p.lo)) & (v <= F.lit(p.hi))
            bkt = F.least(
                F.expr(
                    f"width_bucket(v, {p.lo!r}, {p.hi!r}, {_N_BUCKETS})"
                ),
                F.lit(_N_BUCKETS),
            ) if p.lo < p.hi else F.lit(1)
            tags.append(
                F.when(
                    in_range,
                    F.struct(
                        F.lit(i).alias("pid"), bkt.cast("int").alias("bkt")
                    ),
                ).otherwise(F.lit(None))
            )
        hist = (
            vals.select("v", F.explode(F.array(*tags)).alias("t"))
            .filter(F.col("t").isNotNull())
            .groupBy(F.col("t.pid").alias("pid"), F.col("t.bkt").alias("bkt"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )
            .collect()
        )
        by_pid: dict[int, list] = {}
        for r in hist:
            by_pid.setdefault(r["pid"], []).append(r)
        for i, p in enumerate(active):
            rows = sorted(by_pid.get(i, []), key=lambda r: r["bkt"])
            residual = p.k - p.below
            cum = 0
            for r in rows:
                if cum + r["cnt"] >= residual:
                    p.below += cum
                    if r["mn"] == r["mx"]:
                        p.value = r["mn"]
                    elif r["cnt"] <= _COLLECT_THRESHOLD:
                        want = residual - cum
                        sub = (
                            vals.filter(
                                (F.col("v") >= F.lit(r["mn"]))
                                & (F.col("v") <= F.lit(r["mx"]))
                            )
                            .orderBy("v")
                            .limit(want)
                        )
                        p.value = sub.agg(F.max("v")).collect()[0][0]
                    else:
                        p.lo, p.hi = r["mn"], r["mx"]
                    break
                cum += r["cnt"]
    unresolved = [p for p in probes if p.value is None]
    if unresolved:  # pragma: no cover - 64 rounds cover any double range
        raise RuntimeError(f"selection did not converge: {unresolved}")
    return {p.k: p.value for p in probes}


def quantiles_exact(
    df: DataFrame, col: str, qs: list[float]
) -> DataFrame:
    """(q, k, value) — exact quantiles at the 'lower' rank convention.
    The result is K rows built on the driver (K scalars, like every
    scalar-result operator here)."""
    spark = df.sparkSession
    n = df.filter(F.col(col).isNotNull()).count()
    if n == 0:
        return spark.createDataFrame([], "q double, k long, value double")
    ks = {q: int(floor(q * (n - 1))) + 1 for q in qs}
    found = kth_smallest(df, col, list(ks.values()))
    rows = [(float(q), ks[q], float(found[ks[q]])) for q in qs]
    return spark.createDataFrame(rows, "q double, k long, value double")
