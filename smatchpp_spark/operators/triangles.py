"""Degree-ordered triangle counting.

Classic two-join plan with the degree-orientation trick: orient every
undirected edge from the lower-(degree, id) endpoint to the higher one,
so each triangle is generated from exactly one wedge and the wedge count
is bounded by Σ d_out², with d_out ≤ √(2m) after orientation — the skew
killer for hub vertices (a 10^8-degree hub becomes the *target* of its
edges, never the wedge pivot).

Degree semantics anchor to the reference's degree filters
(smatchpp/util.py:107-138, subgraph_extraction.py:60-74); counts are
exact vs a brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TriangleResult:
    """Single materialization of the wedge joins: ``triangle_count``
    checkpoints the O(V) per-vertex counts eagerly (the persisted edge
    tables feed the wedge join twice inside that one job, then release —
    nothing stays pinned even if the result is discarded).  ``total``
    derives lazily from the checkpointed counts (Σ corner counts / 3 —
    every triangle contributes exactly three corners), so consuming both
    fields never re-runs the joins."""

    def __init__(self, per_vertex: DataFrame):
        self.per_vertex = per_vertex
        self._total: int | None = None

    @property
    def total(self) -> int:
        if self._total is None:
            row = self.per_vertex.agg(
                (F.coalesce(F.sum("triangles"), F.lit(0)) / 3).alias("t")
            ).collect()[0]
            self._total = int(row["t"])
        return self._total


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """Dedup to canonical undirected pairs (a < b); self-loops dropped."""
    a = F.least("src", "dst").alias("a")
    b = F.greatest("src", "dst").alias("b")
    return (
        edges.select(a, b).filter(F.col("a") != F.col("b")).distinct()
    )


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient canonical pairs from low (degree, id) to high (degree, id)."""
    und = _canonical_undirected(edges)
    # lazy checkpoint: the degree table is referenced by BOTH attach
    # joins below; without the barrier its whole union+agg subtree is
    # duplicated per reference (two extra passes over the edge table,
    # seen in the r08 before-plan audit)
    deg = _undirected_degrees(und).localCheckpoint(eager=False)
    return _orient(und, deg)


def _undirected_degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _orient(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Orientation given a caller-prepared canonical table and its
    degree table (lets ``triangle_count`` feed both from persisted
    inputs so nothing is computed twice)."""
    with_deg = (
        und.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_count(edges: DataFrame, num_partitions: int | None = None) -> TriangleResult:
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    canonical = _canonical_undirected(edges).persist()
    # INTEGER-ENCODED wedge pipeline: the Σd²-sized wedge join probes
    # its hash relations once per wedge, and hashing/comparing two
    # string ids per probe dominated the closing join (measured ~6s for
    # 41M wedges at bench scale).  The id dictionary RIDES the degree
    # table, so encoding costs zero extra joins — the orientation pass
    # already joins degrees onto both endpoints; the dictionary is
    # materialized eagerly so the monotonically-increasing ids are fixed
    # for every consumer.  Per-vertex counts are orientation-invariant
    # (any total order generates each triangle exactly once), so the
    # decoded output is identical to the string pipeline's.
    dict_df = (
        _undirected_degrees(canonical)
        .select("v", "deg", F.monotonically_increasing_id().alias("vid"))
        .localCheckpoint(eager=True)
    )
    wd = (
        canonical.join(
            dict_df.select(
                F.col("v").alias("a"),
                F.col("deg").alias("da"),
                F.col("vid").alias("ia"),
            ),
            "a",
        )
        .join(
            dict_df.select(
                F.col("v").alias("b"),
                F.col("deg").alias("db"),
                F.col("vid").alias("ib"),
            ),
            "b",
        )
        .localCheckpoint(eager=False)
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ia") < F.col("ib"))
    )
    oriented = (
        wd.select(
            F.when(a_first, F.col("ia")).otherwise(F.col("ib")).alias("lo"),
            F.when(a_first, F.col("ib")).otherwise(F.col("ia")).alias("hi"),
        )
        .repartition(num_partitions, "lo")
        .sortWithinPartitions("lo", "hi")
        .persist()
    )
    canon_int = wd.select(
        F.least("ia", "ib").alias("a"), F.greatest("ia", "ib").alias("b")
    ).persist()
    # materialize the caches BEFORE composing the wedge join: a cold
    # cache's adaptive plan reports Unknown partitioning/size at compile
    # time, so the self-join would re-exchange + re-sort both sides of a
    # table already laid out by the pivot key; once built, the cached
    # layout is visible and the wedge join plans exchange-free (same
    # total work — the count only forces what the join would compute)
    oriented.count()
    canon_int.count()
    per_vertex_int = _count_wedges(oriented, canon_int, materialize=False)
    per_vertex = (
        per_vertex_int.join(
            dict_df.select(F.col("vid").alias("vertex"), F.col("v")), "vertex"
        )
        .select(F.col("v").alias("vertex"), "triangles")
        .localCheckpoint(eager=True)
    )
    oriented.unpersist()
    canon_int.unpersist()
    canonical.unpersist()
    from smatchpp_spark.operators.supersteps import free_local_checkpoint

    free_local_checkpoint(dict_df)
    free_local_checkpoint(wd)
    return TriangleResult(per_vertex)


def triangle_count_prepared(
    oriented: DataFrame, canonical: DataFrame
) -> TriangleResult:
    """Triangle count over CALLER-PREPARED inputs: ``oriented`` with
    columns (lo, hi) as produced by ``oriented_edges`` and ``canonical``
    with (a, b) as produced by canonical dedup — e.g. tables written
    once with ``sources.bucketed.write_bucketed(..., ["lo"])`` so the
    wedge self-join reads bucket-to-bucket with ZERO exchange on its
    inputs (plan-tested in tests/test_bucketed.py).  At 10^12-edge scale
    the orientation pass is a one-time storage cost amortized over every
    recount/resume; only the closing-edge join and the corner agg
    shuffle."""
    return TriangleResult(_count_wedges(oriented, canonical))


def _count_wedges(
    oriented: DataFrame, canonical: DataFrame, materialize: bool = True
) -> DataFrame:
    e1 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("v"))
    e2 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("w"))
    # each unordered wedge exactly once via strict id order on the endpoints
    wedges = e1.join(e2, "pivot").filter(F.col("v") < F.col("w"))
    # closing edge lookup stays a plain equi-join because both the wedge
    # endpoints (v < w) and the canonical edge table (a < b) share the
    # same id ordering
    tri = wedges.join(
        canonical,
        (F.col("v") == F.col("a")) & (F.col("w") == F.col("b")),
        "inner",
    )

    # one explode pass, not a 3-way union of projections — a union
    # duplicates the wedge-join subtree into three scans of the same
    # expensive plan (measured +30% on the bench graph); explode walks
    # the join output once
    per_corner = (
        tri.select(F.explode(F.array("pivot", "v", "w")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    from smatchpp_spark.operators.supersteps import dump_plan_if_enabled

    dump_plan_if_enabled(per_corner, "triangles_wedgejoin")
    if not materialize:
        return per_corner
    return per_corner.localCheckpoint(eager=True)


class ApproxTriangleResult:
    def __init__(self, per_vertex: DataFrame, sample_rate: float):
        # per_vertex: (vertex, triangles sampled, triangles_est double)
        self.per_vertex = per_vertex
        self.sample_rate = sample_rate

    @property
    def total_estimate(self) -> float:
        """Σ sampled corners / 3, scaled by p^-3 — the DOULION estimator
        of the true triangle count."""
        row = self.per_vertex.agg(F.sum("triangles").alias("c")).collect()[0]
        return (row["c"] or 0) / 3.0 / self.sample_rate**3

    @property
    def total_estimate_stderr(self) -> float:
        """Standard error of ``total_estimate`` — closed form in the
        sampled count S and p, for users sizing ``sample_rate``.

        A triangle survives with probability p³, so S ≈ Binomial(t, p³)
        and Var(T̂) = Var(S)/p⁶ = t·p³(1-p³)/p⁶; plugging in t̂ = S/p³
        gives stderr = √(S·(1-p³)) / p³.  This is the
        independent-triangle term of the public DOULION variance
        (Tsourakakis et al., KDD'09) — exact when no two triangles share
        an edge; edge-sharing triangle pairs add a positive covariance
        term (2k(p⁵-p⁶)/p⁶), so on clustered graphs treat this as a
        lower bound (tested against the empirical spread over
        hash-offset resamples)."""
        import math

        row = self.per_vertex.agg(F.sum("triangles").alias("c")).collect()[0]
        s = (row["c"] or 0) / 3.0
        p3 = self.sample_rate**3
        return math.sqrt(s * (1.0 - p3)) / p3


def triangle_count_approx(
    edges: DataFrame,
    sample_rate: float = 0.2,
    num_partitions: int | None = None,
    portable: bool = True,
    sample_offset: int = 0,
) -> ApproxTriangleResult:
    """DOULION-style approximate triangle counting (Tsourakakis et al.,
    KDD'09 — public algorithm): keep each undirected edge with
    probability p, count triangles EXACTLY on the sample, scale counts by
    p^-3 (each surviving triangle needed its 3 edges kept).  Unbiased,
    and the wedge-join work drops by ~p² — the scale path for graphs
    where exact counting's Σd² cost is the bottleneck (exact triangles
    is consistently the highest exponent in our 1x→10x sweep and the
    sampled path a fraction of it; current numbers in
    BENCH/SCALE_SWEEP.md).

    Sampling is DETERMINISTIC: an edge survives iff
    ``hash(canonical 'a|b' key) mod 1e6 < p·1e6`` — rerunning, resuming,
    or replaying in another engine selects the identical sample
    (``portable=True`` uses the md5-based cross-engine hash; False uses
    xxhash64 for the 100 TB fast path).  ``sample_offset`` salts the
    hash key to draw an independent resample (offset 0 keeps the
    historical key exactly) — used to measure the estimator's empirical
    spread against ``total_estimate_stderr``."""
    from smatchpp_spark.functions.hashing import hash64

    lo = F.least(F.col("src"), F.col("dst"))
    hi = F.greatest(F.col("src"), F.col("dst"))
    key = F.concat(lo, F.lit("|"), hi)
    if sample_offset:
        key = F.concat(key, F.lit(f"|{sample_offset}"))
    threshold = int(round(sample_rate * 1_000_000))
    sampled = edges.filter(
        F.pmod(hash64(key, portable=portable), F.lit(1_000_000)) < threshold
    )
    exact = triangle_count(sampled, num_partitions=num_partitions)
    scale = 1.0 / sample_rate**3
    per_vertex = exact.per_vertex.select(
        "vertex",
        "triangles",
        F.round(F.col("triangles") * F.lit(scale), 6).alias("triangles_est"),
    )
    return ApproxTriangleResult(per_vertex=per_vertex, sample_rate=sample_rate)
