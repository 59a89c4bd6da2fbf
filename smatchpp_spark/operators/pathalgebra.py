"""Semiring path algebra — widest (bottleneck) and most-reliable paths.

Bellman–Ford relaxation is generic over an idempotent, monotone
semiring (Mohri 2002, "Semiring frameworks and algorithms for
shortest-distance problems", public): replace (min, +) with

    widest path      (max, min):  cap(v)  = max over paths of the
                                  MINIMUM edge weight along the path —
                                  bandwidth/bottleneck routing
    most reliable    (max, ×):    rel(v)  = max over paths of the
                                  PRODUCT of edge probabilities ∈ [0,1]

Both share sssp.py's frontier-pruned superstep: only vertices whose
value improved in round r relax out-edges in round r+1 — chaotic
relaxation is sound for any monotone idempotent ⊕ because a vertex's
out-relaxations only matter after its value changes.  After k rounds
the state is the exact optimum over paths of ≤ k edges (the sssp.py
unrolling contract), so the DuckDB oracle replays truncated runs 1:1.

Cross-engine float note: these two semirings never ADD — widest only
SELECTS input values (max of mins), reliability multiplies along a
path in relaxation order — so even double-typed runs are bit-identical
across engines (no sum-order noise), unlike anything built on Σ.

Scale shape: identical to sssp.py — per round one (frontier ⋈ edges)
join, one map-side-combined max-groupBy, one full-outer merge on the
vertex key.  Bucket the edge table (sources/bucketed.py) and the
per-round join is exchange-free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class PathAlgebraResult:
    values: DataFrame  # (vertex, <value_name>) — reached vertices only
    rounds: int
    converged: bool


def _semiring_paths(
    edges: DataFrame,
    sources,
    weight_col: str,
    value_name: str,
    op_name: str,
    seed_value: Column,
    extend,  # (value_col, weight_col) -> Column : path extension (⊗)
    max_supersteps: int,
    directed: bool,
    checkpoint_dir: str | None,
    resume: bool,
) -> PathAlgebraResult:
    """Shared (max, ⊗) relaxation loop; ⊕ is always max here (both
    supported semirings optimize upward), improvement is strict >."""
    spark = edges.sparkSession
    e = edges.select("src", "dst", F.col(weight_col).alias("w"))
    if not directed:
        e = e.unionByName(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col(weight_col).alias("w"),
            )
        )
    e = e.persist()
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    if isinstance(sources, DataFrame):
        seed = sources.select(
            F.col(sources.columns[0]).alias("vertex")
        ).distinct()
        seed = vertices.join(seed, "vertex", "left_semi")
    else:
        seed = vertices.filter(F.col("vertex").isin(list(sources)))
    init = seed.select(
        "vertex", seed_value.alias("val"), F.lit(True).alias("changed")
    )

    def step(state: DataFrame, r: int) -> DataFrame:
        wave = state.filter(F.col("changed")).select("vertex", "val")
        best = (
            wave.join(e, wave["vertex"] == e["src"])
            .select(
                F.col("dst").alias("vertex"),
                extend(F.col("val"), F.col("w")).alias("cand"),
            )
            .groupBy("vertex")
            .agg(F.max("cand").alias("cand"))
        )
        merged = state.drop("changed").join(best, "vertex", "full_outer")
        return merged.select(
            "vertex",
            F.greatest("val", "cand").alias("val"),
            (
                F.col("cand").isNotNull()
                & (F.col("val").isNull() | (F.col("cand") > F.col("val")))
            ).alias("changed"),
        )

    runner = SuperstepRunner(
        spark,
        op=op_name,
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
    )
    res = runner.run(
        init,
        step,
        lambda old, new: float(new.filter(F.col("changed")).count()),
        resume=resume,
    )
    e.unpersist()
    return PathAlgebraResult(
        values=res.state.select("vertex", F.col("val").alias(value_name)),
        rounds=res.supersteps,
        converged=res.converged,
    )


def widest_path(
    edges: DataFrame,
    sources,
    weight_col: str = "weight",
    max_supersteps: int = 20,
    directed: bool = True,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PathAlgebraResult:
    """Maximum-bottleneck capacity from the ``sources`` set to every
    reachable vertex: the largest w such that a path exists using only
    edges of weight ≥ w.  Seeds report the max-type identity cast to
    the weight column's type (LONG_MAX for integral weights, +inf for
    doubles) — "capacity to self is unconstrained", the standard
    bottleneck convention.  Integer weights are cross-engine exact;
    doubles too (the semiring never adds)."""
    wtype = edges.schema[weight_col].dataType.simpleString()
    if wtype in ("bigint", "int", "smallint", "tinyint", "long"):
        seed_val = F.lit((1 << 63) - 1).cast("long")
        cast_to = "long"
    else:
        seed_val = F.lit(float("inf"))
        cast_to = "double"
    e = edges.withColumn(weight_col, F.col(weight_col).cast(cast_to))
    return _semiring_paths(
        e,
        sources,
        weight_col,
        value_name="capacity",
        op_name="widest_path",
        seed_value=seed_val,
        extend=lambda d, w: F.least(d, w),
        max_supersteps=max_supersteps,
        directed=directed,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )


def most_reliable_path(
    edges: DataFrame,
    sources,
    prob_col: str = "prob",
    max_supersteps: int = 20,
    directed: bool = True,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    check_range: bool = True,
) -> PathAlgebraResult:
    """Maximum path reliability (product of per-edge success
    probabilities) from the ``sources`` set.  Probabilities must lie in
    [0, 1] — enforced with one map-side-combined min/max scan (the
    sssp.py guard discipline): a probability above 1 would make longer
    paths "better" and break both monotone convergence and the
    frontier pruning.  Seeds report 1.0."""
    e = edges.withColumn(prob_col, F.col(prob_col).cast("double"))
    if check_range:
        row = e.agg(
            F.min(prob_col).alias("lo"), F.max(prob_col).alias("hi")
        ).collect()[0]
        if row["lo"] is not None and (row["lo"] < 0.0 or row["hi"] > 1.0):
            raise ValueError(
                f"most_reliable_path requires probabilities in [0, 1]; "
                f"got min={row['lo']}, max={row['hi']}. A weight > 1 makes "
                "longer paths better and breaks monotone convergence. Pass "
                "check_range=False only if validated upstream."
            )
    return _semiring_paths(
        e,
        sources,
        prob_col,
        value_name="reliability",
        op_name="most_reliable_path",
        seed_value=F.lit(1.0),
        extend=lambda d, w: d * w,
        max_supersteps=max_supersteps,
        directed=directed,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
