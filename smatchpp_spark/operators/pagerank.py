"""Power-iteration PageRank over the global edge table.

Semantics (held to allclose 1e-6 against a numpy power-iteration oracle):
  * vertices = distinct endpoints of ``edges(src, dst)``;
  * multi-edges count with multiplicity (out-degree too);
  * dangling mass (out-degree-0 vertices) is redistributed uniformly;
  * ``rank' = (1-α)/N + α·(Σ_in contrib + dangling_mass/N)``;
  * stop at ``max |Δrank| < tol`` (default 1e-10, leaving ~4 digits of
    headroom under the 1e-6 parity bar regardless of summation order).

Physical shape per superstep (two shuffles, the Spark minimum for this
dataflow):
  1. ``ranks ⋈ contribs-table on src`` — the static side is the edge
     table pre-joined ONCE with inverse out-degree and hash-partitioned
     by ``src`` then persisted, so every iteration reuses the same
     exchange; only the (small) rank table reshuffles.
  2. ``groupBy(dst).sum`` — partial aggregation combines hub traffic
     map-side, so a 10^8-follower hub costs one row per partition, not
     one per edge.  AQE skew-join handles residual hub skew on the join.
All arithmetic is float64 end-to-end; the iteration loop (driver-side,
like the reference's climb loop solvers.py:333-351) checkpoints state
every superstep through SuperstepRunner for lineage truncation + resume.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vertex long/string, rank double)
    supersteps: int
    converged: bool
    metrics: list


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_supersteps: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    input_lineage: str = "",
    adjacency: bool = False,
    max_fanout: int = 100_000,
    sources: "list | DataFrame | None" = None,
    weight_col: str | None = None,
) -> PageRankResult:
    """``adjacency=True`` stores the static join side pre-grouped: one row
    per (src, hub-bucket) with a dst array instead of one row per edge,
    expanding to |E| inside the stage via ``explode`` (narrow, no extra
    exchange) before the map-side-combined dst aggregation.  Hub sources
    are salted into buckets of ≤ ``max_fanout`` dsts so no row exceeds
    array bounds at web scale.

    Measured on this box (19.2M edges, 5 supersteps): per-edge 1.75M
    edges/s @4 cores / 2.40M @32; adjacency 1.35M / 1.91M — the
    collect_list build + Generate node costs more than the per-row
    overhead it saves, because the per-edge static table is already
    hash-partitioned once and never reshuffles.  Per-edge is therefore
    the default; adjacency remains for memory-bound static tables (array
    rows compress the src column away) and is held to the same oracle.

    ``sources`` switches to PERSONALIZED PageRank: the teleport vector is
    uniform over the source set (a small Python list inlined as a
    predicate, or a DataFrame of vertex ids joined in — use the DataFrame
    form when the set itself is big).  Initial rank, the (1-α) restart
    and the dangling mass all follow the teleport vector, the standard
    random-surfer-with-preferences model; vertices unreachable from the
    sources converge to rank 0.

    ``weight_col`` switches to WEIGHTED PageRank: a source distributes
    its rank proportionally to its positive edge weights (w_e / Σ_src w)
    instead of uniformly.  Weights must be positive (callers filter).
    Composes with ``sources``; not with ``adjacency``."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    personalized = sources is not None
    if weight_col is not None and adjacency:
        raise ValueError("weight_col does not compose with adjacency=True")

    # vertex set, out-degree and the dangling flag all come out of ONE
    # union-aggregation over the endpoint projections (dst rows
    # contribute 0 so every endpoint appears; dangling ⇔ out-mass 0) —
    # this replaces the previous distinct-endpoints + out-degree groupBy
    # + left join (three exchanges over E rows) with a single exchange.
    # The vertex table also carries the dangling flag so the per-step
    # dangling mass is a plain column aggregation over the state — a
    # semi-join against a dangling table would rebuild its broadcast
    # hash table on the driver EVERY superstep, a serial cost that caps
    # scaling.
    deg_col = "out_deg" if weight_col is None else "out_w"
    if weight_col is None:
        ends = edges.select(
            F.col("src").alias("vertex"), F.lit(1).alias("_o")
        ).unionByName(edges.select(F.col("dst").alias("vertex"), F.lit(0).alias("_o")))
        vdeg = ends.groupBy("vertex").agg(F.sum("_o").alias(deg_col))
        dangling = F.col(deg_col) == 0
    else:
        ends = edges.select(
            F.col("src").alias("vertex"),
            F.col(weight_col).cast("double").alias("_o"),
        ).unionByName(
            edges.select(F.col("dst").alias("vertex"), F.lit(0.0).alias("_o"))
        )
        vdeg = ends.groupBy("vertex").agg(F.sum("_o").alias(deg_col))
        # weights are positive (callers filter), so zero out-mass ⇔ no
        # outgoing edge — identical to the old isNull-after-left-join flag
        dangling = F.col(deg_col) == 0.0
    # the agg output is already hash-partitioned by vertex at the session
    # shuffle parallelism (no extra repartition pass); partitions are
    # pre-sorted so the fixed-step path's per-superstep join against
    # this table needs neither exchange nor sort on the cached side
    vdeg = vdeg.sortWithinPartitions("vertex").persist()
    out_deg = vdeg.filter(~dangling)
    vertices = vdeg.select("vertex", dangling.alias("dangling"))
    if personalized:
        if isinstance(sources, DataFrame):
            s = (
                sources.select(F.col(sources.columns[0]).alias("vertex"))
                .distinct()
                .withColumn("is_src", F.lit(True))
            )
            vertices = vertices.join(s, "vertex", "left").withColumn(
                "is_src", F.coalesce("is_src", F.lit(False))
            )
        else:
            vertices = vertices.withColumn(
                "is_src", F.col("vertex").isin(list(sources))
            )
    # static per-superstep join side, hash-partitioned by src once and
    # persisted for reuse across steps.  Built and counted FIRST: its
    # forcing count also materializes the vdeg cache it joins, so the
    # vertex count below is a cached scan instead of a second
    # cache-building job.
    if adjacency:
        contrib_edges = (
            edges.select("src", "dst")
            .join(out_deg.withColumnRenamed("vertex", "src"), "src")
            .withColumn(
                "bkt",
                F.pmod(
                    F.xxhash64("dst"),
                    F.greatest(
                        F.lit(1).cast("long"),
                        F.ceil(F.col("out_deg") / F.lit(max_fanout)).cast("long"),
                    ),
                ),
            )
            .groupBy("src", "bkt", "out_deg")
            .agg(F.collect_list("dst").alias("dsts"))
            .drop("bkt")
            .repartition(num_partitions, "src")
            .sortWithinPartitions("src")
            .persist()
        )
        n_edges = (
            contrib_edges.agg(F.sum(F.size("dsts"))).collect()[0][0] or 0
        )  # also forces the persist
    elif weight_col is not None:
        contrib_edges = (
            edges.select(
                "src", "dst", F.col(weight_col).cast("double").alias("ew")
            )
            .join(out_deg.withColumnRenamed("vertex", "src"), "src")
            .select("src", "dst", (F.col("ew") / F.col("out_w")).alias("w"))
            .repartition(num_partitions, "src")
            .sortWithinPartitions("src")
            .persist()
        )
        n_edges = contrib_edges.count()
    else:
        contrib_edges = (
            edges.select("src", "dst")
            .join(out_deg.withColumnRenamed("vertex", "src"), "src")
            .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
            .repartition(num_partitions, "src")
            .sortWithinPartitions("src")
            .persist()
        )
        n_edges = contrib_edges.count()

    if personalized:
        row = vertices.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_src").cast("long")).alias("ns"),
        ).collect()[0]
        n, n_src = row["n"], row["ns"] or 0
        if n > 0 and n_src == 0:
            raise ValueError("personalized pagerank: no source vertex in graph")
    else:
        n = vertices.count()
    if n == 0:
        contrib_edges.unpersist()
        vdeg.unpersist()
        return PageRankResult(
            ranks=spark.createDataFrame([], "vertex long, rank double"),
            supersteps=0,
            converged=True,
            metrics=[],
        )

    # FIXED-STEP MODE (tol < 0, the bench + fixed-K contract shape): no
    # convergence delta is ever consulted, so the state carries only
    # (vertex, [tp,] rank) and the per-step rebuild joins the PERSISTED
    # vertex table (hash-clustered + sorted, zero exchange on that side)
    # with the fresh contributions — the convergence path's per-step
    # exchange+sort of the checkpointed state and its prev_rank column
    # disappear.  Rank values are identical: same join rows, same
    # formula, only the dataflow differs.
    fixed_steps = tol < 0
    if personalized:
        tp = F.when(F.col("is_src"), F.lit(1.0 / n_src)).otherwise(F.lit(0.0))
        static_vertices = vertices.select("vertex", "dangling", tp.alias("tp"))
        init = static_vertices.select(
            "vertex", "dangling", "tp", F.col("tp").alias("rank"),
        )
    else:
        static_vertices = vertices
        init = static_vertices.select(
            "vertex", "dangling", F.lit(1.0 / n).alias("rank"),
        )
    if not fixed_steps:
        init = init.withColumn("prev_rank", F.lit(float("nan")))

    # the dangling mass of state k-1 and the convergence delta of state k
    # are both collected FOR FREE via an Observation attached to each
    # superstep's materialization job (zero extra scans): dm rides into
    # the next step as a plan literal.  The previous design computed dm
    # with a per-step scan + BroadcastNestedLoopJoin of a 1-row subquery
    # and the delta with a separate whole-state aggregation job — two
    # extra passes over V rows per superstep, and the BNLJ erased the
    # state's output partitioning (guide §2.4/§1: fewer passes, fewer
    # plan nodes per superstep).
    dm_memo: dict = {"dm": None}
    dm_expr = F.sum(
        F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))
    ).alias("dm")

    def _observed_delta(metrics: dict) -> float:
        dm_memo["dm"] = float(metrics["dm"] or 0.0)
        d = metrics["delta"]
        return float(d) if d is not None else float("inf")

    def _observed_dm_only(metrics: dict) -> float:
        dm_memo["dm"] = float(metrics["dm"] or 0.0)
        return float("inf")  # fixed-step mode never converges early

    def step(state: DataFrame, k: int):
        dm = dm_memo["dm"]
        if dm is None:
            # first step (or resume): one tiny scan of the current state
            row = state.agg(dm_expr).collect()[0]
            dm = float(row["dm"] or 0.0)
        if personalized:
            # per-vertex restart mass is (1-α + α·dm) · tp — the scalar
            # is a plan literal, the teleport column rides the state.
            # Same IEEE op order as the old in-plan expression.
            base = (1.0 - alpha) + alpha * dm
        else:
            base = (1.0 - alpha) / n + alpha * dm / float(n)
        # MERGE hint on the rank⋈edges join: the rank side is V rows —
        # size-based planning broadcasts it at bench scale, but that
        # re-collects and re-ships the whole state every superstep
        # (measured 10.9s -> 8.4s for 10 supersteps on the 600k-edge
        # bench); a sort-merge join against the pre-sorted persisted
        # edge table only exchanges+sorts the small rank side, and at
        # web scale a V-row broadcast is impossible anyway.
        if adjacency:
            contribs = (
                state.select(F.col("vertex").alias("src"), "rank")
                .hint("merge")
                .join(contrib_edges, "src")
                .select(
                    F.explode("dsts").alias("vertex"),
                    # rank * (1/deg), NOT rank/deg: keeps the multiply
                    # bit-identical with the per-edge path and the SQL
                    # oracle's `rank * w`
                    (F.col("rank") * (F.lit(1.0) / F.col("out_deg"))).alias(
                        "contrib"
                    ),
                )
                .groupBy("vertex")
                .agg(F.sum("contrib").alias("in_sum"))
            )
        else:
            contribs = (
                state.select(F.col("vertex").alias("src"), "rank")
                .hint("merge")
                .join(contrib_edges, "src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum(F.col("rank") * F.col("w")).alias("in_sum"))
            )
        rank_expr = (
            F.lit(base) * F.col("tp")
            + F.lit(alpha) * F.coalesce("in_sum", F.lit(0.0))
        ) if personalized else (
            F.lit(base) + F.lit(alpha) * F.coalesce("in_sum", F.lit(0.0))
        )
        carry = ["vertex", "dangling", "tp"] if personalized else [
            "vertex", "dangling"
        ]
        if fixed_steps:
            # contribs is also V-scale — merge-join it against the
            # cached sorted vertex table rather than re-broadcasting a
            # V-row hash relation per step (same argument as above;
            # measured another 8.7s -> 7.1s on the bench loop)
            new_state = static_vertices.join(
                contribs.hint("merge"), "vertex", "left"
            ).select(*carry, rank_expr.alias("rank"))
            obs = Observation()
            new_state = new_state.observe(obs, dm_expr)
            return new_state, obs, _observed_dm_only
        new_state = (
            state.select(*carry, F.col("rank").alias("old_rank"))
            .join(contribs.hint("merge"), "vertex", "left")
            .select(
                *carry,
                rank_expr.alias("rank"),
                F.col("old_rank").alias("prev_rank"),
            )
        )
        obs = Observation()
        new_state = new_state.observe(
            obs,
            F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("delta"),
            dm_expr,
        )
        return new_state, obs, _observed_delta

    runner = SuperstepRunner(
        spark,
        op="pagerank",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=tol,
        input_lineage=input_lineage,
    )
    result = runner.run(
        init,
        step,
        None,
        edges_processed_per_step=n_edges,
        resume=resume,
    )
    vdeg.unpersist()
    contrib_edges.unpersist()
    return PageRankResult(
        ranks=result.state.select("vertex", "rank"),
        supersteps=result.supersteps,
        converged=result.converged,
        metrics=result.metrics,
    )
