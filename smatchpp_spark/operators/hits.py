"""HITS (hubs & authorities) over the directed edge table.

Kleinberg's link-analysis pair to PageRank (public algorithm): authority
score = sum of pointing hubs' scores, hub score = sum of pointed-to
authorities' scores, L2-normalized each half-step; the fixpoint is the
principal eigenvector pair of AᵀA / AAᵀ.

Physical shape per superstep — the PageRank dataflow run twice:
  1. ``state ⋈ edges on src`` → ``groupBy(dst).sum`` (map-side combined
     — a 10^8-in-degree authority costs one row per partition);
  2. the L2 norm is a 1-row scalar aggregation broadcast back (same
     pattern as PageRank's dangling mass — never a driver-side loop);
  3. the reverse join/agg for hubs.
The static edge table is hash-partitioned once and persisted; only the
small score table reshuffles.  Runs through SuperstepRunner:
per-superstep state checkpoints with metrics/lineage and resumes
mid-iteration like every other iterative operator.

Scores are held to a numpy power-iteration oracle (allclose 1e-8,
tests/test_linkgraph.py) and an unrolled fixed-iteration SQL oracle
(the ``hits_scores`` contract row).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import (
    observe_scan_delta,
    SuperstepRunner,
    free_local_checkpoint,
)


@dataclass
class HITSResult:
    scores: DataFrame  # (vertex, hub double, authority double)
    supersteps: int
    converged: bool
    metrics: list


def hits(
    edges: DataFrame,
    max_supersteps: int = 50,
    tol: float = 1e-10,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> HITSResult:
    """Hub/authority scores; stop at ``max(|Δhub|, |Δauth|) <= tol``
    (set ``tol=-1`` for exactly ``max_supersteps`` iterations — the
    oracle-replayable fixed form).  Self-loops ignored; multi-edges
    count with multiplicity (standard adjacency semantics)."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .repartition(num_partitions, "src")
        .persist()
    )
    e.count()
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    nan = F.lit(float("nan"))
    init = vertices.select(
        "vertex",
        F.lit(1.0).alias("hub"),
        F.lit(1.0).alias("authority"),
        nan.alias("prev_hub"),
        nan.alias("prev_authority"),
    )

    def _l2(df: DataFrame, col: str):
        row = df.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("n")
        ).collect()[0]
        return float(row["n"] or 0.0)

    # intra-step localCheckpoints (half, full) of the PREVIOUS superstep
    # are dead once the runner materializes that step's output — free
    # them at the next step() entry (the scc.py round_ckpts pattern),
    # else their blocks accumulate in the block manager for the run
    step_ckpts: list[DataFrame] = []

    def _free_step_ckpts() -> None:
        while step_ckpts:
            free_local_checkpoint(step_ckpts.pop())

    def step(state: DataFrame, k: int) -> DataFrame:
        _free_step_ckpts()
        # the previous scores ride along in the output state (the
        # PageRank prev_rank pattern, pagerank.py:208-285), so the
        # convergence delta is a scan of the new state — not an extra
        # old⋈new join job per superstep
        contrib = (
            state.select(F.col("vertex").alias("src"), "hub")
            .join(e, "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        half = (
            state.select(
                "vertex", "hub", F.col("authority").alias("prev_authority")
            )
            .join(contrib, "vertex", "left")
            .select(
                "vertex",
                "hub",
                "prev_authority",
                F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"),
            )
            .localCheckpoint(eager=True)
        )
        half_ckpt = half
        an = _l2(half, "a_raw")
        half = half.select(
            "vertex",
            "hub",
            "prev_authority",
            (F.col("a_raw") / F.lit(an if an > 0 else 1.0)).alias("authority"),
        )
        # hub update from new authorities
        back = (
            half.select(F.col("vertex").alias("dst"), "authority")
            .join(e, "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum("authority").alias("h_raw"))
        )
        full = (
            half.select(
                "vertex",
                F.col("hub").alias("prev_hub"),
                "prev_authority",
                "authority",
            )
            .join(back, "vertex", "left")
            .select(
                "vertex",
                "prev_hub",
                "prev_authority",
                "authority",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
            )
            .localCheckpoint(eager=True)
        )
        # full is materialized now, so half's blocks are already dead
        free_local_checkpoint(half_ckpt)
        step_ckpts.append(full)
        hn = _l2(full, "h_raw")
        # the convergence scan (max over both score deltas; superstep 1
        # sees NaN prev columns → NaN delta → never ≤ tol, exactly like
        # PageRank's NaN-seeded prev_rank; NULL max ⇔ empty graph ⇔
        # converged) rides the materialization job as an Observation —
        # no separate per-superstep aggregation job
        return observe_scan_delta(
            full.select(
                "vertex",
                (F.col("h_raw") / F.lit(hn if hn > 0 else 1.0)).alias("hub"),
                "authority",
                "prev_hub",
                "prev_authority",
            ),
            F.max(
                F.greatest(
                    F.abs(F.col("hub") - F.col("prev_hub")),
                    F.abs(F.col("authority") - F.col("prev_authority")),
                )
            ),
        )

    runner = SuperstepRunner(
        spark,
        op="hits",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=tol,
    )
    res = runner.run(init, step, None, resume=resume)
    # the runner materialized the final state (parquet or its own
    # localCheckpoint), so the last step's intra-step checkpoints are dead
    _free_step_ckpts()
    e.unpersist()
    return HITSResult(
        scores=res.state.select(
            "vertex", "hub", F.col("authority").alias("authority")
        ),
        supersteps=res.supersteps,
        converged=res.converged,
        metrics=res.metrics,
    )


def eigenvector_centrality(
    edges: DataFrame,
    max_supersteps: int = 50,
    tol: float = 1e-10,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> HITSResult:
    """Eigenvector centrality over the UNDIRECTED simple graph — the
    principal-eigenvector limit of x' = A·x / ||A·x||₂ (power iteration,
    public algorithm; HITS's single-matrix sibling).  Returns the HITS
    result shape with ``hub == authority == centrality`` so downstream
    consumers share one schema.

    Same physical superstep as one HITS half-step: score ⋈ undirected
    edges → map-side-combined sum per vertex → 1-row L2 scalar broadcast;
    SuperstepRunner checkpoint/resume/metrics.  Multi-edges collapse
    (simple-graph adjacency); isolated sides never appear (every vertex
    of the edge table has degree ≥ 1)."""
    from smatchpp_spark.operators.kcore import undirected_simple

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        undirected_simple(edges)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .repartition(num_partitions, "src")
        .persist()
    )
    und.count()
    vertices = und.select(F.col("src").alias("vertex")).distinct()
    init = vertices.select(
        "vertex",
        F.lit(1.0).alias("score"),
        F.lit(float("nan")).alias("prev_score"),
    )

    # free the previous superstep's intra-step checkpoint at the next
    # step() entry (scc.py round_ckpts pattern) — see hits() above
    step_ckpts: list[DataFrame] = []

    def _free_step_ckpts() -> None:
        while step_ckpts:
            free_local_checkpoint(step_ckpts.pop())

    def step(state: DataFrame, k: int) -> DataFrame:
        _free_step_ckpts()
        # prev_score rides in the state (PageRank's prev_rank pattern):
        # delta is a scan of the new state, no old⋈new join job
        contrib = (
            state.select(F.col("vertex").alias("src"), "score")
            .join(und, "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("score").alias("raw"))
        )
        half = (
            state.select("vertex", F.col("score").alias("prev_score"))
            .join(contrib, "vertex", "left")
            .select(
                "vertex",
                "prev_score",
                F.coalesce("raw", F.lit(0.0)).alias("raw"),
            )
            .localCheckpoint(eager=True)
        )
        step_ckpts.append(half)
        row = half.agg(
            F.sqrt(F.sum(F.col("raw") * F.col("raw"))).alias("n")
        ).collect()[0]
        n = float(row["n"] or 0.0)
        # convergence scan observed in the materialization job (NULL max
        # ⇔ empty state: converged — see hits() above)
        return observe_scan_delta(
            half.select(
                "vertex",
                (F.col("raw") / F.lit(n if n > 0 else 1.0)).alias("score"),
                "prev_score",
            ),
            F.max(F.abs(F.col("score") - F.col("prev_score"))),
        )

    runner = SuperstepRunner(
        spark,
        op="eigenvector_centrality",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=tol,
    )
    res = runner.run(init, step, None, resume=resume)
    _free_step_ckpts()
    und.unpersist()
    return HITSResult(
        scores=res.state.select(
            "vertex",
            F.col("score").alias("hub"),
            F.col("score").alias("authority"),
        ),
        supersteps=res.supersteps,
        converged=res.converged,
        metrics=res.metrics,
    )


def salsa(
    edges: DataFrame,
    max_supersteps: int = 50,
    tol: float = 1e-10,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> HITSResult:
    """SALSA (Lempel & Moran 2000, public) — the stochastic HITS
    variant: contributions are DEGREE-NORMALIZED random-walk steps
    rather than raw sums, which kills HITS's topic-drift/TKC effect:

    * authority half-step: ``a'(j) = Σ_{i→j} h(i) / out(i)``
    * hub half-step:       ``h'(i) = Σ_{i→j} a'(j) / in(j)``

    each L1-normalized (the scores are probability distributions — the
    stationary authority mass inside a connected support component is
    proportional to in-degree, the paper's closed form; the pytest
    asserts it).  Defined on the SIMPLE directed graph (duplicate edges
    collapse — the random surfer picks among distinct links; self-loops
    dropped), ``tol=-1`` for the fixed-iteration oracle-replayable form.

    Physical shape: both normalizations are pre-joined ONCE into the
    static edge table (``w_fwd = 1/out(src)``, ``w_bwd = 1/in(dst)`` —
    the PageRank static-contrib pattern), hash-partitioned by src and
    persisted; each superstep is two join→map-side-combined-agg passes
    over it plus two 1-row L1 scalars, exactly HITS's dataflow.
    SuperstepRunner provides checkpoint/resume/metrics.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    simple = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    out_w = simple.groupBy("src").agg(
        (F.lit(1.0) / F.count(F.lit(1))).alias("w_fwd")
    )
    in_w = simple.groupBy("dst").agg(
        (F.lit(1.0) / F.count(F.lit(1))).alias("w_bwd")
    )
    ew = (
        simple.join(out_w, "src")
        .join(in_w, "dst")
        .select("src", "dst", "w_fwd", "w_bwd")
        .repartition(num_partitions, "src")
        .persist()
    )
    ew.count()
    vertices = (
        ew.select(F.col("src").alias("vertex"))
        .unionByName(ew.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    n_row = vertices.agg(F.count(F.lit(1)).alias("n")).collect()[0]
    n_vertices = int(n_row["n"])
    nan = F.lit(float("nan"))
    init = vertices.select(
        "vertex",
        F.lit(1.0 / n_vertices if n_vertices else 1.0).alias("hub"),
        F.lit(1.0 / n_vertices if n_vertices else 1.0).alias("authority"),
        nan.alias("prev_hub"),
        nan.alias("prev_authority"),
    )

    def _l1(df: DataFrame, col: str) -> float:
        row = df.agg(F.sum(F.abs(F.col(col))).alias("n")).collect()[0]
        return float(row["n"] or 0.0)

    step_ckpts: list[DataFrame] = []

    def _free_step_ckpts() -> None:
        while step_ckpts:
            free_local_checkpoint(step_ckpts.pop())

    def step(state: DataFrame, k: int) -> DataFrame:
        _free_step_ckpts()
        contrib = (
            state.select(F.col("vertex").alias("src"), "hub")
            .join(ew, "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("hub") * F.col("w_fwd")).alias("a_raw"))
        )
        half = (
            state.select(
                "vertex", "hub", F.col("authority").alias("prev_authority")
            )
            .join(contrib, "vertex", "left")
            .select(
                "vertex",
                "hub",
                "prev_authority",
                F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"),
            )
            .localCheckpoint(eager=True)
        )
        half_ckpt = half
        an = _l1(half, "a_raw")
        half = half.select(
            "vertex",
            "hub",
            "prev_authority",
            (F.col("a_raw") / F.lit(an if an > 0 else 1.0)).alias("authority"),
        )
        back = (
            half.select(F.col("vertex").alias("dst"), "authority")
            .join(ew, "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum(F.col("authority") * F.col("w_bwd")).alias("h_raw"))
        )
        full = (
            half.select(
                "vertex",
                F.col("hub").alias("prev_hub"),
                "prev_authority",
                "authority",
            )
            .join(back, "vertex", "left")
            .select(
                "vertex",
                "prev_hub",
                "prev_authority",
                "authority",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(half_ckpt)
        step_ckpts.append(full)
        hn = _l1(full, "h_raw")
        # convergence scan observed in the materialization job (see hits)
        return observe_scan_delta(
            full.select(
                "vertex",
                (F.col("h_raw") / F.lit(hn if hn > 0 else 1.0)).alias("hub"),
                "authority",
                "prev_hub",
                "prev_authority",
            ),
            F.max(
                F.greatest(
                    F.abs(F.col("hub") - F.col("prev_hub")),
                    F.abs(F.col("authority") - F.col("prev_authority")),
                )
            ),
        )

    runner = SuperstepRunner(
        spark,
        op="salsa",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=tol,
    )
    res = runner.run(init, step, None, resume=resume)
    _free_step_ckpts()
    ew.unpersist()
    return HITSResult(
        scores=res.state.select("vertex", "hub", "authority"),
        supersteps=res.supersteps,
        converged=res.converged,
        metrics=res.metrics,
    )


@dataclass
class KatzResult:
    scores: DataFrame  # (vertex, katz double)
    supersteps: int
    converged: bool
    metrics: list


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_supersteps: int = 50,
    tol: float = 1e-10,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> KatzResult:
    """Katz centrality (Katz 1953, public) over the SIMPLE directed
    graph: ``x(j) = β + α·Σ_{i→j} x(i)`` iterated to the fixpoint
    ``x = β·Σ_k α^k (Aᵀ)^k·1`` — every incoming walk counts, length-k
    walks attenuated by α^k.  Converges for α < 1/λ_max; unlike
    eigenvector centrality the β floor keeps vertices with no incoming
    walks at a nonzero score, so peripheral-vertex rankings are stable.

    Physical shape per superstep = ONE PageRank half-step: score ⋈
    edges on src → map-side-combined sum per dst → affine α·sum + β
    scan (no normalization scalar, so one fewer driver action than
    eigenvector/HITS).  The static edge side is hash-partitioned once
    and persisted; only the score table reshuffles.  SuperstepRunner
    checkpoint/resume/metrics; ``tol=-1`` for the fixed-iteration
    oracle-replayable form.  Duplicate edges collapse (simple-graph
    adjacency); self-loops count like any other edge (standard Katz).
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    e.count()
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    # x0 = β·1 (the k=0 term of the series); prev rides in the state
    # (PageRank's prev_rank pattern — delta needs no old⋈new join)
    init = vertices.select(
        "vertex",
        F.lit(float(beta)).alias("score"),
        F.lit(float("nan")).alias("prev_score"),
    )

    step_ckpts: list[DataFrame] = []

    def _free_step_ckpts() -> None:
        while step_ckpts:
            free_local_checkpoint(step_ckpts.pop())

    def step(state: DataFrame, k: int) -> DataFrame:
        _free_step_ckpts()
        contrib = (
            state.select(F.col("vertex").alias("src"), "score")
            .join(e, "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("score").alias("raw"))
        )
        # convergence scan observed in the materialization job (see hits)
        return observe_scan_delta(
            state.select("vertex", F.col("score").alias("prev_score"))
            .join(contrib, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit(float(alpha)) * F.coalesce("raw", F.lit(0.0))
                    + F.lit(float(beta))
                ).alias("score"),
                "prev_score",
            ),
            F.max(F.abs(F.col("score") - F.col("prev_score"))),
        )

    runner = SuperstepRunner(
        spark,
        op="katz_centrality",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=tol,
    )
    res = runner.run(init, step, None, resume=resume)
    _free_step_ckpts()
    e.unpersist()
    return KatzResult(
        scores=res.state.select("vertex", F.col("score").alias("katz")),
        supersteps=res.supersteps,
        converged=res.converged,
        metrics=res.metrics,
    )
