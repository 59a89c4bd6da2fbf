"""HyperBall / ANF: approximate neighborhood function and effective
diameter over the edge table.

HyperBall (Boldi & Vigna 2013, public algorithm; ANF, Palmer et al.
2002): every vertex carries a HyperLogLog sketch of the set of vertices
within distance r; per superstep each sketch absorbs the sketches of the
vertex's out-neighbors' balls (element-wise register max), so after r
rounds register state estimates |B(v, r)|.  The sum over vertices is the
neighborhood function NF(r); the effective diameter is the smallest r
with NF(r) ≥ q·NF(∞).

Spark-first shape — the sketch is a COLUMN, the merge is an AGGREGATION:
  * registers live as ``array<int>`` of length m = 2^p per vertex;
  * the merge joins whole register ARRAYS along edges (|E| payload rows,
    one shuffle) and takes the element-wise max as m parallel ``max``
    aggregation columns re-packed into the array — map-side combined, so
    a 10^8-degree hub costs one m-int row per partition, never one per
    neighbor (the same skew discipline as PageRank's contrib sum).  The
    explode-to-(vertex, reg_idx) formulation looks natural but shuffles
    |E|·m skinny rows through the join plus a second collect_list/sort
    pass to re-pack — measured superlinear (exponent 1.23) at the 10x
    sweep; the array-payload merge is the linear form;
  * rho/register derive from ``xxhash64(vertex)`` bit ops in the scan
    projection — deterministic, no RNG, cross-run identical;
  * per-round state is localCheckpoint-staged (flat lineage at high r).

Register count m = 64 (p = 6) gives the standard ~1.04/√m ≈ 13% per-ball
standard error; the NF(r) SUM over many vertices concentrates much
tighter (tested ≤ 5% vs an exact BFS oracle).  At 10^12 edges the state
is |V|·m·4 bytes and each round shuffles |E| m-int payloads — m (i.e.
p) is the documented cost knob (halve m to halve both).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner

# alpha_m bias constant for m = 2^p registers (Flajolet et al. 2007)
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


@dataclass
class HyperBallResult:
    neighborhood_function: DataFrame  # (r, nf_estimate double)
    balls: DataFrame  # (vertex, ball_size double[, harmonic_centrality])
    effective_diameter: float | None
    rounds: int
    converged: bool  # NF reached its fixpoint before max_rounds


def _init_registers(
    vertices: DataFrame, p: int, portable: bool = False
) -> DataFrame:
    """Single-element HLL per vertex: register j = rho(w) where
    j = low p bits of hash(vertex) and rho = 1 + leading-zero count
    of the remaining hash bits (position of the first 1-bit).

    ``portable=True`` uses the md5-based cross-engine hash (60-bit,
    functions/hashing.py) so an oracle engine reproduces the registers
    exactly; default xxhash64 is the 100 TB fast path."""
    from smatchpp_spark.functions.hashing import hash64

    m = 1 << p
    bits = 60 if portable else 64
    h = hash64(F.col("vertex"), portable=True) if portable else F.xxhash64(
        "vertex"
    )
    j = F.pmod(h, F.lit(m)).cast("int")
    # w: the hash without its low p bits, as an unsigned value
    w = F.shiftrightunsigned(h, p)
    # rho = (bits - p) - floor(log2(w)) when w > 0 else bits - p + 1
    # log2 via the bit length: DOUBLE log is exact for the leading bit
    rho = F.when(
        w == 0, F.lit(bits - p + 1)
    ).otherwise(
        (F.lit(bits - p) - F.floor(F.log2(w.cast("double")))).cast("int")
    )
    regs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.when(i == j, rho).otherwise(F.lit(0)),
    )
    return vertices.select("vertex", regs.alias("regs"))


def _estimate(regs_col, m: int):
    """HLL raw estimate α·m²/Σ2^−reg with the standard small-range
    linear-counting correction (Flajolet et al. 2007)."""
    z = F.aggregate(
        regs_col,
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")),
    )
    raw = F.lit(_alpha(m) * m * m) / z
    zeros = F.size(F.filter(regs_col, lambda r: r == 0))
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when(
        (raw <= 2.5 * m) & (zeros > 0), lin
    ).otherwise(raw)


def hyperball(
    edges: DataFrame,
    p: int = 6,
    max_rounds: int = 30,
    quantile: float = 0.9,
    directed: bool = True,
    portable: bool = False,
    centrality: bool = False,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> HyperBallResult:
    """Neighborhood function NF(r) for r = 0..convergence and the
    q-effective diameter (smallest r with NF(r) ≥ q·NF(final)).

    ``directed=True`` computes OUT-balls (vertices reachable FROM v);
    the merge therefore pulls each successor's ball INTO its
    predecessors: B(v, r+1) = B(v, r) ∪ ⋃_{v→w} B(w, r).

    ``centrality=True`` additionally accumulates HARMONIC CENTRALITY —
    HyperBall's headline application (Boldi & Vigna 2013):
    ``H(v) = Σ_{u≠v} 1/d(v,u) ≈ Σ_r (|B(v,r)| − |B(v,r−1)|)/r``, the
    per-round ball increment weighted by 1/r.  The accumulator is one
    extra double column riding the superstep state — no extra shuffle
    (it joins the per-round estimates, which the state already holds).
    Output column ``harmonic_centrality`` on ``balls``."""
    # Spark 4.1 workaround: localCheckpoint preserves plan constraints
    # on the LogicalRDD, including UNION-branch constraints that
    # reference pre-union attributes; InferFiltersFromConstraints later
    # re-materializes those as unbindable !Filter nodes on the state
    # scan (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND: "dst#N not in [vertex,
    # regs]") when the whole-array merge join runs over checkpointed
    # state.  Constraint propagation is disabled for the duration of
    # the computation and every returned DataFrame is materialized
    # inside the window (its checkpoint then carries no constraints),
    # so downstream consumers are safe after the conf is restored.
    spark = edges.sparkSession
    _cp_key = "spark.sql.constraintPropagation.enabled"
    _cp_saved = spark.conf.get(_cp_key, "true")
    spark.conf.set(_cp_key, "false")
    try:
        return _hyperball_impl(
            edges, p, max_rounds, quantile, directed, portable, centrality,
            checkpoint_dir, resume,
        )
    finally:
        spark.conf.set(_cp_key, _cp_saved)


def _hyperball_impl(
    edges: DataFrame,
    p: int,
    max_rounds: int,
    quantile: float,
    directed: bool,
    portable: bool,
    centrality: bool,
    checkpoint_dir: str | None,
    resume: bool,
) -> HyperBallResult:
    m = 1 << p
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    e = e.localCheckpoint(eager=True)
    # vertices MUST be checkpointed BEFORE deriving the register
    # expressions: Spark 4.1's localCheckpoint preserves plan
    # constraints, and a constraint derived through this union's
    # branches references the pre-union src/dst attributes — the
    # optimizer later re-materializes it as an unbindable !Filter on
    # the checkpointed state scan (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND).
    # Starting the register lineage at a vertices RDD keeps every
    # preserved constraint inside its own output.
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # identity edges carry each vertex's own ball through the same merge
    # join (B(v, r+1) ⊇ B(v, r)) — one join + one agg per round
    e_msg = e.unionByName(
        vertices.select(
            F.col("vertex").alias("src"), F.col("vertex").alias("dst")
        )
    ).localCheckpoint(eager=True)
    state = _init_registers(vertices, p, portable=portable).localCheckpoint(
        eager=True
    )

    def nf(s: DataFrame) -> float:
        row = s.agg(
            F.sum(_estimate(F.col("regs"), m)).alias("nf")
        ).collect()[0]
        return float(row["nf"] or 0.0)

    if centrality:
        state = state.select(
            "vertex",
            "regs",
            _estimate(F.col("regs"), m).alias("est"),
            F.lit(0.0).alias("hc"),
        ).localCheckpoint(eager=True)

    spark = edges.sparkSession

    def step(st: DataFrame, k: int) -> DataFrame:
        # successor sketches flow to predecessors as WHOLE-ARRAY
        # payloads; the element-wise register max is m parallel MAX
        # aggregation columns re-packed into the array.  One shuffle of
        # |E| array rows — NOT posexplode-then-join (|E|·m skinny rows
        # through the join plus a second collect_list/sort shuffle to
        # re-pack: measured superlinear at 10x in the scale sweep,
        # exponent 1.23, from shuffle-spill on the ×m row blowup).
        # Map-side combine still absorbs hubs: a 10^8-in-degree vertex
        # costs one 64-int row per partition.  The self-ball rides the
        # identity edges baked into e_msg, so the step is one join + one
        # aggregation (no union-after-join).
        ball = st.select("vertex", "regs")
        msgs = e_msg.join(ball, e_msg["dst"] == ball["vertex"]).select(
            F.col("src").alias("vertex"), "regs"
        )
        new = (
            msgs.groupBy("vertex")
            .agg(
                *[
                    F.max(F.element_at("regs", i + 1)).alias(f"_r{i}")
                    for i in range(m)
                ]
            )
            .select(
                "vertex",
                F.array(*[f"_r{i}" for i in range(m)]).alias("regs"),
            )
        )
        if centrality:
            # harmonic accumulator: ball increment this round / r
            # (clamped at 0 — the estimator can jitter down an ulp);
            # one vertex-key join against the previous state, which the
            # groupBy already partitioned compatibly
            prev = st.select("vertex", "est", "hc")
            new = new.join(prev, "vertex").select(
                "vertex",
                "regs",
                _estimate(F.col("regs"), m).alias("est"),
                (
                    F.col("hc")
                    + F.greatest(
                        _estimate(F.col("regs"), m) - F.col("est"),
                        F.lit(0.0),
                    )
                    / F.lit(float(k))
                ).alias("hc"),
            )
        return new

    # NF curve rides the convergence test: each superstep computes the
    # new state's NF once, appends it, and stops when it stopped moving
    # (HLL registers are monotone, so an unchanged estimate means the
    # register fixpoint).  Runs through SuperstepRunner: per-round regs
    # checkpoint with metrics/lineage and resume mid-computation like
    # every other iterative operator; on resume the curve prefix is
    # rebuilt from the committed states.
    runner = SuperstepRunner(
        spark,
        op="hyperball",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_rounds,
        tol=0.0,
    )
    curve: list[tuple[int, float]] = []
    if resume and runner.last_committed_superstep() is not None:
        last = runner.last_committed_superstep()
        for j in range(0, last + 1):
            curve.append((j, nf(spark.read.parquet(runner._state_path(j)))))
    else:
        curve.append((0, nf(state)))

    def delta(old: DataFrame, new: DataFrame) -> float:
        cur = nf(new)
        prev = curve[-1][1]
        curve.append((len(curve), cur))
        return abs(cur - prev)

    res = runner.run(state, step, delta, resume=resume)
    state = res.state
    rounds = res.supersteps
    converged = res.converged
    nf_df = spark.createDataFrame(
        [(r, round(v, 3)) for r, v in curve], "r int, nf_estimate double"
    )
    final_nf = curve[-1][1]
    eff = None
    if final_nf > 0:
        for r, v in curve:
            if v >= quantile * final_nf:
                eff = float(r)
                break
    ball_cols = [
        "vertex",
        F.round(_estimate(F.col("regs"), m), 3).alias("ball_size"),
    ]
    if centrality:
        ball_cols.append(F.round(F.col("hc"), 3).alias("harmonic_centrality"))
    # materialize inside the constraint-propagation-off window (see
    # hyperball): the checkpointed result carries no stale constraints
    balls = state.select(*ball_cols).localCheckpoint(eager=True)
    return HyperBallResult(
        neighborhood_function=nf_df,
        balls=balls,
        effective_diameter=eff,
        rounds=rounds,
        converged=converged,
    )
