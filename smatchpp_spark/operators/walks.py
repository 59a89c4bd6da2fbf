"""Deterministic random-walk corpus generation over the edge table.

DeepWalk-style walk sampling (Perozzi et al. 2014, public algorithm) —
the training-data primitive for graph embeddings: ``walks_per_vertex``
walks of ``walk_length`` steps from every vertex, each step moving to a
uniformly "random" out-neighbor.  At 10^12 edges the walk corpus IS the
dataset a downstream skip-gram trainer consumes, so generation must be
a bounded number of bulk joins, not a per-walk loop.

Spark-first shape:

* **Neighbor index** — one pass builds ``(src, idx, dst, deg)`` with a
  per-source dense position (``row_number`` over dst inside src — the
  window partitions by src, so no global sort), persisted and reused by
  every step.
* **Step = one equi-join.** Walk state is ``(walk_id, vertex, path)``;
  step k joins state to the index on
  ``vertex = src AND idx = hash(walk_id, k) % deg`` — picking the
  hash-chosen neighbor INSIDE the join condition, so each state row
  matches exactly one index row and the join output is |walks| rows,
  never |walks|·deg.  Dead ends (out-degree 0) keep their row and stop
  extending (standard truncated-walk semantics).
* **Determinism.** The "randomness" is ``xxhash64(walk_id, step)``
  (``portable=True`` → the md5 cross-engine hash): reruns, resumes and
  SQL oracles reproduce every walk exactly.

Skew: a hub's index rows are spread across its partition like any edge
rows; the per-step join is on the walk side's current vertex, so hub
load equals the number of walks currently AT the hub — bounded by
|walks|, not by degree².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64
from smatchpp_spark.operators.supersteps import SuperstepRunner


def neighbor_index(
    edges: DataFrame,
    hub_threshold: int | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """(src, idx, dst, deg): distinct out-neighbors with a dense
    per-source position and the out-degree.  ``idx`` is a deterministic
    bijection [0, deg) per source, stable under any physical
    partitioning.

    Skew: the default build sorts each source's neighbor list in one
    window task — ordered by dst, so a 10^8-out-degree hub is a single
    long-running straggler.  With ``hub_threshold`` set, sources whose
    out-degree exceeds it take a SALTED build instead (the dense-index
    pattern, functions/indexing.py, composed with the hot-key split of
    operators/skew.py): each hub neighbor hashes into one of
    ``n_salts`` buckets, the window sorts within (src, salt) — max task
    ≈ deg/n_salts — and per-salt row_numbers are offset by the hub's
    cumulative salt-bucket counts (an O(hubs × n_salts) spine that
    broadcasts).  Hub positions are then ordered (salt-bucket, dst)
    rather than plain dst — still a deterministic bijection, so walks
    stay reproducible; only the draw→neighbor mapping differs from the
    unsalted build (documented: set ``hub_threshold`` consistently
    across runs that must agree walk-for-walk)."""
    from pyspark.sql import Window

    e = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    wc = Window.partitionBy("src")
    if hub_threshold is None:
        return e.select(
            "src",
            (F.row_number().over(w) - 1).alias("idx"),
            "dst",
            F.count(F.lit(1)).over(wc).alias("deg"),
        )

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    hot = F.broadcast(
        deg.filter(F.col("deg") > hub_threshold).select("src", "deg")
    )
    cold = e.join(hot.select("src"), "src", "left_anti").select(
        "src",
        (F.row_number().over(w) - 1).alias("idx"),
        "dst",
        F.count(F.lit(1)).over(wc).alias("deg"),
    )
    # hot path: per-(src, salt) rank + cumulative salt-count offsets
    hsalt = e.join(hot, "src").withColumn(
        "_salt", F.pmod(F.xxhash64("dst"), F.lit(n_salts))
    )
    w_s = Window.partitionBy("src", "_salt").orderBy("dst")
    ranked = hsalt.withColumn("_rn", F.row_number().over(w_s) - 1)
    counts = hsalt.groupBy("src", "_salt").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_off = (
        Window.partitionBy("src")
        .orderBy("_salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "src",
        "_salt",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
    )
    hot_idx = ranked.join(F.broadcast(offsets), ["src", "_salt"]).select(
        "src",
        (F.col("_off") + F.col("_rn")).cast("int").alias("idx"),
        "dst",
        "deg",
    )
    return cold.unionByName(hot_idx)


def _validate_walk_params(walk_length: int, walks_per_vertex: int) -> None:
    # walks_per_vertex=0 would NOT mean "no walks": F.sequence(0, -1)
    # auto-steps DESCENDING, silently emitting walk ids '#0' and '#-1'
    if walks_per_vertex < 1:
        raise ValueError(
            f"walks_per_vertex must be >= 1, got {walks_per_vertex}"
        )
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")


def random_walks(
    edges: DataFrame,
    walk_length: int = 5,
    walks_per_vertex: int = 1,
    seed: int = 42,
    portable: bool = False,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    hub_threshold: int | None = None,
    n_salts: int = 16,
    starts: DataFrame | None = None,
) -> DataFrame:
    """One row per walk: ``(walk_id string, start vertex, path
    array<string>)`` — ``path[0]`` is the start vertex and the walk
    truncates early only at a dead end (|path| ≤ walk_length + 1).

    ``starts``: optional 1-column DataFrame of start vertices (default:
    every vertex of the graph).  Restricting starts does NOT change any
    walk's draws — draws key on (walk_id, step, seed) only — so the
    walks from a restricted run are walk-for-walk identical to the same
    vertices' walks in a full run (pytest-locked).

    ``walk_id`` = ``"<start>#<w>"`` for w in [0, walks_per_vertex) —
    stable across runs; the step-k neighbor choice is
    ``hash(walk_id, 'step', k, seed) % deg``.

    Runs through SuperstepRunner: the walk table is the superstep state,
    so a crashed generation run resumes at the committed step and (the
    draws being pure functions of walk_id and k) produces the identical
    corpus; metrics/lineage follow the engine-wide contract.  Early-
    stops only when every walk is at a dead end.

    ``hub_threshold``/``n_salts``: forwarded to ``neighbor_index`` —
    set a threshold at web scale so hub neighbor lists build in salted
    windows instead of one straggler task (see there for the draw-
    mapping caveat)."""
    _validate_walk_params(walk_length, walks_per_vertex)
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nbr = (
        neighbor_index(edges, hub_threshold=hub_threshold, n_salts=n_salts)
        .repartition(num_partitions, "src")
        .persist()
    )
    nbr.count()  # materialize once; every step reuses this exchange

    if starts is None:
        vertices = (
            edges.select(F.col("src").alias("v"))
            .unionByName(edges.select(F.col("dst").alias("v")))
            .distinct()
        )
    else:
        vertices = starts.select(
            F.col(starts.columns[0]).alias("v")
        ).distinct()
    init = vertices.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1)),
                lambda w: F.concat(F.col("v"), F.lit("#"), w.cast("string")),
            )
        ).alias("walk_id"),
        F.col("v").alias("vertex"),
        F.array(F.col("v")).alias("path"),
        F.lit(False).alias("stopped"),
    )

    def step(state: DataFrame, k: int) -> DataFrame:
        draw = F.pmod(
            hash64(
                F.concat_ws(
                    "#", F.col("walk_id"), F.lit("step"),
                    F.lit(k).cast("string"), F.lit(str(seed)),
                ),
                portable=True,
            )
            if portable
            else F.xxhash64(F.col("walk_id"), F.lit(k), F.lit(seed)),
            F.col("deg"),
        )
        alive = state.filter(~F.col("stopped"))
        stepped = (
            alive.join(
                nbr,
                (alive["vertex"] == nbr["src"]) & (nbr["idx"] == draw),
                "left",
            )
            .select(
                "walk_id",
                F.coalesce(F.col("dst"), F.col("vertex")).alias("vertex"),
                F.when(
                    F.col("dst").isNotNull(),
                    F.concat(F.col("path"), F.array(F.col("dst"))),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                F.col("dst").isNull().alias("stopped"),
            )
        )
        return stepped.unionByName(state.filter(F.col("stopped")))

    def delta(old: DataFrame, new: DataFrame) -> float:
        # 0 only when every walk is stopped — the single early-exit
        return float(new.filter(~F.col("stopped")).count())

    runner = SuperstepRunner(
        spark,
        op="random_walks",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=walk_length,
        tol=0.0,
    )
    res = runner.run(init, step, delta, resume=resume)
    nbr.unpersist()
    return res.state.select(
        "walk_id",
        F.col("path")[0].alias("start"),
        "path",
    )


def _weighted_choice_step(
    candidates: DataFrame, k: int, seed: int, portable: bool
) -> DataFrame:
    """Pick ONE candidate row per walk by deterministic weighted choice:
    u = hash(walk_id, step, seed) ∈ [0,1); the chosen row is the first
    (in candidate order) whose cumulative weight exceeds u·Σw.

    Input: (walk_id, cand, w [, carry...]).  The cumulative sum runs in
    a window partitioned BY WALK — groups are candidate lists (≤ the
    current vertex's degree), so no global sort and no skew beyond a
    single hub's neighbor list; the ordered float cumsum is
    deterministic (fixed candidate order), which keeps the draw
    engine-replayable."""
    from pyspark.sql import Window

    u_hash = (
        hash64(
            F.concat_ws(
                "#", F.col("walk_id"), F.lit("step"),
                F.lit(k).cast("string"), F.lit(str(seed)),
            ),
            portable=True,
        )
        if portable
        else F.xxhash64(F.col("walk_id"), F.lit(k), F.lit(seed))
    )
    u = (F.pmod(u_hash, F.lit(1_000_000)).cast("double") + 0.5) / 1_000_000.0
    w_ord = Window.partitionBy("walk_id").orderBy("cand")
    w_all = Window.partitionBy("walk_id")
    ranked = candidates.select(
        "*",
        F.sum("w").over(w_ord).alias("_cum"),
        F.sum("w").over(w_all).alias("_tot"),
        u.alias("_u"),
    )
    picked = ranked.filter(
        F.col("_cum") > F.col("_u") * F.col("_tot")
    )
    w_pick = Window.partitionBy("walk_id").orderBy("cand")
    return (
        picked.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .drop("_cum", "_tot", "_u", "_rn")
    )


def biased_random_walks(
    edges: DataFrame,
    walk_length: int = 5,
    walks_per_vertex: int = 1,
    seed: int = 42,
    p: float = 1.0,
    q: float = 1.0,
    weight_col: str | None = None,
    portable: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """node2vec-style 2nd-order biased walks (Grover & Leskovec 2016,
    public algorithm), composable with edge weights:

    * step weight for candidate c from current vertex v with previous
      vertex t: ``w(c) · bias`` where bias = 1/p if c == t (return),
      1 if c is a neighbor of t (stay close), 1/q otherwise (explore);
      the first step has no previous vertex — bias 1 everywhere.
    * ``weight_col`` multiplies the per-edge weight w(c) in (else 1).

    Unlike ``random_walks`` (uniform — one candidate row per walk per
    step), the biased step MUST see the whole neighbor distribution:
    per superstep the candidate join emits Σ_alive deg(cur) rows — the
    same magnitude as one PageRank superstep's contrib table — then one
    per-walk windowed cumsum picks the move.  The prev-neighbor test is
    one more equi-join against the edge set on (prev, cand).  All draws
    are deterministic hashes: reruns and the pure-python replay test
    reproduce every walk exactly.

    Output matches ``random_walks``: (walk_id, start, path).
    """
    _validate_walk_params(walk_length, walks_per_vertex)
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if weight_col is None:
        e = edges.select("src", "dst", F.lit(1.0).alias("ew"))
    else:
        e = edges.select(
            "src", "dst", F.col(weight_col).cast("double").alias("ew")
        )
    e = (
        e.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("ew").alias("ew"))
        .repartition(num_partitions, "src")
        .persist()
    )
    e.count()
    eset = e.select("src", "dst").persist()

    vertices = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    state = vertices.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1)),
                lambda w: F.concat(F.col("v"), F.lit("#"), w.cast("string")),
            )
        ).alias("walk_id"),
        F.col("v").alias("vertex"),
        F.lit(None).cast(vertices.schema["v"].dataType).alias("prev"),
        F.array(F.col("v")).alias("path"),
        F.lit(False).alias("stopped"),
    ).localCheckpoint(eager=True)

    for k in range(1, walk_length + 1):
        alive = state.filter(~F.col("stopped"))
        cands = (
            alive.join(e, alive["vertex"] == e["src"])
            .select(
                "walk_id",
                F.col("dst").alias("cand"),
                "ew",
                "prev",
                F.col("path"),
            )
        )
        # node2vec bias: join (prev, cand) against the edge set once
        prev_nbr = eset.select(
            F.col("src").alias("prev"), F.col("dst").alias("cand"),
            F.lit(True).alias("is_pn"),
        )
        cands = cands.join(prev_nbr, ["prev", "cand"], "left").select(
            "walk_id",
            "cand",
            "path",
            (
                F.col("ew")
                * F.when(F.col("prev").isNull(), F.lit(1.0))
                .when(F.col("cand") == F.col("prev"), F.lit(1.0 / p))
                .when(F.coalesce(F.col("is_pn"), F.lit(False)), F.lit(1.0))
                .otherwise(F.lit(1.0 / q))
            ).alias("w"),
        )
        chosen = _weighted_choice_step(cands, k, seed, portable).select(
            "walk_id",
            F.col("cand").alias("vertex"),
            F.element_at(F.col("path"), -1).alias("prev"),
            F.concat(F.col("path"), F.array(F.col("cand"))).alias("path"),
            F.lit(False).alias("stopped"),
        )
        dead = alive.join(chosen.select("walk_id"), "walk_id", "left_anti").select(
            "walk_id", "vertex", "prev", "path", F.lit(True).alias("stopped")
        )
        state = chosen.unionByName(dead).unionByName(
            state.filter(F.col("stopped"))
        ).localCheckpoint(eager=True)

    e.unpersist()
    eset.unpersist()
    return state.select("walk_id", F.col("path")[0].alias("start"), "path")
