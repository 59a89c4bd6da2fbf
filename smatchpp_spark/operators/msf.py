"""Minimum spanning forest — distributed Borůvka.

The textbook bulk-parallel MSF algorithm (Borůvka 1926 / the standard
MapReduce-MST formulation, public): every round each component picks
its minimum-weight edge leaving the component, the picked edges join
the forest, and the components they connect merge.  The component
count at least halves per round → O(log V) rounds.

Determinism: edges are canonicalized to ``(a < b, min weight)`` and the
per-component pick minimizes the lexicographic ``(weight, a, b)``
struct — a total order, so ties never create cycles and runs replay
exactly across engines and partitionings.

Round invariant (oracle-replay contract): with the component-merge
step run to its fixpoint, the (vertex, component) table and the
accumulated forest after k Borůvka rounds are identical in any engine
replaying the same pick/merge schedule — rounds past convergence
pick nothing and are no-ops.

Runs through SuperstepRunner (the checkpoint/resume/metrics contract
shared by every iterative operator): the per-round state is ONE
tagged-union DataFrame holding both the component labels (kind 'c')
and the accumulated forest (kind 'f'), so a crashed run resumes
mid-Borůvka from the last committed superstep with labels and forest
in lockstep.

Scale shape at 100 TB: per round two vertex-keyed joins to label edge
endpoints with components, one map-side-combined min-struct groupBy
for the picks, and a hash-min CC on the PICKED-EDGE component graph
only (≤ one edge per component — geometrically shrinking).  The full
edge table is re-labeled each round but never self-joined; everything
keys on vertex/component ids.  State is materialized per round by the
runner (parquet under a checkpoint dir, else localCheckpoint) to keep
lineage flat.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.components import connected_components
from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class MSFResult:
    forest: DataFrame  # (a, b, weight) — the chosen edges
    n_edges: int
    total_weight: float
    rounds: int
    converged: bool  # no inter-component edge remained


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 20,
    cc_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> MSFResult:
    """Borůvka MSF of the undirected graph spanned by ``edges`` —
    self-loops dropped, parallel edges collapsed to their minimum
    weight.  Raises if a round's component merge does not reach its
    CC fixpoint within ``cc_supersteps`` (a truncated merge would
    silently duplicate forest edges).

    ``max_rounds`` caps PRODUCTIVE rounds (rounds that picked ≥1 edge);
    convergence is detected by one extra no-op superstep, so the runner
    budget is ``max_rounds + 1``.  With ``checkpoint_dir`` every round
    commits the (labels + forest) state and ``resume=True`` continues
    mid-Borůvka, producing an identical forest.
    """
    spark = edges.sparkSession
    a = F.least("src", "dst")
    b = F.greatest("src", "dst")
    e = (
        edges.select(a.alias("a"), b.alias("b"), F.col(weight_col).alias("w"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    wtype = e.schema["w"].dataType
    null_w = F.lit(None).cast(wtype)

    # tagged-union state: kind 'c' rows carry (k1=vertex, k2=component),
    # kind 'f' rows carry (k1=a, k2=b, wt=weight)
    init = (
        e.select(F.col("a").alias("vertex"))
        .unionByName(e.select(F.col("b").alias("vertex")))
        .distinct()
        .select(
            F.lit("c").alias("kind"),
            F.col("vertex").alias("k1"),
            F.col("vertex").alias("k2"),
            null_w.alias("wt"),
        )
    )

    def step(state: DataFrame, _r: int) -> DataFrame:
        comp = state.filter(F.col("kind") == "c").select(
            F.col("k1").alias("vertex"), F.col("k2").alias("component")
        )
        e2 = (
            e.join(
                comp.select(
                    F.col("vertex").alias("a"), F.col("component").alias("ca")
                ),
                "a",
            )
            .join(
                comp.select(
                    F.col("vertex").alias("b"), F.col("component").alias("cb")
                ),
                "b",
            )
            .where(F.col("ca") != F.col("cb"))
        )
        edge = F.struct("w", "a", "b", "ca", "cb").alias("edge")
        cand = e2.select(F.col("ca").alias("comp"), edge).unionByName(
            e2.select(F.col("cb").alias("comp"), edge)
        )
        # picked feeds three consumers (empty check, forest add, CC), so
        # materialize it once inside the step (hits.py intra-step pattern)
        picked = (
            cand.groupBy("comp")
            .agg(F.min("edge").alias("edge"))
            .select("edge.w", "edge.a", "edge.b", "edge.ca", "edge.cb")
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)
        )
        if picked.limit(1).count() == 0:
            return state  # fixpoint: runner sees forest delta 0
        cc = connected_components(
            picked.select(F.col("ca").alias("src"), F.col("cb").alias("dst")),
            max_supersteps=cc_supersteps,
        )
        if not cc.converged:
            raise RuntimeError(
                "minimum_spanning_forest: component merge did not reach "
                f"its fixpoint within cc_supersteps={cc_supersteps}"
            )
        remap = cc.components.select(
            F.col("vertex").alias("component"), F.col("component").alias("newc")
        )
        new_comp = comp.join(remap, "component", "left").select(
            F.lit("c").alias("kind"),
            F.col("vertex").alias("k1"),
            F.coalesce("newc", "component").alias("k2"),
            null_w.alias("wt"),
        )
        adds = picked.select(
            F.lit("f").alias("kind"),
            F.col("a").alias("k1"),
            F.col("b").alias("k2"),
            F.col("w").alias("wt"),
        )
        return new_comp.unionByName(
            state.filter(F.col("kind") == "f")
        ).unionByName(adds)

    # converged when a round adds no forest edges; carry the forest
    # count forward so each superstep runs one count job, not two
    memo: dict = {"prev": None}

    def forest_delta(old: DataFrame, new: DataFrame) -> float:
        prev = memo["prev"]
        if prev is None:
            prev = old.filter(F.col("kind") == "f").count()
        cur = new.filter(F.col("kind") == "f").count()
        memo["prev"] = cur
        return float(cur - prev)

    runner = SuperstepRunner(
        spark,
        op="msf",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_rounds + 1,
        tol=0.0,
    )
    res = runner.run(init, step, forest_delta, resume=resume)
    e.unpersist()

    forest = res.state.filter(F.col("kind") == "f").select(
        F.col("k1").alias("a"), F.col("k2").alias("b"), F.col("wt").alias("weight")
    )
    row = forest.agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("tw")
    ).collect()[0]
    n = int(row["n"])
    # the converging superstep is a no-op pick; productive rounds are
    # one fewer (unless nothing was ever picked)
    rounds = max(0, res.supersteps - 1) if res.converged else res.supersteps
    return MSFResult(
        forest=forest,
        n_edges=n,
        total_weight=float(row["tw"] or 0.0),
        rounds=rounds,
        converged=res.converged,
    )
