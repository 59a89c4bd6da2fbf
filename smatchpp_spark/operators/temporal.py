"""Temporal (time-respecting) reachability — earliest arrival.

A temporal edge ``(src, dst, t)`` is a contact at time ``t``; a
temporal path must traverse edges with non-decreasing times, so
reachability ≠ static reachability (A→B at t=5, B→C at t=3 does NOT
reach C).  Earliest-arrival is the foundational single-source problem
of the family (Wu, Cheng, Huang et al., VLDB 2014 "Path Problems in
Temporal Graphs" — public): arrival(v) = the minimum time any
time-respecting path from the source set can reach v.

Superstep formulation — the SSSP dataflow with the min-plus relaxation
swapped for the temporal one:

    cand(v) = min { t : (u, v, t) ∈ E, t ≥ arrival(u) }

Lowering ``arrival(u)`` only ever ADDS qualifying edges, so arrivals
are monotone non-increasing and the changed-frontier pruning of
``sssp.py`` is sound unconditionally (no negative-weight analogue
exists: every candidate is an edge time ≥ the current arrival at its
tail).  Invariant used by the SQL oracle: after k rounds the state is
the exact minimum arrival over temporal paths of ≤ k edges, so fixed-k
replays are 1:1 whether or not the run converged early.

Scale shape at 100 TB: per round one (changed-frontier ⋈ edges on src)
join with the ``t ≥ arrival`` predicate INSIDE the join condition
(filters before the shuffle write on the frontier side), one map-side
combined min-groupBy, one vertex-keyed full-outer merge.  State is V
rows; the temporal edge table is the only large stable input — bucket
it by src and the per-round join is exchange-free.  SuperstepRunner
checkpoint/resume/metrics like every other iterative operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class TemporalResult:
    arrivals: DataFrame  # (vertex, arrival) — reached vertices only
    rounds: int
    converged: bool


def temporal_earliest_arrival(
    edges: DataFrame,
    sources: "list | DataFrame",
    time_col: str = "t",
    start_time: int = 0,
    max_supersteps: int = 20,
    directed: bool = True,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> TemporalResult:
    """Earliest arrival time from the ``sources`` set (released at
    ``start_time``) to every temporally reachable vertex.  ``edges``
    carries ``src``, ``dst`` and an integer/orderable ``time_col``
    (integer times keep cross-engine parity exact).  Undirected mode
    treats each contact as traversable both ways at the same time.
    Sources report ``arrival = start_time``; unreached vertices are
    absent."""
    spark = edges.sparkSession
    e = edges.select("src", "dst", F.col(time_col).alias("t"))
    if not directed:
        e = e.unionByName(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col(time_col).alias("t"),
            )
        )
    e = e.filter(F.col("t") >= F.lit(start_time)).persist()

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
        "vertex",
        F.lit(start_time).cast("long").alias("arrival"),
        F.lit(True).alias("changed"),
    )

    def step(state: DataFrame, r: int) -> DataFrame:
        wave = state.filter(F.col("changed")).select("vertex", "arrival")
        best = (
            wave.join(
                e,
                (wave["vertex"] == e["src"]) & (e["t"] >= wave["arrival"]),
            )
            .select(F.col("dst").alias("vertex"), F.col("t").alias("cand"))
            .groupBy("vertex")
            .agg(F.min("cand").alias("cand"))
        )
        merged = state.drop("changed").join(best, "vertex", "full_outer")
        return merged.select(
            "vertex",
            F.least("arrival", "cand").alias("arrival"),
            (
                F.col("cand").isNotNull()
                & (
                    F.col("arrival").isNull()
                    | (F.col("cand") < F.col("arrival"))
                )
            ).alias("changed"),
        )

    runner = SuperstepRunner(
        spark,
        op="temporal_earliest_arrival",
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
    return TemporalResult(
        arrivals=res.state.select("vertex", "arrival"),
        rounds=res.supersteps,
        converged=res.converged,
    )


def temporal_triangles(
    contacts: DataFrame,
    delta: int,
    src_col: str = "src",
    dst_col: str = "dst",
    t_col: str = "t",
) -> DataFrame:
    """δ-temporal triangle counting (the undirected instance of the
    temporal-motif family, Paranjape-Benson-Leskovec WSDM'17, public):
    a static triangle {a,b,c} is TEMPORALLY REALIZED iff each of its
    three pairs has a contact inside one common window of width
    ``delta`` — equivalently, iff some contact triple (one per pair)
    has max(t) − min(t) ≤ delta.

    Returns one row: ``(static_triangles, temporal_triangles, delta)``.

    Anchor argument (soundness + completeness): a qualifying triple has
    a minimum contact t0, so the triangle is realized iff SOME contact
    t0 on one of its pairs has all three pairs touched within
    [t0, t0 + delta] (the anchor's own pair trivially via t0).  The
    scan therefore never materializes contact TRIPLES (k³ per
    multi-contact edge); it joins anchors against per-pair contacts
    with the window predicate inside the join condition.

    Scale shape at 100 TB: static triangles come from the
    degree-oriented wedge join (hub-safe, Σ d_out² bound); anchors are
    one equi-join of triangle pairs against the contact table keyed on
    the pair; the window check is a second pair-keyed equi-join with
    the range predicate evaluated join-side.  Everything keys on pair
    or triangle ids — no time-sorted windows, no all-pairs.
    """
    from smatchpp_spark.operators.cliques import oriented_triangles

    pair_contacts = (
        contacts.select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
            F.col(t_col).cast("long").alias("t"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    static = pair_contacts.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).distinct()
    tri = oriented_triangles(static)
    sorted_corners = F.array_sort(F.array("u", "v", "w"))
    tri_id = tri.select(
        F.concat_ws("|", sorted_corners).alias("tid"),
        sorted_corners[0].alias("n1"),
        sorted_corners[1].alias("n2"),
        sorted_corners[2].alias("n3"),
    ).localCheckpoint(eager=True)
    tri_pairs = tri_id.select(
        "tid",
        F.posexplode(
            F.array(
                F.struct(F.col("n1").alias("a"), F.col("n2").alias("b")),
                F.struct(F.col("n1").alias("a"), F.col("n3").alias("b")),
                F.struct(F.col("n2").alias("a"), F.col("n3").alias("b")),
            )
        ).alias("pidx", "e"),
    ).select("tid", "pidx", "e.a", "e.b")

    anchors = (
        tri_pairs.join(pair_contacts, ["a", "b"])
        .select("tid", F.col("t").alias("t0"))
        .distinct()
    )
    hits = (
        anchors.join(tri_pairs, "tid")
        .join(
            pair_contacts.withColumnRenamed("t", "tc"),
            ["a", "b"],
        )
        .filter(
            (F.col("tc") >= F.col("t0"))
            & (F.col("tc") <= F.col("t0") + F.lit(int(delta)))
        )
        .select("tid", "t0", "pidx")
        .distinct()
    )
    realized = (
        hits.groupBy("tid", "t0")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") == 3)
        .select("tid")
        .distinct()
    )
    return (
        tri_id.agg(F.count(F.lit(1)).cast("long").alias("static_triangles"))
        .crossJoin(
            realized.agg(
                F.count(F.lit(1)).cast("long").alias("temporal_triangles")
            )
        )
        .select(
            "static_triangles",
            "temporal_triangles",
            F.lit(int(delta)).cast("long").alias("delta"),
        )
    )
