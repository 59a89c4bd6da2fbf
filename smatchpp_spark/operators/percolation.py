"""Bond-percolation robustness profile.

Retain each edge independently with probability ``p`` (deterministic
portable-hash coin — any engine replays the identical subgraph), run
connected components on what survives, and report the component
profile per ``p``: the classic giant-component / robustness curve
(Erdős–Rényi percolation; how much random edge loss a link graph
tolerates before it shatters).  Vertices that lose all their edges
count as singleton components — the vertex set is fixed by the
ORIGINAL graph, so curves at different ``p`` are comparable.

Scale shape: one hash-filter scan + one hash-min CC per requested
``p`` (the ps list is a handful of driver literals, not data), then a
two-level aggregation (component sizes → profile scalars) that
combines map-side.  Everything downstream of the filter reuses the
checkpoint/resume machinery of ``connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64
from smatchpp_spark.operators.components import connected_components

_M = 1_000_000


def percolation_profile(
    edges: DataFrame,
    ps: tuple = (0.2, 0.5, 0.8),
    seed: int = 13,
    max_supersteps: int = 60,
) -> DataFrame:
    """(p, n_vertices, n_edges_kept, n_components, largest_component,
    frac_largest) for each retention probability, over the undirected
    simple graph spanned by ``edges``."""
    c = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    verts = (
        c.select(F.col("a").alias("vertex"))
        .unionByName(c.select(F.col("b").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    coin = F.pmod(
        hash64(
            F.concat_ws("#", F.col("a"), F.col("b"), F.lit(str(seed))),
            portable=True,
        ),
        F.lit(_M),
    )
    out = None
    for p in ps:
        kept = c.filter(coin < F.lit(int(p * _M)))
        n_kept = kept.count()
        cc_res = connected_components(
            kept.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            max_supersteps=max_supersteps,
        )
        if not cc_res.converged:
            # subcritical retention produces exactly the long-chain
            # subgraphs whose diameter can exceed the superstep cap; a
            # truncated hash-min fixpoint silently inflates n_components
            # and deflates largest_component, so fail loudly (same
            # contract as duplicate_clusters)
            raise RuntimeError(
                f"percolation_profile: connected_components did not "
                f"converge within {max_supersteps} supersteps at p={p}; "
                f"raise max_supersteps"
            )
        cc = cc_res.components
        labeled = verts.join(cc, "vertex", "left").select(
            "vertex", F.coalesce("component", F.col("vertex")).alias("comp")
        )
        sizes = labeled.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
        row = sizes.agg(
            F.sum("sz").alias("n_vertices"),
            F.count(F.lit(1)).alias("n_components"),
            F.max("sz").alias("largest"),
        ).collect()[0]
        prof = c.sparkSession.createDataFrame(
            [
                (
                    float(p),
                    int(row["n_vertices"]),
                    int(n_kept),
                    int(row["n_components"]),
                    int(row["largest"]),
                    round(row["largest"] / row["n_vertices"], 9)
                    if row["n_vertices"]
                    else 0.0,
                )
            ],
            "p double, n_vertices long, n_edges_kept long, "
            "n_components long, largest_component long, frac_largest double",
        )
        out = prof if out is None else out.unionByName(prof)
    return out
