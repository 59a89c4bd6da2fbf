"""Weisfeiler–Leman (1-WL) color refinement and graph fingerprints.

The classic graph-isomorphism invariant (Weisfeiler & Leman 1968; the
"WL test" behind graph kernels and GNN expressivity, all public): every
vertex's color is iteratively rehashed with the multiset of its
neighbors' (edge-label, color) pairs; after k rounds two vertices share
a color only if their k-hop labeled neighborhoods are indistinguishable,
and two graphs with different color histograms are certainly
non-isomorphic.  For this corpus that is the cheap pre-filter the
reference lacks: smatch alignment (operators/align.py) costs a solver
run per pair, while equal WL fingerprints group structurally identical
graphs in one pass — dedup/canonicalization for graph corpora, the
doc_fingerprints analog on the graph side (reference semantics anchor:
graph equality up to variable renaming, smatchpp util.py isomorphism
discussion).

Multiset hashing: the neighbor multiset is combined as a MODULAR SUM of
per-message hashes (``Σ h(rel, color) mod 2^31-1``) instead of a sorted
collect_list — a commutative, associative combine, so the per-vertex
aggregation is map-side combinable and a 10^8-degree hub costs one
partial row per partition, never a hub-sized sorted array in one task.
Deterministic and engine-portable (md5-based hash, integer mod); hash
collisions are possible in principle (any multiset hash) and only ever
MERGE colors — the invariant "different colors ⇒ different
neighborhoods" survives, which is the direction dedup needs.

Directed edges contribute to BOTH endpoints with a direction tag (out:/
in:), so inverse relations refine like the reference's -of edges.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import portable_hash64

MOD = (1 << 31) - 1


@dataclass
class WLResult:
    colors: DataFrame  # (graph_id, vertex, color long)
    fingerprints: DataFrame  # (graph_id, n_vertices, fingerprint long)
    rounds: int


def _h(*cols: Column) -> Column:
    return portable_hash64(F.concat_ws("\x1f", *cols))


def wl_refinement(
    triples: DataFrame,
    rounds: int = 3,
    graph_col: str = "graph_id",
    src_col: str = "src",
    rel_col: str = "rel",
    dst_col: str = "dst",
) -> WLResult:
    """Refine per-graph vertex colors for ``rounds`` iterations over the
    labeled triple table ``(graph_id, src, rel, dst)`` (a plain edge
    table works with a constant rel column).  Initial color = h('init')
    — structure-only refinement, so fingerprints compare graphs up to
    vertex RENAMING, the smatch equivalence.  Per round: one
    edges⋈colors join per direction + ONE map-side-combined modular-sum
    aggregation + a stateless rehash projection.
    """
    if rounds < 1:
        raise ValueError(f"wl_refinement: rounds must be >= 1, got {rounds}")
    t = triples.select(
        F.col(graph_col).alias("g"),
        F.col(src_col).alias("src"),
        F.col(rel_col).cast("string").alias("rel"),
        F.col(dst_col).alias("dst"),
    )
    # both directions with a direction tag; the static join side is
    # built once and reused every round
    msgs_edges = (
        t.select(
            "g",
            F.col("src").alias("vertex"),
            F.col("dst").alias("nbr"),
            F.concat(F.lit("out:"), F.col("rel")).alias("tag"),
        )
        .unionByName(
            t.select(
                "g",
                F.col("dst").alias("vertex"),
                F.col("src").alias("nbr"),
                F.concat(F.lit("in:"), F.col("rel")).alias("tag"),
            )
        )
        .persist()
    )
    vertices = msgs_edges.select("g", "vertex").distinct()
    colors = vertices.select(
        "g", "vertex", _h(F.lit("init")).alias("color")
    ).localCheckpoint(eager=True)

    from smatchpp_spark.operators.supersteps import free_local_checkpoint

    for _ in range(rounds):
        nbr_colors = colors.select(
            "g", F.col("vertex").alias("nbr"), F.col("color").alias("nc")
        )
        msums = (
            msgs_edges.join(nbr_colors, ["g", "nbr"])
            .groupBy("g", "vertex")
            .agg(
                F.pmod(
                    F.sum(
                        F.pmod(_h(F.col("tag"), F.col("nc")), F.lit(MOD))
                    ),
                    F.lit(MOD),
                ).alias("msum")
            )
        )
        prev = colors
        colors = (
            colors.join(msums, ["g", "vertex"], "left")
            .select(
                "g",
                "vertex",
                _h(
                    F.col("color"),
                    F.coalesce(F.col("msum"), F.lit(-1)).cast("string"),
                ).alias("color"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(prev)
    msgs_edges.unpersist()

    fps = colors.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.pmod(F.sum(F.pmod(F.col("color"), F.lit(MOD))), F.lit(MOD)).alias(
            "csum"
        ),
    )
    fps = fps.select(
        F.col("g").alias(graph_col),
        "n_vertices",
        _h(F.col("n_vertices").cast("string"), F.col("csum").cast("string"))
        .alias("fingerprint"),
    )
    return WLResult(
        colors=colors.select(
            F.col("g").alias(graph_col), "vertex", "color"
        ),
        fingerprints=fps,
        rounds=rounds,
    )
