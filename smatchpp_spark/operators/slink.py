"""Single-linkage clustering at scale — MSF + threshold cut.

The classic equivalence (Gower & Ross 1969, public): single-linkage
clusters at distance threshold ``t`` are exactly the connected
components of the graph restricted to edges with weight ≤ t, and the
minimum spanning forest preserves them — an edge of weight ≤ t lies on
the MSF path between any pair it connects (Kruskal's invariant), so

    CC({e ∈ G : w(e) ≤ t})  ==  CC({e ∈ MSF(G) : w(e) ≤ t}).

That identity IS the scale story: the naive cut runs hash-min CC over
the full edge set per threshold; the MSF form pays Borůvka once
(O(log V) rounds, operators/msf.py) and then EVERY cut — a threshold
sweep, a dendrogram level, a cluster-count target — is a filter plus
CC over at most V−1 forest edges.  At 10^12 edges / 10^9 vertices
that's a 1000× smaller CC input per cut, and the forest is the only
state kept between cuts.

Cross-engine determinism: the cut is a pure set construction (filter +
hash-min CC), so cluster labels are the component-minimum vertex ids —
no tie-breaking, bit-identical in any engine.  The DuckDB oracle uses
the INDEPENDENT left side of the identity (recursive CC over the
thresholded original graph) — it never replays Borůvka, so a forest
bug and an oracle bug cannot cancel.

``single_linkage_k`` (cut to a target cluster count) drops the k−c₀
heaviest forest edges by the total order (weight, a, b) — ties are
broken deterministically, and the edges are driver-collected only when
k is small (the IVF-codebook literal-shipping pattern,
pipeline/similarity.py); the threshold form never collects.

Beyond the reference's operator set (its 20-node AMRs need no
clustering); contract style follows operators/msf.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.components import connected_components
from smatchpp_spark.operators.msf import MSFResult, minimum_spanning_forest


@dataclass
class SingleLinkageResult:
    clusters: DataFrame  # (vertex, cluster) — cluster = min member id
    forest: DataFrame  # the MSF (a, b, weight)
    n_clusters: int
    msf_rounds: int
    converged: bool


def _cut(
    vertices: DataFrame, kept_forest: DataFrame, cc_supersteps: int
) -> DataFrame:
    """CC over the kept forest edges; vertices outside every kept edge
    are singleton clusters labeled by themselves."""
    cc = connected_components(
        kept_forest.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ),
        max_supersteps=cc_supersteps,
    )
    return vertices.join(cc.components, "vertex", "left").select(
        "vertex",
        F.coalesce("component", "vertex").alias("cluster"),
    )


def _require_complete(msf: MSFResult) -> None:
    """A TRUNCATED Borůvka run yields a partial forest whose threshold
    cut over-fragments (missing forest edges read as cuts) — refuse
    loudly rather than return silently-wrong clusters."""
    if not msf.converged:
        raise ValueError(
            "single_linkage needs a complete MSF: Borůvka did not "
            "converge within max_rounds — raise max_rounds (the forest "
            "is truncated, so cut clusters would over-fragment)"
        )


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .filter(F.col("vertex").isNotNull())
        .distinct()
    )


def single_linkage(
    edges: DataFrame,
    threshold,
    weight_col: str = "weight",
    max_rounds: int = 20,
    cc_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    msf: MSFResult | None = None,
) -> SingleLinkageResult:
    """Single-linkage clusters of the undirected weighted graph spanned
    by ``edges`` at distance ``threshold`` (inclusive: an edge with
    weight == threshold merges).  Self-loops dropped, parallel edges
    collapsed to their minimum weight (so a pair connects iff ANY
    parallel edge is ≤ threshold — same as the raw thresholded graph).

    Pass a precomputed ``msf`` to sweep several thresholds for one
    Borůvka run — each extra cut costs one filter + one forest-sized
    CC."""
    if msf is None:
        msf = minimum_spanning_forest(
            edges,
            weight_col=weight_col,
            max_rounds=max_rounds,
            cc_supersteps=cc_supersteps,
            checkpoint_dir=checkpoint_dir,
            resume=resume,
        )
    _require_complete(msf)
    kept = msf.forest.filter(F.col("weight") <= threshold)
    verts = _vertices(edges)
    clusters = _cut(verts, kept, cc_supersteps).localCheckpoint(eager=True)
    n_clusters = int(verts.count()) - int(kept.count())  # forest is acyclic
    return SingleLinkageResult(
        clusters=clusters,
        forest=msf.forest,
        n_clusters=n_clusters,
        msf_rounds=msf.rounds,
        converged=msf.converged,
    )


def single_linkage_k(
    edges: DataFrame,
    k: int,
    weight_col: str = "weight",
    max_rounds: int = 20,
    cc_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    msf: MSFResult | None = None,
) -> SingleLinkageResult:
    """Cut the dendrogram at exactly ``k`` clusters (if reachable):
    drop the ``k − c₀`` heaviest forest edges by the total order
    (weight desc, a desc, b desc), where c₀ is the component count of
    the full forest.  If the graph has more than ``k`` components
    already, the full forest is kept (k is a floor, not reachable).

    The dropped edges are driver-collected (≤ k rows — the literal-
    shipping pattern); keep ``k`` small or use ``single_linkage`` with
    a threshold."""
    if k < 1:
        raise ValueError(f"single_linkage_k: k must be >= 1, got {k}")
    if msf is None:
        msf = minimum_spanning_forest(
            edges,
            weight_col=weight_col,
            max_rounds=max_rounds,
            cc_supersteps=cc_supersteps,
            checkpoint_dir=checkpoint_dir,
            resume=resume,
        )
    _require_complete(msf)
    verts = _vertices(edges)
    n_vertices = int(verts.count())
    c0 = n_vertices - msf.n_edges
    # cap at the forest size: k > |V| yields all-singletons, honestly
    n_drop = min(max(0, k - c0), msf.n_edges)
    if n_drop == 0:
        kept = msf.forest
    else:
        dropped = (
            msf.forest.orderBy(
                F.col("weight").desc(), F.col("a").desc(), F.col("b").desc()
            )
            .limit(n_drop)
            .collect()
        )
        cond = F.lit(False)
        for row in dropped:
            cond = cond | (
                (F.col("a") == F.lit(row["a"]))
                & (F.col("b") == F.lit(row["b"]))
            )
        kept = msf.forest.filter(~cond)
    clusters = _cut(verts, kept, cc_supersteps).localCheckpoint(eager=True)
    return SingleLinkageResult(
        clusters=clusters,
        forest=msf.forest,
        n_clusters=c0 + n_drop,
        msf_rounds=msf.rounds,
        converged=msf.converged,
    )


def dendrogram(forest: DataFrame) -> DataFrame:
    """The single-linkage merge sequence: forest edges ranked by the
    total order (weight, a, b) — merge ``i`` joins the clusters of
    ``a`` and ``b`` at height ``weight``.

    DELIBERATE single-partition window: a dendrogram is a driver-side
    artifact (plots, scipy handoff) consumed whole, so this surface is
    for forests that fit one task.  At web scale don't materialize a
    10^9-row merge list — cut by ``single_linkage(threshold=...)``
    (distributed, forest-sized CC) and sweep thresholds instead."""
    from pyspark.sql import Window

    w = Window.orderBy("weight", "a", "b")
    return forest.select(
        F.row_number().over(w).alias("merge_idx"), "a", "b", "weight"
    )
