"""TrustRank and spam mass over the directed link graph.

TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004, public
algorithm) is PageRank with the teleport vector restricted to a
hand-vetted set of trusted seed pages: trust flows out of the seeds
along links, attenuated by the damping factor, so pages reachable only
through spam neighborhoods receive (almost) none.  Spam mass (Gyongyi
et al., VLDB 2006) inverts the idea: the fraction of a page's PageRank
that does NOT come from the trusted core estimates how much of its
rank is spam-made.

Both are compositions of the existing ``pagerank`` operator — TrustRank
IS personalized PageRank on the seed set, and spam mass is an
element-wise expression over the two rank vectors — so the 100 TB plan
shape is exactly pagerank.py's audited one (static contrib side
hash-partitioned once; two shuffles per superstep; map-side-combined
hub aggregation) run twice, plus one final vertex-keyed join.

Definitions held here (oracle-replayable, fixed ``supersteps``):
  * ``rank``   — uniform-teleport PageRank, dangling mass uniform;
  * ``ppr``    — personalized PageRank, teleport uniform over the seed
    set (sums to 1), restart and dangling mass follow the teleport;
  * ``trust``  — the paper's core-based score: ``ppr * n_seed / n``
    (by the fixed-point scaling law, PPR with teleport mass
    ``n_seed/n`` spread 1/n per seed — directly comparable to ``rank``,
    whose teleport puts 1/n on every page);
  * ``spam_mass`` — relative spam mass ``(rank - trust) / rank``
    (rank > 0 always: the uniform teleport floor is (1-alpha)/n).
    Values near 1 = rank made without the trusted core; values ≤ 0
    (trust exceeding rank, common on/near seeds) mean "not spam".

Beyond the reference's operator set (its scoring pipeline has no graph
centralities); contract style follows operators/pagerank.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.pagerank import PageRankResult, pagerank


@dataclass
class TrustRankResult:
    scores: DataFrame  # (vertex, rank, trust, spam_mass — all double)
    pagerank: PageRankResult
    trustrank: PageRankResult
    n_seeds: int


def trustrank_spam_mass(
    edges: DataFrame,
    trusted: "DataFrame | list",
    alpha: float = 0.85,
    max_supersteps: int = 100,
    tol: float = 1e-10,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
) -> TrustRankResult:
    """Run uniform PageRank and seed-personalized PageRank over the same
    ``edges(src, dst)`` (same alpha / superstep budget / tolerance) and
    join them into the spam-mass table.  ``trusted`` is the seed set —
    a DataFrame's first column or a Python list; seeds absent from the
    graph are ignored by the personalized run's own semantics (it
    raises only when NO seed is present, pagerank.py).
    """
    pr = pagerank(
        edges,
        alpha=alpha,
        tol=tol,
        max_supersteps=max_supersteps,
        checkpoint_dir=checkpoint_dir,
        num_partitions=num_partitions,
        input_lineage="trustrank:pr",
    )
    tr = pagerank(
        edges,
        alpha=alpha,
        tol=tol,
        max_supersteps=max_supersteps,
        checkpoint_dir=checkpoint_dir,
        num_partitions=num_partitions,
        sources=trusted,
        input_lineage="trustrank:ppr",
    )
    # n and n_seed as 1-row aggregates broadcast into the projection —
    # NOT driver-side counts of the (possibly huge) vertex set beyond
    # what pagerank already materialized
    verts = pr.ranks.select("vertex")
    n = verts.count()
    if isinstance(trusted, DataFrame):
        seeds = trusted.select(
            F.col(trusted.columns[0]).alias("vertex")
        ).distinct()
        n_seed = seeds.join(verts, "vertex", "left_semi").count()
    else:
        n_seed = (
            verts.filter(F.col("vertex").isin(list(trusted))).count()
        )
    scale = float(n_seed) / float(n) if n else 0.0
    scores = (
        pr.ranks.join(
            tr.ranks.withColumnRenamed("rank", "ppr"), "vertex", "left"
        )
        .select(
            "vertex",
            "rank",
            (F.coalesce("ppr", F.lit(0.0)) * F.lit(scale)).alias("trust"),
        )
        .select(
            "vertex",
            "rank",
            "trust",
            ((F.col("rank") - F.col("trust")) / F.col("rank")).alias(
                "spam_mass"
            ),
        )
    )
    return TrustRankResult(
        scores=scores, pagerank=pr, trustrank=tr, n_seeds=n_seed
    )
