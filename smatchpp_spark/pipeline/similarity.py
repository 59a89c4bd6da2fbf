"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force top-k: the query set is broadcast
  (it is small by construction), the corpus side streams through one
  map+aggregate pass, so the plan is scan → broadcast nested loop →
  per-query top-k.  This is the correctness baseline.
* ``bucketed_topk`` — the scale path: a deterministic sign-LSH bucket key
  prunes the candidate set before scoring (IVF-style coarse quantization
  with 2^bits cells).  Both sides shuffle on the bucket key only.

All dot products run in float64 via JVM ``zip_with``/``aggregate`` array
expressions — vectorized, codegen, no Python.  For very wide vectors a
Pandas-UDF BLAS kernel would win; at the 8-64 dims typical of hashed/IVF
sketches the JVM fold is faster than the Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic, engine-portable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output (query_id, neighbor_id, cosine_sim), self-matches excluded,
    ties broken by neighbor id (deterministic across partitionings).

    This is the documented EXACT path: it broadcasts the query side and
    cross-joins it against the full corpus, so cost is
    |queries| x |corpus|.  The ``max_queries`` guard (same discipline as
    dedup's ``max_bucket``) refuses a corpus-sized query side — at that
    scale use the bucketed variants (``bucketed_topk`` /
    ``hyperplane_topk`` / ``ivf_topk``) instead; raise the limit
    explicitly only when the corpus side is known-small.
    """
    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"cosine_topk is the exact all-pairs path: {n_q} query rows "
            f"exceed max_queries={max_queries}. Use bucketed_topk / "
            "hyperplane_topk / ivf_topk for corpus-scale query sides, or "
            "raise max_queries explicitly if the corpus side is small."
        )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _to_double(vec_col).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cosine_sim"))
    )


def sign_bucket(vec_col: Column | str, bits: int = 8) -> Column:
    """Deterministic sign-LSH bucket: bit i = sign of dimension i.

    An axis-aligned random-hyperplane sketch (the axes ARE the planes —
    valid because the test embeddings are isotropic; swap in hashed
    pseudo-random planes for anisotropic data).  Engine-portable: only
    element access and comparisons.
    """
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code + F.when(
            F.element_at(c, i + 1) >= 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return code


def random_planes(dims: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (seeded numpy),
    generated driver-side and shipped into the plan as literals.

    Replaces the axis-aligned default when embeddings are anisotropic:
    axis signs concentrate mass into few buckets if dimensions are
    correlated; random rotations restore the uniform-bucket guarantee of
    sign-LSH (Charikar's SimHash construction)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    p = rng.standard_normal((bits, dims))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in p]


def _plane_lit(plane: list[float]) -> Column:
    return F.array(*[F.lit(x) for x in plane])


def plane_margins(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """array<double> of signed distances to each hyperplane (the fold is
    the same sequential ``dot`` every other path uses)."""
    c = _to_double(vec_col) if isinstance(vec_col, str) else vec_col
    return F.array(*[dot(_plane_lit(p), c) for p in planes])


def margins_to_bucket(margins: Column, bits: int) -> Column:
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code + F.when(
            F.element_at(margins, i + 1) >= 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return code


# pair flips search the 2-bit perturbations among this many lowest-|margin|
# bits (C(8,2)=28 candidate pairs — plenty; keeps the static expression small)
_PAIR_POOL = 8


def probe_buckets(margins: Column, bits: int, probes: int) -> Column:
    """Multi-probe bucket list: the base code, then single-bit flips of
    the ``min(probes, bits)`` lowest-|margin| bits, then — when ``probes``
    exceeds ``bits`` — two-bit flips of the lowest-margin bit PAIRS
    ordered by combined |margin| (the standard multi-probe perturbation
    sequence truncated to singles-then-pairs; Lv et al., multi-probe
    LSH).  The near-boundary buckets are where a true neighbor most
    likely landed.  Deterministic: ties in |margin| break on the lower
    bit index, pair ties on (|m|sum, i, j)."""
    base = margins_to_bucket(margins, bits)
    if probes <= 0:
        return F.array(base)
    by_margin = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(F.element_at(margins, i + 1)).alias("m"),
                    F.lit(i).alias("i"),
                )
                for i in range(bits)
            ]
        )
    )
    def _pow2(icol: Column) -> Column:
        expr = F.lit(0).cast("long")
        for b in range(bits):
            expr = F.when(icol == b, F.lit(1 << b).cast("long")).otherwise(expr)
        return expr

    flips = F.transform(
        F.slice(by_margin, 1, min(probes, bits)),
        lambda s: base.bitwiseXOR(_pow2(s["i"])),
    )
    out = F.concat(F.array(base), flips)
    need_pairs = probes - bits
    pool = min(bits, _PAIR_POOL)
    if need_pairs > 0 and pool >= 2:
        def ent(pos: int):
            return F.element_at(by_margin, pos + 1)

        pair_structs = F.array_sort(
            F.array(
                *[
                    F.struct(
                        (ent(a)["m"] + ent(b)["m"]).alias("m"),
                        ent(a)["i"].alias("i"),
                        ent(b)["i"].alias("j"),
                    )
                    for a in range(pool)
                    for b in range(a + 1, pool)
                ]
            )
        )
        pair_flips = F.transform(
            F.slice(pair_structs, 1, min(need_pairs, pool * (pool - 1) // 2)),
            lambda s: base.bitwiseXOR(_pow2(s["i"])).bitwiseXOR(_pow2(s["j"])),
        )
        out = F.concat(out, pair_flips)
    return out


def bucket_histogram(
    emb: DataFrame, vec_col: str = "embedding", bits: int = 8
) -> DataFrame:
    return (
        emb.select(sign_bucket(vec_col, bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k: score only within the query's sign-LSH bucket.

    The candidate join is an equi-join on the bucket key (uniform fan-out,
    no skew: bucket population is bounded by the data's sign distribution
    and the guard in the dedup module's LSH applies equally here).  Recall
    vs ``cosine_topk`` rises with fewer bits; bits is the knob that trades
    shuffle volume for recall.

    ``planes`` switches from axis-aligned signs to hashed pseudo-random
    hyperplanes (``random_planes``) — required for anisotropic embeddings;
    ``probes`` adds multi-probe on the query side (the base bucket plus
    the nearest-boundary flips), multiplying query fan-out by
    ``1 + probes`` while the corpus stays single-bucketed.  Recall@k is
    measured against ``cosine_topk`` in tests/test_pipeline.py.
    """
    if planes is not None:
        bits = len(planes)
        q_margins = plane_margins(vec_col, planes)
        q_bucket = (
            F.explode(probe_buckets(q_margins, bits, probes))
            if probes > 0
            else margins_to_bucket(q_margins, bits)
        )
        c_bucket = margins_to_bucket(plane_margins(vec_col, planes), bits)
    else:
        q_bucket = sign_bucket(vec_col, bits)
        c_bucket = sign_bucket(vec_col, bits)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(vec_col).alias("qv"),
        q_bucket.alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(vec_col).alias("cv"),
        c_bucket.alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
        )
    )
    if probes > 0:
        # multi-probe can surface the same candidate through several
        # buckets; dedup before ranking (single-bucket paths can't
        # duplicate — skip the extra exchange there)
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cosine_sim"))
    )


# --------------------------------------------------------------------------
# IVF-style ANN: coarse-quantizer cells + nprobe search
# --------------------------------------------------------------------------

def unit_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF coarse codebook: the ``n_cells`` lowest-id
    vectors, L2-normalized driver-side.

    This is the oracle-replayable fallback: an engine replaying the
    oracle SQL can reproduce it exactly.  For production recall use
    ``kmeans_centroids`` (spherical k-means over a deterministic
    sample) — same return contract, strictly better cell geometry on
    clustered data (tested).  Normalization uses a
    left-to-right float64 sum so an oracle engine recomputing
    ``v / sqrt(Σ v²)`` gets bit-identical centroids.
    """
    import math

    rows = (
        corpus.select(F.col(id_col).alias("i"), _to_double(vec_col).alias("v"))
        .orderBy("i")
        .limit(n_cells)
        .collect()
    )
    out = []
    for r in rows:
        v = [float(x) for x in r.v]
        n = math.sqrt(sum(x * x for x in v))
        out.append([x / n for x in v] if n > 0 else v)
    return out


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 5,
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> list[list[float]]:
    """Spherical k-means IVF codebook trained in-Spark over a
    deterministic hash-sample — the production-grade replacement for
    ``unit_centroids`` (which remains the oracle-replayable fallback).

    Lloyd iterations, all distributed, K·d driver bytes per round:

    1. **Sample** — rows where ``pmod(xxhash64(id, seed), 10^6) <
       fraction·10^6``: deterministic (rerun/resume picks the identical
       sample), no sort, filter rides the scan.
    2. **Init** — the ``n_cells`` sampled vectors with the smallest
       ``xxhash64(id, seed+1)``: a seeded random draw without an RNG.
    3. **Assign** — ``cell_assign`` with the current codebook inlined as
       plan literals (one codegen pass, no shuffle beyond the agg).
    4. **Update** — element-wise mean per cell via ``posexplode`` →
       ``groupBy(cell, pos)`` avg (map-side combined); K·d rows come
       back to the driver, are L2-normalized (spherical k-means — the
       cells rank by cosine, so centroids live on the unit sphere), and
       become the next round's literals.  Empty cells keep their
       previous centroid.

    100 TB shape: per iteration one scan of the SAMPLE (not the corpus)
    + one map-side-combined agg; the codebook never exceeds driver
    scale (K ≤ ~1k cells × d dims).  Deterministic up to floating-point
    reduction order in the distributed mean (the sample/init/argmax
    logic is exactly reproducible; tests assert recall, not bits).
    """
    import math

    if n_cells <= 0:
        raise ValueError("ivf: n_cells must be positive")
    m = 10**6
    sample = corpus.select(
        F.col(id_col).alias("i"), _to_double(vec_col).alias("v")
    )
    if sample_fraction < 1.0:
        sample = sample.filter(
            F.pmod(F.xxhash64("i", F.lit(seed)), F.lit(m))
            < F.lit(int(sample_fraction * m))
        )
    sample = sample.persist()
    try:
        init_rows = (
            sample.orderBy(F.xxhash64("i", F.lit(seed + 1)), "i")
            .limit(n_cells)
            .collect()
        )
        if not init_rows:
            raise ValueError("ivf: empty codebook (corpus had no vectors?)")

        def _unit(v: list[float]) -> list[float]:
            n = math.sqrt(sum(x * x for x in v))
            return [x / n for x in v] if n > 0 else v

        centroids = [_unit([float(x) for x in r.v]) for r in init_rows]
        for _ in range(n_iter):
            assigned = sample.select(
                cell_assign(F.col("v"), centroids), F.col("v")
            )
            means = (
                assigned.select("cell", F.posexplode("v").alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.avg("x").alias("m"))
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in means:
                by_cell.setdefault(int(r.cell), {})[int(r.pos)] = float(r.m)
            new = []
            for i, prev in enumerate(centroids):
                got = by_cell.get(i)
                if got:
                    new.append(_unit([got[p] for p in range(len(prev))]))
                else:
                    new.append(prev)
            if new == centroids:
                break
            centroids = new
        return centroids
    finally:
        sample.unpersist()


def _cell_structs(vec: Column, centroids: list[list[float]]) -> list[Column]:
    """(similarity, -cell_id) structs — ranking by dot with UNIT centroids
    equals ranking by cosine (the per-row ||v|| factor is a shared
    positive constant), so no per-row norm is recomputed per centroid
    (projection collapse would inline it K times)."""
    return [
        F.struct(dot(_plane_lit(c), vec).alias("s"), F.lit(-i).alias("n"))
        for i, c in enumerate(centroids)
    ]


def cell_assign(vec_col: Column | str, centroids: list[list[float]]) -> Column:
    """IVF cell id: argmax cosine over the codebook, ties to the lower
    cell id — a single ``array_max`` over (sim, -id) structs (one
    aggregation-free pass, each dot product evaluated exactly once)."""
    if not centroids:
        raise ValueError("ivf: empty codebook (corpus had no vectors?)")
    vec = _to_double(vec_col) if isinstance(vec_col, str) else vec_col
    return (-F.array_max(F.array(*_cell_structs(vec, centroids)))["n"]).alias(
        "cell"
    )


def probe_cells(
    vec_col: Column | str, centroids: list[list[float]], nprobe: int
) -> Column:
    """The ``nprobe`` nearest cells for a query vector, nearest first
    (sim desc, cell id asc — consistent with ``cell_assign``'s argmax)."""
    if not centroids:
        raise ValueError("ivf: empty codebook (corpus had no vectors?)")
    vec = _to_double(vec_col) if isinstance(vec_col, str) else vec_col
    ranked = F.reverse(F.array_sort(F.array(*_cell_structs(vec, centroids))))
    return F.transform(
        F.slice(ranked, 1, min(nprobe, len(centroids))), lambda s: -s["n"]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: score only corpus vectors whose cell
    is among the query's ``nprobe`` nearest cells.

    100 TB shape: the corpus computes its cell inside the scan projection
    (whole-stage codegen, zero extra shuffle, the codebook rides the plan
    as literals); the exploded query side is tiny and broadcast, so the
    only exchange is the per-query top-k window over candidates — a
    ``|corpus| * nprobe / n_cells`` row subset.  ``nprobe == n_cells``
    degrades gracefully to the exact ``cosine_topk`` semantics (tested).
    For codebooks too large to inline (>~1k cells), swap the literal
    array for a broadcast centroid table + ``min(struct())`` argmax — the
    operator contract is unchanged.

    Cells are disjoint per corpus row and probes are distinct per query,
    so no candidate deduplication pass is needed (unlike multi-probe LSH).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(vec_col).alias("qv"),
        F.explode(probe_cells(vec_col, centroids, nprobe)).alias("cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(vec_col).alias("cv"),
        cell_assign(vec_col, centroids),
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cosine_sim"))
    )


# --------------------------------------------------------------------------
# Product quantization: per-subspace codebooks + ADC search
# --------------------------------------------------------------------------

def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as a sequential left-to-right fold —
    deterministic and engine-portable (the ``dot`` discipline)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 0,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011, public): the
    vector is split into ``m`` contiguous subspaces; each subspace gets
    its own ``n_codes``-centroid codebook.

    ``n_iter=0`` (default) is the deterministic oracle-replayable
    seeding — subspace slices of the ``n_codes`` lowest-id vectors
    (the ``unit_centroids`` discipline).  ``n_iter>0`` refines every
    subspace simultaneously with Lloyd iterations run IN Spark: one
    explode to (vec, subspace) rows, per-iteration argmin assignment +
    ``groupBy(subspace, code)`` mean — map-side combinable, and only
    ``m * n_codes`` centroid rows ever reach the driver.  Empty cells
    keep their previous centroid (no respawn → deterministic).

    Returns ``codebooks[j][c]`` = centroid ``c`` of subspace ``j``.
    """
    head = (
        corpus.select(F.col(id_col).alias("i"), _to_double(vec_col).alias("v"))
        .orderBy("i")
        .limit(n_codes)
        .collect()
    )
    dims = len(head[0].v)
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    d0 = dims // m
    books = [
        [[float(x) for x in r.v[j * d0 : (j + 1) * d0]] for r in head]
        for j in range(m)
    ]
    if n_iter == 0:
        return books

    subs = corpus.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(_to_double(vec_col), j * d0 + 1, d0).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s")
    ).select("s.j", "s.sv").persist()
    for _ in range(n_iter):
        # argmin is PER SUBSPACE: each row only evaluates its own j's
        # codebook (the when() guard), then coalesce picks that column
        assign = subs.select(
            "j",
            "sv",
            *[
                F.when(
                    F.col("j") == j,
                    F.least(
                        *[
                            F.struct(
                                l2sq(
                                    F.col("sv"),
                                    F.array(*[F.lit(x) for x in books[j][c]]),
                                ).alias("d"),
                                F.lit(c).alias("c"),
                            )
                            for c in range(n_codes)
                        ]
                    )["c"],
                ).alias(f"c{j}")
                for j in range(m)
            ],
        ).select(
            "j", "sv", F.coalesce(*[F.col(f"c{j}") for j in range(m)]).alias("code")
        )
        rows = (
            assign.groupBy("j", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("sv", i + 1)).alias(f"s{i}")
                    for i in range(d0)
                ],
            )
            .collect()
        )
        for r in rows:
            if r["n"] > 0:
                books[r["j"]][r["code"]] = [
                    r[f"s{i}"] / r["n"] for i in range(d0)
                ]
    subs.unpersist()
    return books


def _pq_code_cols(
    vec: Column, codebooks: list[list[list[float]]]
) -> list[Column]:
    """One argmin-code column per subspace (ties → lower code id)."""
    m = len(codebooks)
    d0 = len(codebooks[0][0])
    out = []
    for j in range(m):
        sub = F.slice(vec, j * d0 + 1, d0)
        out.append(
            F.least(
                *[
                    F.struct(
                        l2sq(sub, F.array(*[F.lit(x) for x in cent])).alias("d"),
                        F.lit(c).alias("c"),
                    )
                    for c, cent in enumerate(codebooks[j])
                ]
            )["c"].alias(f"code{j}")
        )
    return out


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its ``m`` subspace code ids:
    ``(vec_id, codes array<int>)`` — dims → m small ints, the 100 TB
    compression that makes re-ranking candidate sets memory-resident.
    The encoding is a scan projection (codebooks ride the plan as
    literals, whole-stage codegen, no shuffle, no UDF)."""
    m = len(codebooks)
    v = _to_double(vec_col)
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.array(*[c for c in _pq_code_cols(v, codebooks)]).alias("codes"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC approximate top-k by squared L2: candidates share the
    query's SUBSPACE-0 code (the code doubles as a coarse IVF cell, so
    candidate generation is an equi-join on the cell key — never
    all-pairs; compose with ``ivf_topk`` cells for a finer coarse
    quantizer), then the asymmetric distance computation scores each
    candidate as Σ_j ||q_j − centroid_j(code_j)||² — the query side
    stays un-quantized, the corpus side is m small ints.

    Output: ``(query_id, neighbor_id, approx_dist)`` — ascending
    distance, ties to the lower neighbor id, rounded to 6.
    """
    m = len(codebooks)
    d0 = len(codebooks[0][0])
    qv = _to_double(vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("q"),
        _pq_code_cols(qv, codebooks)[0].alias("cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.array(*_pq_code_cols(_to_double(vec_col), codebooks)).alias("codes"),
    ).withColumn("cell", F.element_at("codes", 1))
    adc = None
    for j in range(m):
        cb_lit = F.array(
            *[F.array(*[F.lit(x) for x in cent]) for cent in codebooks[j]]
        )
        term = l2sq(
            F.slice(F.col("q"), j * d0 + 1, d0),
            F.element_at(cb_lit, F.element_at(F.col("codes"), j + 1) + 1),
        )
        adc = term if adc is None else adc + term
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("dist", 6).alias("approx_dist"))
    )


# --------------------------------------------------------------------------
# Scalar quantization (int8-style): per-dimension affine codes + ADC
# --------------------------------------------------------------------------

def sq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) bounds over the corpus — the scalar
    quantizer's whole trained state: d pairs of doubles to the driver
    (one posexplode + one map-side-combined agg), shipped back as plan
    literals like the IVF/PQ codebooks."""
    rows = (
        corpus.select(F.posexplode(_to_double(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("d")
        .collect()
    )
    return [(float(r.lo), float(r.hi)) for r in rows]


def _sq_decode(codes: Column, bounds: list[tuple[float, float]]) -> Column:
    """codes array<int> → reconstructed array<double> via the affine
    x̂_i = lo_i + code_i·(hi_i − lo_i)/255 (plan literals, codegen)."""
    lo = F.array(*[F.lit(b[0]) for b in bounds])
    sc = F.array(*[F.lit((b[1] - b[0]) / 255.0) for b in bounds])
    return F.zip_with(
        F.zip_with(codes, lo, lambda c, l: F.struct(c.alias("c"), l.alias("l"))),
        sc,
        lambda cl, s: cl["l"] + cl["c"].cast("double") * s,
    )


def sq_encode(
    corpus: DataFrame,
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int> in [0, 255]) — int8-style affine codes.

    ``floor(t·255 + 0.5)`` (identical semantics in every engine, unlike
    ROUND's half-up/half-even ambiguity) with clamping for values at or
    beyond the trained bounds; a zero-width dimension codes to 0.  A
    scan projection — bounds are plan literals, no shuffle, no UDF.
    On-disk the 0-255 codes bit-pack to ~1 byte/dim in parquet — the
    4x over float32 (8x over float64) that keeps a 100 TB corpus's
    re-rank set memory-resident; ``array<int>`` is the in-plan model.
    """
    lo = F.array(*[F.lit(b[0]) for b in bounds])
    inv = F.array(
        *[
            F.lit(0.0 if b[1] <= b[0] else 255.0 / (b[1] - b[0]))
            for b in bounds
        ]
    )
    v = _to_double(vec_col)
    t = F.zip_with(
        F.zip_with(v, lo, lambda x, l: x - l),
        inv,
        lambda d, s: d * s,
    )
    codes = F.transform(
        t,
        lambda x: F.greatest(
            F.lit(0),
            F.least(F.lit(255), F.floor(x + F.lit(0.5)).cast("int")),
        ),
    )
    return corpus.select(F.col(id_col).alias("vec_id"), codes.alias("codes"))


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bounds: list[tuple[float, float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
) -> DataFrame:
    """Asymmetric scalar-quantized top-k by cosine: the query stays
    un-quantized, the corpus side is its int8-style codes decoded
    inside the scoring expression.  Same exact-path shape and
    ``max_queries`` guard as ``cosine_topk`` (brute force over the
    corpus — compose with the LSH/IVF bucketed paths for candidate
    pruning at scale); output (query_id, neighbor_id, sq_sim rounded 6),
    self-matches excluded, ties by neighbor id."""
    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"sq_topk exact path: {n_q} queries > max_queries="
            f"{max_queries}; prune candidates first"
        )
    if bounds is None:
        bounds = sq_train(corpus, id_col, vec_col)
    enc = sq_encode(corpus, bounds, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(vec_col).alias("qv")
    )
    c = enc.select(
        F.col("vec_id").alias("neighbor_id"),
        _sq_decode(F.col("codes"), bounds).alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sq_sim"))
    )
