"""Domain-mixture sampling — the data-mixing step between dedup and
sequence packing in an LLM training pipeline.

Temperature-weighted domain sampling (the multilingual-LM recipe,
e.g. Conneau & Lample 2019 §3.1, public): a domain with corpus share
``q_d`` is sampled proportionally to ``q_d^alpha`` — ``alpha = 1``
keeps the natural mix, ``alpha < 1`` flattens it toward uniform
(upweights rare domains), ``alpha = 0`` is fully uniform.

The draw is a deterministic inverse-CDF hash draw (the
``poisson_weights`` discipline, functions/scores.py:388): every doc gets
``u = portable_hash64(id:seed) / 2^60`` ∈ [0,1) and is kept iff
``u < p_domain``, so the sample is reproducible, engine-portable, and
oracle-replayable row by row.

Float parity contract: with ``alpha`` ∈ {1.0, 0.5} every arithmetic
step is a correctly-rounded IEEE-754 operation applied in a fixed
order — domain shares (exact division), ``sqrt`` (correctly rounded),
the domain-weight normalizer summed by an ordered left fold in
ascending-domain order, then two multiplies + two divides — so the
keep probabilities are BIT-IDENTICAL between Python (driver), Spark
(plan literals), and the DuckDB oracle; the ``u < p`` decision can
never flip across engines.  Other ``alpha`` values use ``pow``, which
is not correctly rounded — documented, and not used by the contract.

Scale shape at 100 TB: one map-side-combined groupBy produces the
K-domain count table (K = dozens; collected driver-side like the IVF
codebook, pipeline/similarity.py:314), keep probabilities ship back as
plan literals in a ``CASE``-free ``create_map`` lookup — the corpus
scan is a single stateless projection + filter, no join, no second
shuffle, trivially streamable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import portable_hash64

_TWO60 = float(1 << 60)


def domain_keep_probs(
    counts: list[tuple[str, int]],
    alpha: float = 0.5,
    target_rate: float = 0.5,
) -> dict[str, float]:
    """Per-domain keep probability for temperature ``alpha`` and an
    expected overall sampling rate ``target_rate``.

    ``p_d = min(1, target_rate · N · w_d / c_d)`` with
    ``w_d = (c_d/N)^alpha / Σ_e (c_e/N)^alpha`` — the fold order of the
    normalizer is ascending domain name (parity contract above).
    Domains whose raw rate caps at 1 make the realized total rate land
    slightly under ``target_rate`` (standard; re-normalizing would
    break the per-domain closed form the oracle replays)."""
    if not counts:
        return {}
    total = 0
    for _, c in counts:
        total += c
    t: dict[str, float] = {}
    for d, c in counts:
        q = c / float(total)
        if alpha == 1.0:
            t[d] = q
        elif alpha == 0.5:
            t[d] = math.sqrt(q)
        else:  # not correctly rounded — engines may differ by ulps
            t[d] = q ** alpha
    s = 0.0
    for d in sorted(t):  # ordered left fold — see parity contract
        s += t[d]
    return {
        d: min(1.0, ((target_rate * float(total)) * (t[d] / s)) / float(c))
        for d, c in counts
    }


def domain_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    target_rate: float = 0.5,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic temperature-weighted domain sampling.

    Output: ``(doc_id, domain, p_keep, keep)`` for EVERY input doc —
    ``p_keep`` rounded to 9 dp for display, ``keep`` decided on the
    unrounded probability.  Callers filter ``keep`` and feed the
    survivors onward (e.g. ``packing.pack_sequences``).
    """
    spark = docs.sparkSession
    counts = [
        (r["domain"], r["cnt"])
        for r in docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # K-domain table — driver-side by design (see module doc)
    ]
    probs = domain_keep_probs(counts, alpha=alpha, target_rate=target_rate)
    if not probs:
        return spark.createDataFrame(
            [], f"{id_col} long, domain string, p_keep double, keep boolean"
        )
    pmap = F.create_map(
        *[x for d in sorted(probs) for x in (F.lit(d), F.lit(probs[d]))]
    )
    u = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ).cast("double") / F.lit(_TWO60)
    p = pmap[F.col(domain_col)]
    return docs.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        F.round(p, 9).alias("p_keep"),
        (u < p).alias("keep"),
    )


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic train/val/test (or any named) split by hash.

    Every doc draws the same ``u = portable_hash64(id:seed) / 2^60`` as
    ``domain_mixture`` and is assigned to the first split whose
    cumulative upper boundary exceeds ``u`` — boundaries are computed
    driver-side in the dict's insertion order and shipped as plan
    literals, so the assignment is reproducible, engine-portable, and
    stable under any repartitioning or re-run (the property a training
    pipeline needs: a doc never migrates between splits).

    ``fractions`` must sum to 1.0 (±1e-9).  Output:
    ``(doc_id, u, split)`` with ``u`` rounded to 9 dp for display; the
    assignment uses the unrounded draw.

    Scale shape at 100 TB: stateless projection, no shuffle, no join —
    runs at scan speed with only the id column read.
    """
    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = 0.0
    for f in fractions.values():
        total += f
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    u = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ).cast("double") / F.lit(_TWO60)
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return docs.select(
        F.col(id_col),
        F.round(u, 9).alias("u"),
        split.alias("split"),
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: str | None = None,
    seed: int = 7,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — the A-ES one-pass scheme
    (Efraimidis & Spirakis 2006, public): every row draws
    ``u = portable_hash64(id:seed) / 2^60`` and gets the sample key
    ``ln(u) / w`` (the log form of ``u^(1/w)``, monotone-equivalent and
    numerically stable); the ``k`` LARGEST keys are the sample.  Items
    with non-positive weight are excluded (zero weight can never be
    drawn; negative is invalid).

    ``by`` selects per-stratum sampling: k rows per distinct ``by``
    value via one window over the stratum (use for balanced per-domain
    subcorpora); otherwise a global TakeOrdered top-k — no full sort,
    per-partition heaps merge at the driver side of the plan.

    The hash draw makes the sample deterministic, engine-portable
    (DuckDB oracle replays it row by row), and stable under
    repartitioning/re-runs — the property a training pipeline needs.

    Output: ``(id[, by], weight, sample_key)`` with ``sample_key``
    rounded to 9 dp for display; selection uses the unrounded key.
    """
    if k <= 0:
        raise ValueError(f"weighted_sample: k must be positive, got {k}")
    u = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ).cast("double") / F.lit(_TWO60)
    # u == 0.0 (one hash value in 2^60) would give ln(0) = -inf; nudge
    # into (0, 1) identically in both engines
    u = F.greatest(u, F.lit(2.0 ** -60))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    base = docs.filter(w > 0).select(
        F.col(id_col),
        *([F.col(by)] if by else []),
        w.alias("weight"),
        key.alias("_k"),
    )
    if by:
        from pyspark.sql import Window

        win = Window.partitionBy(by).orderBy(
            F.col("_k").desc(), F.col(id_col)
        )
        out = (
            base.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    else:
        out = base.orderBy(F.col("_k").desc(), F.col(id_col)).limit(k)
    return out.select(
        id_col,
        *([by] if by else []),
        "weight",
        F.round("_k", 9).alias("sample_key"),
    )


# --------------------------------------------------------------------------
# DSIR — data selection with importance resampling
# --------------------------------------------------------------------------


def _hashed_gram_buckets(text_col: str, n_buckets: int, portable: bool) -> "F.Column":
    """Array of hashed n-gram bucket ids (lowercased whitespace
    unigrams + bigrams, DSIR's feature space) for one document."""
    from smatchpp_spark.functions.hashing import hash64
    from smatchpp_spark.pipeline.text import tokens

    toks = F.transform(tokens(text_col), F.lower)
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, 2), " ")
    )
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams, lambda g: F.pmod(hash64(g, portable=portable), F.lit(n_buckets))
    )


def _bucket_counts(
    docs: DataFrame, text_col: str, n_buckets: int, portable: bool
) -> DataFrame:
    """(bucket, cnt) over the corpus — explode + ONE map-side-combined
    groupBy; output bounded by n_buckets rows per partition."""
    return (
        docs.select(
            F.explode(
                _hashed_gram_buckets(text_col, n_buckets, portable)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_importance(
    source: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Per-source-document DSIR importance log-weight (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public): build hashed-n-gram bag-of-words models of the TARGET and
    SOURCE corpora (unigrams + bigrams hashed into ``n_buckets``), and
    score each source document by

        log w(x) = Σ_{g ∈ grams(x)} [ log p̂_target(b(g))
                                      − log p̂_source(b(g)) ]

    with add-``alpha`` smoothed bucket probabilities.  Documents whose
    grams are relatively more likely under the target model get higher
    weight; resampling by ``exp(log w)`` shifts the source mix toward
    the target domain.

    Output: ``(doc_id, n_grams, log_weight)`` — ``log_weight``
    unrounded (round at the sink for cross-engine hashing), 0.0 for
    gram-less documents.

    Scale shape at 100 TB: two map-side-combined bucket-count
    aggregations (≤ ``n_buckets`` rows per partition each), the
    per-bucket log-ratio table is ≤ ``n_buckets`` rows and BROADCAST
    into the per-doc scoring join; the scoring pass is explode →
    broadcast join → one doc-keyed groupBy — a single shuffle keyed by
    doc, partition sizes track document length, never corpus size.
    The two scalar totals ride along as 1-row crossJoins (the
    PageRank dangling-mass pattern), so nothing is collected."""
    if n_buckets <= 0:
        raise ValueError(f"dsir_importance: n_buckets must be positive, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"dsir_importance: alpha must be positive, got {alpha}")

    tc = _bucket_counts(target, text_col, n_buckets, portable)
    sc = _bucket_counts(source, text_col, n_buckets, portable)
    t_tot = tc.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("t_total"))
    s_tot = sc.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("s_total"))

    ab = float(alpha) * n_buckets
    lam = (
        sc.withColumnRenamed("cnt", "s_cnt")
        .join(tc.withColumnRenamed("cnt", "t_cnt"), "bucket", "full_outer")
        .crossJoin(t_tot)
        .crossJoin(s_tot)
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("t_cnt", F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("t_total") + F.lit(ab))
                )
                - F.log(
                    (F.coalesce("s_cnt", F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("s_total") + F.lit(ab))
                )
            ).alias("lam"),
        )
    )

    per_gram = source.select(
        F.col(id_col),
        F.explode_outer(
            _hashed_gram_buckets(text_col, n_buckets, portable)
        ).alias("bucket"),
    )
    scored = (
        per_gram.join(F.broadcast(lam), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("bucket")).alias("n_grams"),
            F.coalesce(F.sum("lam"), F.lit(0.0)).alias("log_weight"),
        )
    )
    return scored


def dsir_select(
    source: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
    portable: bool = False,
) -> DataFrame:
    """DSIR's resampling step: Gumbel-top-k over the importance
    log-weights — ``key = log w(x) + Gumbel(u_x)`` with the
    deterministic portable-hash draw ``u_x`` (Gumbel-max gives a
    sample WITHOUT replacement proportional to ``exp(log w)``, the
    log-domain twin of the A-ES scheme in ``weighted_sample`` — no
    exp() overflow on large documents).  Top-k via TakeOrdered
    (per-partition heaps, no global sort); ties broken by id.

    Output: ``(doc_id, n_grams, log_weight, gumbel_key)`` for the k
    selected documents, keys rounded 6 dp at the sink (selection uses
    the unrounded key)."""
    if k <= 0:
        raise ValueError(f"dsir_select: k must be positive, got {k}")
    w = dsir_importance(
        source, target, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, id_col=id_col, portable=portable,
    )
    u = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ).cast("double") / F.lit(_TWO60)
    u = F.greatest(u, F.lit(2.0 ** -60))
    key = F.col("log_weight") - F.log(-F.log(u))
    return (
        w.withColumn("_k", key)
        .orderBy(F.col("_k").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            "n_grams",
            F.round("log_weight", 6).alias("log_weight"),
            F.round("_k", 6).alias("gumbel_key"),
        )
    )


def unimax_allocation(
    docs: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    domain_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, public): split a
    token ``budget_tokens`` across domains so every domain gets an
    equal share EXCEPT where that would exceed ``max_epochs`` passes
    over its corpus — the waterfilling ``alloc_d = min(capacity_d, θ)``
    with capacity_d = n_tokens_d · max_epochs and the water level θ
    chosen so the allocations sum to the budget.

    Determinism/parity contract: capacities and the binding test are
    EXACT integer arithmetic: in ascending (capacity, domain) order the
    binding set is the MAXIMAL PREFIX on which
    ``capacity·k_remaining + cum_prev ≤ B`` holds — the raw inequality
    alone is NOT monotone (a later, larger capacity can spuriously pass
    once an earlier one failed), so the first failure ends the prefix;
    θ is ONE double division ``(B − Σ_binding capacity) / #non-binding``
    of exact integers, identical in any engine.  K domains are
    driver-collected (dozens of rows — the domain_mixture pattern);
    the output IS the K-row allocation table, ready to feed
    ``domain_mixture``-style per-domain keep rates.

    Output: (domain, n_tokens, capacity, allocation, epochs), epochs =
    allocation / n_tokens ≤ max_epochs.
    """
    from smatchpp_spark.pipeline.text import tokens

    if budget_tokens < 0:
        raise ValueError(
            f"unimax_allocation: budget must be >= 0, got {budget_tokens}"
        )
    if max_epochs < 1:
        raise ValueError(
            f"unimax_allocation: max_epochs must be >= 1, got {max_epochs}"
        )
    spark = docs.sparkSession
    counts = (
        docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.sum(F.size(tokens(text_col))).alias("n_tokens"))
        .collect()
    )
    rows = sorted(
        ((r["domain"], int(r["n_tokens"])) for r in counts),
        key=lambda t: (t[1] * max_epochs, t[0]),
    )
    k = len(rows)
    if k == 0:
        return spark.createDataFrame(
            [],
            "domain string, n_tokens bigint, capacity bigint, "
            "allocation double, epochs double",
        )
    bound = []  # (domain, n, cap, binding)
    cum = 0
    n_bind = 0
    in_prefix = True
    for i, (d, n) in enumerate(rows):
        cap = n * max_epochs
        binding = in_prefix and cap * (k - i) + cum <= budget_tokens
        if binding:
            n_bind += 1
            cum += cap
        else:
            in_prefix = False
        bound.append((d, n, cap, binding))
    theta = (
        float(budget_tokens - cum) / float(k - n_bind)
        if n_bind < k
        else 0.0
    )
    out = []
    for d, n, cap, binding in bound:
        alloc = float(cap) if binding else theta
        out.append((d, n, cap, alloc, alloc / float(n) if n else 0.0))
    return spark.createDataFrame(
        out,
        "domain string, n_tokens bigint, capacity bigint, "
        "allocation double, epochs double",
    )
