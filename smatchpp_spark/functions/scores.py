"""Corpus score aggregation — micro / macro / pairwise F1-P-R.

Reference semantics (smatchpp/eval_statistics.py):
  * a match statistic is a 4-vector ``(matchsum_x, matchsum_y, xlen, ylen)``
    per graph pair (score.py:181-197);
  * ``precision = a/c``, ``recall = b/d``, ``f1 = 2PR/(P+R)``; if the whole
    4-vector sums to 0 the score is 1.0 (both graphs empty, possible for
    fine-grained dims — eval_statistics.py:28-33); denominators below 1e-8
    yield 0.0 (eval_statistics.py:30-33, :55-60, :85-89);
  * micro: sum the 4-vectors over the corpus, then take ratios
    (eval_statistics.py:132-138, :172-174);
  * macro: per-pair F/P/R, then the corpus mean (eval_statistics.py:140-142,
    :176-178);
  * final scores are multiplied by 100 and rounded to 2 decimals
    (eval_statistics.py:209-211).

All of this is Catalyst-native column arithmetic: the micro aggregation is a
partial+final ``sum`` (map-side combined — one tiny shuffle regardless of
corpus size), the macro aggregation is per-row expressions plus ``avg``.
No Python executes on the executors.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPS = 1e-8

STAT_COLS = ("matchsum_x", "matchsum_y", "xlen", "ylen")


def _ratio(num: Column, denom: Column, allzero: Column) -> Column:
    """num/denom with the reference zero guards (sumzerothenone + eps)."""
    return (
        F.when(allzero, F.lit(1.0))
        .when(denom < _EPS, F.lit(0.0))
        .otherwise(num / denom)
    )


def fpr_columns(
    a: Column, b: Column, c: Column, d: Column
) -> tuple[Column, Column, Column]:
    """(f1, precision, recall) expressions for one match 4-vector."""
    allzero = (a + b + c + d) == 0.0
    p = _ratio(a, c, allzero)
    r = _ratio(b, d, allzero)
    f1 = (
        F.when(allzero, F.lit(1.0))
        .when((p + r) < _EPS, F.lit(0.0))
        .otherwise(2.0 * p * r / (p + r))
    )
    return f1, p, r


def _final(col: Column) -> Column:
    """×100, round 2 (eval_statistics.py:209-211)."""
    return F.round(col * 100.0, 2)


def micro_scores(stats: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Micro aggregation: sum 4-vectors (optionally per group), then ratios."""
    group_cols = group_cols or []
    agg = stats.groupBy(*group_cols).agg(
        *[F.sum(F.col(c).cast("double")).alias(c) for c in STAT_COLS]
    )
    f1, p, r = fpr_columns(*[F.col(c) for c in STAT_COLS])
    return agg.select(
        *group_cols,
        _final(f1).alias("f1"),
        _final(p).alias("p"),
        _final(r).alias("r"),
    )


def macro_scores(stats: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Macro aggregation: per-pair F/P/R, then the mean (optionally per group)."""
    group_cols = group_cols or []
    f1, p, r = fpr_columns(
        *[F.col(c).cast("double") for c in STAT_COLS]
    )
    per_pair = stats.select(
        *group_cols, f1.alias("f1"), p.alias("p"), r.alias("r")
    )
    return per_pair.groupBy(*group_cols).agg(
        _final(F.avg("f1")).alias("f1"),
        _final(F.avg("p")).alias("p"),
        _final(F.avg("r")).alias("r"),
    )


def pairwise_scores(stats: DataFrame, pair_col: str = "pair_id") -> DataFrame:
    """Per-pair F/P/R rows (score_type='pairwise', bindings.py:152-159)."""
    f1, p, r = fpr_columns(*[F.col(c).cast("double") for c in STAT_COLS])
    return stats.select(
        pair_col, _final(f1).alias("f1"), _final(p).alias("p"), _final(r).alias("r")
    )


def drop_empty_pairs(stats: DataFrame) -> DataFrame:
    """For fine-grained dims the reference keeps only rows whose 4-vector
    sum is > 0 (eval_statistics.py:164-169)."""
    total = sum(F.col(c) for c in STAT_COLS)
    return stats.filter(total > 0)


def pair_index(
    stats: DataFrame,
    pair_col: str = "pair_id",
    portable: bool = False,
    buckets: int = 1024,
) -> DataFrame:
    """Attach a deterministic dense index ``i`` ∈ [0, n) keyed by the pair
    id — partitioning-independent and scalable (no global single-partition
    window): pairs hash into ``buckets`` buckets, get a per-bucket
    row_number ordered by pair id, and bucket offsets come from a cumsum
    over the tiny bucket spine (≤ ``buckets`` rows), broadcast back."""
    from smatchpp_spark.functions.hashing import hash64
    from smatchpp_spark.functions.indexing import dense_index

    h = hash64(F.concat(F.lit("b#"), F.col(pair_col).cast("string")), portable)
    bucketed = stats.withColumn("_b", F.pmod(h, F.lit(buckets)).cast("int"))
    return dense_index(bucketed, "_b", pair_col, "i").drop("_b")


def _norm_cdf(x: float) -> float:
    import math

    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _norm_ppf(p: float) -> float:
    """Inverse standard-normal CDF by bisection on the erf-based CDF —
    monotone, converges to ~1e-13 in 60 steps; no scipy needed."""
    if not 0.0 < p < 1.0:
        raise ValueError(p)
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if _norm_cdf(mid) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-13:
            break
    return (lo + hi) / 2.0


def _quantile(sorted_vals: list[float], q: float) -> float:
    """Linear-interpolation quantile (numpy default / SQL quantile_cont)."""
    n = len(sorted_vals)
    if n == 1:
        return sorted_vals[0]
    h = (n - 1) * min(max(q, 0.0), 1.0)
    i = int(h)
    if i >= n - 1:
        return sorted_vals[-1]
    return sorted_vals[i] + (h - i) * (sorted_vals[i + 1] - sorted_vals[i])


def _py_micro_f1(a: float, b: float, c: float, d: float) -> float:
    """Python twin of ``fpr_columns`` (same zero guards), for the driver-
    side point estimate and the test oracle."""
    if (a + b + c + d) == 0.0:
        return 1.0
    p = 0.0 if c < _EPS else a / c
    r = 0.0 if d < _EPS else b / d
    if (p + r) < _EPS:
        return 0.0
    return 2.0 * p * r / (p + r)


def bca_interval(
    theta_hat: float,
    reps: list[float],
    jack_n: int,
    jack_sum: float,
    jack_sum2: float,
    jack_sum3: float,
    ci: float = 0.95,
) -> tuple[float, float] | None:
    """BCa confidence interval from the replicate distribution plus
    jackknife moments (Efron; the method scipy.stats.bootstrap defaults
    to, reference eval_statistics.py:183-197) — pure arithmetic:

      * bias correction z0 = Φ⁻¹(#{θ* < θ̂} / B);
      * acceleration a = Σ(θ̄₍.₎ − θ₍ᵢ₎)³ / (6·[Σ(θ̄₍.₎ − θ₍ᵢ₎)²]^{3/2}),
        computed from the raw jackknife moment sums via
        Σ(c − x)² = Σx² − n·c² and Σ(c − x)³ = −Σx³ + 3cΣx² − 2nc³;
      * adjusted levels αₖ = Φ(z0 + (z0 + z_{αₖ}) / (1 − a(z0 + z_{αₖ})));
      * interval = interpolated quantiles of θ* at (α₁, α₂).

    Returns ``None`` on the degenerate cases where scipy yields nan
    (all replicates on one side of θ̂, or zero jackknife variance) — the
    reference then reports [0, 100] (eval_statistics.py:194-197).
    """
    B = len(reps)
    below = sum(1 for t in reps if t < theta_hat)
    if below == 0 or below == B:
        return None
    z0 = _norm_ppf(below / B)
    m1 = jack_sum / jack_n
    s2 = jack_sum2 - jack_n * m1 * m1
    s3 = -jack_sum3 + 3.0 * m1 * jack_sum2 - 2.0 * jack_n * m1**3
    if s2 <= 0.0:
        return None
    accel = s3 / (6.0 * s2**1.5)
    alpha = (1.0 - ci) / 2.0
    srt = sorted(reps)

    def adjusted(level: float) -> float:
        z = _norm_ppf(level)
        denom = 1.0 - accel * (z0 + z)
        if denom <= 0.0:
            return float("nan")
        return _norm_cdf(z0 + (z0 + z) / denom)

    a1, a2 = adjusted(alpha), adjusted(1.0 - alpha)
    if a1 != a1 or a2 != a2:  # nan
        return None
    return _quantile(srt, a1), _quantile(srt, a2)


def jackknife_moments(
    stats: DataFrame, totals: tuple[float, float, float, float]
) -> tuple[int, float, float, float]:
    """(n, Σθ, Σθ², Σθ³) of the leave-one-out micro F1 — closed form per
    row from the corpus totals minus the pair's 4-vector, so the whole
    jackknife is one map-side-combined aggregation (never n jobs)."""
    A, Bm, C, D = totals
    jk_f1, _, _ = fpr_columns(
        F.lit(A) - F.col("matchsum_x").cast("double"),
        F.lit(Bm) - F.col("matchsum_y").cast("double"),
        F.lit(C) - F.col("xlen").cast("double"),
        F.lit(D) - F.col("ylen").cast("double"),
    )
    jk = stats.select(jk_f1.alias("t")).agg(
        F.count("t").alias("n"),
        F.sum("t").alias("s1"),
        F.sum(F.col("t") * F.col("t")).alias("s2"),
        F.sum(F.col("t") * F.col("t") * F.col("t")).alias("s3"),
    ).first()
    return int(jk.n), float(jk.s1), float(jk.s2), float(jk.s3)


def bootstrap_micro(
    stats: DataFrame,
    n_resamples: int = 200,
    seed: int = 42,
    ci: float = 0.95,
    pair_col: str = "pair_id",
    portable: bool = False,
    method: str = "percentile",
    resample: str = "auto",
) -> DataFrame:
    """Bootstrap CI for the micro F1 (eval_statistics.py:183-197
    semantics, deterministic re-expression).  ``method="bca"`` matches
    the reference's scipy default (bias-corrected & accelerated, no scipy
    needed — see ``bca_interval``); ``method="percentile"`` (default) is
    the oracle-replayable mode a SQL engine can reproduce bit-for-bit.

    scipy draws pair-resamples; here each replicate r resamples pairs via a
    deterministic hash draw: pair i contributes to replicate r with
    multiplicity = count of j in [0, n) with hash(r, j, seed) % n == i.
    That is a fixed multinomial resample expressed as a join — a replicate
    spine × pair index — no Python on executors, one shuffle into the
    replicate aggregation.  The pair index is the stable hash-bucketed
    dense index from ``pair_index`` (keyed by pair id, not by physical row
    position), so the same corpus yields the same CI under any
    partitioning.  ``portable=True`` swaps xxhash64 for the md5-based
    cross-engine hash so a SQL oracle can replay the draw exactly.

    ``resample`` as in ``bootstrap_scores``: ``auto`` (default) uses the
    reference-exact multinomial draw up to ``POISSON_AUTO_PAIRS`` pairs
    and the linear-cost Poisson(1) weight column beyond it.
    """
    if resample not in ("auto", "multinomial", "poisson"):
        raise ValueError(f"unknown resample mode {resample!r}")
    spark = stats.sparkSession
    n = stats.count()
    if n == 0:
        return spark.createDataFrame([], "lo double, hi double")
    resample = _resolve_resample(resample, n)
    if resample == "poisson":
        wdf = poisson_weights(stats, n_resamples, seed, pair_col, portable)
        rep_stats = wdf.groupBy("rep").agg(
            *[
                F.sum(F.col("w") * F.col(c).cast("double")).alias(c)
                for c in STAT_COLS
            ]
        )
    else:
        # replicate spine inside _replicate_draws: two lazy Range scans
        # cross-joined — never materializes an n-element array in a
        # single row (explode(sequence(0, n-1)) would build the full
        # [0, n) array per replicate before exploding, a multi-GB
        # single-row value at 10^8 pairs).  j is cast to int there
        # because the old sequence() spine produced int elements and
        # xxhash64 is type-sensitive — the draw is bit-identical.
        pairs, draws = _replicate_draws(
            stats, n, n_resamples, seed, pair_col, portable
        )
        rep_stats = draws.join(pairs, "i").groupBy("rep").agg(
            *[F.sum(F.col(c).cast("double")).alias(c) for c in STAT_COLS]
        )
    f1, _, _ = fpr_columns(*[F.col(c) for c in STAT_COLS])
    if method == "bca":
        return _bca_micro(stats, rep_stats, f1, ci)
    if method != "percentile":
        raise ValueError(f"unknown bootstrap method {method!r}")
    per_rep = rep_stats.select("rep", _final(f1).alias("f1"))
    alpha = (1.0 - ci) / 2.0
    # exact interpolated percentile over the (tiny) replicate set — same
    # linear-interpolation definition as SQL quantile_cont, so the oracle
    # reproduces it bit-for-bit
    return per_rep.agg(
        F.round(F.percentile("f1", F.lit(alpha)), 6).alias("lo"),
        F.round(F.percentile("f1", F.lit(1.0 - alpha)), 6).alias("hi"),
    )


def _replicate_draws(
    stats: DataFrame,
    n: int,
    n_resamples: int,
    seed: int,
    pair_col: str,
    portable: bool,
) -> tuple[DataFrame, DataFrame]:
    """(pairs-with-dense-index, draw table (rep, i)) — the shared
    deterministic multinomial resample both bootstrap shapes join on."""
    from smatchpp_spark.functions.hashing import portable_hash64

    spark = stats.sparkSession
    pairs = pair_index(stats, pair_col=pair_col, portable=portable)
    spine = (
        spark.range(n_resamples)
        .withColumnRenamed("id", "rep")
        .crossJoin(spark.range(n).select(F.col("id").cast("int").alias("j")))
    )
    if portable:
        hdraw = portable_hash64(
            F.concat_ws("#", F.lit("draw"), F.col("rep"), F.col("j"), F.lit(seed))
        )
    else:
        hdraw = F.xxhash64(F.col("rep"), F.col("j"), F.lit(seed))
    draws = spine.select("rep", F.pmod(hdraw, F.lit(n)).alias("i"))
    return pairs, draws


def _poisson1_cdf(k_max: int = 9) -> list[float]:
    """Cumulative Poisson(1) CDF values for k = 0..k_max (exact float64
    from the closed form e^-1 Σ 1/i! — both engines reproduce the same
    doubles from these repr'd literals)."""
    import math

    acc = 0.0
    fact = 1.0
    out = []
    for k in range(k_max + 1):
        if k > 0:
            fact *= k
        acc += 1.0 / fact
        out.append(math.exp(-1.0) * acc)
    return out


# auto-resample crossover: the multinomial draw's B×n join spine
# measured superlinear in the 1x→10x sweep (exponent 1.51) while the
# Poisson weight column stayed linear (0.23) — BENCH/SCALE_SWEEP.md.
# Above ~1M pairs the reference-exact draw stops being worth its
# shuffle; the Poisson(1) approximation's CI error is O(1/√n) and the
# in-repo parity test holds widths to ~0.1 points at the switch point.
POISSON_AUTO_PAIRS = 1_000_000


def _resolve_resample(resample: str, n_pairs: int) -> str:
    """``auto`` → multinomial (reference-exact) below
    ``POISSON_AUTO_PAIRS`` pairs, Poisson above.

    When ``auto`` resolves to the Poisson approximation the switch is
    logged, so at-scale runs record which draw produced the CI (the
    values are NOT continuous across the threshold for the same seed)."""
    if resample == "auto":
        if n_pairs > POISSON_AUTO_PAIRS:
            logging.getLogger(__name__).info(
                "bootstrap resample=auto resolved to POISSON "
                "(n_pairs=%d > %d); CI values differ from the "
                "reference-exact multinomial draw at the same seed",
                n_pairs,
                POISSON_AUTO_PAIRS,
            )
            return "poisson"
        return "multinomial"
    if resample not in ("multinomial", "poisson"):
        raise ValueError(f"unknown resample mode {resample!r}")
    return resample


def poisson_weights(
    stats: DataFrame,
    n_resamples: int,
    seed: int = 42,
    pair_col: str = "pair_id",
    portable: bool = False,
) -> DataFrame:
    """stats × replicate spine with a deterministic Poisson(1) resample
    weight per (pair, rep) — the standard AT-SCALE bootstrap (Poisson
    approximation to the multinomial resample; Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", public method).

    Why this exists: the exact multinomial draw joins a B×n draw spine
    against the pair table — a shuffle of O(B·n) rows that our own 1x→10x
    sweep measured superlinear (exponent 1.55 at 6M pairs, spill-bound).
    Poisson weights are computed IN the scan projection (hash → uniform →
    inverse-CDF CASE cascade) and flow straight into a map-side-combined
    per-rep aggregation: the B·n rows never shuffle — only ~B rows per
    partition do.  The draw is deterministic and engine-replayable
    (``portable=True`` uses the md5 cross-engine hash).

    Output: the stats columns + (rep int, w double).
    """
    from smatchpp_spark.functions.hashing import portable_hash64

    reps = F.explode(
        F.sequence(F.lit(0), F.lit(n_resamples - 1))
    ).alias("rep")
    with_rep = stats.select("*", reps)
    if portable:
        h = portable_hash64(
            F.concat_ws(
                "#",
                F.lit("pois"),
                F.col("rep"),
                F.col(pair_col).cast("string"),
                F.lit(seed),
            )
        )
    else:
        h = F.xxhash64(F.col("rep"), F.col(pair_col), F.lit(seed))
    u = (F.pmod(h, F.lit(1_000_000)).cast("double") + 0.5) / 1_000_000.0
    cdf = _poisson1_cdf()
    w = F.lit(float(len(cdf)))  # beyond the table: cap (P < 1e-7)
    for k in range(len(cdf) - 1, -1, -1):
        w = F.when(u <= F.lit(cdf[k]), F.lit(float(k))).otherwise(w)
    return with_rep.withColumn("w", w)


def bootstrap_scores(
    stats: DataFrame,
    score_type: str = "micro",
    n_resamples: int = 200,
    seed: int = 42,
    ci: float = 0.95,
    pair_col: str = "pair_id",
    portable: bool = False,
    method: str = "percentile",
    resample: str = "auto",
) -> DataFrame:
    """Bootstrap CI for the full (f1, p, r) statistic vector, micro or
    macro — the reference's ``_aggr_wrapper`` contract
    (eval_statistics.py:120-144): ``micro`` resamples raw 4-vectors and
    takes the ratio of sums; ``macro`` resamples per-pair (f1, p, r)
    rows and takes their mean.  Output: one row per statistic,
    ``(stat, lo, hi)``, stats ∈ {f1, p, r}, on the ×100-round-2 scale.

    Same deterministic hash draw as ``bootstrap_micro``; ``method`` as
    there (percentile = oracle-replayable, bca = reference scipy
    default).  Degenerate-BCa statistics fall back to [0, 100]
    per statistic (the reference falls back for the whole vector —
    per-statistic is strictly more informative and documented).

    ``resample``: ``auto`` (default) picks ``multinomial`` (the
    reference-exact draw) below ``POISSON_AUTO_PAIRS`` pairs and
    ``poisson`` (``poisson_weights`` — no B×n shuffle; measured linear
    where multinomial went superlinear in the 1x→10x sweep) above, so
    callers never have to know about the crossover.  Both explicit
    modes remain available and deterministic/oracle-replayable.
    """
    if score_type not in ("micro", "macro"):
        raise ValueError(score_type)
    if resample not in ("auto", "multinomial", "poisson"):
        raise ValueError(f"unknown resample mode {resample!r}")
    spark = stats.sparkSession
    n = stats.count()
    if n == 0:
        return spark.createDataFrame([], "stat string, lo double, hi double")
    resample = _resolve_resample(resample, n)

    if resample == "poisson":
        wdf = poisson_weights(stats, n_resamples, seed, pair_col, portable)
        if score_type == "micro":
            rep_stats = wdf.groupBy("rep").agg(
                *[
                    F.sum(F.col("w") * F.col(c).cast("double")).alias(c)
                    for c in STAT_COLS
                ]
            )
            f1, p, r = fpr_columns(*[F.col(c) for c in STAT_COLS])
            per_rep = rep_stats.select(
                "rep", f1.alias("f1"), p.alias("p"), r.alias("r")
            )
        else:
            pf1, pp, pr = fpr_columns(
                *[F.col(c).cast("double") for c in STAT_COLS]
            )
            sums = wdf.groupBy("rep").agg(
                F.sum("w").alias("sw"),
                F.sum(F.col("w") * pf1).alias("sf1"),
                F.sum(F.col("w") * pp).alias("sp"),
                F.sum(F.col("w") * pr).alias("sr"),
            )
            # an all-zero-weight replicate (possible only at tiny n)
            # degenerates to the observed per-pair mean of that column
            per_rep = sums.select(
                "rep",
                *[
                    F.when(
                        F.col("sw") > 0, F.col(s) / F.col("sw")
                    ).alias(c)
                    for s, c in (("sf1", "f1"), ("sp", "p"), ("sr", "r"))
                ],
            ).na.drop()
    elif score_type == "micro":
        pairs, draws = _replicate_draws(
            stats, n, n_resamples, seed, pair_col, portable
        )
        rep_stats = draws.join(pairs, "i").groupBy("rep").agg(
            *[F.sum(F.col(c).cast("double")).alias(c) for c in STAT_COLS]
        )
        f1, p, r = fpr_columns(*[F.col(c) for c in STAT_COLS])
        per_rep = rep_stats.select(
            "rep", f1.alias("f1"), p.alias("p"), r.alias("r")
        )
    else:
        pairs, draws = _replicate_draws(
            stats, n, n_resamples, seed, pair_col, portable
        )
        pf1, pp, pr = fpr_columns(*[F.col(c).cast("double") for c in STAT_COLS])
        pair_fpr = pairs.select(
            "i", pf1.alias("f1"), pp.alias("p"), pr.alias("r")
        )
        per_rep = draws.join(pair_fpr, "i").groupBy("rep").agg(
            F.avg("f1").alias("f1"), F.avg("p").alias("p"), F.avg("r").alias("r")
        )

    alpha = (1.0 - ci) / 2.0
    if method == "percentile":
        long = per_rep.select(
            F.expr(
                "stack(3, 'f1', f1, 'p', p, 'r', r) as (stat, v)"
            )
        ).select("stat", _final(F.col("v")).alias("v"))
        return long.groupBy("stat").agg(
            F.round(F.percentile("v", F.lit(alpha)), 6).alias("lo"),
            F.round(F.percentile("v", F.lit(1.0 - alpha)), 6).alias("hi"),
        )
    if method != "bca":
        raise ValueError(f"unknown bootstrap method {method!r}")

    if n < 2:
        # the jackknife divides by (n - 1); with a single pair the BCa
        # acceleration is undefined — return the documented degenerate
        # [0, 100] fallback per statistic (mirrors bca_interval's
        # degenerate behavior) instead of DIVIDE_BY_ZERO under ANSI.
        return spark.createDataFrame(
            [(c, 0.0, 100.0) for c in ("f1", "p", "r")],
            "stat string, lo double, hi double",
        )

    reps_rows = per_rep.select("f1", "p", "r").collect()
    tot = stats.agg(
        *[F.sum(F.col(c).cast("double")).alias(c) for c in STAT_COLS]
    ).first()
    A, Bm, C, D = (float(tot[c] or 0.0) for c in STAT_COLS)
    if score_type == "micro":
        theta = {
            "f1": _py_micro_f1(A, Bm, C, D),
            "p": 1.0 if (A + Bm + C + D) == 0 else (0.0 if C < _EPS else A / C),
            "r": 1.0 if (A + Bm + C + D) == 0 else (0.0 if D < _EPS else Bm / D),
        }
        jf1, jp, jr = fpr_columns(
            F.lit(A) - F.col("matchsum_x").cast("double"),
            F.lit(Bm) - F.col("matchsum_y").cast("double"),
            F.lit(C) - F.col("xlen").cast("double"),
            F.lit(D) - F.col("ylen").cast("double"),
        )
        jack_cols = {"f1": jf1, "p": jp, "r": jr}
    else:
        pf1, pp, pr = fpr_columns(*[F.col(c).cast("double") for c in STAT_COLS])
        sums = stats.select(
            pf1.alias("f1"), pp.alias("p"), pr.alias("r")
        ).agg(
            *[F.sum(c).alias(c) for c in ("f1", "p", "r")]
        ).first()
        theta = {c: float(sums[c]) / n for c in ("f1", "p", "r")}
        # leave-one-out mean is affine in the removed value
        pfpr = dict(zip(("f1", "p", "r"), fpr_columns(
            *[F.col(c).cast("double") for c in STAT_COLS]
        )))
        jack_cols = {
            c: (F.lit(float(sums[c])) - pfpr[c]) / F.lit(n - 1)
            for c in ("f1", "p", "r")
        }

    mom = stats.select(
        *[jack_cols[c].alias(c) for c in ("f1", "p", "r")]
    ).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"{c}_s1") for c in ("f1", "p", "r")],
        *[F.sum(F.col(c) * F.col(c)).alias(f"{c}_s2") for c in ("f1", "p", "r")],
        *[F.sum(F.col(c) * F.col(c) * F.col(c)).alias(f"{c}_s3") for c in ("f1", "p", "r")],
    ).first()
    out_rows = []
    for c in ("f1", "p", "r"):
        interval = bca_interval(
            theta[c],
            [float(row[c]) for row in reps_rows],
            int(mom["n"]),
            float(mom[f"{c}_s1"]),
            float(mom[f"{c}_s2"]),
            float(mom[f"{c}_s3"]),
            ci,
        )
        if interval is None:
            out_rows.append((c, 0.0, 100.0))
        else:
            out_rows.append(
                (c, round(interval[0] * 100.0, 2), round(interval[1] * 100.0, 2))
            )
    return spark.createDataFrame(out_rows, "stat string, lo double, hi double")


def _bca_micro(stats: DataFrame, rep_stats: DataFrame, f1, ci: float) -> DataFrame:
    """BCa micro-F1 CI (reference scipy default).  Distributed work: the
    replicate aggregation (shared with the percentile path) plus ONE
    jackknife moment aggregation — the leave-one-out micro F1 is closed
    form from the corpus 4-vector totals minus each pair's 4-vector, so
    the jackknife is a per-row expression + map-side-combined agg, never
    n jobs.  Driver-side math touches only the B replicate values and
    five scalars, independent of corpus size.  Scaling mirrors the
    reference: quantiles computed on the raw [0, 1] statistic, then
    ×100 round 2 (eval_statistics.py:209-211); degenerate cases → the
    reference's [0, 100] fallback (eval_statistics.py:194-197)."""
    spark = stats.sparkSession
    reps = [
        float(r.f1)
        for r in rep_stats.select(f1.alias("f1")).collect()
    ]
    tot = stats.agg(
        *[F.sum(F.col(c).cast("double")).alias(c) for c in STAT_COLS]
    ).first()
    A, Bm, C, D = (float(tot[c] or 0.0) for c in STAT_COLS)
    theta_hat = _py_micro_f1(A, Bm, C, D)
    jk = jackknife_moments(stats, (A, Bm, C, D))
    interval = bca_interval(theta_hat, reps, *jk, ci)
    if interval is None:
        lo, hi = 0.0, 100.0
    else:
        lo, hi = (round(v * 100.0, 2) for v in interval)
    return spark.createDataFrame([(float(lo), float(hi))], "lo double, hi double")
