"""Brute-force parity for the round-7 late additions: JSON props
extraction/rollup, Spearman rank correlation, within-doc span dedup."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from smatchpp_spark.operators.graphstats import spearman_correlation
from smatchpp_spark.pipeline.events import parse_props, props_rollup
from smatchpp_spark.pipeline.text import span_self_dedup


# ---- props extraction ------------------------------------------------------

def _events(spark):
    rows = [
        (0, "a", 1.25, '{"k": 3}'),
        (1, "a", 2.50, '{"k": 7}'),
        (2, "a", 0.25, "not json at all"),
        (3, "b", 4.00, '{"other": 1}'),
        (4, "b", 1.00, None),
        (5, "b", 3.75, '{"k": 3}'),
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double, props string"
    )


def test_parse_props_permissive(spark):
    got = {
        r["event_id"]: r["k"]
        for r in parse_props(_events(spark), "k BIGINT").collect()
    }
    # malformed / missing-field / NULL props all yield NULL, never throw
    assert got == {0: 3, 1: 7, 2: None, 3: None, 4: None, 5: 3}


def test_props_rollup(spark):
    got = {r["event_type"]: r.asDict() for r in props_rollup(_events(spark)).collect()}
    a, b = got["a"], got["b"]
    assert (a["n_events"], a["n_missing"], a["sum_k"], a["min_k"], a["max_k"]) == (
        3, 1, 10, 3, 7,
    )
    assert a["n_distinct_k"] == 2
    assert math.isclose(a["sum_value"], 4.0)
    assert (b["n_events"], b["n_missing"], b["sum_k"], b["n_distinct_k"]) == (3, 2, 3, 1)
    assert math.isclose(b["sum_value"], 8.75)


# ---- Spearman --------------------------------------------------------------

def _py_spearman(xy):
    def avg_ranks(vals):
        s = sorted(vals)
        first = {}
        for i, v in enumerate(s):
            first.setdefault(v, i)
        cnt = {}
        for v in vals:
            cnt[v] = cnt.get(v, 0) + 1
        return [first[v] + (cnt[v] + 1) / 2 for v in vals]

    rx = avg_ranks([x for x, _ in xy])
    ry = avg_ranks([y for _, y in xy])
    n = len(xy)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    dy = math.sqrt(sum((b - my) ** 2 for b in ry))
    return 0.0 if dx == 0 or dy == 0 else num / (dx * dy)


def _rho(spark, xy):
    df = spark.createDataFrame(xy, "x long, y long")
    row = spearman_correlation(df, "x", "y").collect()[0]
    assert row["n"] == len(xy)
    return row["spearman_rho"]


def test_spearman_with_ties_vs_python(spark):
    rng = random.Random(5)
    xy = [(rng.randrange(8), rng.randrange(6)) for _ in range(300)]
    assert math.isclose(_rho(spark, xy), _py_spearman(xy), abs_tol=1e-12)


def test_spearman_extremes(spark):
    mono = [(i, i * 10) for i in range(50)]
    assert math.isclose(_rho(spark, mono), 1.0)
    rev = [(i, -i) for i in range(50)]
    assert math.isclose(_rho(spark, rev), -1.0)
    const = [(i, 7) for i in range(50)]
    assert _rho(spark, const) == 0.0


# ---- span self-dedup -------------------------------------------------------

def _py_span_dedup(text, n=3):
    toks = text.split()
    grams = [" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))]
    first = {}
    for i, g in enumerate(grams):
        first.setdefault(g, i)
    covered = set()
    for i, g in enumerate(grams):
        if first[g] < i:
            covered.update(range(i, i + n))
    kept = [t for i, t in enumerate(toks) if i not in covered]
    return len(toks), len(toks) - len(kept), " ".join(kept)


def test_span_self_dedup_vs_python(spark):
    rng = random.Random(13)
    vocab = ["a", "b", "c", "d", "e"]
    docs = []
    for d in range(30):
        L = rng.randrange(0, 25)
        docs.append((d, " ".join(rng.choice(vocab) for _ in range(L))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in span_self_dedup(df, n=3).collect()
    }
    for d, text in docs:
        assert got[d] == _py_span_dedup(text, 3), (d, text)


def test_span_self_dedup_short_and_exact_repeat(spark):
    df = spark.createDataFrame(
        [
            (0, "x y"),                    # shorter than n: untouched
            (1, "p q r p q r p q r"),      # two later copies fully removed
            (2, ""),                       # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in span_self_dedup(df, n=3).collect()}
    assert got[0]["n_removed"] == 0 and got[0]["text_clean"] == "x y"
    assert got[1]["n_removed"] == 6 and got[1]["text_clean"] == "p q r"
    assert got[2]["n_tokens"] == 0 and got[2]["text_clean"] == ""
