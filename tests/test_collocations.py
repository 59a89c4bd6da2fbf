"""PMI collocations: python replay, min-count guard, conventions."""

from __future__ import annotations

import math
import re
from collections import Counter

from smatchpp_spark.pipeline.text import collocations

DOCS = [
    (i, "machine learning is fun and machine learning is useful "
        + "the quick brown fox " * 3)
    for i in range(5)
] + [(99, "totally different text here"), (100, "   ")]


def _toks(t):
    s = t.strip(" ")
    return [w.lower() for w in re.split(r"\s+", s) if w] if s.strip() else []


def _replay(k, min_count):
    uni: Counter = Counter()
    bi: Counter = Counter()
    p = 0
    for _, t in DOCS:
        ts = _toks(t)
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
        p += max(len(ts) - 1, 0)
    n = sum(uni.values())
    scored = [
        (math.log((c / p) / ((uni[a] / n) * (uni[b] / n))), a, b, c)
        for (a, b), c in bi.items()
        if c >= min_count
    ]
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    return [
        (i + 1, a, b, c, round(pmi, 6))
        for i, (pmi, a, b, c) in enumerate(scored[:k])
    ]


def test_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r.rank, r.w1, r.w2, r.cnt, r.pmi)
        for r in collocations(df, k=10, min_count=3).collect()
    ]
    assert got == _replay(10, 3)


def test_min_count_kills_hapax_pairs(spark):
    # a unique pair of two unique words maxes raw PMI — the guard drops it
    df = spark.createDataFrame(
        DOCS + [(500, "zzyzx qwfp")], "doc_id long, text string"
    )
    got = collocations(df, k=50, min_count=2).collect()
    assert all((r.w1, r.w2) != ("zzyzx", "qwfp") for r in got)
    got1 = collocations(df, k=500, min_count=1).collect()
    # without the guard the hapax pair shares the maximum PMI (tied
    # with the other all-hapax pairs; w1-asc breaks the tie)
    by_pair = {(r.w1, r.w2): r.pmi for r in got1}
    assert by_pair[("zzyzx", "qwfp")] == got1[0].pmi


def test_empty_corpus(spark):
    df = spark.createDataFrame([(1, "  ")], "doc_id long, text string")
    assert collocations(df, k=5).count() == 0
