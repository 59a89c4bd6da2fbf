"""Token entropy / lexical diversity: python replay + conventions."""

from __future__ import annotations

import math
import re
from collections import Counter

from smatchpp_spark.pipeline.text import token_entropy

DOCS = [
    (1, "a a a a a a"),                      # one token looped: H = 0
    (2, "the quick brown fox jumps high"),   # all distinct: norm = 1
    (3, "x y x y x y"),
    (4, "  "),                               # empty
    (5, "solo"),
]


def _toks(t):
    s = t.strip(" ")
    return [w.lower() for w in re.split(r"\s+", s) if w] if s.strip() else []


def test_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.type_token_ratio,
                   r.token_entropy, r.entropy_norm)
        for r in token_entropy(df).collect()
    }
    for did, t in DOCS:
        c = Counter(_toks(t))
        n, ty = sum(c.values()), len(c)
        if n == 0:
            exp = (0, 0, 0.0, 0.0, 0.0)
        else:
            h = -sum((v / n) * math.log(v / n) for v in c.values())
            norm = 0.0 if ty <= 1 else h / math.log(ty)
            exp = (n, ty, round(ty / n, 6), round(h, 6) + 0.0,
                   round(norm, 6) + 0.0)
        assert got[did][:3] == exp[:3], did
        assert abs(got[did][3] - exp[3]) < 2e-6 and abs(got[did][4] - exp[4]) < 2e-6


def test_repetition_scores_low(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.token_entropy for r in token_entropy(df).collect()}
    # looped single token → exactly 0 (and canonical +0.0, never -0.0)
    assert got[1] == 0.0 and str(got[1]) == "0.0"
    assert got[1] < got[3] < got[2]
