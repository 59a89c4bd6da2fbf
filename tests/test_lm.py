"""Bigram stupid-backoff LM scoring: python replay, conventions,
separation of in-domain vs out-of-domain text."""

from __future__ import annotations

import math
import re
from collections import Counter

from smatchpp_spark.pipeline.text import backoff_lm_scores

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog"),
]
TGT = [
    (10, "the cat sat on the rug"),
    (11, "zebra quantum flux"),
    (12, "x"),
    (13, "  "),
    (14, "the cat sat on the mat"),
]


def _toks(t):
    s = t.strip(" ")
    if not s.strip():
        return []
    return [w.lower() for w in re.split(r"\s+", s) if w]


def _replay():
    uni = Counter(w for _, t in REF for w in _toks(t))
    bi = Counter(
        (a, b) for _, t in REF for a, b in zip(_toks(t), _toks(t)[1:])
    )
    denom = sum(uni.values()) + len(uni) + 1

    def lp(v, w):
        if bi[(v, w)] > 0:
            return math.log(bi[(v, w)] / uni[v])
        return math.log(0.4 * (uni[w] + 1) / denom)

    out = {}
    for did, t in TGT:
        prs = list(zip(_toks(t), _toks(t)[1:]))
        if not prs:
            out[did] = (0, 0.0, 1.0)
        else:
            a = sum(lp(v, w) for v, w in prs) / len(prs)
            out[did] = (len(prs), round(a, 6), round(math.exp(-a), 6))
    return out


def test_matches_python_replay(spark):
    rdf = spark.createDataFrame(REF, "doc_id long, text string")
    tdf = spark.createDataFrame(TGT, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_pairs, r.avg_logprob, r.ppl)
        for r in backoff_lm_scores(tdf, rdf).collect()
    }
    exp = _replay()
    assert set(got) == set(exp)
    for did in exp:
        assert got[did][0] == exp[did][0]
        assert got[did][1] == exp[did][1]
        assert abs(got[did][2] - exp[did][2]) < 1e-6


def test_in_domain_beats_out_of_domain(spark):
    rdf = spark.createDataFrame(REF, "doc_id long, text string")
    tdf = spark.createDataFrame(TGT, "doc_id long, text string")
    got = {r.doc_id: r.ppl for r in backoff_lm_scores(tdf, rdf).collect()}
    # in-reference sentences have low perplexity ((the,mat) and
    # (the,rug) have identical counts, so 14 and 10 tie exactly);
    # unseen vocabulary is heavily penalized
    assert got[14] == got[10] < got[11]
    # 0-pair conventions
    assert got[12] == 1.0 and got[13] == 1.0


def test_empty_reference(spark):
    rdf = spark.createDataFrame([], "doc_id long, text string")
    tdf = spark.createDataFrame(TGT, "doc_id long, text string")
    out = backoff_lm_scores(tdf, rdf)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == len(TGT)
    # every pair backs off to 0.4 * 1 / (0 + 0 + 1) = 0.4
    assert rows[11].avg_logprob == round(math.log(0.4), 6)
