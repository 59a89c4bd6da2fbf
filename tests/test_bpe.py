"""BPE merge training / segmentation vs an independent python replay
of Sennrich's algorithm (multiplicity pair stats, deterministic
(count desc, left, right) tie-break, greedy left-to-right apply)."""

from __future__ import annotations

import random

import pytest

from smatchpp_spark.pipeline.bpe import (
    END_OF_WORD,
    apply_merge,
    bpe_merges,
    bpe_segment,
)

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_apply(syms, left, right):
    out, held = [], False
    for s in syms:
        if held and s == right:
            out.append(left + right)
            held = False
        elif held:
            out.append(left)
            if s == left:
                held = True
            else:
                out.append(s)
                held = False
        elif s == left:
            held = True
        else:
            out.append(s)
    if held:
        out.append(left)
    return out


def _py_bpe(word_freqs, n_merges):
    words = {
        tuple(list(w) + [END_OF_WORD]): f for w, f in word_freqs.items()
    }
    merges = []
    for r in range(1, n_merges + 1):
        stats = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, left, right, left + right, cnt))
        words = {
            tuple(_py_apply(list(s), left, right)): f for s, f in words.items()
        }
    return merges, words


def test_apply_merge_greedy_nonoverlap(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["b", "a", "a"],)],
        "syms array<string>",
    )
    from pyspark.sql import functions as F

    got = [r[0] for r in df.select(apply_merge(F.col("syms"), "a", "a")).collect()]
    assert got == [["aa", "a"], ["a", "b", "a", "b"], ["b", "aa"]]


def test_bpe_merges_sennrich_example(spark):
    """The ACL'16 example corpus; our deterministic tie-break picks
    (e,s) → (es,t) → (est,</w>) first (three 9-count pairs, left asc)."""
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    got = bpe_merges(_docs(spark, [" ".join(texts)]), n_merges=5).collect()
    rows = [(r["round"], r["left"], r["right"], r["pair_freq"]) for r in got]
    assert rows[0] == (1, "e", "s", 9)
    assert rows[1] == (2, "es", "t", 9)
    assert rows[2] == (3, "est", END_OF_WORD, 9)
    assert rows[3] == (4, "l", "o", 7)
    assert rows[4] == (5, "lo", "w", 7)
    # python replay agrees end-to-end
    want, _ = _py_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 5)
    assert [tuple(r) for r in got] == [
        (r, l, rt, m, c) for (r, l, rt, m, c) in want
    ]


def test_bpe_merges_vs_python_random(spark):
    rng = random.Random(9)
    vocab = ["ab", "aab", "bba", "abab", "ba", "a", "b", "aa"]
    words = [rng.choice(vocab) for _ in range(200)]
    wf = {}
    for w in words:
        wf[w] = wf.get(w, 0) + 1
    got = bpe_merges(_docs(spark, [" ".join(words)]), n_merges=6).collect()
    want, _ = _py_bpe(wf, 6)
    assert [tuple(r) for r in got] == [tuple(w) for w in want]


def test_bpe_merges_early_stop_single_char_words(spark):
    # words 'a' and 'b': only pairs are (x, </w>); after two merges no
    # adjacent pair remains -> early stop
    got = bpe_merges(_docs(spark, ["a b a b a"]), n_merges=10).collect()
    assert len(got) == 2
    assert {(r["left"], r["right"]) for r in got} == {
        ("a", END_OF_WORD), ("b", END_OF_WORD)
    }


def test_bpe_segment_replays_merges(spark):
    texts = ["low lower lowest", "newest widest low"]
    docs = _docs(spark, texts)
    merges = bpe_merges(docs, n_merges=4)
    seg = bpe_segment(docs, merges).collect()
    mlist = [(r["left"], r["right"]) for r in merges.orderBy("round").collect()]
    by_id = {r["doc_id"]: r for r in seg}
    for i, t in enumerate(texts):
        wsubs = []
        for w in t.split():
            syms = list(w) + [END_OF_WORD]
            for l_, r_ in mlist:
                syms = _py_apply(syms, l_, r_)
            wsubs.extend(syms)
        assert by_id[i]["subwords"] == wsubs
        assert by_id[i]["n_words"] == len(t.split())
        assert by_id[i]["n_subwords"] == len(wsubs)


def test_bpe_merges_guard(spark):
    with pytest.raises(ValueError):
        bpe_merges(_docs(spark, ["x"]), n_merges=0)
