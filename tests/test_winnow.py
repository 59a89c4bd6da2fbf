"""MOSS winnowing fingerprints + clone pairs: python replay, shared-run
guarantee, insertion robustness."""

from __future__ import annotations

import hashlib
import re

from smatchpp_spark.pipeline.dedup import clone_pairs, winnow_fingerprints

BASE = " ".join(f"tok{i}" for i in range(40))
CLONED = (
    "prefix junk words here "
    + " ".join(f"tok{i}" for i in range(10, 30))
    + " trailing other stuff"
)
OTHER = " ".join(f"zzz{i}" for i in range(40))
DOCS = [(1, BASE), (2, CLONED), (3, OTHER)]


def _winnow_replay(t, k=5, w=4):
    ts = [x.lower() for x in re.split(r"\s+", t.strip(" ")) if x]
    grams = [" ".join(ts[i:i + k]) for i in range(len(ts) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    fps = set()
    for i in range(len(hs) - w + 1):
        # classic rule: minimal hash, ties to the RIGHTMOST position
        fps.add(min((hs[i + j], -(i + j)) for j in range(w))[0])
    return fps


def test_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, portable=True).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for did, t in DOCS:
        assert got.get(did, set()) == _winnow_replay(t), did


def test_shared_run_guarantee_and_clone_detection(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # a shared run of 20 tokens >= window + k - 1 = 8 must share >= 1 fp
    pairs = {
        (r.doc_a, r.doc_b): (r.shared_fps, r.overlap)
        for r in clone_pairs(df, threshold=0.3, portable=True).collect()
    }
    assert set(pairs) == {(1, 2)}  # the unrelated doc pairs with nobody
    assert pairs[(1, 2)][0] >= 1 and pairs[(1, 2)][1] >= 0.3


def test_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    # doc 1: 3 tokens < k; doc 2: 7 tokens -> 3 grams < window
    assert winnow_fingerprints(df, k=5, window=4).count() == 0
