"""Random-walk generation + dedup clustering vs pure-python replays."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _portable_hash(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_walks(pairs, walk_length, walks_per_vertex, seed):
    nbrs = {}
    verts = set()
    for a, b in pairs:
        a, b = str(a), str(b)
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        verts.add(a)
        verts.add(b)
    out = {}
    for v in sorted(verts):
        for w in range(walks_per_vertex):
            wid = f"{v}#{w}"
            path = [v]
            cur = v
            for k in range(1, walk_length + 1):
                nb = sorted(nbrs.get(cur, ()))
                if not nb:
                    break
                h = _portable_hash(f"{wid}#step#{k}#{seed}")
                cur = nb[h % len(nb)]
                path.append(cur)
            out[wid] = path
    return out


def test_random_walks_match_python_replay(spark):
    """Every walk — id, start, full path — reproduces the pure-python
    replay of the same hash draws (portable mode); walks truncate at
    dead ends; walks_per_vertex fans out ids."""
    from smatchpp_spark.operators.walks import random_walks

    rng = random.Random(4)
    pairs = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(70)})
    pairs.append((100, 101))  # 101 is a dead end
    edges = _edges_df(spark, pairs)

    res = random_walks(
        edges, walk_length=4, walks_per_vertex=2, seed=9, portable=True
    )
    got = {r.walk_id: (r.start, list(r.path)) for r in res.collect()}
    want = _py_walks(pairs, walk_length=4, walks_per_vertex=2, seed=9)
    assert set(got) == set(want)
    for wid, path in want.items():
        assert got[wid] == (path[0], path), wid

    # dead-end start: the walk is just the start vertex
    assert got["101#0"] == ("101", ["101"])

    # fast-hash mode: same shape (ids, starts, lengths bounded), still
    # deterministic run-to-run
    f1 = random_walks(edges, walk_length=3, seed=9).collect()
    f2 = random_walks(edges, walk_length=3, seed=9).collect()
    k = lambda r: (r.walk_id, tuple(r.path))
    assert sorted(map(k, f1)) == sorted(map(k, f2))
    assert all(len(r.path) <= 4 for r in f1)


def test_random_walks_edges_are_real(spark):
    """Every consecutive (path[i], path[i+1]) is a real edge."""
    from smatchpp_spark.operators.walks import random_walks

    rng = random.Random(12)
    pairs = sorted({(rng.randrange(15), rng.randrange(15)) for _ in range(40)})
    eset = {(str(a), str(b)) for a, b in pairs if a != b}
    res = random_walks(
        _edges_df(spark, pairs), walk_length=5, walks_per_vertex=1, seed=2
    ).collect()
    for r in res:
        for x, y in zip(r.path, r.path[1:]):
            assert (x, y) in eset, (r.walk_id, r.path)


def test_duplicate_clusters(spark):
    """duplicate_clusters: near-identical docs land in one cluster with
    the minimum id canonical; unique docs are absent."""
    from smatchpp_spark.pipeline import dedup

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, base.replace("quick", "quick very")),
            (10, "completely different text about spark dataframes and "
                 "shuffle partitions in a distributed engine"),
            (11, "completely different text about spark dataframes and "
                 "shuffle partitions in a distributed engine today"),
            (20, "a unique snowflake document with nothing in common "
                 "with any other row present here at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    out = dedup.duplicate_clusters(
        docs, threshold=0.4, num_hashes=8, band_size=2
    ).collect()
    by_doc = {r.doc_id: (r.cluster_id, r.is_canonical) for r in out}
    assert 20 not in by_doc  # unique doc keeps itself, absent from output
    assert by_doc[1] == (1, True)
    assert by_doc[2] == (1, False)
    assert by_doc[3] == (1, False)
    assert by_doc[10] == (10, True)
    assert by_doc[11] == (10, False)


def test_walk_param_validation(spark):
    """walks_per_vertex=0 must raise, not silently emit '#0' and '#-1'
    walks (F.sequence(0, -1) auto-steps descending)."""
    from smatchpp_spark.operators.walks import biased_random_walks, random_walks

    e = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError, match="walks_per_vertex"):
        random_walks(e, walks_per_vertex=0)
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(e, walk_length=0)
    with pytest.raises(ValueError, match="walks_per_vertex"):
        biased_random_walks(e, walks_per_vertex=-1)


def test_salted_hub_neighbor_index(spark):
    """Salted index build for hub sources: still a dense deterministic
    bijection [0, deg) per source, stable across input partitionings,
    with the hub's window sort split across (src, salt) buckets instead
    of one whole-hub task; walks over it follow real edges."""
    from smatchpp_spark.operators.walks import neighbor_index, random_walks

    pairs = [("h", f"n{i:04d}") for i in range(300)]
    pairs += [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    e = _edges_df_str(spark, pairs)

    salted = neighbor_index(e, hub_threshold=100, n_salts=8)
    rows = salted.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    for src, rs in by_src.items():
        deg = len(rs)
        assert all(r.deg == deg for r in rs)
        assert sorted(r.idx for r in rs) == list(range(deg)), src
        assert len({r.dst for r in rs}) == deg
    assert {r.dst for r in by_src["h"]} == {f"n{i:04d}" for i in range(300)}
    # cold sources keep the plain dst-ordered index
    assert [(r.idx, r.dst) for r in sorted(by_src["a"], key=lambda r: r.idx)] \
        == [(0, "b"), (1, "c")]

    # deterministic under any physical partitioning
    again = neighbor_index(
        e.repartition(7, "dst"), hub_threshold=100, n_salts=8
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))

    # the hub branch's window partitions by (src, salt): no single-task
    # whole-hub sort in the plan
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan

    # walks over the salted index traverse real edges only
    eset = {(a, b) for a, b in pairs}
    walks = random_walks(
        e, walk_length=4, walks_per_vertex=2, hub_threshold=100, n_salts=8
    ).collect()
    assert walks
    for w in walks:
        for x, y in zip(w.path, w.path[1:]):
            assert (x, y) in eset, (w.walk_id, x, y)


def _edges_df_str(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def test_duplicate_clusters_unconverged_raises(spark):
    """A CC round cap too small for the pair-graph diameter must raise
    (truncated hash-min labels would split clusters and let duplicates
    survive the keep-lowest policy silently)."""
    from smatchpp_spark.pipeline import dedup

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra")], "doc_id long, text string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(
            docs, threshold=0.4, num_hashes=8, band_size=2, max_rounds=0
        )


def test_random_walks_checkpoint_resume_identical(spark, tmp_path):
    """Walk generation resumes mid-corpus: a run interrupted at step 2
    and resumed produces the identical walk table (draws are pure
    functions of walk_id and step)."""
    import os

    from smatchpp_spark.operators.walks import random_walks

    rng = random.Random(31)
    pairs = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    edges = _edges_df(spark, pairs)
    ckpt = str(tmp_path / "walks_ckpt")

    full = random_walks(edges, walk_length=5, seed=3, portable=True)
    want = sorted((r.walk_id, tuple(r.path)) for r in full.collect())

    random_walks(
        edges, walk_length=2, seed=3, portable=True, checkpoint_dir=ckpt
    )
    assert os.path.exists(f"{ckpt}/random_walks/metrics.jsonl")
    resumed = random_walks(
        edges, walk_length=5, seed=3, portable=True,
        checkpoint_dir=ckpt, resume=True,
    )
    got = sorted((r.walk_id, tuple(r.path)) for r in resumed.collect())
    assert got == want


def _py_biased_walks(pairs, walk_length, seed, p, q, weights=None):
    """Pure-python replay of biased_random_walks (portable hash)."""
    ew = {}
    for i, (a, b) in enumerate(pairs):
        a, b = str(a), str(b)
        if a == b:
            continue
        w = 1.0 if weights is None else weights[i]
        ew[(a, b)] = ew.get((a, b), 0.0) + w
    nbrs = {}
    verts = set()
    for (a, b), w in ew.items():
        nbrs.setdefault(a, {})[b] = w
        verts.add(a)
        verts.add(b)
    out = {}
    for v in sorted(verts):
        wid = f"{v}#0"
        path = [v]
        prev = None
        cur = v
        for k in range(1, walk_length + 1):
            cand = sorted(nbrs.get(cur, {}).items())
            if not cand:
                break
            ws = []
            for c, w in cand:
                if prev is None:
                    bias = 1.0
                elif c == prev:
                    bias = 1.0 / p
                elif (prev, c) in ew:
                    bias = 1.0
                else:
                    bias = 1.0 / q
                ws.append(w * bias)
            u = (_portable_hash(f"{wid}#step#{k}#{seed}") % 1_000_000 + 0.5) / 1e6
            tot = sum(ws)
            cum = 0.0
            pick = None
            for (c, _), w in zip(cand, ws):
                cum += w
                if cum > u * tot:
                    pick = c
                    break
            prev = cur
            cur = pick
            path.append(cur)
        out[wid] = path
    return out


def test_biased_walks_match_python_replay(spark):
    """node2vec biased walks reproduce the pure-python replay exactly —
    including the return (1/p), stay-close (1), explore (1/q) biases and
    edge weights — and p=q=1 unweighted gives a valid uniform-ish walk
    set over real edges."""
    from smatchpp_spark.operators.walks import biased_random_walks

    rng = random.Random(19)
    pairs = sorted({(rng.randrange(18), rng.randrange(18)) for _ in range(60)})
    weights = [float(rng.randint(1, 5)) for _ in pairs]
    edges = spark.createDataFrame(
        [(str(a), str(b), w) for (a, b), w in zip(pairs, weights)],
        "src string, dst string, wt double",
    )

    for p, q in ((1.0, 1.0), (0.25, 4.0), (4.0, 0.25)):
        res = biased_random_walks(
            edges, walk_length=4, walks_per_vertex=1, seed=13,
            p=p, q=q, weight_col="wt", portable=True,
        )
        got = {r.walk_id: list(r.path) for r in res.collect()}
        want = _py_biased_walks(
            pairs, walk_length=4, seed=13, p=p, q=q, weights=weights
        )
        assert got == want, (p, q)

    # unweighted, p=q=1: all steps follow real edges
    eset = {(str(a), str(b)) for a, b in pairs if a != b}
    res = biased_random_walks(edges.select("src", "dst"), walk_length=3, seed=1)
    for r in res.collect():
        for x, y in zip(r.path, r.path[1:]):
            assert (x, y) in eset
