"""Product quantization: exact python-replay parity + kmeans refinement.

Semantics per Jégou et al. 2011 (public): per-subspace codebooks,
asymmetric distance computation, subspace-0 code as the coarse cell.
"""

from __future__ import annotations

import random

from smatchpp_spark.pipeline.similarity import (
    pq_codebooks,
    pq_encode,
    pq_topk,
)

M, D0, NC = 2, 4, 4
DIMS = M * D0


def _vectors(n=60, seed=21):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        center = [(i % 3) * 5.0] * DIMS  # 3 coarse clusters
        out.append((i, [center[d] + rng.uniform(-1, 1) for d in range(DIMS)]))
    return out


def _df(spark, vecs):
    return spark.createDataFrame(vecs, "vec_id long, embedding array<double>")


def _py_codebooks(vecs):
    head = sorted(vecs)[:NC]
    return [[v[j * D0 : (j + 1) * D0] for _, v in head] for j in range(M)]


def _l2(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _py_encode(v, books):
    return [
        min(
            range(NC),
            key=lambda c: (_l2(v[j * D0 : (j + 1) * D0], books[j][c]), c),
        )
        for j in range(M)
    ]


def _py_topk(vecs, books, queries, k=3):
    codes = {i: _py_encode(v, books) for i, v in vecs}
    out = {}
    for qi, qv in queries:
        cell = codes[qi][0]
        cand = []
        for ni, _ in vecs:
            if ni == qi or codes[ni][0] != cell:
                continue
            d = sum(
                _l2(qv[j * D0 : (j + 1) * D0], books[j][codes[ni][j]])
                for j in range(M)
            )
            cand.append((round(d, 6), ni))
        cand.sort()
        out[qi] = cand[:k]
    return out


def test_pq_codebooks_seed_shape(spark):
    vecs = _vectors()
    books = pq_codebooks(_df(spark, vecs), m=M, n_codes=NC)
    assert books == _py_codebooks(vecs)


def test_pq_encode_vs_python(spark):
    vecs = _vectors()
    books = pq_codebooks(_df(spark, vecs), m=M, n_codes=NC)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(_df(spark, vecs), books).collect()
    }
    for i, v in vecs:
        assert got[i] == _py_encode(v, books), i


def test_pq_topk_vs_python(spark):
    vecs = _vectors()
    df = _df(spark, vecs)
    books = pq_codebooks(df, m=M, n_codes=NC)
    queries = [(i, v) for i, v in vecs if i % 10 == 0]
    want = _py_topk(vecs, books, queries, k=3)
    rows = pq_topk(df, _df(spark, queries), books, k=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["approx_dist"], r["neighbor_id"])
        )
    for qi in want:
        assert sorted(got.get(qi, [])) == want[qi], qi


def test_pq_kmeans_refinement_improves_quantization(spark):
    vecs = _vectors(n=80)
    df = _df(spark, vecs)
    seed_books = pq_codebooks(df, m=M, n_codes=NC, n_iter=0)
    ref_books = pq_codebooks(df, m=M, n_codes=NC, n_iter=3)
    assert len(ref_books) == M and all(len(b) == NC for b in ref_books)

    def total_err(books):
        return sum(
            _l2(v[j * D0 : (j + 1) * D0], books[j][_py_encode(v, books)[j]])
            for _, v in vecs
            for j in range(M)
        )

    # Lloyd iterations never increase total quantization error
    assert total_err(ref_books) <= total_err(seed_books) + 1e-9


def test_sq_codes_bounds_and_recall(spark):
    import random

    from pyspark.sql import functions as F

    from smatchpp_spark.pipeline.similarity import (
        cosine_topk,
        sq_encode,
        sq_topk,
        sq_train,
    )

    random.seed(9)
    vecs = [(i, [random.gauss(0, 1) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    b = sq_train(df)
    assert len(b) == 16 and all(lo <= hi for lo, hi in b)
    enc = sq_encode(df, b)
    r = enc.select(F.explode("codes").alias("c")).agg(
        F.min("c"), F.max("c")
    ).collect()[0]
    assert 0 <= r[0] and r[1] <= 255
    # the corpus extremes hit both ends of the code range
    assert r[0] == 0 and r[1] == 255
    q = df.filter(F.col("vec_id") % 50 == 0)
    exact = {(x.query_id, x.neighbor_id) for x in cosine_topk(df, q, k=5).collect()}
    sq = {(x.query_id, x.neighbor_id) for x in sq_topk(df, q, k=5).collect()}
    assert len(exact & sq) / len(exact) >= 0.8  # 8-bit ADC recall


def test_sq_degenerate_dimension_and_guard(spark):
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from smatchpp_spark.pipeline.similarity import sq_encode, sq_topk, sq_train

    # a constant dimension has zero width: codes to 0, never NaN
    df = spark.createDataFrame(
        [(1, [1.0, 7.0]), (2, [2.0, 7.0]), (3, [3.0, 7.0])],
        "vec_id long, embedding array<double>",
    )
    b = sq_train(df)
    codes = {r.vec_id: r.codes for r in sq_encode(df, b).collect()}
    assert [c[1] for c in codes.values()] == [0, 0, 0]
    assert codes[1][0] == 0 and codes[3][0] == 255
    with pytest.raises(ValueError):
        sq_topk(df, df, k=1, max_queries=2)
