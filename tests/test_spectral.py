"""Spectral bisection: true-Fiedler agreement on planted structure,
determinism, disconnected input, resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from smatchpp_spark.operators.spectral import spectral_bisection


def _two_clusters(spark):
    # two 6-cliques joined by one bridge edge
    E = []
    for base in (0, 6):
        for i in range(6):
            for j in range(i + 1, 6):
                E.append((f"v{base + i}", f"v{base + j}"))
    E.append(("v0", "v6"))
    return spark.createDataFrame(E, "src string, dst string")


def test_bisection_splits_planted_clusters(spark):
    r = spectral_bisection(_two_clusters(spark), supersteps=40)
    rows = {x.vertex: x.side for x in r.coords.collect()}
    a = {v for v, s in rows.items() if s}
    c1 = {f"v{i}" for i in range(6)}
    c2 = {f"v{i}" for i in range(6, 12)}
    assert a in (c1, c2)


def test_agrees_with_numpy_fiedler(spark):
    np = __import__("numpy")
    E = [(f"v{i}", f"v{(i + 1) % 10}") for i in range(10)]  # 10-cycle
    edges = spark.createDataFrame(E, "src string, dst string")
    got = {
        x.vertex: x.fiedler
        for x in spectral_bisection(edges, supersteps=60).coords.collect()
    }
    verts = sorted(got, key=lambda v: int(v[1:]))
    A = np.zeros((10, 10))
    for a, b in E:
        i, j = int(a[1:]), int(b[1:])
        A[i, j] = A[j, i] = 1
    d = A.sum(1)
    Dm = np.diag(1 / np.sqrt(d))
    vals, vecs = np.linalg.eigh(Dm @ A @ Dm)
    g = np.array([got[v] for v in verts])
    # the cycle's second eigenvalue has multiplicity 2 and the residual
    # contracts as (0.6545/0.9045)^k ≈ 1e-6 at k=43: project onto the
    # 2-dim eigenspace instead of one chosen basis vector
    space = vecs[:, -3:-1]
    proj = space @ (space.T @ g)
    assert float(np.linalg.norm(g - proj)) < 1e-6
    assert abs(float(np.linalg.norm(g)) - 1.0) < 1e-9  # unit iterate


def test_deterministic_across_partitionings(spark):
    e = _two_clusters(spark)
    a = {
        x.vertex: x.fiedler
        for x in spectral_bisection(e.repartition(1), supersteps=15).coords.collect()
    }
    b = {
        x.vertex: x.fiedler
        for x in spectral_bisection(
            e.repartition(7, "dst"), supersteps=15
        ).coords.collect()
    }
    assert set(a) == set(b)
    assert all(abs(a[v] - b[v]) < 1e-9 for v in a)


def test_disconnected_components_separate(spark):
    # two disjoint triangles: the dominant deflated direction separates
    # the components (the sparsest cut: zero edges crossing)
    E = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
         ("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    r = spectral_bisection(
        spark.createDataFrame(E, "src string, dst string"), supersteps=40
    )
    rows = {x.vertex: x.side for x in r.coords.collect()}
    a_sides = {rows[v] for v in ("a1", "a2", "a3")}
    b_sides = {rows[v] for v in ("b1", "b2", "b3")}
    assert len(a_sides) == 1 and len(b_sides) == 1 and a_sides != b_sides


def test_resume_identical(spark, tmp_path):
    e = _two_clusters(spark)
    ck = str(tmp_path / "ck")
    full = spectral_bisection(e, supersteps=8, checkpoint_dir=ck).coords
    resumed = spectral_bisection(
        e, supersteps=8, checkpoint_dir=ck, resume=True
    ).coords
    j = full.withColumnRenamed("fiedler", "a").join(
        resumed.withColumnRenamed("fiedler", "b"), "vertex"
    )
    assert j.filter(F.col("a") != F.col("b")).count() == 0
