"""Bond percolation: cycle invariants, determinism, fixed vertex set."""

from __future__ import annotations

from smatchpp_spark.operators.percolation import percolation_profile


def _cycle(spark, n=30):
    E = [(f"v{i:02d}", f"v{(i + 1) % n:02d}") for i in range(n)]
    return spark.createDataFrame(E, "src string, dst string")


def test_cycle_invariants(spark):
    df = _cycle(spark)
    rows = {
        r.p: r for r in percolation_profile(df, ps=(0.1, 0.5, 1.0)).collect()
    }
    # p=1: the full cycle is one component
    assert rows[1.0].n_components == 1 and rows[1.0].largest_component == 30
    assert rows[1.0].n_edges_kept == 30 and rows[1.0].frac_largest == 1.0
    # removing k edges from a cycle leaves exactly max(1, k) paths:
    # components = n - kept for any proper subgraph of the cycle
    for p in (0.1, 0.5):
        r = rows[p]
        assert r.n_vertices == 30
        assert r.n_components == 30 - r.n_edges_kept
    # monotone: more retention, fewer components
    assert (
        rows[0.1].n_components
        >= rows[0.5].n_components
        >= rows[1.0].n_components
    )


def test_deterministic_and_vertex_set_fixed(spark):
    df = _cycle(spark)
    a = sorted(map(tuple, percolation_profile(df, ps=(0.3,)).collect()))
    b = sorted(
        map(tuple, percolation_profile(df.repartition(7), ps=(0.3,)).collect())
    )
    assert a == b
    # every vertex of the ORIGINAL graph is counted even at p -> 0
    r = percolation_profile(df, ps=(0.001,)).collect()[0]
    assert r.n_vertices == 30
