"""Graph snapshot diff (operators/graphdiff.py)."""

from __future__ import annotations

from smatchpp_spark.operators.graphdiff import graph_diff


def _df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def test_diff_classification_and_churn(spark):
    old = [(1, 2), (2, 3), (3, 4), (1, 2)]  # duplicate collapses
    new = [(1, 2), (3, 4), (4, 5), (2, 5)]
    r = graph_diff(_df(spark, old), _df(spark, new))
    st = {(x.src, x.dst): x.status for x in r.edges.collect()}
    assert st[("1", "2")] == "kept" and st[("3", "4")] == "kept"
    assert st[("2", "3")] == "removed"
    assert st[("4", "5")] == "added" and st[("2", "5")] == "added"
    assert (r.n_added, r.n_removed, r.n_kept) == (2, 1, 2)
    v = {x.vertex: x for x in r.vertices.collect()}
    # vertex 2: out 1->1 (kept 2->3? no: removed; added 2->5), in 1->1
    assert (v["2"].out_old, v["2"].out_new) == (1, 1)
    assert v["2"].churn == 0  # degree-neutral rewiring is churn 0 by design
    assert (v["5"].in_old, v["5"].in_new, v["5"].churn) == (0, 2, 2)
    assert v["3"].churn == 1  # lost the in-edge 2->3


def test_diff_identical_snapshots(spark):
    e = [(1, 2), (2, 3)]
    r = graph_diff(_df(spark, e), _df(spark, e))
    assert (r.n_added, r.n_removed, r.n_kept) == (0, 0, 2)
    assert r.vertices.filter("churn > 0").count() == 0
