"""Edge embeddedness + local sparsification: python replay, bridge
behavior, union semantics, salted-phase equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from smatchpp_spark.operators.sparsify import edge_embeddedness, local_sparsify

# triangle(a,b,c) — bridge(c,d) — triangle(d,e,f), pendant(a,p)
E = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
     ("d", "e"), ("e", "f"), ("d", "f"), ("a", "p")]


def _replay():
    canon = {tuple(sorted(p)) for p in E}
    adj: dict[str, set] = {}
    for x, y in canon:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    exp = {}
    for x, y in canon:
        cn = len(adj[x] & adj[y])
        da, db = len(adj[x]), len(adj[y])
        emb = 0.0 if min(da, db) - 1 <= 0 else round(cn / (min(da, db) - 1), 9)
        un = da + db - 2 - cn
        jac = 0.0 if un <= 0 else round(cn / un, 9)
        exp[(x, y)] = (cn, emb, jac)
    return exp


def test_embeddedness_matches_replay(spark):
    edges = spark.createDataFrame(E, "src string, dst string")
    got = {
        (r.a, r.b): (r.support, r.embeddedness, r.nbr_jaccard)
        for r in edge_embeddedness(edges).collect()
    }
    assert got == _replay()
    # the bridge and the pendant are the zero-support (weak-tie) edges
    assert got[("c", "d")][0] == 0 and got[("a", "p")][0] == 0


def test_sparsify_drops_bridge_keeps_triangles(spark):
    edges = spark.createDataFrame(E, "src string, dst string")
    kept = {(r.a, r.b) for r in local_sparsify(edges, exponent=0.5).collect()}
    tri_edges = {("a", "b"), ("a", "c"), ("b", "c"),
                 ("d", "e"), ("d", "f"), ("e", "f")}
    assert tri_edges <= kept
    assert ("c", "d") not in kept  # the zero-support bridge loses its slot
    # union semantics: a degree-1 vertex always keeps its only edge
    assert ("a", "p") in kept


def test_salted_phase_equals_naive_topk(spark):
    # tiny max_fanout forces many salt buckets; result must equal the
    # unsalted exact top-k (phase 1 only prunes within-bucket beyond-k)
    import random

    random.seed(5)
    pairs = list({
        tuple(sorted((f"v{random.randrange(20)}", f"v{random.randrange(20)}")))
        for _ in range(80)
    })
    pairs = [p for p in pairs if p[0] != p[1]]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    a = {(r.a, r.b) for r in local_sparsify(edges, 0.5, max_fanout=2).collect()}
    b = {(r.a, r.b) for r in local_sparsify(edges, 0.5, max_fanout=10**5).collect()}
    assert a == b


def test_exponent_one_keeps_everything(spark):
    edges = spark.createDataFrame(E, "src string, dst string")
    kept = local_sparsify(edges, exponent=1.0)
    assert kept.count() == len({tuple(sorted(p)) for p in E})
