"""Differential tests of the pairwise alignment + scoring kernel against
the reference implementation (numpy-only configuration: PenmanReader,
seeded HillClimber, IDTripleMatcher, TripleScorer)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from smatchpp_spark.corpus import generate_penman
from smatchpp_spark.operators import align as myalign

ref = pytest.importorskip("smatchpp.data_helpers", reason="reference not importable")
from smatchpp import data_helpers, preprocess, score, solvers  # noqa: E402
from smatchpp import align as ref_align  # noqa: E402

READER = data_helpers.PenmanReader()
PREP = preprocess.BasicGraphPairPreparer()
SCORER = score.TripleScorer()


def ref_score_pair(s1: str, s2: str, restarts: int = 8) -> list[float]:
    aligner = ref_align.GraphAligner(
        score.IDTripleMatcher(), solvers.HillClimber(rand_inits=restarts)
    )
    g1 = READER.string2graph(s1)
    g2 = READER.string2graph(s2)
    random.seed(0)
    t1, t2, v1, v2 = PREP.prepare_get_vars(list(g1), list(g2))
    am, vi, _ = aligner.align(t1, t2, v1, v2)
    return list(SCORER.score(list(t1), list(t2), am, vi))


def my_score_pair(s1: str, s2: str, **cfg_kwargs) -> list[float]:
    g1 = READER.string2graph(s1)
    g2 = READER.string2graph(s2)
    row = myalign.process_pair(list(g1), list(g2), myalign.AlignConfig(**cfg_kwargs))
    return [row["matchsum_x"], row["matchsum_y"], float(row["xlen"]), float(row["ylen"])]


GOLDEN = [
    # README example pair (control-01 inversion), expected [3,3,6,6]
    (
        "(m / man :arg0-of (c / control-01 :arg1 (c2 / computer)))",
        "(c / computer :arg1-of (c2 / control-01 :arg0 (m / man)))",
        [3.0, 3.0, 6.0, 6.0],
    ),
    ("(x / test)", "(y / test)", [2.0, 2.0, 2.0, 2.0]),
    (
        "(a / ant :mod (s / small))",
        "(a / ant :mod (s2 / small) :polarity -)",
        [4.0, 4.0, 4.0, 5.0],
    ),
]


def test_golden_pairs():
    for s1, s2, expect in GOLDEN:
        assert my_score_pair(s1, s2) == expect
        assert ref_score_pair(s1, s2) == expect


def test_self_score_is_perfect():
    for i in range(20):
        rng = random.Random(f"selfscore:{i}")
        g = generate_penman(rng, max_nodes=6, max_depth=3)
        row = my_score_pair(g, g)
        n = row[2]
        assert row == [n, n, n, n], g


def test_differential_vs_reference_small_graphs():
    """40 seeded small-graph pairs: our exhaustive solver (certified
    optimum) must produce the same 4-vector as the reference's seeded
    hill-climber (which reaches the optimum on graphs this small)."""
    mismatches = []
    for i in range(40):
        rng = random.Random(f"diff:{i}")
        s1 = generate_penman(rng, max_nodes=6, max_depth=3)
        s2 = generate_penman(rng, max_nodes=6, max_depth=3)
        mine = my_score_pair(s1, s2, solver="exhaustive")
        refv = ref_score_pair(s1, s2)
        if mine != refv:
            mismatches.append((i, s1, s2, mine, refv))
    assert not mismatches, mismatches[:3]


def test_hillclimber_matches_exhaustive_on_small_graphs():
    for i in range(25):
        rng = random.Random(f"hc:{i}")
        s1 = generate_penman(rng, max_nodes=6, max_depth=3)
        s2 = generate_penman(rng, max_nodes=6, max_depth=3)
        ex = my_score_pair(s1, s2, solver="exhaustive")
        hc = my_score_pair(s1, s2, solver="hillclimber", restarts=6)
        assert hc == ex, (i, s1, s2, hc, ex)


def test_lossless_compression_matches_reference():
    prep_c = preprocess.BasicGraphPairPreparer(lossless_graph_compression=True)
    for i in range(25):
        rng = random.Random(f"comp:{i}")
        s1 = generate_penman(rng, max_nodes=7, max_depth=3)
        s2 = generate_penman(rng, max_nodes=7, max_depth=3)
        g1 = READER.string2graph(s1)
        g2 = READER.string2graph(s2)
        rt1, rt2, rv1, rv2 = prep_c.prepare_get_vars(list(g1), list(g2))
        mt1, mt2, mv1, mv2 = myalign.prepare_pair(list(g1), list(g2), compress=True)
        assert sorted(rt1) == sorted(mt1)
        assert sorted(rt2) == sorted(mt2)
        assert set(rv1) == set(mv1)
        assert set(rv2) == set(mv2)


def _clean_parse(s: str) -> bool:
    """True when the reference parser did not need broken-graph salvage
    (salvaged triples carry stray parens); the compression-losslessness
    property is only claimed for well-formed graphs."""
    return all(
        "(" not in x and ")" not in x
        for tr in READER.string2graph(s)
        for x in tr
    )


def test_compressed_scores_match_reference():
    """Differential under lossless_graph_compression: our compressed
    4-vectors equal the reference's compressed 4-vectors (the reference's
    "lossless" is itself conditional — a concept mentioned in only one
    graph still gets contracted, shrinking that side's length — so the
    faithful property is reference equality, not F1 invariance)."""
    for i in range(25):
        rng = random.Random(f"compscore:{i}")
        s1 = generate_penman(rng, max_nodes=6, max_depth=3)
        s2 = generate_penman(rng, max_nodes=6, max_depth=3)
        if not (_clean_parse(s1) and _clean_parse(s2)):
            continue
        g1 = READER.string2graph(s1)
        g2 = READER.string2graph(s2)
        prep_c = preprocess.BasicGraphPairPreparer(lossless_graph_compression=True)
        aligner = ref_align.GraphAligner(
            score.IDTripleMatcher(), solvers.HillClimber(rand_inits=8)
        )
        random.seed(0)
        t1, t2, v1, v2 = prep_c.prepare_get_vars(list(g1), list(g2))
        am, vi, _ = aligner.align(t1, t2, v1, v2)
        refv = list(SCORER.score(list(t1), list(t2), am, vi))
        mine = my_score_pair(s1, s2, solver="exhaustive", compress=True)
        assert mine == refv, (i, s1, s2, mine, refv)


def test_spark_operator_matches_kernel(spark):
    """align_and_score through cogroup+applyInPandas == pure kernel."""
    from smatchpp_spark.corpus import corpus_dataframe
    from smatchpp_spark.sources.penman import parse_edges, with_graph_id

    corpus = corpus_dataframe(spark, 30, seed=7)
    edges = parse_edges(corpus).cache()
    # pair graph i with graph i+15 by renaming pair keys
    ids = [r["graph_id"] for r in with_graph_id(corpus).select("graph_id").collect()]
    mapping_a = {gid: str(i % 15) for i, gid in enumerate(ids)}
    side = {gid: i // 15 for i, gid in enumerate(ids)}
    mapping_df = spark.createDataFrame(
        [(g, mapping_a[g], side[g]) for g in ids], "graph_id string, pair_id string, side int"
    )
    keyed = edges.join(mapping_df, "graph_id")
    ea = keyed.filter(F.col("side") == 0)
    # cogrouping two filters of one plan trips the ambiguous-self-join
    # check; break lineage on one side
    eb = keyed.filter(F.col("side") == 1).localCheckpoint(eager=True)
    cfg = myalign.AlignConfig(solver="auto", exhaustive_max_v=6, restarts=4)
    got = {
        r["pair_id"]: (r["matchsum_x"], r["matchsum_y"], r["xlen"], r["ylen"])
        for r in myalign.align_and_score(ea, eb, pair_col="pair_id", cfg=cfg).collect()
    }
    assert len(got) == 15

    # pure-kernel reproduction
    triples = {}
    for r in edges.orderBy("graph_id", "pos").collect():
        triples.setdefault(r["graph_id"], []).append((r["src"], r["rel"], r["dst"]))
    for i in range(15):
        ga = ids[i]
        gb = ids[i + 15]
        row = myalign.process_pair(
            triples[ga], triples[gb], cfg, pair_seed=myalign.stable_pair_seed(str(i))
        )
        assert got[str(i)] == (
            row["matchsum_x"], row["matchsum_y"], row["xlen"], row["ylen"]
        ), i


def test_graded_concept_matcher():
    """EmbeddingConceptMatcher analog (score.py:31-65): graded similarity
    applies to :instance triples with matching (masked) sources, in both
    the alignment objective and the matchsum."""
    sim = {("cat", "kitten"): 0.8, ("dog", "wolf"): 0.5}
    cfg = myalign.AlignConfig(solver="exhaustive", concept_sim=sim)
    g1 = READER.string2graph("(x / cat)")
    g2 = READER.string2graph("(y / kitten)")
    row = myalign.process_pair(list(g1), list(g2), cfg)
    # root triple matches exactly (1.0) + instance graded 0.8
    assert row["matchsum_x"] == pytest.approx(1.8)
    assert row["matchsum_y"] == pytest.approx(1.8)
    assert (row["xlen"], row["ylen"]) == (2, 2)
    # without the graded matcher only the root survives
    plain = myalign.process_pair(
        list(g1), list(g2), myalign.AlignConfig(solver="exhaustive")
    )
    assert plain["matchsum_x"] == 1.0
    # graded alignment steers the solver: dog aligns to wolf, not to an
    # unrelated node
    g3 = READER.string2graph("(a / dog :arg0 (b / bird))")
    g4 = READER.string2graph("(c / wolf :arg0 (d / fish))")
    row2 = myalign.process_pair(list(g3), list(g4), cfg)
    # matches: root 1.0 + dog~wolf 0.8? no: 0.5 + :arg0 edge exact 1.0
    assert row2["matchsum_x"] == pytest.approx(1.0 + 0.5 + 1.0)


def test_swap_gain_equals_full_rescore():
    """Property: incremental swap_gain == full objective re-scoring delta
    on random match dicts (includes self-loops and i-k cross terms)."""
    rng = random.Random(99)
    for trial in range(200):
        V = rng.randint(2, 7)
        unary = {
            (rng.randrange(V), rng.randrange(V)): rng.randint(1, 3) * 0.5
            for _ in range(rng.randint(0, 8))
        }
        binary = {}
        for _ in range(rng.randint(0, 10)):
            a, b, c, d = (rng.randrange(V) for _ in range(4))
            binary[(a, b, c, d)] = binary.get((a, b, c, d), 0.0) + 0.5
            binary[(c, d, a, b)] = binary.get((c, d, a, b), 0.0) + 0.5
        grouped = myalign._group_binary(binary)
        align = np.array(rng.sample(range(V), V), dtype=int)
        i = rng.randrange(1, V)
        k = rng.randrange(0, i)
        before = myalign.alignment_score(align, unary, grouped)
        inc = myalign.swap_gain(align, unary, grouped, i, k)
        swapped = align.copy()
        swapped[i], swapped[k] = align[k], align[i]
        full = myalign.alignment_score(swapped, unary, grouped) - before
        assert inc == pytest.approx(full), (trial, V, align, i, k, unary, binary)


def test_branch_bound_matches_exhaustive_objective():
    """Random synthetic match dicts (V ≤ 6): branch-and-bound must certify
    the same optimum the exhaustive enumerator finds (ub == lb == opt)."""
    for trial in range(30):
        rng = random.Random(f"bnb:{trial}")
        V = rng.randint(1, 6)
        unary = {}
        for i in range(V):
            for j in range(V):
                if rng.random() < 0.5:
                    unary[(i, j)] = rng.randint(0, 4) * 1.0
        binary = {}
        for _ in range(rng.randint(0, 3 * V)):
            i, j, k, l = (rng.randrange(V) for _ in range(4))
            w = rng.randint(1, 3) * 0.5
            if (i, j) == (k, l):
                binary[(i, j, k, l)] = binary.get((i, j, k, l), 0.0) + w
            else:
                # symmetric half-weight construction, as build_match_dicts
                binary[(i, j, k, l)] = binary.get((i, j, k, l), 0.0) + w / 2
                binary[(k, l, i, j)] = binary.get((k, l, i, j), 0.0) + w / 2
        _, ex_score, _ = myalign.solve_exhaustive(unary, binary, V)
        a, lb, ub = myalign.solve_branch_bound(unary, binary, V, seed=trial)
        assert abs(lb - ex_score) < 1e-9, (trial, lb, ex_score)
        assert abs(ub - lb) < 1e-9, (trial, lb, ub)
        grouped = myalign._group_binary(binary)
        assert abs(myalign.alignment_score(a, unary, grouped) - lb) < 1e-9


def test_branch_bound_on_graph_pairs_matches_exhaustive():
    for i in range(25):
        rng = random.Random(f"bnbpair:{i}")
        s1 = generate_penman(rng, max_nodes=6, max_depth=3)
        s2 = generate_penman(rng, max_nodes=6, max_depth=3)
        ex = my_score_pair(s1, s2, solver="exhaustive")
        bb = my_score_pair(s1, s2, solver="bnb")
        assert bb == ex, (i, s1, s2, bb, ex)


def test_branch_bound_certifies_midsize_graphs():
    """V in (7, 12]: beyond the old exhaustive cap, the auto solver now
    certifies optimality — ub == lb on every pair, and its score is at
    least the hillclimber's."""
    certified = 0
    for i in range(12):
        rng = random.Random(f"bnbmid:{i}")
        s1 = generate_penman(rng, max_nodes=11, max_depth=4)
        s2 = generate_penman(rng, max_nodes=11, max_depth=4)
        g1 = list(READER.string2graph(s1))
        g2 = list(READER.string2graph(s2))
        row = myalign.process_pair(
            g1, g2, myalign.AlignConfig(solver="auto")
        )
        if row["n_vars_a"] == 0 or row["n_vars_b"] == 0:
            continue
        assert row["upper_bound"] == row["lower_bound"], (i, row)
        hc = myalign.process_pair(
            g1, g2, myalign.AlignConfig(solver="hillclimber", restarts=4)
        )
        assert row["lower_bound"] >= hc["lower_bound"] - 1e-9
        certified += 1
    assert certified >= 8


def test_hillclimber_upper_bound_finite_and_admissible():
    """The hillclimber path must report the finite B&B root bound, never
    the reference's 1e7 sentinel (solvers.py:356) — and the bound must be
    admissible: >= the certified optimum on instances small enough to
    enumerate."""
    for trial in range(20):
        rng = random.Random(f"rootub:{trial}")
        V = rng.randint(1, 6)
        unary = {}
        for i in range(V):
            for j in range(V):
                if rng.random() < 0.5:
                    unary[(i, j)] = rng.randint(0, 4) * 1.0
        binary = {}
        for _ in range(rng.randint(0, 3 * V)):
            i, j, k, l = (rng.randrange(V) for _ in range(4))
            w = rng.randint(1, 3) * 0.5
            if (i, j) == (k, l):
                binary[(i, j, k, l)] = binary.get((i, j, k, l), 0.0) + w
            else:
                binary[(i, j, k, l)] = binary.get((i, j, k, l), 0.0) + w / 2
                binary[(k, l, i, j)] = binary.get((k, l, i, j), 0.0) + w / 2
        _, opt, _ = myalign.solve_exhaustive(unary, binary, V)
        _, lb, ub = myalign.solve_hillclimb(unary, binary, V, seed=trial)
        assert ub < 1e6, (trial, ub)
        assert ub >= opt - 1e-9, (trial, ub, opt)
        assert lb <= ub + 1e-9


def test_large_v_pairs_report_finite_bounds():
    """V > bnb_max_v pairs route to the hillclimber — their stats row must
    carry a finite honest (lb, ub), no 1e7 anywhere."""
    seen_large = 0
    for i in range(10):
        rng = random.Random(f"bigv:{i}")
        s1 = generate_penman(rng, max_nodes=20, max_depth=5)
        s2 = generate_penman(rng, max_nodes=20, max_depth=5)
        g1 = list(READER.string2graph(s1))
        g2 = list(READER.string2graph(s2))
        row = myalign.process_pair(g1, g2, myalign.AlignConfig(solver="auto"))
        V = max(row["n_vars_a"], row["n_vars_b"])
        if V <= 12:
            continue
        seen_large += 1
        assert row["upper_bound"] < 1e6, (i, row)
        assert row["upper_bound"] >= row["lower_bound"] - 1e-9
        # the bound is an upper bound on the achieved matchsum too
        assert row["upper_bound"] >= row["matchsum_x"] - 1e-9
    assert seen_large >= 3


def test_bnb_escalation_certifies_exhausted_pairs():
    """A starved B&B budget leaves a gap (ub > lb); one escalated retry
    closes it on midsize pairs (VERDICT r2 item 7)."""
    found_gap = 0
    for i in range(20):
        rng = random.Random(f"bnb-escalate:{i}")
        s1 = generate_penman(rng, max_nodes=11, max_depth=4)
        s2 = generate_penman(rng, max_nodes=11, max_depth=4)
        g1 = list(READER.string2graph(s1))
        g2 = list(READER.string2graph(s2))
        starved = myalign.process_pair(
            g1, g2,
            myalign.AlignConfig(solver="bnb", bnb_node_budget=3, bnb_escalation=0),
        )
        if starved["upper_bound"] <= starved["lower_bound"] + 1e-9:
            continue  # tiny pair: 3 nodes already certified it
        found_gap += 1
        escalated = myalign.process_pair(
            g1, g2,
            myalign.AlignConfig(
                solver="bnb", bnb_node_budget=3, bnb_escalation=200_000
            ),
        )
        assert escalated["upper_bound"] == escalated["lower_bound"], escalated
        certified = myalign.process_pair(g1, g2, myalign.AlignConfig(solver="bnb"))
        assert escalated["lower_bound"] == certified["lower_bound"]
    assert found_gap >= 1


def test_solve_lap_exact_vs_bruteforce():
    """The Hungarian assignment solver must return the true max-weight
    perfect assignment (validated by V! enumeration on small matrices,
    negative profits included)."""
    import itertools

    for trial in range(120):
        rng = random.Random(f"lap-exact:{trial}")
        V = rng.randint(1, 6)
        m = np.array([[rng.uniform(-5, 10) for _ in range(V)] for _ in range(V)])
        assign, total = myalign.solve_lap(m)
        assert sorted(assign.tolist()) == list(range(V))
        assert abs(sum(m[i, assign[i]] for i in range(V)) - total) < 1e-9
        brute = max(
            sum(m[i, p[i]] for i in range(V))
            for p in itertools.permutations(range(V))
        )
        assert abs(total - brute) < 1e-9, (trial, total, brute)


def test_lap_bound_admissible_and_tighter_than_root():
    """Gilmore-Lawler LAP bound: always >= the certified optimum (valid)
    and always <= the row-max root bound (never worse); strictly tighter
    on a healthy fraction of random instances."""
    tighter = 0
    for trial in range(60):
        rng = random.Random(f"lap-bound:{trial}")
        V = rng.randint(1, 6)
        unary = {
            (i, j): rng.randint(0, 4) * 1.0
            for i in range(V)
            for j in range(V)
            if rng.random() < 0.5
        }
        binary = {}
        for _ in range(rng.randint(0, 3 * V)):
            i, j, k, l = (rng.randrange(V) for _ in range(4))
            w = rng.randint(1, 3) * 0.5
            if (i, j) == (k, l):
                binary[(i, j, k, l)] = binary.get((i, j, k, l), 0.0) + w
            else:
                binary[(i, j, k, l)] = binary.get((i, j, k, l), 0.0) + w / 2
                binary[(k, l, i, j)] = binary.get((k, l, i, j), 0.0) + w / 2
        grouped = myalign._group_binary(binary)
        _, opt, _ = myalign.solve_exhaustive(unary, binary, V)
        lap = myalign.lap_upper_bound(unary, grouped, V)
        root = myalign.root_upper_bound(unary, grouped, V)
        assert lap >= opt - 1e-9, (trial, lap, opt)
        assert lap <= root + 1e-9, (trial, lap, root)
        if lap < root - 1e-9:
            tighter += 1
    assert tighter >= 10


def test_lap_certifies_unary_only_any_v():
    """With no binary terms the objective IS a linear assignment, so the
    LAP bound equals the optimum at any V — the hillclimber path (V far
    beyond exhaustive/bnb reach) must then certify: lb == ub == optimum."""
    V = 25
    rng = random.Random("lap-unary")
    unary = {(i, j): rng.uniform(0.0, 4.0) for i in range(V) for j in range(V)}
    _, lap_opt = myalign.solve_lap(myalign._cap_matrix(unary, {}, V))
    _, lb, ub = myalign.solve_hillclimb(unary, {}, V, seed=3)
    assert abs(ub - lap_opt) < 1e-9
    # the LAP-seeded start makes the climb hit the assignment optimum
    assert abs(lb - ub) < 1e-9, (lb, ub)


def test_bnb_root_certification_skips_search():
    """When the LAP root bound meets the warm-start incumbent the B&B
    returns the certified optimum with a zero node budget — proof the
    certificate came from the bound, not the search."""
    certified_at_root = 0
    for i in range(20):
        rng = random.Random(f"lap-root:{i}")
        s1 = generate_penman(rng, max_nodes=10, max_depth=4)
        s2 = generate_penman(rng, max_nodes=10, max_depth=4)
        g1 = list(READER.string2graph(s1))
        g2 = list(READER.string2graph(s2))
        full = myalign.process_pair(g1, g2, myalign.AlignConfig(solver="bnb"))
        starved = myalign.process_pair(
            g1,
            g2,
            myalign.AlignConfig(solver="bnb", bnb_node_budget=0, bnb_escalation=0),
        )
        if starved["upper_bound"] <= starved["lower_bound"] + 1e-9:
            certified_at_root += 1
            # a root certificate must agree with the full search optimum
            assert abs(starved["lower_bound"] - full["lower_bound"]) < 1e-9
    assert certified_at_root >= 3


def test_lap_dual_forced_bound_admissible():
    """solve_lap duals: reduced costs are dual-feasible and the
    forced-assignment bound total - rc(i,j) upper-bounds the true
    forced optimum (profit[i,j] + LAP of the minor) for every cell —
    the per-node B&B child bound's correctness property."""
    rng = np.random.RandomState(5)
    for trial in range(10):
        n = rng.randint(2, 10)
        prof = np.round(rng.rand(n, n) * 5, 3)
        _, total, u, v = myalign.solve_lap(prof, with_duals=True)
        for i in range(n):
            for j in range(n):
                rc = (-prof[i, j]) - u[i + 1] - v[j + 1]
                assert rc >= -1e-9, (trial, i, j, rc)
                minor = np.delete(np.delete(prof, i, 0), j, 1)
                _, mt = myalign.solve_lap(minor)
                assert total - max(rc, 0.0) >= prof[i, j] + mt - 1e-9


def test_branch_bound_certifies_dense_dicts_v20():
    """Per-node Gilmore–Lawler frontier WITH LAP-dual variable fixing:
    dense random match dicts at V = 16, 20, 25, and 28 certify
    (ub == lb) within the default node budget, and the certified
    optimum is >= the hillclimber's score.  (Child bounds alone topped
    out around V = 20-25; fixing forbids high-reduced-cost cells for
    whole subtrees and pushes the routine frontier to V ≈ 32-36.)"""
    for V in (16, 20, 25, 28):
        for t in range(6):
            rng = random.Random(f"dense:{V}:{t}")
            unary = {}
            for i in range(V):
                for j in range(V):
                    if rng.random() < 0.5:
                        unary[(i, j)] = rng.randint(0, 4) * 1.0
            binary = {}
            for _ in range(rng.randint(0, 3 * V)):
                i, j, k, l = (rng.randrange(V) for _ in range(4))
                w = rng.randint(1, 3) * 0.5
                if (i, j) == (k, l):
                    binary[(i, j, k, l)] = binary.get((i, j, k, l), 0.0) + w
                else:
                    binary[(i, j, k, l)] = binary.get((i, j, k, l), 0.0) + w / 2
                    binary[(k, l, i, j)] = binary.get((k, l, i, j), 0.0) + w / 2
            a, lb, ub = myalign.solve_branch_bound(unary, binary, V, seed=t)
            assert abs(ub - lb) < 1e-9, (V, t, lb, ub)
            hc, hc_score, _ = myalign.solve_hillclimb(
                unary, binary, V, seed=t, restarts=4
            )
            assert lb >= hc_score - 1e-9
            grouped = myalign._group_binary(binary)
            assert abs(myalign.alignment_score(a, unary, grouped) - lb) < 1e-9
