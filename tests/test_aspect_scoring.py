"""Differential: DataFrame-native all-onealign aspect scoring vs the
reference, using the REFERENCE's own alignment so the comparison
isolates extraction + substitution + matchsum (alignment parity is
covered in test_align.py)."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from smatchpp_spark.corpus import generate_penman
from smatchpp_spark.operators.align import AlignConfig, align_and_score
from smatchpp_spark.operators.aspect_scoring import (
    alignment_table,
    score_aspects_onealign,
)
from smatchpp_spark.sources.penman import parse_edges

ref = pytest.importorskip("smatchpp.data_helpers", reason="reference not importable")
from smatchpp import data_helpers, preprocess, score, solvers, subgraph_extraction  # noqa: E402
from smatchpp import align as ref_align  # noqa: E402

READER = data_helpers.PenmanReader()


def _ref_extractor():
    with open(
        "/root/reference/smatchpp/formalism/amr/resource/graph_aspects.json"
    ) as fh:
        aspects = json.load(fh)
    with open(
        "/root/reference/smatchpp/formalism/amr/resource/concept_groups.json"
    ) as fh:
        groups = json.load(fh)
    return subgraph_extraction.BasicSubgraphExtractor(
        add_instance=True, graph_aspects=aspects, concept_groups=groups
    )


def test_onealign_aspect_scores_match_reference(spark):
    n_pairs = 12
    pairs = []
    for i in range(n_pairs):
        rng = random.Random(f"aspscore:{i}")
        pairs.append(
            (
                generate_penman(rng, max_nodes=8, max_depth=4),
                generate_penman(rng, max_nodes=8, max_depth=4),
            )
        )

    prep = preprocess.BasicGraphPairPreparer()
    aligner = ref_align.GraphAligner(
        score.IDTripleMatcher(), solvers.HillClimber(rand_inits=8)
    )
    scorer = score.TripleScorer()
    extractor = _ref_extractor()

    expected: dict[tuple[str, str], list[float]] = {}
    alignment_rows = []
    for i, (s1, s2) in enumerate(pairs):
        g1 = READER.string2graph(s1)
        g2 = READER.string2graph(s2)
        random.seed(0)
        t1, t2, v1, v2 = prep.prepare_get_vars(list(g1), list(g2))
        am, vi, _ = aligner.align(t1, t2, v1, v2)
        for va, vb in ref_align.GraphAligner._get_var_map(am, vi):
            if va is not None and vb is not None:
                alignment_rows.append((str(i), va[3:], vb[3:]))
        sub1 = extractor.all_subgraphs_by_name(list(t1))
        sub2 = extractor.all_subgraphs_by_name(list(t2))
        for name in sub1:
            expected[(str(i), name)] = list(
                scorer.score(list(sub1[name]), list(sub2[name]), am, vi)
            )

    ca = spark.createDataFrame(
        [(str(i), a) for i, (a, _) in enumerate(pairs)], "pid string, content string"
    )
    cb = spark.createDataFrame(
        [(str(i), b) for i, (_, b) in enumerate(pairs)], "pid string, content string"
    )
    edges_a = parse_edges(ca, id_col="pid")
    edges_b = parse_edges(cb, id_col="pid")
    alignment = spark.createDataFrame(
        alignment_rows or [("none", "x", "y")],
        "pair_id string, var_a string, var_b string",
    )
    got = {
        (r["pair_id"], r["score_dim"]): [
            r["matchsum_x"], r["matchsum_y"], float(r["xlen"]), float(r["ylen"])
        ]
        for r in score_aspects_onealign(edges_a, edges_b, alignment).collect()
    }
    mismatches = []
    for key, exp in expected.items():
        mine = got.get(key, [0.0, 0.0, 0.0, 0.0])
        if mine != exp:
            mismatches.append((key, mine, exp))
    assert not mismatches, mismatches[:5]


def test_alignment_table_roundtrip(spark):
    corpus = spark.createDataFrame(
        [("0", "(m / man :arg0 (c / cat))")], "pid string, content string"
    )
    edges = parse_edges(corpus, id_col="pid")
    stats = align_and_score(
        edges, edges, pair_col="graph_id",
        cfg=AlignConfig(solver="exhaustive"), return_alignment=True,
    )
    rows = alignment_table(stats).collect()
    got = {(r["var_a"], r["var_b"]) for r in rows}
    assert got == {("m", "m"), ("c", "c")}


def test_multialign_aspect_scores_match_reference(spark):
    """all-multialign: each aspect pair prepared + aligned independently
    (bindings.py:96-110); our re-keyed pairwise kernel must reproduce the
    reference per-dim 4-vectors (small aspect subgraphs -> exhaustive
    optimum == reference hill-climber optimum)."""
    from smatchpp_spark.engine import EngineConfig, SmatchppSpark
    from smatchpp_spark.operators.align import AlignConfig

    n_pairs = 8
    pairs = []
    for i in range(n_pairs):
        rng = random.Random(f"multi:{i}")
        pairs.append(
            (
                generate_penman(rng, max_nodes=7, max_depth=3),
                generate_penman(rng, max_nodes=7, max_depth=3),
            )
        )

    prep = preprocess.BasicGraphPairPreparer()
    aligner = ref_align.GraphAligner(
        score.IDTripleMatcher(), solvers.HillClimber(rand_inits=8)
    )
    scorer = score.TripleScorer()
    extractor = _ref_extractor()

    expected: dict[tuple[str, str], list[float]] = {}
    for i, (s1, s2) in enumerate(pairs):
        g1 = READER.string2graph(s1)
        g2 = READER.string2graph(s2)
        sub1 = extractor.all_subgraphs_by_name(list(g1))
        sub2 = extractor.all_subgraphs_by_name(list(g2))
        for name in sub1:
            random.seed(0)
            t1, t2, v1, v2 = prep.prepare_get_vars(list(sub1[name]), list(sub2[name]))
            am, vi, _ = aligner.align(t1, t2, v1, v2)
            expected[(str(i), name)] = list(scorer.score(list(t1), list(t2), am, vi))

    ca = spark.createDataFrame(
        [(str(i), a) for i, (a, _) in enumerate(pairs)], "pair_id string, content string"
    )
    cb = spark.createDataFrame(
        [(str(i), b) for i, (_, b) in enumerate(pairs)], "pair_id string, content string"
    )
    eng = SmatchppSpark(
        EngineConfig(standardizer="none", align=AlignConfig(solver="exhaustive"))
    )
    res = eng.score_dimensions(ca, cb, dimension="all-multialign")
    got = {
        (r["pair_id"], r["score_dim"]): [
            r["matchsum_x"], r["matchsum_y"], float(r["xlen"]), float(r["ylen"])
        ]
        for r in res["pairs"].collect()
    }
    mismatches = []
    for key, exp in expected.items():
        mine = got.get(key, [0.0, 0.0, 0.0, 0.0])
        if mine != exp:
            mismatches.append((key, mine, exp))
    assert not mismatches, mismatches[:5]
