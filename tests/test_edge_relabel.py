"""Differential tests: PropBank frame-conditioned edge relabeling
(SyntacticEdgeRelabelingTransformer, reference graph_transforms.py:192-222)
and frame-table inversion (formalism/amr/tools.py:118-128) vs the reference,
plus the relabel-then-extract AMRSubgraphExtractor flow (tools.py:226-232).
"""

from __future__ import annotations

import json
import random
from collections import Counter

import pytest

from smatchpp_spark.corpus import generate_penman
from smatchpp_spark.functions.amr_rules import (
    FRAME_TABLE,
    invert_frame_table,
    parse_frame_table,
    semantic_edge_rules,
)
from smatchpp_spark.operators.standardize import relabel_edges_by_concept
from smatchpp_spark.operators.subgraphs import extract_all_aspects
from smatchpp_spark.sources.penman import parse_edges

ref = pytest.importorskip("smatchpp.data_helpers", reason="reference not importable")
from smatchpp import data_helpers, graph_transforms, subgraph_extraction  # noqa: E402
from smatchpp.formalism.amr import tools as ref_tools  # noqa: E402

READER = data_helpers.PenmanReader()
RULES = semantic_edge_rules()


def test_parse_frame_table_mirrors_reference_format():
    # hand-computed expectation following read_frame_table line handling
    # (tools.py:85-115): lower, split on "  arg", ", "/". " -> " ",
    # whitespace normalized, padded with one space each side.
    text = "Foo-01  ARG0: the  fooer, agent. extra  ARG1: thing fooed\n"
    assert parse_frame_table(text) == {
        "foo-01": {
            ":arg0": " the fooer agent extra ",
            ":arg1": " thing fooed ",
        }
    }


def test_invert_frame_table_matches_reference():
    with open(
        "/root/reference/smatchpp/formalism/amr/resource/graph_aspects.json"
    ) as fh:
        aspects = json.load(fh)
    expected = ref_tools.invert_frame_table(FRAME_TABLE, aspects)
    got = invert_frame_table(FRAME_TABLE, aspects)
    assert {k: dict(v) for k, v in expected.items()} == got
    assert got  # the bundled table must actually generate rules


HITTING_GRAPHS = [
    # hand-written graphs whose (concept, rel) pairs hit bundled rules
    "(c / control-01 :arg0 (p / person) :arg2 (l / lever) :arg1 (m / machine))",
    "(g / go-02 :arg0 (p / person) :arg3 (t / town) :arg4 (r / road))",
    "(p / pay-01 :arg0 (x / person) :arg2 (y / person) :arg3 (z / car))",
    "(o / own-01 :arg0 (p / person) :arg1 (h / house :mod (b / big)))",
    "(t / talk-01 :arg0 (p / person) :arg1 (w / weather) :arg2 p)",
]


def test_relabel_matches_reference_transformer(spark):
    graphs = list(HITTING_GRAPHS)
    for i in range(30):
        rng = random.Random(f"relabel:{i}")
        graphs.append(generate_penman(rng, max_nodes=9, max_depth=4))
    corpus = spark.createDataFrame(
        [(str(i), g) for i, g in enumerate(graphs)], "gid string, content string"
    )
    edges = parse_edges(corpus, id_col="gid")
    got: dict[str, Counter] = {}
    for r in relabel_edges_by_concept(edges, RULES).collect():
        got.setdefault(r["graph_id"], Counter())[(r["src"], r["rel"], r["dst"])] += 1

    transformer = graph_transforms.SyntacticEdgeRelabelingTransformer(RULES)
    n_changed = 0
    for i, g in enumerate(graphs):
        triples = list(READER.string2graph(g))
        out = transformer._transform(triples)
        n_changed += sum(1 for a, b in zip(triples, out) if a != b)
        assert got.get(str(i), Counter()) == Counter(out), i
    # the corpus generator emits control-01/go-02 with :argN edges, so the
    # differential must exercise real rewrites, not just identity
    assert n_changed > 0


def test_aspect_extraction_with_rules_matches_reference(spark):
    graphs = list(HITTING_GRAPHS)
    for i in range(20):
        rng = random.Random(f"relabel-extract:{i}")
        graphs.append(generate_penman(rng, max_nodes=9, max_depth=4))
    corpus = spark.createDataFrame(
        [(str(i), g) for i, g in enumerate(graphs)], "gid string, content string"
    )
    edges = parse_edges(corpus, id_col="gid")
    got: dict[tuple[str, str], Counter] = {}
    for r in extract_all_aspects(edges, edge_rules=RULES).collect():
        got.setdefault((r["graph_id"], r["aspect"]), Counter())[
            (r["src"], r["rel"], r["dst"])
        ] += 1

    with open(
        "/root/reference/smatchpp/formalism/amr/resource/graph_aspects.json"
    ) as fh:
        aspects = json.load(fh)
    with open(
        "/root/reference/smatchpp/formalism/amr/resource/concept_groups.json"
    ) as fh:
        groups = json.load(fh)
    extractor = subgraph_extraction.BasicSubgraphExtractor(
        add_instance=True, graph_aspects=aspects, concept_groups=groups
    )
    transformer = graph_transforms.SyntacticEdgeRelabelingTransformer(RULES)
    mismatches = []
    for i, g in enumerate(graphs):
        triples = transformer._transform(list(READER.string2graph(g)))
        expected = extractor.all_subgraphs_by_name(triples)
        for aspect, sg in expected.items():
            exp = Counter(set(sg))
            mine = got.get((str(i), aspect), Counter())
            if mine != exp:
                mismatches.append((i, aspect, sorted(mine), sorted(exp)))
    assert not mismatches, mismatches[:2]
