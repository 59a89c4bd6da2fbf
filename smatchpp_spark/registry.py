"""Component registries keyed by uri/name — the DataFrame-native analog of
the reference's ``model_factory`` (model_factory.py:1-120): the same names
resolve to the same semantic components, with the same NotImplementedError
contract for unknown uris.

Where the reference returns objects with ``standardize`` /
``string2graph`` / ``all_subgraphs_by_name`` methods over triple lists,
these factories return DataFrame transforms over the global edge table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class StandardizerFactory:
    """uri → edge-table standardizer (model_factory.py:6-33)."""

    @classmethod
    def get_standardizer(cls, uri: str | None) -> Callable[[DataFrame], DataFrame]:
        from smatchpp_spark.operators.standardize import (
            amr_standardize,
            generic_standardize,
        )

        if not uri or uri == "none":
            return lambda df: df  # DoNothingStandardizer
        if uri == "amr":
            return amr_standardize
        if uri == "generic":
            return generic_standardize
        raise NotImplementedError(f"Preprocessor for uri {uri} not implemented")


class GraphReaderFactory:
    """uri → corpus parser (model_factory.py:60-85)."""

    @classmethod
    def get_reader(
        cls, uri: str
    ) -> Callable[..., DataFrame]:
        if uri == "penman":
            from smatchpp_spark.sources.penman import parse_edges

            return parse_edges
        if uri == "tsv":
            from smatchpp_spark.sources.tsv import parse_tsv_edges

            return parse_tsv_edges
        if uri == "goodmami":
            # optional third-party wrapper (reference data_helpers.py:255-275);
            # resolves when the penman library is importable, else raises the
            # reference's install hint at call time
            from smatchpp_spark.sources.penman import goodmami_parse_edges

            return goodmami_parse_edges
        raise NameError(f"reader {uri} not implemented")


class SubgraphExtractorFactory:
    """uri → tagged aspect extractor (model_factory.py:36-57).

    ``edge_rules="bundled"`` applies the PropBank frame-conditioned
    relabel prelude from the bundled frame table (the reference's
    with-frame-file behavior, formalism/amr/tools.py:215-232); ``None``
    matches its offline empty-table fallback.
    """

    @classmethod
    def get_extractor(
        cls, uri: str, edge_rules: dict | str | None = "bundled"
    ) -> Callable[[DataFrame], DataFrame]:
        if uri == "amr":
            from smatchpp_spark.functions.amr_rules import semantic_edge_rules
            from smatchpp_spark.operators.subgraphs import extract_all_aspects

            rules = semantic_edge_rules() if edge_rules == "bundled" else edge_rules

            def extract(edges: DataFrame, **kw) -> DataFrame:
                return extract_all_aspects(edges, edge_rules=rules, **kw)

            return extract
        raise NotImplementedError(
            f"Subgraph extraction for graph type {uri} not implemented"
        )


class SolverFactory:
    """uri → solver name accepted by AlignConfig (solvers.py get_solver
    analog).  Reference names map to the closest certified equivalent:
    ``ilp`` / ``ilp_backed`` → branch-and-bound (certified optimum +
    honest (lb, ub) — the ILP contract, solvers.py:417-454; the ``mip``
    dependency is unavailable offline); ``lp`` → hillclimber whose LAP
    relaxation bound + repaired-alignment rescore meet the LP contract
    (solvers.py:457-511); ``rilp`` raises, as the reference itself marks
    it experimental (solvers.py:539-548)."""

    NAMES = {
        "auto": "auto",
        "bnb": "bnb",
        "exhaustive": "exhaustive",
        "hillclimber": "hillclimber",
        "dummy": "dummy",
        "ilp": "bnb",
        "ilp_backed": "bnb",
        # the reference LP contract (solvers.py:457-511) is a finite
        # relaxation upper bound + a repaired feasible alignment re-scored
        # for the lower bound — the hillclimber path delivers exactly that
        # via the Gilmore-Lawler LAP bound and the LAP-seeded climb
        "lp": "hillclimber",
    }

    @classmethod
    def get_solver(cls, uri: str) -> str:
        if uri in cls.NAMES:
            return cls.NAMES[uri]
        raise NotImplementedError(f"solver {uri} not implemented")
