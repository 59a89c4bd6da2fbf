"""Fine-grained (per-aspect) scoring given a whole-graph alignment — the
DataFrame-native form of the reference's ``all-onealign`` dimension
(bindings.py:81-94): align each pair ONCE on the full graphs, then score
every aspect subgraph under that alignment.

Faithful stage order (bindings.py:81-94 operates on *prepared* graphs):
affix variables first (aa_/bb_, preprocess.py:67-87) — so a variable that
happens to be named like a concept-group member can never seed an aspect
— then extract aspect subgraphs, then substitute aligned g1 variables by
their g2 partners, then multiset-match.

Where the reference substitutes variables in Python per pair
(score.py:81-141), here substitution is an equi-join against the
alignment table and the matchsum is a count-join-least aggregation —
whole-stage codegen, no Python.  With the exact (ID) matcher,
``matchsum = Σ min(count_a, count_b)`` over identical substituted
triples, which equals the reference's greedy duplicate-capped matchsum
(score.py:143-179).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.scores import STAT_COLS

INSTANCE = ":instance"


def alignment_table(stats_with_alignment: DataFrame) -> DataFrame:
    """(pair_id, var_a, var_b) rows from the JSON alignment column that
    ``align_and_score(..., return_alignment=True)`` emits."""
    return stats_with_alignment.select(
        "pair_id",
        F.explode(F.from_json("alignment", "map<string,string>")).alias(
            "var_a", "var_b"
        ),
    )


def graph_vars(edges: DataFrame, pair_col: str = "pair_id") -> DataFrame:
    """(pair_id, var): the :instance sources of each graph (util.py:13-19)."""
    return (
        edges.filter(F.col("rel") == INSTANCE)
        .select(F.col(pair_col).alias("pair_id"), F.col("src").alias("var"))
        .distinct()
    )


def affix_edges(
    edges: DataFrame,
    vars_tbl: DataFrame,
    affix: str,
    pair_col: str = "pair_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Prefix this graph side's variables (reference _affix_vars,
    preprocess.py:67-87); :instance targets are concepts, never prefixed."""
    extra_cols = extra_cols or []
    vset = vars_tbl.select("pair_id", F.col("var").alias("node")).withColumn(
        "is_var", F.lit(True)
    )
    out = edges.select(
        F.col(pair_col).alias("pair_id"), "src", "rel", "dst", *extra_cols
    )
    for col, guard in (("src", False), ("dst", True)):
        joined = out.withColumnRenamed(col, "node").join(
            vset, ["pair_id", "node"], "left"
        )
        new = F.when(F.col("is_var"), F.concat(F.lit(affix), F.col("node"))).otherwise(
            F.col("node")
        )
        if guard:
            new = F.when(F.col("rel") == INSTANCE, F.col("node")).otherwise(new)
        out = joined.withColumn(col, new).drop("node", "is_var")
    return out.select("pair_id", "src", "rel", "dst", *extra_cols)


def apply_alignment(
    affixed_a: DataFrame,
    alignment: DataFrame,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite aligned ``aa_<var_a>`` nodes to ``bb_<var_b>``
    (score.py:81-141 as a join); unaligned aa_ vars keep their name."""
    extra_cols = extra_cols or []
    amap = alignment.select(
        "pair_id",
        F.concat(F.lit("aa_"), F.col("var_a")).alias("node"),
        F.concat(F.lit("bb_"), F.col("var_b")).alias("partner"),
    )
    out = affixed_a
    for col in ("src", "dst"):
        out = (
            out.withColumnRenamed(col, "node")
            .join(amap, ["pair_id", "node"], "left")
            .withColumn(col, F.coalesce("partner", F.col("node")))
            .drop("node", "partner")
        )
    return out.select("pair_id", "src", "rel", "dst", *extra_cols)


def match_stats_given_alignment(
    subst_a: DataFrame,
    affixed_b: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """4-vector per (pair[, group]) from substituted/affixed edges:
    multiset-intersection matchsum via count-join-least.  Groups present
    on only one side get zero matchsum and the other side's length."""
    group = ["pair_id"] + (group_cols or [])
    key = group + ["src", "rel", "dst"]
    ca = subst_a.groupBy(*key).agg(F.count(F.lit(1)).alias("na"))
    cb = affixed_b.groupBy(*key).agg(F.count(F.lit(1)).alias("nb"))
    matched = (
        ca.join(cb, key)
        .groupBy(*group)
        .agg(F.sum(F.least("na", "nb")).cast("double").alias("matchsum"))
    )
    xlen = subst_a.groupBy(*group).agg(F.count(F.lit(1)).alias("xlen"))
    ylen = affixed_b.groupBy(*group).agg(F.count(F.lit(1)).alias("ylen"))
    spine = xlen.select(*group).unionByName(ylen.select(*group)).distinct()
    return (
        spine.join(matched, group, "left")
        .join(xlen, group, "left")
        .join(ylen, group, "left")
        .select(
            *group,
            F.coalesce("matchsum", F.lit(0.0)).alias("matchsum_x"),
            F.coalesce("matchsum", F.lit(0.0)).alias("matchsum_y"),
            F.coalesce("xlen", F.lit(0)).alias("xlen"),
            F.coalesce("ylen", F.lit(0)).alias("ylen"),
        )
    )


def score_aspects_onealign(
    edges_a: DataFrame,
    edges_b: DataFrame,
    alignment: DataFrame,
    pair_col: str = "graph_id",
    edge_rules: dict | None = None,
) -> DataFrame:
    """Per-(pair, aspect) match 4-vectors under one whole-graph alignment
    (the ``all-onealign`` score dimension, bindings.py:81-94).

    Both edge tables are affixed, aspect-expanded (19 aspect tags), then a
    single substitution + matchsum pass scores all aspects of all pairs
    in one shot — a handful of shuffles total regardless of aspect count,
    vs the reference's aspect × pair Python loop.
    """
    from smatchpp_spark.operators.subgraphs import extract_all_aspects

    ea = edges_a.withColumnRenamed(pair_col, "pair_id")
    eb = edges_b.withColumnRenamed(pair_col, "pair_id")
    fa = affix_edges(ea, graph_vars(ea), "aa_", extra_cols=["pos"])
    fb = affix_edges(eb, graph_vars(eb), "bb_", extra_cols=["pos"])
    asp_a = extract_all_aspects(
        fa.withColumnRenamed("pair_id", "graph_id"), edge_rules=edge_rules
    )
    asp_b = extract_all_aspects(
        fb.withColumnRenamed("pair_id", "graph_id"), edge_rules=edge_rules
    )
    sa = apply_alignment(
        asp_a.withColumnRenamed("graph_id", "pair_id"),
        alignment,
        extra_cols=["aspect"],
    )
    sb = asp_b.withColumnRenamed("graph_id", "pair_id").select(
        "pair_id", "src", "rel", "dst", "aspect"
    )
    # each side feeds three matchsum branches (counts, lengths, spine);
    # stage them so the 19-aspect extraction union is planned/run once
    sa = sa.localCheckpoint(eager=False)
    sb = sb.localCheckpoint(eager=False)
    stats = match_stats_given_alignment(sa, sb, group_cols=["aspect"])
    return stats.select("pair_id", F.col("aspect").alias("score_dim"), *STAT_COLS)
