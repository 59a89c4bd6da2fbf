"""Graph standardization passes as DataFrame rewrites.

Each pass is an equivalence-preserving transform over the global edge
table ``(graph_id, pos, src, rel, dst)``; together they reproduce the
reference standardizer pipelines:

  * ``generic_standardize`` — lower → dequote → relabel_vars → deinvert
    (reference formalism/generic/tools.py:15-57)
  * ``amr_standardize`` — lower → dequote → relabel_vars → domain2mod →
    deinvert → concept_as_root → dereify → dedup
    (reference formalism/amr/tools.py:179-193)

All passes are pure column expressions, window functions, and joins —
whole-stage-codegen friendly, no Python on the executors.  Per-graph
lookup tables (variable→concept, constants) are expressed as joins on
``graph_id`` so Catalyst shuffles once on the graph key and AQE handles
size decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smatchpp_spark.functions.amr_rules import DEREIFY_RULES

INSTANCE = ":instance"
ROOT_REL = ":root"

_EDGE_COLS = ["graph_id", "pos", "src", "rel", "dst"]


def _edges(df: DataFrame) -> DataFrame:
    return df.select(*_EDGE_COLS)


def _stage(df: DataFrame) -> DataFrame:
    """Lineage barrier between passes that reference their input several
    times (relabel joins 4 derivations of it, dereify 6).  Without it the
    chained pipeline duplicates the whole upstream plan per reference —
    multiplicative plan growth, measured 3x wall on the full AMR chain.
    Lazy localCheckpoint = compute once, reuse; the batch-superstep
    analog of SuperstepRunner's per-step truncation (at cluster scale an
    intermediate table write serves the same role)."""
    return df.localCheckpoint(eager=False)


def lower_all_labels(edges: DataFrame) -> DataFrame:
    """Lowercase src/rel/dst (reference graph_transforms.py:13-16)."""
    return edges.select(
        "graph_id",
        "pos",
        F.lower("src").alias("src"),
        F.lower("rel").alias("rel"),
        F.lower("dst").alias("dst"),
    )


def remove_quotes(edges: DataFrame) -> DataFrame:
    """Strip double and single quotes (graph_transforms.py:19-29)."""
    dequote = lambda c: F.translate(c, "\"'", "")  # noqa: E731
    return edges.select(
        "graph_id",
        "pos",
        dequote("src").alias("src"),
        dequote("rel").alias("rel"),
        dequote("dst").alias("dst"),
    )


def remove_duplicates(edges: DataFrame) -> DataFrame:
    """Set-dedup triples per graph, keeping the smallest pos of each
    duplicate group so downstream order stays deterministic
    (graph_transforms.py:8-10)."""
    return edges.groupBy("graph_id", "src", "rel", "dst").agg(
        F.min("pos").alias("pos")
    ).select(*_EDGE_COLS)


def variables(edges: DataFrame) -> DataFrame:
    """Per-graph var→concept table (util.py:13-19): first :instance
    occurrence fixes dict position, the last fixes the concept."""
    return (
        edges.filter(F.col("rel") == INSTANCE)
        .groupBy("graph_id", F.col("src").alias("var"))
        .agg(
            F.min("pos").alias("first_pos"),
            F.max_by("dst", "pos").alias("concept"),
        )
    )


def constants(edges: DataFrame) -> DataFrame:
    """Per-graph constant set (util.py:22-37): non-variable endpoints of
    non-instance triples, plus all concepts."""
    var_tbl = variables(edges).select("graph_id", "var")
    non_inst = edges.filter(F.col("rel") != INSTANCE)
    ends = non_inst.select("graph_id", F.col("src").alias("name")).unionByName(
        non_inst.select("graph_id", F.col("dst").alias("name"))
    )
    non_var_ends = ends.join(
        var_tbl.withColumnRenamed("var", "name"), ["graph_id", "name"], "left_anti"
    )
    concepts = edges.filter(F.col("rel") == INSTANCE).select(
        "graph_id", F.col("dst").alias("name")
    )
    return non_var_ends.unionByName(concepts).distinct()


def relabel_vars(edges: DataFrame) -> DataFrame:
    """Rename variables to ``<first-concept-char><n>`` (graph_transforms.py:32-73).

    Naming order is the first-occurrence order of each variable's
    :instance triple (= the reference's dict iteration order), expressed
    as a row_number window per (graph, first-char).  Collisions with the
    constant set get 'x' appended until free (reference loop); resolved
    here in closed form with ONE join: a constant c blocks candidate
    ``name + 'x'*k`` iff ``rtrim_x(c) == rtrim_x(name)`` and
    ``len(c) >= len(name)`` (k = len difference), so the final suffix
    length is the smallest non-negative integer missing from the blocked
    set — a sorted-array gap fold, no driver-side fixpoint probing.
    """
    var_tbl = variables(edges)
    base = F.substring("concept", 1, 1)
    w = Window.partitionBy("graph_id", "base").orderBy("first_pos")
    named = (
        var_tbl.withColumn("base", base)
        .withColumn("rank", F.row_number().over(w) - 1)
        .withColumn(
            "new_var",
            F.when(F.col("rank") == 0, F.col("base")).otherwise(
                F.concat(F.col("base"), F.col("rank").cast("string"))
            ),
        )
        .select("graph_id", "var", "new_var")
    )

    rtrim_x = lambda c: F.regexp_replace(c, "x+$", "")  # noqa: E731
    const_tbl = constants(edges).select(
        "graph_id",
        rtrim_x(F.col("name")).alias("stem"),
        F.length("name").alias("clen"),
    )
    blocked = (
        named.withColumn("stem", rtrim_x(F.col("new_var")))
        .join(const_tbl, ["graph_id", "stem"])
        .filter(F.col("clen") >= F.length("new_var"))
        .groupBy("graph_id", "var")
        .agg(
            F.array_sort(
                F.collect_set(F.col("clen") - F.length("new_var"))
            ).alias("ks")
        )
        .withColumn(
            "n_x",
            F.aggregate(
                "ks",
                F.lit(0),
                lambda acc, k: F.when(k == acc, acc + 1).otherwise(acc),
            ),
        )
        .select("graph_id", "var", "n_x")
    )
    named = (
        named.join(blocked, ["graph_id", "var"], "left")
        .select(
            "graph_id",
            "var",
            F.concat(
                "new_var", F.repeat(F.lit("x"), F.coalesce("n_x", F.lit(0)))
            ).alias("new_var"),
        )
    )

    src_map = named.withColumnRenamed("var", "src").withColumnRenamed(
        "new_var", "new_src"
    )
    dst_map = named.withColumnRenamed("var", "dst").withColumnRenamed(
        "new_var", "new_dst"
    )
    return (
        edges.join(src_map, ["graph_id", "src"], "left")
        .join(dst_map, ["graph_id", "dst"], "left")
        .select(
            "graph_id",
            "pos",
            F.coalesce("new_src", "src").alias("src"),
            "rel",
            # :instance targets are concepts, never remapped
            F.when(F.col("rel") == INSTANCE, F.col("dst"))
            .otherwise(F.coalesce("new_dst", "dst"))
            .alias("dst"),
        )
    )


def relabel_edges_by_concept(
    edges: DataFrame, rules: dict[str, dict[str, str]] | None
) -> DataFrame:
    """Node-label-conditioned edge relabeling
    (reference SyntacticEdgeRelabelingTransformer, graph_transforms.py:192-222):
    ``(x, r, y)`` becomes ``(x, rules[concept(x)][r], y)`` when the source's
    concept has a rule for ``r``, else the triple is unchanged.

    The reference builds ``rules`` from PropBank frame argument descriptions
    (``invert_frame_table``, formalism/amr/tools.py:118-128) and applies the
    pass before aspect subgraph extraction (tools.py:226-232) so core roles
    like ``control-01 :arg2`` surface as explicit roles (``:instrument``).

    Spark shape: the rule table is a tiny broadcast dim (concept, rel →
    new_rel); the var→concept lookup is the same per-graph equi-join every
    other pass uses.  One broadcast hash join + one shuffle-free projection —
    no Python on executors.
    """
    if not rules:
        return edges
    spark = edges.sparkSession
    rule_rows = [
        (concept, rel, new_rel)
        for concept, rel_map in rules.items()
        for rel, new_rel in rel_map.items()
    ]
    rules_df = F.broadcast(
        spark.createDataFrame(rule_rows, "concept string, rel string, new_rel string")
    )
    var_tbl = variables(edges).select(
        "graph_id", F.col("var").alias("src"), "concept"
    )
    return (
        edges.join(var_tbl, ["graph_id", "src"], "left")
        .join(rules_df, ["concept", "rel"], "left")
        .select(
            "graph_id",
            "pos",
            "src",
            F.coalesce("new_rel", "rel").alias("rel"),
            "dst",
        )
    )


def domain2mod(edges: DataFrame) -> DataFrame:
    """:domain ↔ :mod-of relabel (graph_transforms.py:101-111)."""
    return edges.withColumn(
        "rel",
        F.when(F.col("rel") == ":domain", F.lit(":mod-of"))
        .when(F.col("rel") == ":domain-of", F.lit(":mod"))
        .otherwise(F.col("rel")),
    )


def deinvert_edges(edges: DataFrame) -> DataFrame:
    """(s, r-of…of, t) → strip trailing -of chain; swap endpoints when the
    chain length is odd (graph_transforms.py:76-98)."""
    stripped = F.regexp_replace("rel", "(-of)+$", "")
    n_of = (F.length("rel") - F.length(stripped)) / 3
    odd = n_of.cast("int") % 2 == 1
    return edges.select(
        "graph_id",
        "pos",
        F.when(odd, F.col("dst")).otherwise(F.col("src")).alias("src"),
        stripped.alias("rel"),
        F.when(odd, F.col("src")).otherwise(F.col("dst")).alias("dst"),
    )


def concept_as_root(edges: DataFrame) -> DataFrame:
    """First :root triple (ROOT, :root, x) → (x, :root, concept_of_x)
    (graph_transforms.py:114-131); non-variable root targets are left
    untouched rather than failing the whole job."""
    w = Window.partitionBy("graph_id").orderBy("pos")
    roots = (
        edges.filter(F.col("rel") == ROOT_REL)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("graph_id", "pos")
        .withColumn("is_first_root", F.lit(True))
    )
    var_tbl = variables(edges).select(
        "graph_id", F.col("var").alias("dst"), "concept"
    )
    return (
        edges.join(roots, ["graph_id", "pos"], "left")
        .join(var_tbl, ["graph_id", "dst"], "left")
        .select(
            "graph_id",
            "pos",
            F.when(F.col("is_first_root") & F.col("concept").isNotNull(), F.col("dst"))
            .otherwise(F.col("src"))
            .alias("src"),
            "rel",
            F.when(
                F.col("is_first_root") & F.col("concept").isNotNull(), F.col("concept")
            )
            .otherwise(F.col("dst"))
            .alias("dst"),
        )
    )


def norm_logical_ops(edges: DataFrame) -> DataFrame:
    """:opN → :op when the source's concept is and/or
    (graph_transforms.py:134-154)."""
    and_or_vars = (
        edges.filter(
            (F.col("rel") == INSTANCE) & F.col("dst").isin("and", "or")
        )
        .select("graph_id", F.col("src").alias("node"))
        .distinct()
        .withColumn("is_logical", F.lit(True))
    )
    return (
        edges.join(
            and_or_vars.withColumnRenamed("node", "src"), ["graph_id", "src"], "left"
        )
        .select(
            "graph_id",
            "pos",
            "src",
            F.when(
                F.col("is_logical") & F.col("rel").contains(":op"), F.lit(":op")
            )
            .otherwise(F.col("rel"))
            .alias("rel"),
            "dst",
        )
    )


def reify_attributes(edges: DataFrame) -> DataFrame:
    """Reify constant leaves: (x, :r, const) → (x, :r, v), (v, :instance, const)
    (graph_transforms.py:157-189).

    A triple reifies when its target has no :instance edge *anywhere* in
    the graph (as source or target).  New variable names are
    deterministic content positions: ``rfattribute_<k>`` with k ordered
    by pos, matching the reference's positional numbering.
    """
    inst = edges.filter(F.col("rel") == INSTANCE)
    inst_nodes = (
        inst.select("graph_id", F.col("src").alias("node"))
        .unionByName(inst.select("graph_id", F.col("dst").alias("node")))
        .distinct()
    )
    flagged = edges.join(
        inst_nodes.withColumnRenamed("node", "dst"), ["graph_id", "dst"], "left_anti"
    )
    w = Window.partitionBy("graph_id").orderBy("pos")
    numbered = flagged.withColumn("k", F.row_number().over(w) - 1).withColumn(
        "new_var", F.concat(F.lit("rfattribute_"), F.col("k").cast("string"))
    )
    maxpos = edges.groupBy("graph_id").agg(F.max("pos").alias("max_pos"))
    numbered = numbered.join(maxpos, "graph_id")
    rewired = numbered.select(
        "graph_id",
        (F.col("max_pos") + 1 + F.col("k") * 2).alias("pos"),
        "src",
        "rel",
        F.col("new_var").alias("dst"),
    )
    new_inst = numbered.select(
        "graph_id",
        (F.col("max_pos") + 2 + F.col("k") * 2).alias("pos"),
        F.col("new_var").alias("src"),
        F.lit(INSTANCE).alias("rel"),
        F.col("dst"),
    )
    kept = edges.join(
        flagged.select("graph_id", "pos"), ["graph_id", "pos"], "left_anti"
    )
    return kept.unionByName(rewired).unionByName(new_inst)


def dereify(edges: DataFrame, rules: dict[str, tuple[str, str, str]] | None = None) -> DataFrame:
    """Rule-based dereification: (z,:instance,C),(z,a1,x),(z,a2,y) → (x,rel,y)
    (graph_transforms.py:277-385).

    Eligibility per variable z, computed with one conditional aggregation
    over its outgoing edges plus anti-joins for "no incoming edge":
      * concept C is in the rule table,
      * zero incoming edges (and z is not the root),
      * exactly one a1-out, one a2-out, no other non-instance out-edges.
    All eligible variables rewrite simultaneously (the reference scans a
    frozen snapshot; a dereified var's targets are never themselves
    eligible because the a-edges are incoming edges for them).
    """
    if rules is None:
        rules = DEREIFY_RULES
    spark = edges.sparkSession
    rules_df = F.broadcast(
        spark.createDataFrame(
            [(c, r, a1, a2) for c, (r, a1, a2) in rules.items()],
            "concept string, new_rel string, arg1 string, arg2 string",
        )
    )

    var_tbl = variables(edges)  # (graph_id, var, first_pos, concept)
    candidates = var_tbl.join(rules_df, "concept")

    # no incoming edges at all (covers :root targets too)
    incoming = edges.select("graph_id", F.col("dst").alias("var")).distinct()
    candidates = candidates.join(incoming, ["graph_id", "var"], "left_anti")

    out = edges.filter(F.col("rel") != INSTANCE).select(
        "graph_id", F.col("src").alias("var"), "rel", "dst", "pos"
    )
    agg = (
        out.join(
            candidates.select("graph_id", "var", "new_rel", "arg1", "arg2"),
            ["graph_id", "var"],
        )
        .groupBy("graph_id", "var", "new_rel")
        .agg(
            F.sum(F.when(F.col("rel") == F.col("arg1"), 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("rel") == F.col("arg2"), 1).otherwise(0)).alias("n2"),
            F.sum(
                F.when(
                    (F.col("rel") != F.col("arg1")) & (F.col("rel") != F.col("arg2")),
                    1,
                ).otherwise(0)
            ).alias("n_other"),
            F.max_by(
                F.when(F.col("rel") == F.col("arg1"), F.col("dst")),
                F.when(F.col("rel") == F.col("arg1"), F.col("pos")),
            ).alias("x"),
            F.max_by(
                F.when(F.col("rel") == F.col("arg2"), F.col("dst")),
                F.when(F.col("rel") == F.col("arg2"), F.col("pos")),
            ).alias("y"),
            F.min(
                F.when(F.col("rel") == F.col("arg1"), F.col("pos"))
            ).alias("a1_pos"),
        )
        .filter((F.col("n1") == 1) & (F.col("n2") == 1) & (F.col("n_other") == 0))
    )

    eligible = agg.select("graph_id", "var", "new_rel", "x", "y", "a1_pos")

    # drop the three structure triples of each eligible var: its outgoing
    # a1/a2 edges (all of them — there is exactly one each) and the first
    # :instance triple (the reference deletes the first instance index).
    first_inst = (
        edges.filter(F.col("rel") == INSTANCE)
        .groupBy("graph_id", F.col("src").alias("var"))
        .agg(F.min("pos").alias("pos"))
        .join(eligible.select("graph_id", "var"), ["graph_id", "var"], "left_semi")
        .select("graph_id", "pos")
    )
    out_edges_of_eligible = (
        edges.filter(F.col("rel") != INSTANCE)
        .join(
            eligible.select("graph_id", F.col("var").alias("src")),
            ["graph_id", "src"],
            "left_semi",
        )
        .select("graph_id", "pos")
    )
    to_delete = first_inst.unionByName(out_edges_of_eligible)
    kept = edges.join(to_delete, ["graph_id", "pos"], "left_anti")

    maxpos = edges.groupBy("graph_id").agg(F.max("pos").alias("max_pos"))
    w = Window.partitionBy("graph_id").orderBy("a1_pos")
    new_edges = (
        eligible.join(maxpos, "graph_id")
        .withColumn("k", F.row_number().over(w))
        .select(
            "graph_id",
            (F.col("max_pos") + F.col("k")).alias("pos"),
            F.col("x").alias("src"),
            F.col("new_rel").alias("rel"),
            F.col("y").alias("dst"),
        )
    )
    return kept.unionByName(new_edges)


def reify_rules_transform(
    edges: DataFrame, rules: dict[str, tuple[str, str, str]] | None = None
) -> DataFrame:
    """Rule-based reification: (x, :rel, y) → (z,:instance,C),(z,a1,x),(z,a2,y)
    (graph_transforms.py:261-275).

    The reference names z positionally (``ric<i>`` with i the triple's
    list index); ``pos`` carries exactly that index, so names stay
    deterministic under any partitioning.
    """
    if rules is None:
        from smatchpp_spark.functions.amr_rules import REIFY_RULES

        rules = REIFY_RULES
    spark = edges.sparkSession
    rules_df = F.broadcast(
        spark.createDataFrame(
            [(r, c, a1, a2) for r, (c, a1, a2) in rules.items()],
            "rel string, concept string, arg1 string, arg2 string",
        )
    )
    matched = edges.join(rules_df, "rel").withColumn(
        "zvar", F.concat(F.lit("ric"), F.col("pos").cast("string"))
    )
    kept = edges.join(
        matched.select("graph_id", "pos"), ["graph_id", "pos"], "left_anti"
    )
    maxpos = edges.groupBy("graph_id").agg(F.max("pos").alias("max_pos"))
    w = Window.partitionBy("graph_id").orderBy("pos")
    m = matched.join(maxpos, "graph_id").withColumn(
        "k", F.row_number().over(w) - 1
    )
    base = F.col("max_pos") + 1 + F.col("k") * 3
    inst = m.select(
        "graph_id", base.alias("pos"), F.col("zvar").alias("src"),
        F.lit(INSTANCE).alias("rel"), F.col("concept").alias("dst"),
    )
    e1 = m.select(
        "graph_id", (base + 1).alias("pos"), F.col("zvar").alias("src"),
        F.col("arg1").alias("rel"), F.col("src").alias("dst"),
    )
    e2 = m.select(
        "graph_id", (base + 2).alias("pos"), F.col("zvar").alias("src"),
        F.col("arg2").alias("rel"), F.col("dst").alias("dst"),
    )
    return kept.unionByName(inst).unionByName(e1).unionByName(e2)


def unlabel_edges(edges: DataFrame) -> DataFrame:
    """Non-instance rels → :rel (subgraph_extraction.py:21-37)."""
    return edges.withColumn(
        "rel",
        F.when(F.col("rel") != INSTANCE, F.lit(":rel")).otherwise(F.col("rel")),
    )


def unlabel_nodes(edges: DataFrame) -> DataFrame:
    """Concepts → 'concept' (subgraph_extraction.py:40-57)."""
    return edges.withColumn(
        "dst",
        F.when(F.col("rel") == INSTANCE, F.lit("concept")).otherwise(F.col("dst")),
    )


def subgraph_instance(edges: DataFrame) -> DataFrame:
    """Keep instance edges (subgraph_extraction.py:8-10)."""
    return edges.filter(F.col("rel") == INSTANCE)


def subgraph_lexicalized(edges: DataFrame) -> DataFrame:
    """Instance edges with sense-tagged concepts, e.g. run-01
    (subgraph_extraction.py:13-18)."""
    return subgraph_instance(edges).filter(
        F.lower("dst").rlike(".*-[0-9]+")
    )


def generic_standardize(edges: DataFrame) -> DataFrame:
    """lower → dequote → relabel_vars → deinvert (generic/tools.py:15-57)."""
    out = remove_quotes(lower_all_labels(edges))
    out = relabel_vars(_stage(out))
    out = deinvert_edges(out)
    return _edges(out)


def amr_standardize(edges: DataFrame) -> DataFrame:
    """The full AMR pipeline (formalism/amr/tools.py:179-193); pass order
    is semantics-bearing.  Multi-reference passes (relabel,
    concept_as_root, dereify) get a staged input — see _stage."""
    out = remove_quotes(lower_all_labels(edges))
    out = relabel_vars(_stage(out))
    out = deinvert_edges(domain2mod(out))
    out = concept_as_root(_stage(out))
    out = dereify(_stage(out))
    out = remove_duplicates(out)
    return _edges(out)
