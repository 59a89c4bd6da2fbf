"""Deterministic synthetic corpus generator.

Emits the input-hint schema ``(repo, path, commit, lang, content)`` where
``content`` is a seeded Penman graph string — one graph per row — so the
parser and every standardization pass get full coverage (vars, concepts,
constants, quoted literals, ``-of`` inversions, ``:domain``, ``:opN`` under
and/or, reentrancies, ``:polarity -``).

The generator is pure Python but is only ever used to *create* test/bench
inputs (it materializes a DataFrame once); the engine itself never loops
over rows.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

_CONCEPTS = [
    "man", "cat", "dog", "duck", "ant", "test", "train", "fast", "small",
    "very", "run-01", "see-01", "give-01", "control-01", "computer",
    "mouse", "city", "name", "and", "or", "accompany-01", "be-located-at-91",
    "have-mod-91", "possible", "country", "person", "go-02", "want-01",
]

_RELATIONS = [
    ":arg0", ":arg1", ":arg2", ":arg3", ":mod", ":quant", ":polarity",
    ":location", ":time", ":name", ":domain", ":op1", ":op2", ":manner",
]

_CONSTANTS = ['2', '3', '100', '-', '+', '"New York"', '"hello world"', "'x'", "imperative"]


def generate_penman(rng: random.Random, max_nodes: int = 12, max_depth: int = 5) -> str:
    """Build one random-but-seeded Penman graph string."""
    n_nodes = rng.randint(1, max_nodes)
    concepts = [rng.choice(_CONCEPTS) for _ in range(n_nodes)]
    # variable names: first letter + index, occasionally a weird name to
    # exercise relabel_vars (including var == concept collisions).
    names: list[str] = []
    for i, c in enumerate(concepts):
        style = rng.random()
        if style < 0.1:
            names.append(c[0])  # may collide across nodes -> parser sees reentrancy-ish refs
        elif style < 0.2:
            names.append(c)  # var equals a concept name (relabel collision case)
        else:
            names.append(f"{c[0]}{i}")
    # ensure uniqueness of variable names
    seen: dict[str, int] = {}
    for i, nm in enumerate(names):
        if nm in seen:
            seen[nm] += 1
            names[i] = f"{nm}z{seen[nm]}"
        else:
            seen[nm] = 0

    children: dict[int, list[tuple[str, int]]] = {i: [] for i in range(n_nodes)}
    depth_of = {0: 0}
    for i in range(1, n_nodes):
        parent = rng.randrange(0, i)
        while depth_of[parent] >= max_depth:
            parent = rng.randrange(0, i)
        rel = rng.choice(_RELATIONS)
        if rng.random() < 0.15:
            rel += "-of"
        children[parent].append((rel, i))
        depth_of[i] = depth_of[parent] + 1

    # attribute leaves and reentrant variable references
    attrs: dict[int, list[tuple[str, str]]] = {i: [] for i in range(n_nodes)}
    for i in range(n_nodes):
        if rng.random() < 0.4:
            attrs[i].append((rng.choice(_RELATIONS), rng.choice(_CONSTANTS)))
        if n_nodes > 2 and rng.random() < 0.25:
            j = rng.randrange(0, n_nodes)
            if j != i:
                attrs[i].append((rng.choice(_RELATIONS), names[j]))
    # :opN under and/or for norm_logical_ops coverage
    for i in range(n_nodes):
        if concepts[i] in ("and", "or"):
            for k, (rel, node) in enumerate(children[i]):
                children[i][k] = (f":op{k + 1}", node)

    def render(i: int) -> str:
        parts = [f"({names[i]} / {concepts[i]}"]
        for rel, j in children[i]:
            parts.append(f" {rel} {render(j)}")
        for rel, val in attrs[i]:
            parts.append(f" {rel} {val}")
        parts.append(")")
        return "".join(parts)

    return render(0)


def generate_corpus_rows(n_graphs: int, seed: int = 42) -> list[tuple[str, str, str, str, str]]:
    rows = []
    for i in range(n_graphs):
        rng = random.Random(f"{seed}:{i}")
        content = generate_penman(rng)
        repo = f"org/repo-{i % max(1, n_graphs // 10):05d}"
        path = f"src/m{i % 7}/f{i}.amr"
        commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()
        rows.append((repo, path, commit, "amr", content))
    return rows


def corpus_dataframe(spark: SparkSession, n_graphs: int, seed: int = 42) -> DataFrame:
    """Materialize the synthetic corpus as a DataFrame in the input-hint shape."""
    return spark.createDataFrame(generate_corpus_rows(n_graphs, seed), CORPUS_SCHEMA)
