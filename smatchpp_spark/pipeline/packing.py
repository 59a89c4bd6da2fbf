"""Sequence packing: assign documents to fixed-token-budget packs.

The step between a cleaned corpus and an LLM training run: documents are
concatenated into packs of at most ``max_tokens`` tokens (the training
sequence length), so short documents amortize padding and long ones are
split at pack boundaries.  True greedy first-fit packing is inherently
sequential; the standard distributed policy (used here) hashes documents
into independent BUCKETS and packs each bucket by cumulative token
offset — every bucket is a separate stream, so the whole corpus packs in
one window pass per bucket with no global coordination.

Policy, stated exactly (deterministic, oracle-replayable):

* ``bucket = hash(doc_id) mod n_buckets`` (``portable=True`` → the
  md5-based cross-engine hash);
* within a bucket documents are ordered by ``doc_id``; ``offset`` =
  cumulative token count of all PRIOR documents in the bucket;
* ``pack = offset div max_tokens`` — a document starts in the pack its
  cumulative offset falls into and may straddle the pack's end (the
  consumer truncates or spills the tail into the next sequence — the
  standard bin-by-offset packing used by block-concatenation loaders).

Scale shape: one token-count projection, one window per bucket (group
size ≈ |corpus|/n_buckets — size ``n_buckets`` so a bucket's documents
fit a task; the window never sees the whole corpus), map-side-combined
stats aggregation.  Cost is linear in documents, same budget as
tokenizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64
from smatchpp_spark.pipeline.text import tokens


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, n_tokens int, bucket int, pack bigint, offset bigint):
    the pack assignment for every document (see module docstring for
    the exact policy).  ``token_count_col`` supplies a precomputed
    token count (e.g. from a real tokenizer) instead of the whitespace
    count; ``offset`` is the document's cumulative token start within
    its bucket stream."""
    if max_tokens < 1 or n_buckets < 1:
        raise ValueError("max_tokens and n_buckets must be >= 1")
    if token_count_col is None:
        ntok = F.size(tokens(F.col(text_col)))
    else:
        ntok = F.col(token_count_col).cast("int")
    bucket = F.pmod(
        hash64(F.col(id_col).cast("string"), portable), F.lit(n_buckets)
    ).cast("int")
    t = docs.select(
        F.col(id_col),
        ntok.alias("n_tokens"),
        bucket.alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    # `div` is exact integer division on longs (no double rounding at
    # any stream length); DuckDB mirrors it with `//`
    return t.select(
        id_col, "n_tokens", "bucket", off.alias("offset")
    ).select(
        id_col,
        "n_tokens",
        "bucket",
        F.expr(f"offset div {int(max_tokens)}").alias("pack"),
        "offset",
    )


def pack_stats(
    assignments: DataFrame, max_tokens: int = 512
) -> DataFrame:
    """Per-(bucket, pack) packing efficiency: (bucket, pack, n_docs,
    n_tokens, fill_ratio double) — ``fill_ratio`` counts the tokens
    that START in the pack against the budget (straddling tails land in
    the next pack's budget by the bin-by-offset policy).  One map-side-
    combined aggregation over the assignment table."""
    return (
        assignments.groupBy("bucket", "pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            "bucket",
            "pack",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.lit(float(max_tokens)), 6
            ).alias("fill_ratio"),
        )
    )
