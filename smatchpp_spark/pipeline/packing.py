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


def chunk_documents(
    docs: DataFrame,
    window: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Slice each document into overlapping fixed-token windows — the
    standard pretraining / retrieval chunker (windowed token slices
    with ``stride`` overlap; stride == window is disjoint chunking).

    Policy, stated exactly (deterministic, oracle-replayable): with
    ``n`` whitespace tokens (pipeline.text.tokens), chunk ``i`` covers
    tokens ``[i·stride + 1, i·stride + window]`` (1-based, clamped at
    the end) for ``i = 0 .. n_chunks − 1`` where
    ``n_chunks = 1 + ceil(max(n − window, 0) / stride)`` — every token
    lands in ≥ 1 chunk, the final chunk may be short, empty documents
    emit NO chunks.

    Output ``(id, chunk_idx int, n_tokens int, chunk_text string)``.
    Scale shape: one scan + one narrow explode (fan-out ≈ n/stride per
    document, the physical size of the chunked corpus) — no shuffle, no
    UDF; everything stays in whole-stage codegen.
    """
    if window < 1 or stride < 1:
        raise ValueError(
            f"chunk_documents: window/stride must be >= 1, got "
            f"{window}/{stride}"
        )
    toks = docs.select(
        F.col(id_col), tokens(text_col).alias("toks")
    ).withColumn("n", F.size("toks"))
    nonempty = toks.filter(F.col("n") > 0)
    # integer-exact ceil via floor((x + stride - 1) / stride): double
    # floor is exact for corpus-plausible token counts (< 2^52)
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(F.col("n") - window, F.lit(0)) + F.lit(stride - 1))
            / F.lit(float(stride))
        )
    ).cast("int")
    out = (
        nonempty.withColumn(
            "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .withColumn(
            "chunk_toks",
            F.slice(F.col("toks"), F.col("chunk_idx") * stride + 1, window),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("chunk_toks").alias("n_tokens"),
            F.array_join("chunk_toks", " ").alias("chunk_text"),
        )
    )
    return out
