"""Streaming exact deduplication — the ingest-time form of the batch
dedup operators (pipeline/dedup.py).

A live document/edge feed dedups on a key (typically the content
fingerprint) with BOUNDED state: ``dropDuplicatesWithinWatermark``
keeps one row per key and expires key-state once the watermark passes —
the production shape for at-most-once ingest of a crawled corpus, where
exact duplicates cluster in time (re-crawls, mirror bursts) but the
key space is unbounded over the stream's lifetime.

Batch parity: on a batch frame the same helper degrades to plain
``dropDuplicates`` over the key — identical surviving-key set whenever
each key's duplicates fall inside one watermark span (tested)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    text_col: str | None = None,
) -> DataFrame:
    """Keep the first row per key.  ``key_cols`` defaults to a content
    fingerprint of ``text_col`` (sha256 — the same per-row invariant the
    corpus reader uses for graph ids).  Streaming frames use
    watermark-bounded duplicate state; batch frames use plain
    ``dropDuplicates`` (same semantics when duplicates of a key arrive
    within one watermark span)."""
    if key_cols is None:
        if text_col is None:
            raise ValueError("stream_dedup_exact: key_cols or text_col required")
        df = df.withColumn("content_key", F.sha2(F.col(text_col), 256))
        key_cols = ["content_key"]
    if df.isStreaming:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)
