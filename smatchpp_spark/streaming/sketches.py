"""Structured Streaming forms of the frequency/cardinality sketches.

The batch sketches (pipeline/sketches.py) are bounded-state aggregates
by construction — the CMS grid has ≤ depth×width cells and the HLL
register table ≤ 2^p rows — which is exactly the property Structured
Streaming's stateful aggregation needs: state never grows with the
stream.  So the streaming forms ARE the batch expressions, run in
``complete`` output mode; this module pins that contract and keeps the
single-aggregation shape streaming requires.

* ``stream_count_min`` — the CMS cell aggregation over a streaming key
  frame; the sink holds the full current sketch after every trigger
  (complete mode on a ≤ depth×width result is cheap by design).  Point
  estimates run batch-side with ``cms_estimate`` against the sink
  table.
* ``stream_hll_registers`` — the HLL (register, max rho) aggregation.
  The estimator (``hll_estimate_from_registers``) is a BATCH step over
  the sink table: chaining the second aggregation into the stream
  would be two stateful aggs in one query, which Structured Streaming
  rejects — and the register table, not the scalar, is the mergeable
  sketch state a production pipeline checkpoints anyway.

Parity contract (tests/test_streaming.py): after N micro-batches the
sink equals the batch sketch of the concatenated input — sketches are
order-insensitive monoids, so streaming and backfill agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from smatchpp_spark.pipeline.sketches import (
    count_min_sketch,
    hll_estimate_from_registers,
    hll_register_table,
)

__all__ = [
    "stream_count_min",
    "stream_hll_registers",
    "hll_estimate_from_registers",
]


def stream_count_min(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    count_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """CMS cells over a streaming frame — run with
    ``.outputMode("complete")``; state and result are both bounded by
    depth×width."""
    return count_min_sketch(items, key_col, depth, width, count_col, portable)


def stream_hll_registers(
    items: DataFrame,
    key_col: str,
    p: int = 6,
    portable: bool = False,
) -> DataFrame:
    """(register, max rho) over a streaming frame — run with
    ``.outputMode("complete")``; ≤ 2^p state rows.  Feed the sink table
    to ``hll_estimate_from_registers`` for the cardinality scalar."""
    return hll_register_table(items, key_col, p, portable)
