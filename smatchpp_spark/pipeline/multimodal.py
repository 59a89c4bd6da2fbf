"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The decode step itself is a **clearly-marked stub** — the image/audio
libraries are not in this container — but everything Spark-side is real
and tested: the asset schema, the batch shape through ``mapInPandas``,
partitioning by asset kind, and the deterministic fake feature extractor
(a hash-derived vector standing in for a real CNN/fbank embedding, so
downstream similarity/dedup operators can be exercised end-to-end).

Real deployments swap ``_fake_features`` for a PIL/torchvision (image),
torchaudio (audio), or pyav frame-sampler (video) body with the SAME
signature — the Spark plumbing does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, duration_ms int, codec string"
)

FEATURE_DIM = 8
FEATURES_SCHEMA = "asset_id long, kind string, n_bytes int, feature array<double>"


def synth_assets(spark: SparkSession, docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake asset table from the documents table:
    payload = utf-8 bytes of the text, kind round-robins image/audio/video.
    Real pipelines read (path, payload) from object storage instead."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col(id_col) % 10000).cast("int").alias("duration_ms"),
        F.lit("synthetic").alias("codec"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real image decode (PIL/libjpeg) is unavailable in this
    container.  Deployments replace this body; the Spark plumbing in
    ``extract_features`` is unchanged."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg; use fake=True for the "
        "deterministic stand-in feature extractor"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-content embedding: sha256 of
    the payload chopped into ``dim`` uniform floats in [0, 1)."""
    h = hashlib.sha256(payload or b"").digest()
    vals = [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]
    return np.asarray(vals, dtype=np.float64)


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """assets → (asset_id, kind, n_bytes, feature array<double>).

    One Arrow-batched ``mapInPandas`` pass; only (asset_id, kind, payload)
    reach Python, everything else is pruned at the scan.  Batches arrive
    as whole pandas frames, so a real decoder can vectorize across the
    batch (e.g. torch stack) instead of per-row work.
    """
    if not fake:
        # the real path needs decoders this container doesn't ship
        raise NotImplementedError("only the deterministic fake decoder is available here")

    slim = assets.select("asset_id", "kind", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return slim.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (JVM-side explode of the sample grid — the decode of each
    frame would then run through ``extract_features``-style kernels)."""
    video = assets.filter(F.col("kind") == "video")
    grid = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return video.select(
        "asset_id",
        F.explode(grid).alias("frame_ms"),
    )
