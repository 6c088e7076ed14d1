"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode/resize/frame-sample kernels are STUBBED deterministically
(sha256-derived fake features) because no image/audio libraries exist in
this container — swap ``_fake_decode`` for a real decoder (PIL/ffmpeg)
behind the same batch signature. The Spark-side plumbing — schema,
partition-preserving mapInPandas, Arrow batch shapes, binary handling —
is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, kind string, width int, height int, n_frames int, "
    "feature array<float>"
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes, kind: str):
    """Deterministic stand-in for a real media decoder.

    A real implementation would raise NotImplementedError without the
    codec library; here we derive stable pseudo-metadata/features from
    the payload hash so the pipeline is testable end-to-end.
    """
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    n_frames = 1 if kind == "image" else 1 + h[2] % 64
    feat = [
        (int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32) * 2 - 1
        for i in range(FEATURE_DIM)
    ]
    return width, height, n_frames, feat


def extract_media_features(
    df: DataFrame, payload_col: str = "html", id_col: str = "doc_id",
    kind: str = "image",
) -> DataFrame:
    """(doc_id, kind, width, height, n_frames, feature) via mapInPandas.

    One Arrow batch in -> one batch out; no shuffle, no per-row Python
    UDF overhead beyond the vectorized batch loop.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [
                _fake_decode(bytes(p) if p is not None else b"", kind)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "kind": kind,
                    "width": np.array([r[0] for r in rows], dtype=np.int32),
                    "height": np.array([r[1] for r in rows], dtype=np.int32),
                    "n_frames": np.array([r[2] for r in rows], dtype=np.int32),
                    "feature": [np.array(r[3], dtype=np.float32) for r in rows],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def frame_sample(
    media: DataFrame, every_n: int = 8
) -> DataFrame:
    """(doc_id, frame_idx) — deterministic frame sampling plumbing:
    explode sampled frame indices per media row (JVM sequence/filter)."""
    from pyspark.sql import functions as F

    return media.select(
        "doc_id",
        F.explode(
            F.expr(f"CASE WHEN n_frames > 0 THEN sequence(0, n_frames - 1, {every_n}) ELSE array() END")
        ).alias("frame_idx"),
    )
