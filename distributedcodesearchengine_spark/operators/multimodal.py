"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode/resize/frame-sample kernels are STUBBED deterministically
(sha256-derived fake features) because no image/audio libraries exist in
this container — swap ``_fake_decode`` for a real decoder (PIL/ffmpeg)
behind the same batch signature. The Spark-side plumbing — schema,
partition-preserving mapInPandas, Arrow batch shapes, binary handling —
is real and tested.

Because the stub is sha256-derived it IS SQL-expressible: the colocated
DuckDB builders recompute the same hash arithmetic, so both multimodal
gate entries are value-checked (not rows-only). Feature lanes are
emitted as SCALAR double columns f0..f7 (the driver's canonicalizer
can't hash list cells); each f_i = (u32_i / 2^32) * 2 - 1 is a dyadic
rational that Python, Spark and DuckDB all evaluate bit-identically, so
no display rounding is needed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id long, kind string, width int, height int, n_frames int, "
    + ", ".join(f"f{i} double" for i in range(FEATURE_DIM))
)


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
    """(doc_id, kind, width, height, n_frames, f0..f7) via mapInPandas.

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
            out = {
                "doc_id": pdf[id_col].to_numpy(),
                "kind": kind,
                "width": np.array([r[0] for r in rows], dtype=np.int32),
                "height": np.array([r[1] for r in rows], dtype=np.int32),
                "n_frames": np.array([r[2] for r in rows], dtype=np.int32),
            }
            for i in range(FEATURE_DIM):
                out[f"f{i}"] = np.array([r[3][i] for r in rows], dtype=np.float64)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def resize_plan(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """(doc_id, width, height, target_w, target_h, scale_x, scale_y,
    fit_w, fit_h) — aspect-preserving resize planning: the pure-metadata
    half of an image resize (the pixel kernel would run in the same
    mapInPandas as the decoder). fit = dimensions after scaling by
    min(target/w, target/h); scales are exact double ratios (no
    rounding needed — both engines divide the same ints)."""
    from pyspark.sql import functions as F

    sx = F.lit(float(target_w)) / F.col("width").cast("double")
    sy = F.lit(float(target_h)) / F.col("height").cast("double")
    s = F.least(sx, sy)
    return media.select(
        "doc_id",
        "width",
        "height",
        F.lit(target_w).alias("target_w"),
        F.lit(target_h).alias("target_h"),
        sx.alias("scale_x"),
        sy.alias("scale_y"),
        F.floor(F.col("width").cast("double") * s).cast("int").alias("fit_w"),
        F.floor(F.col("height").cast("double") * s).cast("int").alias("fit_h"),
    ).orderBy("doc_id")


def resize_plan_sql(
    kind: str = "image", target_w: int = 224, target_h: int = 224
) -> str:
    return (
        f"WITH {_media_cte(kind)}, r AS (SELECT doc_id, width, height, "
        f"{target_w} AS target_w, {target_h} AS target_h, "
        f"{float(target_w)} / width AS scale_x, {float(target_h)} / height AS scale_y "
        "FROM media) "
        "SELECT doc_id, width, height, CAST(target_w AS INT) AS target_w, "
        "CAST(target_h AS INT) AS target_h, scale_x, scale_y, "
        "CAST(floor(width * least(scale_x, scale_y)) AS INT) AS fit_w, "
        "CAST(floor(height * least(scale_x, scale_y)) AS INT) AS fit_h "
        "FROM r ORDER BY doc_id"
    )


def frame_sample(
    media: DataFrame, every_n: int = 8
) -> DataFrame:
    """(doc_id, frame_idx) — deterministic frame sampling plumbing:
    explode sampled frame indices per media row (JVM sequence/filter)."""
    from pyspark.sql import functions as F

    return media.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN n_frames > 0 THEN "
                f"sequence(CAST(0 AS BIGINT), CAST(n_frames - 1 AS BIGINT), {every_n}) "
                f"ELSE array() END"
            )
        ).alias("frame_idx"),
    )


# --- DuckDB oracle builders ------------------------------------------------
# The pages adaptation wraps documents.text as
#   '<html><head><title>doc</title></head><body><p>' || text ||
#   '</p></body></html>'  (sources/tables.py:documents_as_pages), and the
# stub decoder hashes those utf-8 bytes; DuckDB's sha256(varchar) hashes
# the same bytes, so both engines see the same digest hex.

_PAGE_SHA = (
    "sha256('<html><head><title>doc</title></head><body><p>' || text "
    "|| '</p></body></html>')"
)


def _media_cte(kind: str) -> str:
    nf = (
        "1"
        if kind == "image"
        else "1 + (('0x' || substr(hx, 5, 2))::INT % 64)"
    )
    feats = ", ".join(
        f"((('0x' || substr(hx, {8 * i + 1}, 8))::BIGINT / 4294967296.0) * 2 - 1) AS f{i}"
        for i in range(FEATURE_DIM)
    )
    return (
        f"hx AS (SELECT doc_id, {_PAGE_SHA} AS hx FROM documents), "
        f"media AS (SELECT doc_id, '{kind}' AS kind, "
        "CAST(64 + ('0x' || substr(hx, 1, 2))::INT * 4 AS INT) AS width, "
        "CAST(64 + ('0x' || substr(hx, 3, 2))::INT * 4 AS INT) AS height, "
        f"CAST({nf} AS INT) AS n_frames, {feats} FROM hx)"
    )


def media_features_sql(kind: str = "image") -> str:
    return f"WITH {_media_cte(kind)} SELECT * FROM media ORDER BY doc_id"


def frame_sample_sql(kind: str = "video", every_n: int = 8) -> str:
    return (
        f"WITH {_media_cte(kind)} "
        "SELECT doc_id, CAST(unnest(range(0, n_frames, "
        f"{every_n})) AS BIGINT) AS frame_idx "
        "FROM media WHERE n_frames > 0 ORDER BY doc_id, frame_idx"
    )
