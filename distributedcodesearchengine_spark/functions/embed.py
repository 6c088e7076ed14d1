"""Deterministic mock embedder + vector similarity (SURVEY P8/P9, T3).

``mock_embed_text`` transcribes the reference's MockEmbedder
(``codesearch/embeddings/generator.py:210-243``): sha256(text) -> 4-byte
big-endian chunks -> floats in [-1,1], zero-pad to dim, L2-normalize.
It is the deterministic test double the reference's LocalSearchEngine
uses (engine.py:423-426) — ideal for reproducible hybrid-search tests
without ML dependencies.

``cosine_topk`` is the brute-force ANN baseline over an embedding
column (array<float>) using JVM-side ``zip_with``/``aggregate`` (no
Python in the hot path); the dot/norm operand order mirrors the DuckDB
oracle SQL (list_dot_product) for float parity.
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType


def mock_embed_text(text: str, dim: int = 64) -> List[float]:
    hash_bytes = hashlib.sha256(text.encode()).digest()
    emb: List[float] = []
    for i in range(0, min(len(hash_bytes), dim), 4):
        val = int.from_bytes(hash_bytes[i : i + 4], "big") / (2**32)
        emb.append(val * 2 - 1)
    while len(emb) < dim:
        emb.append(0.0)
    emb = emb[:dim]
    norm = math.sqrt(sum(x * x for x in emb))
    if norm > 0:
        emb = [x / norm for x in emb]
    return emb


def mock_embed_udf(dim: int = 64):
    @pandas_udf(ArrayType(FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        return s.map(lambda t: mock_embed_text(t or "", dim))

    return _embed


def dot_expr(vec_col, qvec: Sequence[float]):
    """sum_i a_i*q_i in element order (matches list_dot_product)."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_expr(vec_col, qvec: Sequence[float]):
    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    vnorm = F.sqrt(
        F.aggregate(
            F.zip_with(
                vec_col.cast("array<double>"),
                vec_col.cast("array<double>"),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot_expr(vec_col, qvec) / (vnorm * F.lit(qnorm))


def cosine_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k -> (rank, id, score); the exact baseline
    the LSH-bucketed variant (operators/similarity.py) is checked
    against. TakeOrderedAndProject at the plan level — no full sort."""
    from pyspark.sql.window import Window

    scored = embeddings.select(
        F.col(id_col), cosine_expr(F.col(vec_col), qvec).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), "score"
    )
