"""Similarity search over an embedding column (array<float>).

- ``cosine_topk`` (functions/embed.py) is the brute-force baseline.
- ``hyperplane_buckets``: random-hyperplane LSH — sign bits of dot
  products against NP deterministic hyperplanes (derived from the mock
  embedder so both engines share exact literals) -> bucket id. The scale
  path: restrict candidate search to same-bucket (or Hamming-near
  buckets) before exact scoring.
- ``near_dup_pairs``: embedding-cosine near-duplicate detection on
  bounded inputs (the exact baseline for bucketed variants).

JVM-only expressions (zip_with/aggregate); DuckDB SQL mirrors colocated.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.embed import mock_embed_text

N_PLANES = 8


def hyperplanes(dim: int = 64, n_planes: int = N_PLANES) -> List[List[float]]:
    """Deterministic hyperplanes via the mock embedder (unit vectors)."""
    return [mock_embed_text(f"hyperplane-{i}", dim) for i in range(n_planes)]


def _dot(vec_col, plane: Sequence[float]):
    arr = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_buckets(
    embeddings: DataFrame, dim: int = 64, n_planes: int = N_PLANES,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket) — bucket = sum over planes of (dot >= 0) << i."""
    planes = hyperplanes(dim, n_planes)
    expr = None
    for i, p in enumerate(planes):
        bit = F.when(_dot(F.col(vec_col), p) >= 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        expr = bit if expr is None else expr + bit
    return embeddings.select(F.col(id_col), expr.alias("bucket")).orderBy(id_col)


def hyperplane_buckets_sql(dim: int = 64, n_planes: int = N_PLANES) -> str:
    planes = hyperplanes(dim, n_planes)
    bits = " + ".join(
        "CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(float(x)) for x in p)
        + f"]) >= 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"SELECT vec_id, {bits} AS bucket FROM embeddings ORDER BY vec_id"


def near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.25, limit: int = 50,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cos) pairs with cosine >= threshold.

    All-pairs on the given (bounded) input; at scale, feed this the
    per-bucket groups from hyperplane_buckets instead of the full table.
    """
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb")
    )
    pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(
        F.zip_with(F.col("ea").cast("array<double>"), F.col("eb").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(F.col(c).cast("array<double>"), F.col(c).cast("array<double>"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = dot / (norm("ea") * norm("eb"))
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
        .orderBy(F.desc("cos"), "vec_a", "vec_b")
        .limit(limit)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )


def near_dup_pairs_sql(threshold: float = 0.25, limit: int = 50) -> str:
    return (
        "WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos "
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) "
        f"SELECT vec_a, vec_b, round(cos, 6) AS cos FROM p WHERE cos >= {threshold} "
        f"ORDER BY cos DESC, vec_a, vec_b LIMIT {limit}"
    )
