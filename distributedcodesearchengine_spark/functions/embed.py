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
from typing import List, Optional, Sequence

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


def _mock_embed_batch(texts, dim: int):
    """Vectorized mock embedder: one numpy pass per batch, bit-identical
    to ``mock_embed_text`` per row (same big-endian chunking, the same
    left-fold norm over the nonzero prefix — appending the zero pads to
    the fold cannot change an IEEE sum of nonnegative squares — and the
    same operation order per element). Returns a pandas Series backed by
    an Arrow list<float32> array — no per-row Python float lists."""
    import hashlib as _hl

    import numpy as np
    import pyarrow as pa

    n = len(texts)
    k = len(range(0, min(32, dim), 4))  # sha256 yields 32 bytes
    dig = b"".join(
        _hl.sha256((t or "").encode()).digest()[: 4 * k] for t in texts
    )
    d = np.frombuffer(dig, ">u4").reshape(n, k).astype(np.float64)
    e = (d / 4294967296.0) * 2.0 - 1.0
    acc = np.zeros(n, np.float64)
    for j in range(k):  # left fold == math.sqrt(sum(x*x)) order
        acc = acc + e[:, j] * e[:, j]
    norm = np.sqrt(acc)
    nz = norm > 0
    e[nz] = e[nz] / norm[nz, None]
    out = np.zeros((n, dim), np.float64)
    out[:, : min(k, dim)] = e[:, : min(k, dim)]
    values = pa.array(out.astype(np.float32).ravel(), type=pa.float32())
    offs = pa.array((np.arange(n + 1) * dim).astype(np.int32), type=pa.int32())
    la = pa.ListArray.from_arrays(offs, values)
    return pd.Series(pd.arrays.ArrowExtensionArray(pa.chunked_array([la])))


def mock_embed_udf(dim: int = 64):
    @pandas_udf(ArrayType(FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        return _mock_embed_batch(s.tolist(), dim)

    return _embed


# --- P8: real-model batch inference seam -----------------------------------
#
# The reference's EmbeddingGenerator (generator.py:35-56,138-199) runs a
# sentence-transformer in batches with mean pooling + L2. The Spark
# re-expression is mapInPandas with a PER-WORKER lazily-loaded model:
# the iterator form amortizes model load over every Arrow batch the
# worker sees, and inference never leaves the executor. The mock is the
# default so the pipeline runs in this container; a real model drops in
# as ``loader=lambda: SentenceTransformer(...).encode``.

# per-worker model cache, keyed by model name: python workers are
# reused across tasks/jobs, so the key keeps two different models (or a
# swapped loader) from colliding in one worker
_WORKER_MODELS: dict = {}


def _default_loader(dim: int = 64):
    """Loads the embedding model once per python worker. Tries a real
    sentence-transformers model when available; otherwise returns the
    deterministic mock (this container has no ML libs)."""
    try:  # pragma: no cover - not installed in this sandbox
        from sentence_transformers import SentenceTransformer  # type: ignore

        model = SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2")

        def encode(texts: List[str]):
            import numpy as np

            v = model.encode(texts, normalize_embeddings=True)
            return np.asarray(v, dtype=np.float32)

        return encode
    except ImportError:
        import numpy as np

        def encode(texts: List[str]):
            return np.array(
                [mock_embed_text(t or "", dim) for t in texts], dtype=np.float32
            )

        return encode


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    batch_size: int = 256,
    loader=None,
    model_key: str = "default",
) -> DataFrame:
    """(doc_id, embedding) via Arrow-batched mapInPandas inference.

    ``loader`` is a zero-arg callable returning ``encode(list[str]) ->
    np.ndarray[n, dim]`` — called at most once per python worker per
    ``model_key`` (workers are reused across jobs), exactly the pattern
    a GPU transformer needs. Sub-batches of ``batch_size`` bound peak
    inference memory independent of the Arrow batch size."""
    from typing import Iterator

    import numpy as np

    use_loader = loader or (lambda: _default_loader(dim))
    key = f"{model_key}|dim={dim}"

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        encode = _WORKER_MODELS.get(key)
        if encode is None:
            encode = _WORKER_MODELS[key] = use_loader()
        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("").tolist()
            chunks = [
                encode(texts[i : i + batch_size])
                for i in range(0, len(texts), batch_size)
            ]
            vecs = np.concatenate(chunks, axis=0)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(), "embedding": list(vecs)}
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, schema="doc_id long, embedding array<float>"
    )


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


def cosine_topk_filtered(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int,
    label: Optional[int] = None,
    id_filter: Optional[DataFrame] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The ES kNN-with-filter: exact cosine top-k over the FILTERED
    candidate set (ES knn ``filter`` semantics — the filter applies
    DURING the search, so the result is the true top-k of the
    restricted set, never a post-filtered global top-k that can
    return < k rows).

    ``label`` is an equality predicate on the embeddings table's own
    metadata column — a parquet pushdown filter, so the scan reads
    only matching row groups. ``id_filter`` is a (vec_id) DataFrame of
    admissible ids (typically a pushdown-filtered documents scan
    projected to ids) applied as a left-semi join — at web scale the
    filtered id set is large, so it stays a distributed join, never a
    collect/broadcast of the filter side. Both compose (AND).
    """
    emb = embeddings
    if label is not None:
        emb = emb.where(F.col("label") == int(label))
    if id_filter is not None:
        ids = id_filter.select(F.col(id_filter.columns[0]).alias(id_col))
        emb = emb.join(ids, id_col, "left_semi")
    return cosine_topk(emb, qvec, k, id_col=id_col, vec_col=vec_col)
