"""Cross-encoder rerank seam — the modern two-stage retrieval tail
(BM25 recall -> model precision) every production search stack runs
(public architecture: MS MARCO cross-encoder rerankers, ColBERT's
candidate re-scoring stage).

Stage 1 is the engine's own BM25 top-``depth`` (cheap, recall-
oriented); stage 2 scores each (query, candidate text) PAIR with a
model through the same Arrow-batched ``mapInPandas`` seam as the
embedding / quality-classifier operators (per-worker lazy model load
shared via ``_WORKER_MODELS``, sub-batching, zero shuffles — the k-row
candidate set is the only data that moves). The default model is a
deterministic md5-derived pair scorer so the pipeline runs — and is
oracle-checkable bit-for-bit — in this container; a real cross-encoder
(sentence-transformers ``CrossEncoder``) drops in as
``loader=lambda query: model_predict_fn`` (the factory receives the
query string, like ``_default_loader``).

The candidate text is the searchable-text projection (tokens joined by
a single space — the same reconstruction the embedding branch uses,
api.build_doc_embeddings), so the oracle can rebuild it exactly with
the tokenizer lanes.
"""

from __future__ import annotations

import hashlib
from typing import List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .embed import _WORKER_MODELS

_SEP = "\x1f"


def mock_rerank_pair(query: str, text: str) -> float:
    """Deterministic pair relevance in [0, 1): md5(query | 0x1f | text)
    first 8 hex chars -> uint32 / 2^32."""
    h = int(
        hashlib.md5((query + _SEP + (text or "")).encode("utf-8")).hexdigest()[:8],
        16,
    )
    return h / 4294967296.0


def mock_rerank_sql_expr(query_lit: str, text_expr: str) -> str:
    """DuckDB expression computing ``mock_rerank_pair`` bit-for-bit
    (``query_lit`` must be SQL-escaped by the caller)."""
    h = f"('0x' || substr(md5('{query_lit}' || chr(31) || {text_expr}), 1, 8))::BIGINT"
    return f"({h} / 4294967296.0)"


def _default_loader(query: str):
    """Per-worker model factory. Tries a real sentence-transformers
    CrossEncoder when configured; otherwise the deterministic mock."""
    try:  # pragma: no cover - not installed in this sandbox
        import os

        from sentence_transformers import CrossEncoder  # type: ignore

        name = os.environ.get("DCSE_RERANK_MODEL", "")
        if not name:
            raise ImportError("no rerank model configured")
        model = CrossEncoder(name)

        def predict(q: str, texts: List[str]) -> List[float]:
            return [float(s) for s in model.predict([(q, t) for t in texts])]

        return predict
    except ImportError:

        def predict(q: str, texts: List[str]) -> List[float]:
            return [mock_rerank_pair(q, t) for t in texts]

        return predict


def rerank_pairs(
    cand: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 256,
    loader=None,
    model_key: str = "rerank-default",
) -> DataFrame:
    """cand(doc_id, ..., text) -> (doc_id, rerank_score) via the
    Arrow-batched pair-scoring seam."""
    from typing import Iterator

    use_loader = loader or _default_loader
    key = f"rerank|{model_key}"
    q = query

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        predict = _WORKER_MODELS.get(key)
        if predict is None:
            predict = _WORKER_MODELS[key] = use_loader(q)
        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("").tolist()
            scores: List[float] = []
            for i in range(0, len(texts), batch_size):
                scores.extend(predict(q, texts[i : i + batch_size]))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(), "rerank_score": scores}
            )

    return cand.select(id_col, text_col).mapInPandas(
        gen, schema="doc_id long, rerank_score double"
    )


def cross_rerank(index, query: str, k: int = 10, depth: int = 30, loader=None) -> DataFrame:
    """Two-stage search: BM25 top-``depth`` candidates re-scored by the
    pair model -> (rank, doc_id, rerank_score, bm25_rank, bm25_score),
    ranked (rerank_score desc, doc_id asc), truncated to ``k``.

    The pair model sees only the ``depth`` candidates (a broadcast-side
    relation); the corpus-sized docs table contributes the candidate
    texts via a doc_id-keyed join of the k-row candidate set — never a
    full scan beyond stage 1's own term-pruned work."""
    from ..functions.rounding import round6
    from ..operators.scorer import bm25_topk

    top = bm25_topk(index, query, k=depth).select(
        F.col("rank").alias("bm25_rank"), "doc_id", F.col("score").alias("bm25_score")
    )
    cand = index.docs.select(
        "doc_id", F.concat_ws(" ", "tokens").alias("text")
    ).join(F.broadcast(top.select("doc_id")), "doc_id")
    scores = rerank_pairs(cand, query, loader=loader)
    out = top.join(scores, "doc_id")
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("rerank_score"), F.asc("doc_id"))
    return (
        out.orderBy(F.desc("rerank_score"), F.asc("doc_id"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "doc_id",
            round6("rerank_score").alias("rerank_score"),
            "bm25_rank",
            round6("bm25_score").alias("bm25_score"),
        )
    )


def cross_rerank_sql(query: str, k: int = 10, depth: int = 30) -> str:
    """DuckDB mirror over the documents table: the bm25_topk_sql chain
    at k=depth, candidate text rebuilt as the space-joined token
    projection, the mock pair score, same rank/tiebreak/truncation."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import bm25_topk_sql, tokenize_col

    esc = query.replace("'", "''")
    text_expr = f"array_to_string({tokenize_col('text')}, ' ')"
    pair = mock_rerank_sql_expr(esc, "d.jtext")
    return (
        f"WITH top AS (SELECT rank AS bm25_rank, doc_id, score AS bm25_score "
        f"FROM ({bm25_topk_sql(query, k=depth)})), "
        f"dt AS (SELECT doc_id, {text_expr} AS jtext FROM documents), "
        "scored AS (SELECT top.doc_id, top.bm25_rank, top.bm25_score, "
        f"{pair} AS rerank_score FROM top JOIN dt d ON d.doc_id = top.doc_id) "
        "SELECT CAST(row_number() OVER (ORDER BY rerank_score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('rerank_score')} AS rerank_score, bm25_rank, "
        f"{round6_sql('bm25_score')} AS bm25_score "
        f"FROM scored ORDER BY rerank_score DESC, doc_id ASC LIMIT {int(k)}"
    )
