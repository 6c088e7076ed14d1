"""User-facing search engine facade — the analog of the reference's
``HybridSearchEngine`` / ``LocalSearchEngine`` (codesearch/search/engine.py)
and its ``SearchQuery`` surface (models.py:144-153).

- ``search(...)``: BM25-only (exact or WAND scorer) with the reference's
  LocalSearchEngine max-normalization (engine.py:484-489), or hybrid
  (mock-embedder semantic branch + BM25 + RRF merge with overfetch 2k,
  adaptive weight, optional http boost — engine.py:158-238).
- Filters map to the reference's language/entity_type/repo_name equality
  filters (lang / site / source here).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.embed import cosine_topk, mock_embed_text, mock_embed_udf
from .operators.rrf import DEFAULT_SEMANTIC_WEIGHT, boost_col, rrf_merge
from .operators.scorer import Index, bm25_topk
from .operators.wand import wand_topk
from .oracle.hybrid import enhance_query


def build_doc_embeddings(docs, dim: int = 64) -> DataFrame:
    """(doc_id, embedding) via the deterministic mock embedder over the
    tokenized doc text (tokens joined by space — the searchable-text
    projection analog, models.py:66-103). ``docs`` is a docs DataFrame
    or an Index."""
    if isinstance(docs, Index):
        docs = docs.docs
    return docs.select(
        "doc_id",
        mock_embed_udf(dim)(F.concat_ws(" ", "tokens")).alias("embedding"),
    )


class SearchEngine:
    def __init__(self, index: Index, embeddings: Optional[DataFrame] = None, dim: int = 64):
        self.index = index
        self.dim = dim
        self.embeddings = embeddings

    def _ensure_embeddings(self):
        if self.embeddings is None:
            self.embeddings = build_doc_embeddings(self.index, self.dim).persist()
        return self.embeddings

    def _bm25(self, query: str, limit: int, filters, scorer: str) -> DataFrame:
        fn = wand_topk if scorer == "wand" else bm25_topk
        return fn(self.index, query, k=limit, filters=filters or None)

    def search(
        self,
        query: str,
        limit: int = 20,
        lang: Optional[str] = None,
        site: Optional[str] = None,
        source: Optional[str] = None,
        use_hybrid: bool = False,
        semantic_weight: float = DEFAULT_SEMANTIC_WEIGHT,
        scorer: str = "exact",
        enhance: bool = True,
        normalize: bool = True,
    ) -> DataFrame:
        filters: Dict[str, str] = {}
        if lang:
            filters["lang"] = lang
        if site:
            filters["site"] = site
        if source:
            filters["source"] = source

        if not use_hybrid:
            res = self._bm25(query, limit, filters, scorer)
            if not normalize:
                return res
            # LocalSearchEngine normalization: divide by top score if > 0
            mx_row = res.orderBy("rank").limit(1).collect()
            mx = mx_row[0]["score"] if mx_row else None
            if mx is not None and mx > 0:
                res = res.withColumn("score", F.col("score") / F.lit(mx))
            return res

        # hybrid: overfetch both branches at 2*limit (engine.py:207,214)
        emb = self._ensure_embeddings()
        qvec = mock_embed_text(enhance_query(query) if enhance else query, self.dim)
        sem = cosine_topk(emb, qvec, 2 * limit, id_col="doc_id")
        # semantic branch honors the same metadata filters via docs join
        if filters:
            cond = [F.col(c) == v for c, v in filters.items()]
            docs_f = self.index.docs
            for c in cond:
                docs_f = docs_f.where(c)
            sem = sem.join(docs_f.select("doc_id"), "doc_id", "left_semi")
        bm = self._bm25(query, 2 * limit, filters, scorer).select("rank", "doc_id", "score")
        merged = rrf_merge(
            sem.select("rank", "doc_id", "score"),
            bm,
            id_col="doc_id",
            semantic_weight=semantic_weight,
            query=query,
            limit=limit,
        )
        # inner join streaming the big docs side, broadcasting the k rows
        return self.index.docs.select("doc_id", "url").join(
            F.broadcast(merged), "doc_id", "inner"
        ).select("rank", "doc_id", "url", "score", "semantic_score", "bm25_score").orderBy("rank")
