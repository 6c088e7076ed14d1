"""Model-based quality-classifier seam (FineWeb-Edu / fastText-style
document filtering) — the modern curation step where a trained
classifier, not a heuristic, decides what enters the training mix.

Same architecture as the embedding seam (functions/embed.py, SURVEY
P8): Arrow-batched ``mapInPandas`` inference with a PER-WORKER
lazily-loaded model (the iterator form amortizes model load across
every batch a reused python worker sees; inference never leaves the
executor; sub-batching bounds peak memory independent of Arrow batch
size). The default model is a deterministic md5-derived logistic mock
so the pipeline runs — and is oracle-checkable bit-for-bit — in this
container; a real classifier (fastText, a distilled transformer head)
drops in as ``loader=lambda: model.predict_proba_fn``.

The mock's arithmetic is written to be portable across engines
(DuckDB oracle in ``mock_classify_sql_expr``): md5 hex prefix ->
uint32 -> logit in [-4, 4) -> logistic, with identical literal text on
both sides (the md5-prefix/exp parity lanes are the ones the
chunk_semantic_topk and unigram_logppl gates already prove).
"""

from __future__ import annotations

import hashlib
import math
from typing import List

import pandas as pd
from pyspark.sql import DataFrame

from .embed import _WORKER_MODELS


def mock_classify_text(text: str) -> float:
    """Deterministic P(keep): md5(text) first 8 hex chars -> uint32 ->
    logit z = (h / 2^32) * 8 - 4 -> 1 / (1 + e^-z)."""
    h = int(hashlib.md5((text or "").encode("utf-8")).hexdigest()[:8], 16)
    z = (h / 4294967296.0) * 8.0 - 4.0
    return 1.0 / (1.0 + math.exp(-z))


def mock_classify_sql_expr(col: str = "text") -> str:
    """DuckDB expression computing ``mock_classify_text`` bit-for-bit."""
    h = f"('0x' || substr(md5({col}), 1, 8))::BIGINT"
    return f"1.0 / (1.0 + exp(-(({h} / 4294967296.0) * 8.0 - 4.0)))"


def _default_loader():
    """Loads the classifier once per python worker. Tries a real
    fastText model when available; otherwise the deterministic mock
    (this container has no ML libs)."""
    try:  # pragma: no cover - not installed in this sandbox
        import fasttext  # type: ignore
        import os

        path = os.environ.get("DCSE_QUALITY_MODEL", "")
        if not path:
            raise ImportError("no model path configured")
        model = fasttext.load_model(path)

        def predict(texts: List[str]):
            labels, probs = model.predict([t.replace("\n", " ") for t in texts])
            return [
                float(p[0]) if l and l[0].endswith("keep") else 1.0 - float(p[0])
                for l, p in zip(labels, probs)
            ]

        return predict
    except ImportError:

        def predict(texts: List[str]):
            return [mock_classify_text(t) for t in texts]

        return predict


def classify_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    batch_size: int = 512,
    loader=None,
    model_key: str = "quality-default",
) -> DataFrame:
    """(doc_id, score, keep) via Arrow-batched mapInPandas inference.

    ``loader`` is a zero-arg callable returning
    ``predict(list[str]) -> list[float]`` (P(keep) per doc), called at
    most once per python worker per ``model_key`` — the per-worker
    cache is shared with the embedding seam, so a pipeline running
    both loads each model exactly once per worker. Embarrassingly
    parallel: zero shuffles, the filter verdict rides back as a
    boolean column for the curation funnel to consume.
    """
    from typing import Iterator

    use_loader = loader or _default_loader
    key = f"classify|{model_key}"
    thr = float(threshold)

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        predict = _WORKER_MODELS.get(key)
        if predict is None:
            predict = _WORKER_MODELS[key] = use_loader()
        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("").tolist()
            scores: List[float] = []
            for i in range(0, len(texts), batch_size):
                scores.extend(predict(texts[i : i + batch_size]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "score": scores,
                    "keep": [s > thr for s in scores],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, schema="doc_id long, score double, keep boolean"
    )


def classify_gate_sql(table: str = "documents", threshold: float = 0.5) -> str:
    """DuckDB oracle for the gate entry: mock scores, 6dp-rounded, keep
    decided on the unrounded double exactly like the Spark side."""
    from .rounding import round6_sql, sql_double

    e = mock_classify_sql_expr("text")
    return (
        f"SELECT doc_id, {round6_sql(e)} AS score, "
        f"{e} > CAST({sql_double(threshold)} AS DOUBLE) AS keep "
        f"FROM {table} ORDER BY doc_id"
    )
