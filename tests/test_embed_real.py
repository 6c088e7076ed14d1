"""Opt-in real-encoder seam test (VERDICT r2 item 7): run
``embed_documents`` with an actual sentence-transformers model through
the index build + hybrid-search flow, proving the mapInPandas
schema/batching seam beyond the deterministic mock.

Skips when sentence-transformers is not installed (this sandbox has no
ML libs). To run where it is:

    pip install sentence-transformers   # pulls a ~90MB MiniLM model
    python -m pytest tests/test_embed_real.py -q
"""

import pytest

st = pytest.importorskip(
    "sentence_transformers",
    reason="real-encoder seam test needs sentence-transformers installed",
)


def test_real_encoder_through_build_and_search(spark):
    import numpy as np

    from distributedcodesearchengine_spark.build.indexer import build_index_inmem
    from distributedcodesearchengine_spark.functions.embed import (
        cosine_topk,
        embed_documents,
    )
    from distributedcodesearchengine_spark.operators.rrf import rrf_merge
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    pages = generate_pages(spark, 120, seed=17, parts=2)
    idx = build_index_inmem(spark, pages)

    # real-model embedding over the built docs: batch_size < n proves
    # the sub-batching path; model loads once per worker
    emb = embed_documents(
        idx.docs.withColumn("text", idx.docs["tokens"].cast("string")),
        batch_size=32,
        model_key="minilm-test",
    ).persist()
    rows = emb.collect()
    assert len(rows) == 120
    dims = {len(r["embedding"]) for r in rows}
    assert len(dims) == 1  # consistent model dim (384 for MiniLM-L6)
    norms = [float(np.linalg.norm(r["embedding"])) for r in rows[:10]]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)  # normalize_embeddings=True

    # hybrid flow over the REAL embeddings: semantic list + BM25 list
    # fused; the query vector comes from the same worker-cached model
    model = st.SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2")
    qvec = model.encode(["parse json"], normalize_embeddings=True)[0].tolist()
    sem = cosine_topk(emb, qvec, 20, id_col="doc_id")
    bm = bm25_topk(idx, "parse json", k=20).select("rank", "doc_id", "score")
    merged = rrf_merge(
        sem.select("rank", "doc_id", "score"), bm, query="parse json", limit=10
    ).collect()
    assert len(merged) == 10 and merged[0]["rank"] == 1
    emb.unpersist()
