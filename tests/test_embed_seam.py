"""P8 batch-inference seam: mapInPandas embed_documents with a
per-worker lazily-loaded encode fn — default (mock) path matches
mock_embed_text per row; a custom loader is honored and called with
bounded sub-batches."""

import numpy as np

from distributedcodesearchengine_spark.functions.embed import (
    embed_documents,
    mock_embed_text,
)


def test_embed_documents_matches_mock(spark):
    rows = [(i, f"document number {i} about parsing") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["embedding"] for r in embed_documents(df, dim=64).collect()}
    assert len(got) == 50
    for i, t in rows:
        want = np.array(mock_embed_text(t, 64), dtype=np.float32)
        assert np.allclose(np.array(got[i], dtype=np.float32), want, atol=0), i
        # L2-normalized
        assert abs(float(np.linalg.norm(got[i])) - 1.0) < 1e-5


def test_embed_documents_custom_loader(spark):
    def loader():
        def encode(texts):
            # constant unit vector; batch size must be bounded
            assert len(texts) <= 7
            v = np.zeros((len(texts), 8), dtype=np.float32)
            v[:, 0] = 1.0
            return v

        return encode

    df = spark.createDataFrame([(i, "x") for i in range(20)], "doc_id long, text string")
    out = embed_documents(
        df, dim=8, batch_size=7, loader=loader, model_key="test-const"
    ).collect()
    assert len(out) == 20
    assert all(abs(r["embedding"][0] - 1.0) < 1e-6 for r in out)
