"""Quality-classifier seam: mapInPandas classify_documents with a
per-worker lazily-loaded predict fn — default (mock) path matches
mock_classify_text per row; a custom loader is honored with bounded
sub-batches; the keep verdict follows the threshold."""

from distributedcodesearchengine_spark.functions.classify import (
    classify_documents,
    mock_classify_text,
)


def test_classify_documents_matches_mock(spark):
    rows = [(i, f"document number {i} about parsing") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in classify_documents(df).collect()}
    assert len(got) == 50
    for i, t in rows:
        want = mock_classify_text(t)
        assert got[i]["score"] == want, i
        assert got[i]["keep"] == (want > 0.5), i
    # the mock spreads over (0, 1): both verdicts occur on 50 docs
    assert any(r["keep"] for r in got.values())
    assert any(not r["keep"] for r in got.values())


def test_classify_documents_custom_loader_and_threshold(spark):
    def loader():
        def predict(texts):
            assert len(texts) <= 7  # sub-batching bounds inference memory
            return [0.25 for _ in texts]

        return predict

    df = spark.createDataFrame([(i, "x") for i in range(20)], "doc_id long, text string")
    out = classify_documents(
        df, threshold=0.2, batch_size=7, loader=loader, model_key="test-const"
    ).collect()
    assert len(out) == 20
    assert all(r["score"] == 0.25 and r["keep"] for r in out)
    low = classify_documents(
        df, threshold=0.3, batch_size=7, loader=loader, model_key="test-const"
    ).collect()
    assert all(not r["keep"] for r in low)
