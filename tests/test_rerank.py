"""Cross-encoder rerank seam (functions/rerank): mock pair-score
parity, loader injection, two-stage composition."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.functions.rerank import (
    cross_rerank,
    mock_rerank_pair,
    rerank_pairs,
)


@pytest.fixture(scope="module")
def index(spark):
    from distributedcodesearchengine_spark.build.indexer import build_index_inmem
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    return build_index_inmem(spark, generate_pages(spark, 120, seed=7, parts=2))


def test_mock_pair_parity(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "gamma delta epsilon")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["rerank_score"] for r in rerank_pairs(d, "my query").collect()}
    exp = {1: mock_rerank_pair("my query", "alpha beta"),
           2: mock_rerank_pair("my query", ""),
           3: mock_rerank_pair("my query", "gamma delta epsilon")}
    assert got == exp
    # query-sensitive: a different query gives different scores
    got2 = {r["doc_id"]: r["rerank_score"] for r in rerank_pairs(d, "other").collect()}
    assert got2 != got


def test_custom_loader_is_used(spark):
    d = spark.createDataFrame([(1, "aaa"), (2, "bb")], "doc_id long, text string")

    def loader(query):
        return lambda q, texts: [float(len(t)) for t in texts]

    got = {
        r["doc_id"]: r["rerank_score"]
        for r in rerank_pairs(d, "q", loader=loader, model_key="len-test").collect()
    }
    assert got == {1: 3.0, 2: 2.0}


def test_cross_rerank_composition(index):
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    q = "parse json"
    res = cross_rerank(index, q, k=5, depth=15).collect()
    assert len(res) == 5
    # ranked by rerank_score desc with contiguous ranks
    scores = [r["rerank_score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    assert [r["rank"] for r in res] == [1, 2, 3, 4, 5]
    # every survivor came from the BM25 stage-1 candidate set
    stage1 = {r["doc_id"]: r["rank"] for r in bm25_topk(index, q, k=15).collect()}
    for r in res:
        assert r["bm25_rank"] == stage1[r["doc_id"]]
    # the rerank genuinely reshuffles (mock is independent of BM25)
    assert [r["doc_id"] for r in res] != [
        d for d, _ in sorted(stage1.items(), key=lambda kv: kv[1])[:5]
    ]
