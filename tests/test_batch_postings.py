"""Batch postings scorer == batch tf scorer == per-query scorer."""

from distributedcodesearchengine_spark.build.indexer import (
    add_postings,
    build_index_inmem,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk_batch
from distributedcodesearchengine_spark.operators.wand import batch_topk_postings
from distributedcodesearchengine_spark.sources.corpus import generate_pages

QUERIES = {
    1: "JSON parsing",
    2: "parse json",
    3: "json json parser",
    4: "parseJSON HTTPClient2",
    5: "validate email address",
}


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    return {k: sorted(v) for k, v in out.items()}


def test_batch_postings_matches(spark):
    pages = generate_pages(spark, 400, seed=33, parts=4)
    idx = add_postings(build_index_inmem(spark, pages), block_size=32,
                       target_row_postings=96)
    a = _by_query(bm25_topk_batch(idx, QUERIES, k=10).collect())
    b = _by_query(batch_topk_postings(idx, QUERIES, k=10).collect())
    assert a == b
