"""Batch multi-query scorer == per-query scorer, rank for rank."""

import pytest

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.scorer import (
    bm25_topk,
    bm25_topk_batch,
)
from distributedcodesearchengine_spark.sources.corpus import generate_pages

QUERIES = {
    0: "JSON parsing",
    1: "parse json",
    2: "send HTTP request",
    3: "json json parser",
    4: "parseJSON HTTPClient2",
    5: "zzzzunknown tokens only",  # degenerate: batch path skips it
}


def test_batch_matches_per_query(spark):
    pages = generate_pages(spark, 500, seed=21, parts=4)
    idx = build_index_inmem(spark, pages)
    batch = bm25_topk_batch(idx, QUERIES, k=10).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], round(r["score"], 9)))
    for qid, q in QUERIES.items():
        if qid == 5:
            # all-unknown query: the batch path (documented) skips the
            # full-corpus zero backfill that the per-query path does
            assert qid not in got
            continue
        want = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(idx, q, k=10).collect()
        ]
        assert sorted(got[qid]) == sorted(want), q
