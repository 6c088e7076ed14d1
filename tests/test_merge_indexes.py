"""Offline index merge (build/checkpoint.merge_indexes_persisted —
Lucene addIndexes analog): tuple-identity vs the monolithic build,
exact merged stats, resume no-op, WAND over the merged segments."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.build.checkpoint import (
    build_index_persisted,
    merge_indexes_persisted,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("mrg")
    pages = generate_pages(spark, 160, seed=13, parts=2).persist()
    # split BY URL ORDER so per-shard url-rank ids + dense offsets
    # reproduce the monolithic url-rank assignment exactly
    urls = sorted(r["url"] for r in pages.select("url").collect())
    cut = urls[len(urls) // 2]
    p1, p2 = pages.where(F.col("url") < cut), pages.where(F.col("url") >= cut)
    i1 = build_index_persisted(spark, p1, str(base / "i1"))
    i2 = build_index_persisted(spark, p2, str(base / "i2"))
    mono = build_index_persisted(spark, pages, str(base / "mono"))
    merged = merge_indexes_persisted(
        spark, [str(base / "i1"), str(base / "i2")], str(base / "out")
    )
    return base, i1, i2, mono, merged


def test_merged_stats_are_exact(dirs):
    _, i1, i2, mono, merged = dirs
    assert merged.n_docs == mono.n_docs == i1.n_docs + i2.n_docs
    assert merged.avgdl == mono.avgdl
    mt = {r["term"]: (r["df"], r["idf"]) for r in merged.terms.collect()}
    ot = {r["term"]: (r["df"], r["idf"]) for r in mono.terms.collect()}
    assert mt == ot  # exact integer df merge + shared idf fold, bitwise


def test_merged_search_is_tuple_identical_to_monolithic(dirs):
    _, _, _, mono, merged = dirs
    for q in ["parse json", "http client request", "zzzznotaword"]:
        a = [(r["rank"], r["doc_id"], r["url"], r["score"])
             for r in bm25_topk(merged, q, k=10).collect()]
        b = [(r["rank"], r["doc_id"], r["url"], r["score"])
             for r in bm25_topk(mono, q, k=10).collect()]
        assert a == b, q


def test_merged_wand_matches_exact(dirs):
    from distributedcodesearchengine_spark.operators.wand import wand_topk

    _, _, _, _, merged = dirs
    q = "parse json"
    a = [(r["rank"], r["doc_id"], round(r["score"], 9))
         for r in wand_topk(merged, q, k=10).collect()]
    b = [(r["rank"], r["doc_id"], round(r["score"], 9))
         for r in bm25_topk(merged, q, k=10).collect()]
    assert a == b


def test_merge_resume_is_noop(dirs, spark):
    base, *_ , merged = dirs
    again = merge_indexes_persisted(
        spark, [str(base / "i1"), str(base / "i2")], str(base / "out")
    )
    assert again.n_docs == merged.n_docs and again.avgdl == merged.avgdl
