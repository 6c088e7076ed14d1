"""Scorer v2 (compressed postings + block-max WAND) equality tests:
v2 top-k == v1 top-k == oracle, on a normal corpus and on a skewed
corpus (one term in 50% of docs) with tiny block/row targets to force
hot-term range splitting and multi-row posting lists."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.build.indexer import (
    add_postings,
    build_index_inmem,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.operators.wand import wand_topk
from distributedcodesearchengine_spark.sources.corpus import HOT_TERM, generate_pages

QUERIES = [
    "JSON parsing",
    "parse json",
    "send HTTP request",
    "parseJSON HTTPClient2",
    "json json parser",
    "zzzzunknowntoken",
    "table row scan",
]


@pytest.fixture(scope="module")
def skew_index(spark):
    pages = generate_pages(spark, 600, seed=7, parts=5, skew=True)
    idx = build_index_inmem(spark, pages)
    # tiny targets: force blocks-per-row and hot-term splits
    return add_postings(idx, block_size=16, target_row_postings=64)


def _rows(df):
    return [(r["rank"], r["doc_id"], r["url"], round(r["score"], 9)) for r in df.collect()]


@pytest.mark.parametrize("query", QUERIES)
def test_wand_equals_exact(skew_index, query):
    v1 = _rows(bm25_topk(skew_index, query, k=10))
    v2 = _rows(wand_topk(skew_index, query, k=10, prune=True))
    assert v1 == v2, query


@pytest.mark.parametrize("query", [HOT_TERM, f"{HOT_TERM} parseJSON"])
def test_wand_hot_term(skew_index, query):
    v1 = _rows(bm25_topk(skew_index, query, k=10))
    v2 = _rows(wand_topk(skew_index, query, k=10, prune=True))
    v2np = _rows(wand_topk(skew_index, query, k=10, prune=False))
    assert v1 == v2 == v2np, query


def test_wand_with_filters(skew_index):
    v1 = _rows(bm25_topk(skew_index, "table row scan", k=10, filters={"lang": "de"}))
    v2 = _rows(wand_topk(skew_index, "table row scan", k=10, filters={"lang": "de"}))
    assert v1 == v2


def test_hot_term_is_split(skew_index):
    rows = (
        skew_index.postings.groupBy("term")
        .agg(F.count("*").alias("n_rows"), F.sum("n_postings").alias("total"))
        .where(F.col("term") == HOT_TERM)
        .collect()
    )
    assert rows, "hot term missing from postings"
    assert rows[0]["n_rows"] > 1, "hot term was not range-split"
    # ~300 postings, target 64 -> expect >= 4 rows
    assert rows[0]["n_rows"] >= 4


def test_row_postings_bounded(skew_index):
    # skew criterion (SURVEY §5.5): no posting row wildly above target
    mx = skew_index.postings.agg(F.max("n_postings")).first()[0]
    assert mx <= 4 * 64


def test_degenerate_candidate_set_falls_back_bounded(skew_index, monkeypatch):
    """A query whose candidate set exceeds _C_CAP must take the exact
    fallback — and decide it from a bounded (cap+1-row) driver pull,
    never by materializing the oversized candidate set. Forcing the cap
    to 1 makes every real query degenerate; results must still equal
    the exact scorer (fallback correctness), and the pull bound is
    structural (limit precedes collect in wand_topk)."""
    from distributedcodesearchengine_spark.operators import wand as wd

    monkeypatch.setattr(wd, "_C_CAP", 1)
    for q in ["parse json", HOT_TERM]:
        v1 = _rows(bm25_topk(skew_index, q, k=10))
        v2 = _rows(wd.wand_topk(skew_index, q, k=10, prune=True))
        assert v1 == v2, q


def test_blocks_are_compressed(skew_index):
    row = (
        skew_index.postings.where(F.col("term") == HOT_TERM)
        .select(F.explode("blocks").alias("b"))
        .select("b.n", F.length("b.doc_deltas").alias("nbytes"))
        .collect()
    )
    # delta-varint: dense-ish doc ids in a range => ~1-2 bytes per delta
    for r in row:
        assert r["nbytes"] <= 3 * r["n"]


def test_zero_idf_query_matches_exact_backfill(spark):
    """A term in exactly N/2 docs has idf == 0 (the epsilon floor only
    lifts NEGATIVE idf): every matched score is 0.0, the degenerate
    regime. The pruned path must disable itself (S == 0 gate) and fall
    through to finalize_topk's zero-backfill — previously it returned
    only the matched docs while bm25_topk returned ALL docs by id."""
    pages = spark.createDataFrame(
        [
            ("https://a.example/0", "banana apple", "en"),
            ("https://a.example/1", "apple cherry", "en"),
            ("https://a.example/2", "banana cherry", "en"),
            ("https://a.example/3", "apple apple", "en"),
        ],
        "url string, text string, lang string",
    ).withColumn("html", F.encode(F.col("text"), "utf-8"))
    idx = add_postings(build_index_inmem(spark, pages), block_size=4,
                       target_row_postings=8)
    v1 = _rows(bm25_topk(idx, "banana", k=10))
    v2 = _rows(wand_topk(idx, "banana", k=10, prune=True))
    assert v1 == v2
    assert len(v1) == 4  # all docs backfilled at 0.0, ranked by doc_id
