"""Keyset ("search_after") pagination semantics
(operators/scorer.bm25_topk_after) — the cursor cut must reproduce the
rank window of the same total ordering in both threshold regimes,
including score ties straddling the page boundary."""

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.scorer import (
    bm25_topk,
    bm25_topk_after,
)


def _index(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    pages = spark.createDataFrame(
        [
            (
                f"https://a.example/{i:04d}",
                f"<html><body><p>{t}</p></body></html>".encode(),
                t,
                lg,
                "s1",
            )
            for i, (t, lg) in enumerate(zip(texts, langs))
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages, meta_cols=("source",))


def _pages_equal_window(idx, query, k, filters=None):
    """page1+page2 via keyset == the first 2k rows of the ranking."""
    full = bm25_topk(idx, query, k=2 * k, filters=filters).orderBy("rank").collect()
    page1 = bm25_topk(idx, query, k=k, filters=filters).orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in page1] == [
        (r["doc_id"], r["score"]) for r in full[:k]
    ]
    last = page1[-1]
    page2 = (
        bm25_topk_after(
            idx, query, k=k,
            after=(float(last["score"]), int(last["doc_id"])),
            filters=filters,
        )
        .orderBy("rank")
        .collect()
    )
    assert [(r["doc_id"], r["score"]) for r in page2] == [
        (r["doc_id"], r["score"]) for r in full[k : 2 * k]
    ]
    # page-relative ranks
    assert [r["rank"] for r in page2] == list(range(1, len(page2) + 1))


def test_healthy_continuation_equals_rank_window(spark):
    # 'rare' in 3 of 7 docs -> positive idf; distinct doc lengths give
    # distinct scores
    texts = [
        "rare one",
        "rare two words here",
        "rare three words padding out the line",
        "filler a", "filler b", "filler c", "filler d",
    ]
    idx = _index(spark, texts)
    _pages_equal_window(idx, "rare", k=2)


def test_tie_straddling_page_boundary(spark):
    # four IDENTICAL docs -> identical scores; k=2 puts the tie's
    # doc_id cut exactly at the boundary
    texts = ["rare same text"] * 4 + ["filler a", "filler b", "filler c",
                                      "filler d", "filler e"]
    idx = _index(spark, texts)
    _pages_equal_window(idx, "rare", k=2)


def test_degenerate_zero_backfill_continuation(spark):
    # unknown term -> every doc at score 0.0, ordered by doc_id
    texts = [f"filler word{i:02d}" for i in range(7)]
    idx = _index(spark, texts)
    _pages_equal_window(idx, "zzzznotaword filler", k=3)


def test_filters_compose(spark):
    texts = ["rare de one", "rare en one", "rare de two words",
             "rare en two words", "filler a", "filler b", "filler c"]
    langs = ["de", "en", "de", "en", "en", "en", "en"]
    idx = _index(spark, texts, langs)
    _pages_equal_window(idx, "rare", k=1, filters={"lang": "de"})


def test_no_cursor_is_first_page(spark):
    texts = ["rare one", "rare two words", "filler a", "filler b", "filler c"]
    idx = _index(spark, texts)
    a = bm25_topk(idx, "rare", k=2).orderBy("rank").collect()
    b = bm25_topk_after(idx, "rare", k=2, after=None).orderBy("rank").collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == [
        (r["rank"], r["doc_id"], r["score"]) for r in b
    ]


def test_empty_query_guard(spark):
    idx = _index(spark, ["alpha beta"])
    assert bm25_topk_after(idx, "!! ??", k=5).count() == 0
