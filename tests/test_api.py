"""SearchEngine facade: BM25-only path with LocalSearchEngine
normalization (engine.py:484-489), filters, and scorer selection."""

import pytest

from distributedcodesearchengine_spark.api import SearchEngine
from distributedcodesearchengine_spark.build.indexer import (
    add_postings,
    build_index_inmem,
    remove_docs,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.sources.corpus import generate_pages
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def engine(spark):
    pages = generate_pages(spark, 350, seed=17, parts=3)
    idx = add_postings(build_index_inmem(spark, pages), block_size=32,
                       target_row_postings=128)
    return SearchEngine(idx)


def test_bm25_only_normalized(engine):
    raw = bm25_topk(engine.index, "parse json", k=10).collect()
    got = engine.search("parse json", limit=10, use_hybrid=False).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in raw]
    assert abs(got[0]["score"] - 1.0) < 1e-12  # top normalized to 1.0
    for g, r in zip(got, raw):
        assert abs(g["score"] - r["score"] / raw[0]["score"]) < 1e-9


def test_scorer_selection_agrees(engine):
    a = [(r["rank"], r["doc_id"]) for r in
         engine.search("JSON parsing", limit=10, scorer="exact").collect()]
    b = [(r["rank"], r["doc_id"]) for r in
         engine.search("JSON parsing", limit=10, scorer="wand").collect()]
    assert a == b


def test_lang_filter(engine):
    got = engine.search("parse json", limit=10, lang="de", use_hybrid=False)
    docs = {r["doc_id"] for r in got.collect()}
    de_docs = {
        r["doc_id"]
        for r in engine.index.docs.where(F.col("lang") == "de").select("doc_id").collect()
    }
    assert docs <= de_docs and docs


def test_remove_docs(spark, engine):
    idx = engine.index
    before = idx.n_docs
    smaller = remove_docs(idx, F.col("lang") == "de")
    n_de = idx.docs.where(F.col("lang") == "de").count()
    assert smaller.n_docs == before - n_de
    assert smaller.docs.where(F.col("lang") == "de").count() == 0
    # stats really rebuilt: avgdl changed and terms df shrank
    assert smaller.avgdl != idx.avgdl
    res = bm25_topk(smaller, "parse json", k=5).collect()
    assert res


def test_reload_same_dir_keeps_warm_cache(spark, tmp_path):
    """POST /index rebuilds into the SAME index dir -> identical logical
    plans old vs new. reload_index must unpersist the old handle BEFORE
    warming the new one, or the plan-keyed cache eviction silently
    un-warms the engine (the new relations must still be cached after
    the swap)."""
    from distributedcodesearchengine_spark.build.checkpoint import (
        build_index_persisted,
        load_index,
    )

    d = str(tmp_path / "idx")
    pages = generate_pages(spark, 100, seed=51, parts=2)
    build_index_persisted(spark, pages, d)
    engine = SearchEngine(load_index(spark, d)).warm()
    assert engine.index.docs.is_cached and engine.index.terms.is_cached

    new = build_index_persisted(spark, pages, d)  # resume no-op, same paths
    engine.reload_index(new, warm=True)
    assert engine.index.docs.is_cached, "warm cache evicted by old-handle unpersist"
    assert engine.index.terms.is_cached
    rows = engine.search("parse json", limit=3).collect()
    assert len(rows) == 3 and rows[0]["rank"] == 1


def test_count_and_range_drop_unknown_lang(engine):
    """on_invalid='drop' consistency: 'About N results' and the range
    path must agree with search() for identical params — an unknown
    lang drops instead of filtering to an empty set."""
    base = engine.count("parse json")
    assert engine.count("parse json", lang="zz") == base
    with_range = engine.search_range(
        "parse json", limit=5, ranges={"doc_len": (1, 10**9)}, lang="zz"
    ).collect()
    assert len(with_range) > 0


def test_auto_scorer_routes_by_layout(engine, spark):
    """The serving split: scorer='auto' (the server/CLI default) takes
    the persisted sharded layout when the index carries one and the
    exact path otherwise — rank-identical either way, so the only
    observable contract is identical results plus no error."""
    base = [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in
            engine.search("JSON parsing", limit=10, scorer="exact").collect()]
    # this fixture index has no sharded layout -> auto == exact
    assert "sharded" not in engine.index.extras
    auto = [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in
            engine.search("JSON parsing", limit=10, scorer="auto").collect()]
    assert auto == base
    with pytest.raises(ValueError):
        engine.search("x", scorer="bogus")
