"""Semantics tests for the second query-surface wave
(operators/queryext.py): regexp expansion + safe-subset guards,
constant_score filter-context semantics, span_first boundary and
composition contracts, _analyze ordered token streams, sampler /
diversified_sampler windows, and the rescore blend."""

import pytest

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.queryext import (
    analyze_doc,
    analyze_text,
    bm25_regexp_topk,
    bm25_rescore_topk,
    bm25_span_first_topk,
    constant_score_topk,
    expand_regexp,
    parse_safe_regexp,
    sampler_terms,
    span_first_docs,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk


def _index(spark, rows, langs=None, sources=None):
    langs = langs or ["en"] * len(rows)
    sources = sources or ["s1"] * len(rows)
    pages = spark.createDataFrame(
        [
            (
                f"https://x.example/{i:04d}",
                f"<html><body><p>{text}</p></body></html>".encode(),
                text,
                langs[i],
                sources[i],
            )
            for i, text in enumerate(rows)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages, meta_cols=("source",))


# --- regexp ---------------------------------------------------------------


def test_regexp_expansion_whole_term_only(spark):
    idx = _index(spark, ["scan sort slow", "scan xscan scanx", "aa bb"])
    terms = [t for t, _ in expand_regexp(idx, "s(can|ort)")]
    assert terms == ["scan", "sort"]  # not slow, not xscan/scanx


def test_regexp_safe_subset_guards():
    for bad in ("Scan", "a'b", "a\\d", "a{2}", "", "a" * 65, "(unclosed"):
        with pytest.raises(ValueError):
            parse_safe_regexp(bad)
    assert parse_safe_regexp("jo.n+[a-z]?(x|y)*") == "jo.n+[a-z]?(x|y)*"


def test_regexp_single_expansion_matches_plain_topk(spark):
    idx = _index(
        spark,
        ["scan aa bb", "scan scan cc", "dd ee ff", "gg hh ii", "jj kk ll"],
    )
    via_regexp = bm25_regexp_topk(idx, "sc.n").collect()
    plain = bm25_topk(idx, "scan").collect()
    assert [(r.doc_id, r.score) for r in via_regexp] == [
        (r.doc_id, r.score) for r in plain
    ]


def test_regexp_no_match_degenerate_backfill(spark):
    idx = _index(spark, ["aa bb", "cc dd", "ee ff"])
    rows = bm25_regexp_topk(idx, "zz+qq").collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]  # doc_id order
    assert all(r.score == 0.0 for r in rows)


# --- constant_score -------------------------------------------------------


def test_constant_score_filter_context(spark):
    idx = _index(spark, ["aa bb", "bb cc", "cc dd", "ee ff"])
    rows = constant_score_topk(idx, "bb cc", boost=2.5).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]  # any-term match, id order
    assert all(r.score == 2.5 for r in rows)
    assert [r.rank for r in rows] == [1, 2, 3]
    # filter context: a non-matching query is EMPTY (no zero-backfill)
    assert constant_score_topk(idx, "zz").count() == 0
    assert constant_score_topk(idx, "!!").count() == 0  # empty tokenize


# --- span_first -----------------------------------------------------------


def test_span_first_boundary_inclusive(spark):
    idx = _index(
        spark,
        ["word aa bb", "aa word bb", "aa bb word", "aa bb cc"],
    )
    ids = sorted(
        r.doc_id for r in span_first_docs(idx, "word", end=2).collect()
    )
    assert ids == [0, 1]  # pos 3 excluded at end=2; 1-based inclusive
    ids3 = sorted(
        r.doc_id for r in span_first_docs(idx, "word", end=3).collect()
    )
    assert ids3 == [0, 1, 2]


def test_span_first_guards(spark):
    idx = _index(spark, ["aa bb"])
    with pytest.raises(ValueError):
        span_first_docs(idx, "two words", end=3)
    with pytest.raises(ValueError):
        span_first_docs(idx, "aa", end=0)


def test_span_first_wide_end_equals_plain_topk(spark):
    # with end >= every doc length, the filter passes every doc that
    # contains the term — the healthy-regime kept set itself
    idx = _index(
        spark,
        ["aa bb word", "word cc dd", "ee ff gg", "hh ii jj", "kk ll mm"],
    )
    via_span = bm25_span_first_topk(idx, "word", end=1000).collect()
    plain = bm25_topk(idx, "word").collect()
    assert [(r.doc_id, r.score) for r in via_span] == [
        (r.doc_id, r.score) for r in plain if r.score > 0
    ]


# --- _analyze -------------------------------------------------------------


def test_analyze_doc_ordered_stream(spark):
    idx = _index(spark, ["FooBar baz a foo2"])
    rows = analyze_doc(idx, 0).collect()
    assert [(r.pos, r.token) for r in rows] == [
        (1, "foo"), (2, "bar"), (3, "baz"), (4, "foo2")
    ]  # camel split, len>=2 drop of 'a', ORDER preserved
    assert analyze_doc(idx, 999).count() == 0


def test_analyze_text_matches_house_tokenizer(spark):
    from distributedcodesearchengine_spark.oracle.tokenizer import tokenize

    text = "QuickBrown fox-jumps over 3 lazyDogs!"
    rows = analyze_text(spark, text).collect()
    assert [r.token for r in rows] == tokenize(text)
    assert [r.pos for r in rows] == list(range(1, len(rows) + 1))


# --- sampler --------------------------------------------------------------


def test_sampler_full_window_equals_facets(spark):
    idx = _index(
        spark,
        ["word aa", "word bb", "word cc", "dd ee", "ff gg"],
        sources=["s1", "s1", "s2", "s3", "s3"],
    )
    rows = sampler_terms(idx, "word", key="source", shard_size=1000).collect()
    # healthy kept set = the 3 matching docs; full window == plain counts
    assert [(r.source, r.n_docs) for r in rows] == [("s1", 2), ("s2", 1)]


def test_sampler_window_cuts_by_score_then_doc_id(spark):
    # doc 0 has tf=2 (highest score); shard_size=1 keeps only it
    idx = _index(
        spark,
        ["word word aa", "word bb", "word cc", "dd ee", "ff gg"],
        sources=["s1", "s2", "s2", "s3", "s3"],
    )
    rows = sampler_terms(idx, "word", key="source", shard_size=1).collect()
    assert [(r.source, r.n_docs) for r in rows] == [("s1", 1)]


def test_diversified_sampler_caps_per_value(spark):
    idx = _index(
        spark,
        ["word aa", "word bb", "word cc", "dd ee", "ff gg"],
        sources=["s1", "s1", "s2", "s3", "s3"],
    )
    rows = sampler_terms(
        idx, "word", key="source", shard_size=1000,
        dedup_field="source", max_docs_per_value=1,
    ).collect()
    assert [(r.source, r.n_docs) for r in rows] == [("s1", 1), ("s2", 1)]


def test_sampler_guards(spark):
    idx = _index(spark, ["aa bb"])
    with pytest.raises(ValueError):
        sampler_terms(idx, "aa", key="source; DROP")
    with pytest.raises(ValueError):
        sampler_terms(idx, "aa", key="source", shard_size=0)
    assert sampler_terms(idx, "!!", key="source").count() == 0


# --- rescore --------------------------------------------------------------


def test_rescore_phrase_flips_rank(spark):
    # doc 0: high BM25 (tf=2 of 'word') but never the phrase;
    # doc 1: lower BM25, contains 'word up' twice -> rescore wins
    idx = _index(
        spark,
        [
            "word word aa bb",
            "word up cc word up",
            "dd ee ff gg",
            "hh ii jj kk",
            "ll mm nn oo",
        ],
    )
    base = bm25_rescore_topk(idx, "word", "word up", rescore_weight=0.0)
    b = base.collect()
    assert b[0].doc_id == 0  # plain BM25 order at rw=0
    assert all(r.score == r.base for r in b)  # rw=0 blend is the identity
    res = bm25_rescore_topk(idx, "word", "word up", rescore_weight=5.0)
    r = res.collect()
    assert r[0].doc_id == 1 and r[0].n_occur == 2
    assert r[0].score == pytest.approx(r[0].base + 5.0 * 2, abs=1e-6)


def test_rescore_guards(spark):
    idx = _index(spark, ["aa bb"])
    with pytest.raises(ValueError):
        bm25_rescore_topk(idx, "aa", "aa bb", window_size=5, k=10)
    with pytest.raises(ValueError):
        bm25_rescore_topk(idx, "aa", "aa bb", rescore_weight=-1.0)
    assert bm25_rescore_topk(idx, "!!", "aa bb").count() == 0
