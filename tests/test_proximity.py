"""Proximity (NEAR) query tests (operators/proximity).

Contract: Spark window counts == a pure-Python sliding-window check
over the SAME tokenizer output; the indexed (compressed positional)
path's doc set == the tokens-scan path's doc set; the BM25-NEAR
composition keeps only near docs and scores them like the plain query.
"""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import docs_with_tokens
from distributedcodesearchengine_spark.operators.proximity import (
    bm25_proximity_topk,
    parse_near_query,
    proximity_match_indexed,
    proximity_windows,
)
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize


def py_n_win(tokens, terms, w):
    """# of 1-based window starts i in [1, len] covering all terms."""
    n = 0
    for i in range(len(tokens)):
        win = set(tokens[i : i + w])
        if all(t in win for t in terms):
            n += 1
    return n


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = docs_with_tokens(spark, sf_dir).persist()
    yield d
    d.unpersist()  # never leak a cached shared-plan into later modules


def test_parse_near_query():
    assert parse_near_query('"row scan"~3') == ("row scan", 3)
    assert parse_near_query('  "a b" ~ 10 ') == ("a b", 10)
    assert parse_near_query('"a b"~0') == ("a b", 1)  # clamp
    assert parse_near_query('"a b"') is None
    assert parse_near_query("row scan~3") is None


CASES = [
    ("row scan", 6),
    ("row scan", 2),        # tight window (phrase-adjacent)
    ("table", 4),           # single term: n_win = windows containing it
    ("query window sort", 9),
    ("zzz unknown", 5),     # no matches
    ("Row-Scan!", 6),       # tokenizer normalization applies
]


@pytest.mark.parametrize("query,w", CASES)
def test_window_counts_match_python(docs, query, w):
    terms = sorted(set(tokenize(query)))
    expected = {}
    if terms:
        for r in docs.select("doc_id", "tokens").collect():
            c = py_n_win(list(r["tokens"]), terms, w)
            if c > 0:
                expected[r["doc_id"]] = c
    got = {
        r["doc_id"]: r["n_win"]
        for r in proximity_windows(docs, query, w).collect()
    }
    assert got == expected


def test_empty_token_doc(spark):
    """Zero-token docs must not blow up sequence/slice (Spark's
    sequence(1, 0) descends) — regression for the CLI-corpus crash."""
    docs = spark.createDataFrame(
        [(1, ["row", "scan"]), (2, [])], "doc_id long, tokens array<string>"
    )
    got = {r["doc_id"]: r["n_win"] for r in proximity_windows(docs, "row scan", 3).collect()}
    assert got == {1: 1}


@pytest.mark.parametrize("query,w", [("row scan", 6), ("row scan", 2), ("dup small", 12)])
def test_indexed_docset_matches_scan(docs, query, w):
    scan = {r["doc_id"] for r in proximity_windows(docs, query, w).collect()}
    idxd = {
        r["doc_id"]
        for r in proximity_match_indexed(docs, query, w, shard_width=64).collect()
    }
    assert idxd == scan


def test_bm25_near_composition(spark, sf_dir):
    """NEAR-kept docs score exactly like the plain query (predicate
    selects, never rescales), and every result doc is near."""
    from distributedcodesearchengine_spark.entry_queries import (
        get_documents_index,
    )
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    idx = get_documents_index(spark, sf_dir)
    near_docs = {
        r["doc_id"]
        for r in proximity_windows(idx.docs, "dup small", 12).collect()
    }
    got = bm25_proximity_topk(idx, "dup small", 12, k=10).collect()
    assert got and all(r["doc_id"] in near_docs for r in got)
    plain = {
        r["doc_id"]: r["score"] for r in bm25_topk(idx, "dup small", k=500).collect()
    }
    for r in got:
        if r["doc_id"] in plain and r["score"] > 0:
            assert abs(plain[r["doc_id"]] - r["score"]) < 1e-9


def test_api_routing(spark, sf_dir):
    from distributedcodesearchengine_spark.api import SearchEngine
    from distributedcodesearchengine_spark.entry_queries import (
        get_documents_index,
    )

    idx = get_documents_index(spark, sf_dir)
    eng = SearchEngine(idx)
    near_docs = {
        r["doc_id"] for r in proximity_windows(idx.docs, "dup small", 12).collect()
    }
    got = eng.search('"dup small"~12', limit=5).collect()
    assert got and all(r["doc_id"] in near_docs for r in got)


# --- ordered NEAR (Surround W operator / SpanNear inOrder=true) ---

from distributedcodesearchengine_spark.operators.proximity import (  # noqa: E402
    bm25_ordered_near_topk,
    ordered_match_indexed,
    ordered_windows,
    parse_ordered_near_query,
)


def py_ordered_n_win(tokens, seq, w):
    """# of 1-based window starts whose w-slice contains ``seq`` as a
    subsequence (greedy check — exact for existence)."""
    n = 0
    for i in range(len(tokens)):
        win = tokens[i : i + w]
        k = 0
        for x in win:
            if k < len(seq) and x == seq[k]:
                k += 1
        if k == len(seq):
            n += 1
    return n


def test_parse_ordered_near_query():
    assert parse_ordered_near_query('"row scan"~o3') == ("row scan", 3)
    assert parse_ordered_near_query('  "a b" ~ o 10 ') == ("a b", 10)
    assert parse_ordered_near_query('"a b"~3') is None  # unordered form
    assert parse_near_query('"a b"~o3') is None  # and vice versa


ORDERED_CASES = [
    ("row scan", 6),
    ("row scan", 2),          # adjacent (ordered w=2 == bigram phrase)
    ("scan row", 6),          # reverse order: different doc set
    ("table", 4),             # single term == unordered
    ("batch batch", 5),       # duplicate terms need DISTINCT positions
    ("query window sort", 9),
    ("zzz unknown", 5),
]


@pytest.mark.parametrize("query,w", ORDERED_CASES)
def test_ordered_window_counts_match_python(docs, query, w):
    seq = tokenize(query)
    expected = {}
    if seq:
        for r in docs.select("doc_id", "tokens").collect():
            c = py_ordered_n_win(list(r["tokens"]), seq, w)
            if c > 0:
                expected[r["doc_id"]] = c
    got = {
        r["doc_id"]: r["n_win"] for r in ordered_windows(docs, query, w).collect()
    }
    assert got == expected


def test_ordered_strict_subset(docs):
    """Order thins the match set on this corpus (non-vacuous operator)."""
    uno = {r["doc_id"] for r in proximity_windows(docs, "row scan", 6).collect()}
    ord_ = {r["doc_id"] for r in ordered_windows(docs, "row scan", 6).collect()}
    assert ord_ < uno


def test_ordered_duplicate_terms_distinct_positions(spark):
    """'batch batch' must NOT match a doc with a single 'batch' in the
    window — the subsequence needs two increasing positions."""
    docs = spark.createDataFrame(
        [(1, ["batch", "row"]), (2, ["batch", "row", "batch"]), (3, [])],
        "doc_id long, tokens array<string>",
    )
    got = {r["doc_id"]: r["n_win"] for r in ordered_windows(docs, "batch batch", 3).collect()}
    assert got == {2: 1}
    idxd = {r["doc_id"] for r in ordered_match_indexed(docs, "batch batch", 3, shard_width=8).collect()}
    assert idxd == {2}


@pytest.mark.parametrize("query,w", [("row scan", 6), ("scan row", 6), ("row scan", 2), ("query window sort", 9)])
def test_ordered_indexed_docset_matches_scan(docs, query, w):
    scan = {r["doc_id"] for r in ordered_windows(docs, query, w).collect()}
    idxd = {
        r["doc_id"]
        for r in ordered_match_indexed(docs, query, w, shard_width=64).collect()
    }
    assert idxd == scan


def test_ordered_bm25_composition_and_routing(spark, sf_dir):
    from distributedcodesearchengine_spark.api import SearchEngine
    from distributedcodesearchengine_spark.entry_queries import (
        get_documents_index,
    )
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    idx = get_documents_index(spark, sf_dir)
    odocs = {
        r["doc_id"] for r in ordered_windows(idx.docs, "small dup", 8).collect()
    }
    got = bm25_ordered_near_topk(idx, "small dup", 8, k=10).collect()
    assert got and all(r["doc_id"] in odocs for r in got)
    plain = {
        r["doc_id"]: r["score"] for r in bm25_topk(idx, "small dup", k=500).collect()
    }
    for r in got:
        if r["doc_id"] in plain and r["score"] > 0:
            assert abs(plain[r["doc_id"]] - r["score"]) < 1e-9
    routed = SearchEngine(idx).search('"small dup"~o8', limit=10).collect()
    assert [r["doc_id"] for r in routed] == [r["doc_id"] for r in got]
