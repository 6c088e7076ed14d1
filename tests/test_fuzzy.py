"""Fuzzy query tests (operators/fuzzy)."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import get_documents_index
from distributedcodesearchengine_spark.operators.fuzzy import (
    bm25_fuzzy_topk,
    expand_fuzzy,
    is_fuzzy_query,
    parse_fuzzy_query,
)


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return get_documents_index(spark, sf_dir)


def test_parse():
    assert parse_fuzzy_query("dup sow~1") == (["dup"], [("sow", 1)])
    assert parse_fuzzy_query("tble~") == ([], [("tble", 1)])  # default d=1
    assert parse_fuzzy_query("word~2") == ([], [("word", 2)])
    assert parse_fuzzy_query("word~3") == (["word"], [])  # d capped at 2
    assert is_fuzzy_query("sow~") and not is_fuzzy_query("sow")


def test_symspell_candidates_equal_levenshtein_scan(idx):
    """d=1 deletion-key expansion == brute dictionary levenshtein."""
    got = [t for t, _ in expand_fuzzy(idx, "sow", 1, 100)]
    rows = idx.terms.select(
        "term", "df", F.levenshtein("term", F.lit("sow")).alias("d")
    ).where(F.col("d") <= 1).collect()
    want = [t for t, _, _ in sorted(
        ((r["term"], r["df"], r["d"]) for r in rows),
        key=lambda x: (x[2], -x[1], x[0]),
    )]
    assert got == want and len(got) >= 2  # multi-term correction


def test_exact_term_ranks_first(idx):
    got = [t for t, _ in expand_fuzzy(idx, "scan", 1, 10)]
    assert got and got[0] == "scan"


def test_fuzzy_equals_expanded_or_query(idx):
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    terms = [t for t, _ in expand_fuzzy(idx, "sow", 1)]
    explicit = " ".join(["dup"] + terms)
    a = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_fuzzy_topk(idx, "dup sow~1", k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_topk(idx, explicit, k=10).collect()]
    assert a == b


def test_api_routing(spark, idx):
    from distributedcodesearchengine_spark.api import SearchEngine

    eng = SearchEngine(idx)
    got = eng.search("dup sow~1", limit=5).collect()
    want = bm25_fuzzy_topk(idx, "dup sow~1", k=5).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
