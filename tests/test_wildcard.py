"""Wildcard prefix-query tests (operators/wildcard)."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import get_documents_index
from distributedcodesearchengine_spark.operators.wildcard import (
    bm25_wildcard_topk,
    expand_prefix,
    is_wildcard_query,
    parse_wildcard_query,
)


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return get_documents_index(spark, sf_dir)


def test_parse():
    assert parse_wildcard_query("dup s*") == (["dup"], ["s"])
    assert parse_wildcard_query("Sp* table") == (["table"], ["sp"])
    # a mid-clause star is not wildcard shape -> plain tokenization
    assert parse_wildcard_query("ab*cd*") == (["ab", "cd"], [])
    assert parse_wildcard_query("*") == ([], [])
    assert is_wildcard_query("s*") and not is_wildcard_query("scan")


def test_expand_prefix_cap_and_order(idx):
    full = expand_prefix(idx, "s", max_expansions=100)
    capped = expand_prefix(idx, "s", max_expansions=3)
    assert [t for t, _ in capped] == [t for t, _ in full][:3]
    # ranked df desc, term asc — recompute from the dictionary
    rows = (
        idx.terms.where(F.col("term").startswith("s"))
        .select("term", "df")
        .collect()
    )
    want = [t for t, _ in sorted(((r["term"], r["df"]) for r in rows),
                                 key=lambda x: (-x[1], x[0]))]
    assert [t for t, _ in full] == want[: len(full)]
    assert len(full) >= 2  # multi-term expansion on this corpus


def test_wildcard_equals_expanded_or_query(idx):
    """'dup s*' must rank exactly like the explicit OR query over
    dup + the expanded terms (qtf 1 each)."""
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    terms = [t for t, _ in expand_prefix(idx, "s")]
    explicit = " ".join(["dup"] + terms)
    a = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_wildcard_topk(idx, "dup s*", k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_topk(idx, explicit, k=10).collect()]
    assert a == b


def test_no_match_prefix_degenerates(idx):
    """'zzz*' expands to nothing -> unknown-token convention (zero
    backfill), engine-consistent with bm25_topk."""
    got = bm25_wildcard_topk(idx, "zzzq*", k=5).collect()
    assert len(got) == 5 and all(r["score"] == 0.0 for r in got)


def test_api_routing(spark, idx):
    from distributedcodesearchengine_spark.api import SearchEngine

    eng = SearchEngine(idx)
    got = eng.search("dup s*", limit=5).collect()
    want = bm25_wildcard_topk(idx, "dup s*", k=5).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
