"""Query-time synonym expansion (operators/synonyms)."""

import pytest
from collections import Counter

from distributedcodesearchengine_spark.operators.synonyms import (
    bm25_synonyms_topk,
    expand_query,
)


@pytest.fixture(scope="module")
def index(spark):
    from distributedcodesearchengine_spark.build.indexer import build_index_inmem
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    return build_index_inmem(spark, generate_pages(spark, 120, seed=11, parts=2))


def test_expansion_carries_multiplicity():
    got = expand_query("json json parser", {"json": ["yaml"], "parser": ["lexer"]})
    assert got == Counter({"json": 2, "yaml": 2, "parser": 1, "lexer": 1})
    # synonym colliding with another query token accumulates
    got = expand_query("json yaml", {"json": ["yaml"]})
    assert got == Counter({"json": 1, "yaml": 2})
    # synonyms normalize through the tokenizer (camelCase, min length);
    # a multi-token synonym containing the source token does NOT double
    # the source's weight (the st != t guard)
    got = expand_query("json", {"json": ["JsonDoc", "a"]})
    assert got == Counter({"json": 1, "doc": 1})


def test_synonym_search_equals_expanded_plain_query(index):
    """With single-multiplicity tokens and vocab synonyms, the synonym
    search equals the plain BM25 over the expanded token bag."""
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    syn = bm25_synonyms_topk(index, "parse", {"parse": ["json"]}, k=10).collect()
    plain = bm25_topk(index, "parse json", k=10).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in syn] == [
        (r["rank"], r["doc_id"], r["score"]) for r in plain
    ]


def test_empty_and_unknown(index):
    assert bm25_synonyms_topk(index, "!!", {}).count() == 0
    # unknown synonym terms drop; the query still scores on its own token
    res = bm25_synonyms_topk(index, "parse", {"parse": ["zzzznotaword"]}, k=5)
    assert res.count() == 5
