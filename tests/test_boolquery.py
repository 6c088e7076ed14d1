"""Boolean occur-flag query tests (operators/boolquery).

Contract: for any +/- query, the result set equals a pure-Python
filter over the SAME tokenizer output — docs containing ALL required
tokens and NO excluded token — ranked by the standard BM25 scorer over
the positive tokens, threshold taken over the constrained set.
"""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import get_documents_index
from distributedcodesearchengine_spark.operators.boolquery import (
    bm25_boolean_topk,
    is_boolean_query,
    parse_boolean_query,
)


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return get_documents_index(spark, sf_dir)


def test_parse():
    pos, req, exc = parse_boolean_query("dup +table -row plainWord")
    assert req == ["table"] and exc == ["row"]
    # positive = plain + required, camel clause expands
    assert set(pos) == {"dup", "table", "plain", "word"}
    # camelCase under a flag expands to multiple required tokens
    _, req2, _ = parse_boolean_query("+camelCase")
    assert req2 == ["camel", "case"]


def test_is_boolean_query():
    assert is_boolean_query("dup +table")
    assert is_boolean_query("-row")
    assert not is_boolean_query("plain query")
    assert not is_boolean_query("state-of-the-art non-blocking")  # mid-word dashes
    assert not is_boolean_query("-o")  # flag token too short to tokenize


def _doc_sets(idx, required, excluded):
    rows = idx.docs.select("doc_id", "tokens").collect()
    keep = set()
    for r in rows:
        toks = set(r["tokens"])
        if all(t in toks for t in required) and not any(t in toks for t in excluded):
            keep.add(r["doc_id"])
    return keep


@pytest.mark.parametrize(
    "query",
    [
        "dup +table -row",     # healthy: positive max, both constraints
        "dup +table +row",     # two required terms
        "table -dup",          # degenerate all-non-positive + exclusion
        "-dup",                # pure exclusion (zero backfill universe)
        "+zzznotaword dup",    # unknown required term -> empty result
    ],
)
def test_result_set_respects_constraints(idx, query):
    pos, req, exc = parse_boolean_query(query)
    allowed = _doc_sets(idx, req, exc)
    got = bm25_boolean_topk(idx, query, k=10).collect()
    assert all(r["doc_id"] in allowed for r in got)
    if not allowed:
        assert got == []
    else:
        # healthy regime keeps only docs over the 1%-of-max threshold
        # (no zero backfill when max > 0), so <= k rows come back; the
        # degenerate regime backfills to min(k, |universe|)
        assert 0 < len(got) <= min(10, len(allowed))


def test_required_scores_match_plain_scorer(idx):
    """A boolean query's surviving docs score exactly like the plain
    bag-of-words query over its positive tokens (constraints select,
    never rescale)."""
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    bool_rows = {
        r["doc_id"]: r["score"]
        for r in bm25_boolean_topk(idx, "dup +table", k=10).collect()
    }
    plain_rows = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(idx, "dup table", k=500).collect()
    }
    assert bool_rows  # non-vacuous
    for did, s in bool_rows.items():
        if did in plain_rows:  # plain k cut can drop deep ties
            assert abs(plain_rows[did] - s) < 1e-9


def test_api_routing(spark, sf_dir, idx):
    """SearchEngine.search auto-detects occur flags."""
    from distributedcodesearchengine_spark.api import SearchEngine

    eng = SearchEngine(idx)
    got = eng.search("dup +table -row", limit=5).collect()
    allowed = _doc_sets(idx, ["table"], ["row"])
    assert got and all(r["doc_id"] in allowed for r in got)


# --- minimum_should_match ---------------------------------------------------


def test_msm_one_is_plain_bm25(spark):
    from distributedcodesearchengine_spark.operators.boolquery import (
        bm25_topk_msm,
    )
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk
    from tests.test_search_after import _index

    idx = _index(spark, [
        "rare signal one", "rare other two words", "signal three",
        "filler a", "filler b",
    ])
    a = bm25_topk(idx, "rare signal", k=5).orderBy("rank").collect()
    b = bm25_topk_msm(idx, "rare signal", k=5, msm=1).orderBy("rank").collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == [
        (r["rank"], r["doc_id"], r["score"]) for r in b
    ]


def test_msm_restricts_match_set_pre_threshold(spark):
    from distributedcodesearchengine_spark.operators.boolquery import (
        bm25_topk_msm,
    )
    from tests.test_search_after import _index

    idx = _index(spark, [
        "rare signal one",        # both terms
        "rare other two words",   # rare only
        "signal three",           # signal only
        "filler a", "filler b",
    ])
    got = bm25_topk_msm(idx, "rare signal", k=5, msm=2).collect()
    assert [r["doc_id"] for r in got] == [0]  # only the 2-of-2 doc matches


def test_msm_all_equals_boolean_required(spark):
    from distributedcodesearchengine_spark.operators.boolquery import (
        bm25_boolean_topk,
        bm25_topk_msm,
    )
    from tests.test_search_after import _index

    idx = _index(spark, [
        "rare signal one", "rare signal two words", "rare three",
        "signal four", "filler a", "filler b",
    ])
    # msm == number of distinct terms == MUST-all boolean with every
    # term required (required tokens also score): same ranking
    a = bm25_topk_msm(idx, "rare signal", k=5, msm=2).collect()
    b = bm25_boolean_topk(idx, "+rare +signal", k=5).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == [
        (r["rank"], r["doc_id"], r["score"]) for r in b
    ]


def test_msm_beyond_terms_matches_nothing(spark):
    from distributedcodesearchengine_spark.operators.boolquery import (
        bm25_topk_msm,
    )
    from tests.test_search_after import _index

    idx = _index(spark, ["rare signal one", "filler a"])
    assert bm25_topk_msm(idx, "rare signal", k=5, msm=3).count() == 0


# --- terms_set (per-doc minimum_should_match) --------------------------------


def test_terms_set_matches_python_recheck(spark):
    """Match set == a pure-Python filter: distinct-present count of the
    query terms >= doc_id % 3 + 1, over the same tokenizer output."""
    from distributedcodesearchengine_spark.operators.boolquery import (
        bm25_topk_terms_set,
    )
    from distributedcodesearchengine_spark.oracle.tokenizer import tokenize
    from tests.test_search_after import _index

    texts = [
        "rare signal one",        # 0: req 1, has 2 -> match
        "rare other two words",   # 1: req 2, has 1 -> no
        "signal rare three",      # 2: req 3, has 2 -> no
        "rare signal extra xyz",  # 3: req 1, has 2 -> match
        "signal only here",       # 4: req 2, has 1 -> no
        "filler a",               # 5: req 3, has 0 -> no
    ]
    idx = _index(spark, texts)
    q = "rare signal"
    uniq = set(tokenize(q))
    exp = set()
    for i, t in enumerate(texts):
        present = len(uniq & set(tokenize(t)))
        if present >= i % 3 + 1 and present > 0:
            exp.add(i)
    got = bm25_topk_terms_set(idx, q, k=10).collect()
    assert {r["doc_id"] for r in got} == exp
    # scores come from the plain scorer over the constrained set
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_terms_set_requirement_varies_per_doc(spark):
    """Two docs with the SAME term content but different doc_ids land
    on different sides of the match boundary — the per-doc requirement
    no global msm can express."""
    from distributedcodesearchengine_spark.operators.boolquery import (
        bm25_topk_terms_set,
    )
    from tests.test_search_after import _index

    # doc 0 (req 1) and doc 2 (req 3) carry one query term each
    idx = _index(spark, [
        "rare padding words", "filler b", "rare padding words", "filler c",
    ])
    got = {r["doc_id"] for r in bm25_topk_terms_set(idx, "rare signal", k=10).collect()}
    assert 0 in got and 2 not in got


def test_terms_set_no_match_is_empty(spark):
    from distributedcodesearchengine_spark.operators.boolquery import (
        bm25_topk_terms_set,
    )
    from tests.test_search_after import _index

    idx = _index(spark, ["filler a", "filler b"])
    assert bm25_topk_terms_set(idx, "rare signal", k=5).count() == 0
    assert bm25_topk_terms_set(idx, "!! ??", k=5).count() == 0


def test_terms_set_duckdb_parity(spark, sf_dir):
    """Hash-level Spark-vs-DuckDB agreement on the gate corpus."""
    import duckdb

    from distributedcodesearchengine_spark import entry_queries as eq
    from distributedcodesearchengine_spark.functions import sql_oracle as oq

    sp = (
        eq.bm25_terms_set_q(spark, sf_dir, "dup table row", k=10)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oc = (
        con.execute(oq.bm25_terms_set_sql("dup table row", k=10))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(sp["doc_id"]) == list(oc["doc_id"])
    assert list(sp["score"]) == list(oc["score"])


# --- BM25+ variant ------------------------------------------------------------


def test_bm25plus_delta_zero_is_plain_bm25(spark):
    from distributedcodesearchengine_spark.operators.scorer import (
        bm25plus_topk,
        bm25_topk,
    )
    from tests.test_search_after import _index

    idx = _index(spark, [
        "rare signal one", "rare other two words", "signal three",
        "filler a", "filler b",
    ])
    a = bm25_topk(idx, "rare signal", k=5).collect()
    b = bm25plus_topk(idx, "rare signal", k=5, delta=0.0).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == [
        (r["rank"], r["doc_id"], r["score"]) for r in b
    ]


def test_bm25plus_lower_bound_property(spark):
    """The BM25+ motivation: a very long doc CONTAINING the term keeps
    a positive floor contribution (idf * delta * qtf), so it outranks
    any non-matching doc — and every matched score strictly exceeds
    its Okapi counterpart at delta > 0."""
    from distributedcodesearchengine_spark.operators.scorer import (
        bm25plus_topk,
        bm25_topk,
    )
    from tests.test_search_after import _index

    texts = [
        "rare " + " ".join(f"pad{i:03d}" for i in range(120)),  # long match
        "short other text", "more filler words",
    ]
    idx = _index(spark, texts)
    plus = {r["doc_id"]: r["score"]
            for r in bm25plus_topk(idx, "rare", k=5, delta=1.0).collect()}
    okapi = {r["doc_id"]: r["score"]
             for r in bm25_topk(idx, "rare", k=5).collect()}
    assert plus[0] > okapi[0] > 0
    # non-matching docs keep zero in both (degenerate/backfill aside,
    # this query is healthy: doc 0 matches)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25plus_topk(idx, "rare", delta=-0.5)
