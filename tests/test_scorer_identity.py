"""Rank-identity harness (SURVEY §5.2, BASELINE.md).

The Spark engine's top-k (docIDs AND scores, abs diff < 1e-9, ties ->
ascending doc_id) must match the pure-Python BM25Okapi-replica oracle on
the reference query set over the synthetic corpus — including filters,
the relative threshold, empty queries, unknown tokens, and query-token
multiplicity.
"""

import numpy as np
import pytest

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.oracle.bm25 import BM25Oracle
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize
from distributedcodesearchengine_spark.sources.corpus import (
    generate_pages,
    generate_rows_local,
)

N_DOCS = 800

# Reference query set (README.md:159-169, tests/test_search.py:44,61) +
# adversarial cases from FIXTURES.md §2.
QUERIES = [
    ("JSON parsing", None),
    ("parse json", None),
    ("send HTTP request", None),
    ("validate email address", None),
    ("async database query", None),
    ("json json parser", None),  # query-token multiplicity
    ("zzzzunknowntoken", None),  # all-unknown -> degenerate all-zero path
    ("a b c", None),  # all tokens < 2 chars -> empty result
    ("", None),
    ("parseJSON HTTPClient2", None),
    ("table row scan", {"lang": "de"}),
    ("JSON parsing", {"lang": "en"}),
    ("parse json", {"site": "site1.example"}),
]


@pytest.fixture(scope="module")
def oracle_and_index(spark):
    pages = generate_pages(spark, N_DOCS, seed=42, parts=6)
    index = build_index_inmem(spark, pages)

    local = generate_rows_local(np.arange(N_DOCS), seed=42)
    local = local.sort_values("url").reset_index(drop=True)  # doc_id = url rank
    corpus = [tokenize(t) for t in local["text"]]
    oracle = BM25Oracle(corpus)
    meta = {
        "lang": local["lang"].tolist(),
        "site": [u.split("://")[1].split("/")[0] for u in local["url"]],
    }
    return oracle, meta, index, local


@pytest.mark.parametrize("query,filters", QUERIES)
def test_rank_identity(oracle_and_index, query, filters):
    oracle, meta, index, local = oracle_and_index
    want = oracle.search(query, limit=10, filters=filters, meta=meta)
    got = bm25_topk(index, query, k=10, filters=filters).collect()

    assert [r["doc_id"] for r in got] == [d for d, _ in want], query
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-9, (query, r["doc_id"], r["score"], s)
    # urls resolve to the same rows
    for r in got:
        assert r["url"] == local["url"].iloc[r["doc_id"]]


def test_stats_match_oracle(oracle_and_index):
    oracle, _, index, _ = oracle_and_index
    assert index.n_docs == oracle.corpus_size
    assert abs(index.avgdl - oracle.avgdl) < 1e-12
    got_idf = {
        r["term"]: r["idf"] for r in index.terms.collect()
    }
    assert len(got_idf) == len(oracle.idf)
    for t, v in oracle.idf.items():
        assert abs(got_idf[t] - v) < 1e-9, t


def test_explain_contributions_sum_to_score(oracle_and_index):
    """explain rows decompose the ranked score exactly: per-doc
    canonical term-ordered sum of raw contributions == ranked score."""
    import math

    from distributedcodesearchengine_spark.functions.rounding import round6_py
    from distributedcodesearchengine_spark.operators.scorer import (
        bm25_topk,
        explain_topk,
    )

    _, _, index, _ = oracle_and_index
    q = "parse json table"
    top = {r["doc_id"]: (r["rank"], r["score"]) for r in bm25_topk(index, q, k=5).collect()}
    rows = explain_topk(index, q, k=5).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert (r["rank"], round6_py(top[r["doc_id"]][1])) == (
            top[r["doc_id"]][0],
            r["score"],
        )
    for doc_id, rs in by_doc.items():
        # the displayed contribs are rounded; recompute raw from factors
        total = 0.0
        for r in sorted(rs, key=lambda x: x["term"]):
            total += r["contrib"]
        assert math.isclose(total, top[doc_id][1], rel_tol=0, abs_tol=5e-6 * len(rs))


def test_explain_empty_on_unknown_tokens(oracle_and_index):
    from distributedcodesearchengine_spark.operators.scorer import explain_topk

    _, _, index, _ = oracle_and_index
    assert explain_topk(index, "zzzzunknowntoken").count() == 0
    assert explain_topk(index, "!! ??").count() == 0


def test_range_filter_semantics(oracle_and_index):
    """Range filter is post-threshold: every kept doc satisfies the
    bound, ranks recompute over the survivors, and the unfiltered
    ranking's bounded prefix is preserved in order."""
    from distributedcodesearchengine_spark.operators.scorer import (
        bm25_topk,
        bm25_topk_range,
    )

    _, _, index, local = oracle_and_index
    q = "parse json"
    lo, hi = 150, 260
    lens = {
        r["doc_id"]: r["doc_len"]
        for r in index.docs.select("doc_id", "doc_len").collect()
    }
    got = bm25_topk_range(index, q, k=10, ranges={"doc_len": (lo, hi)}).collect()
    assert got and all(lo <= lens[r["doc_id"]] <= hi for r in got)
    base = [r["doc_id"] for r in bm25_topk(index, q, k=200).collect()
            if lo <= lens[r["doc_id"]] <= hi][:10]
    assert [r["doc_id"] for r in got] == base
    # open-ended side
    open_hi = bm25_topk_range(index, q, k=10, ranges={"doc_len": (lo, None)}).collect()
    assert all(lens[r["doc_id"]] >= lo for r in open_hi)


def test_avg_idf_two_level_fold_is_canonical(oracle_and_index):
    """The epsilon-floor average idf is the canonical TWO-LEVEL fold
    (md5-prefix buckets, term-ordered within, bucket-ordered across) —
    a pure-Python replication of that exact definition must match the
    engine BIT-FOR-BIT, and the corpus must genuinely span many
    buckets (the scale property the fold exists for)."""
    import hashlib

    from distributedcodesearchengine_spark.operators.stats import EPSILON

    _, _, index, _ = oracle_and_index
    detail = index.extras.get("terms_detail")
    if detail is None:
        from distributedcodesearchengine_spark.operators.stats import (
            terms_with_idf_detail,
        )

        detail = terms_with_idf_detail(index.tf, index.n_docs)
    rows = detail.select("term", "idf_raw", "idf").collect()
    idf_raw = {r["term"]: r["idf_raw"] for r in rows}
    floored = [r for r in rows if r["idf_raw"] < 0]
    assert floored, "corpus must floor at least one term for this to bind"

    buckets: dict = {}
    for t, v in idf_raw.items():
        buckets.setdefault(hashlib.md5(t.encode()).hexdigest()[:3], []).append(
            (t, v)
        )
    assert len(buckets) > 1, "vocab must span multiple md5 buckets"
    total = 0.0
    for b in sorted(buckets):
        s = 0.0
        for _, v in sorted(buckets[b]):
            s += v
        total += s
    avg = total / len(idf_raw)
    for r in floored:
        assert r["idf"] == EPSILON * avg, (r["term"], r["idf"], EPSILON * avg)
