"""Click-prior boosted BM25 tests (operators/explore)."""

import math

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import get_documents_index
from distributedcodesearchengine_spark.operators.explore import (
    bm25_clickboost_topk,
    click_prior,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return get_documents_index(spark, sf_dir)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    # unpersist at teardown: the CacheManager keys cache entries by
    # logical plan, so a leaked persist of the RAW events scan would
    # silently substitute into every later test's events plans and,
    # e.g., hide PushedFilters from the plan-shape asserts
    ev = load_table(spark, sf_dir, "events").persist()
    yield ev
    ev.unpersist()


def test_prior_counts(events):
    rows = click_prior(events).collect()
    assert rows and all(r["n_clicks"] > 0 for r in rows)
    total = events.where(F.col("event_type") == "click").count()
    assert sum(r["n_clicks"] for r in rows) == total


def test_boost_formula_and_membership(idx, events):
    """Every boosted score equals bm25 * (1 + w*ln(1+clicks)) for the
    SAME doc in the plain ranking's kept set — boost rescores, never
    admits non-matching docs."""
    prior = {r["doc_id"]: r["n_clicks"] for r in click_prior(events).collect()}
    plain = {
        r["doc_id"]: r["score"] for r in bm25_topk(idx, "dup table", k=500).collect()
    }
    got = bm25_clickboost_topk(idx, "dup table", events, k=10, weight=0.2).collect()
    assert got
    for r in got:
        assert r["n_clicks"] == prior.get(r["doc_id"], 0)
        if r["doc_id"] in plain:
            want = plain[r["doc_id"]] * (1 + 0.2 * math.log1p(r["n_clicks"]))
            assert abs(r["score"] - want) < 1e-6


def test_weight_zero_is_plain_order(idx, events):
    got = [r["doc_id"] for r in
           bm25_clickboost_topk(idx, "dup table", events, k=10, weight=0.0).collect()]
    plain = [r["doc_id"] for r in bm25_topk(idx, "dup table", k=10).collect()]
    assert got == plain


def test_boost_reranks(idx, events):
    got = [r["doc_id"] for r in
           bm25_clickboost_topk(idx, "dup table", events, k=10, weight=0.2).collect()]
    plain = [r["doc_id"] for r in bm25_topk(idx, "dup table", k=10).collect()]
    assert got != plain  # non-vacuous on this corpus
