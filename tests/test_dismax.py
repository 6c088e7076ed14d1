"""DisMax (best_fields) semantics (operators/fields.dismax_topk) —
Spark/DuckDB parity is covered by the dismax_topk gate key; these pin
the combiner algebra and the best-field-dominates behavior."""

import math

from pyspark.sql import functions as F

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.fields import (
    FieldSpec,
    dismax_topk,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk


def _docs(spark, rows):
    """rows: [(title, body)] -> docs(doc_id, title, body)."""
    return spark.createDataFrame(
        [(i, t, b) for i, (t, b) in enumerate(rows)],
        "doc_id long, title string, body string",
    )


def test_best_field_dominates_at_tie_zero(spark):
    # doc 0: whole query in the title; doc 1: query split across both
    # fields. Pure dismax (tie=0) must rank the concentrated match
    # first — the defining best_fields behavior a sum-combiner misses.
    rows = [
        ("alpha beta", "unrelated filler words here"),
        ("alpha filler", "beta filler words here"),
        ("noise one", "noise two three four"),
        ("noise five", "noise six seven eight"),
        ("noise nine", "noise ten eleven twelve"),
    ]
    d = _docs(spark, rows)
    fields = [FieldSpec("title", 1.0, 0.75), FieldSpec("body", 1.0, 0.75)]
    got = dismax_topk(d, "alpha beta", fields, k=5, tie=0.0).collect()
    assert got[0]["doc_id"] == 0
    assert got[0]["score"] > got[1]["score"]


def test_tie_one_is_weighted_sum(spark):
    # score(tie) = dis + tie * (tot - dis), so tie=1 must equal the
    # plain weighted sum of the per-field scores — verified through the
    # interpolation identity on a third point (tie=0.5 is the midpoint)
    rows = [
        ("alpha beta", "beta gamma delta"),
        ("alpha other", "words beta here"),
        ("noise one", "noise two three"),
        ("noise four", "noise five six"),
        ("noise seven", "noise eight nine"),
    ]
    d = _docs(spark, rows)
    fields = [FieldSpec("title", 2.0, 0.75), FieldSpec("body", 1.0, 0.75)]

    def scores(tie):
        return {
            r["doc_id"]: r["score"]
            for r in dismax_topk(d, "alpha beta", fields, k=5, tie=tie).collect()
        }

    s0, s5, s1 = scores(0.0), scores(0.5), scores(1.0)
    for doc in s0:
        if doc in s5 and doc in s1:
            assert math.isclose(
                s5[doc], s0[doc] + 0.5 * (s1[doc] - s0[doc]), rel_tol=1e-12
            )
            assert s1[doc] >= s0[doc] - 1e-15  # sum >= max for w,S >= 0


def test_single_field_equals_plain_bm25(spark):
    # one field at weight 1 -> dismax IS the house BM25 (same idf
    # chain, same (k1+1) saturation): scores must agree bit-for-bit
    # with bm25_topk over an index built from the same text
    texts = [
        "rare words here indeed",
        "rare other tokens again and again",
        "plain unrelated stuff here",
        "more filler content rows",
        "final filler document text",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, body string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in dismax_topk(
            d, "rare words", [FieldSpec("body", 1.0, 0.75)], k=5, tie=0.0
        ).collect()
    }
    pages = spark.createDataFrame(
        [
            (
                f"https://a.example/{i:04d}",
                f"<html><body><p>{t}</p></body></html>".encode(),
                t,
                "en",
                "s1",
            )
            for i, t in enumerate(texts)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    idx = build_index_inmem(spark, pages, meta_cols=("source",))
    want = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(idx, "rare words", k=5).collect()
    }
    assert set(got) == set(want)
    for doc in got:
        assert got[doc] == want[doc], (doc, got[doc], want[doc])


def test_degenerate_zero_backfill(spark):
    rows = [("alpha one", "two"), ("alpha three", "four"),
            ("alpha five", "six")]
    d = _docs(spark, rows)
    fields = [FieldSpec("title", 1.0, 0.75), FieldSpec("body", 1.0, 0.75)]
    got = dismax_topk(d, "zzzznotaword", fields, k=2, tie=0.0).collect()
    # unknown term -> all zeros, doc_id order, k rows
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
        (1, 0, 0.0), (2, 1, 0.0)
    ]


def test_empty_query_guard(spark):
    d = _docs(spark, [("alpha", "beta")])
    assert dismax_topk(d, "!! ??", [FieldSpec("title", 1.0)], k=5).count() == 0
