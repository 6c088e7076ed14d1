"""Retrieval-eval harness (operators/evalrank): label derivation,
hand-computed nDCG/MRR/recall, perfect- and degraded-ranking regimes."""

import math

from distributedcodesearchengine_spark.functions.rounding import round6_py
from distributedcodesearchengine_spark.operators.evalrank import (
    LN2,
    eval_ranking,
    relevance_labels,
)

DOCS = [
    (1, ["alpha", "beta", "gamma"]),   # rel 2 for "alpha beta"
    (2, ["alpha", "alpha", "delta"]),  # rel 1 (distinct terms!)
    (3, ["beta", "beta"]),             # rel 1
    (4, ["epsilon"]),                  # rel 0
]
QUERIES = {7: "alpha beta"}


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, tokens array<string>")


def _results(spark, order):
    rows = [(7, i + 1, d) for i, d in enumerate(order)]
    return spark.createDataFrame(rows, "query_id int, rank int, doc_id long")


def _dcg(rels):
    return sum(
        (2.0 ** r - 1.0) / (math.log(i + 2.0) / LN2) for i, r in enumerate(rels)
    )


def test_labels_are_distinct_term_counts(spark):
    got = {
        (r["query_id"], r["doc_id"]): r["rel"]
        for r in relevance_labels(_docs(spark), QUERIES).collect()
    }
    assert got == {(7, 1): 2, (7, 2): 1, (7, 3): 1}


def test_perfect_ranking_is_all_ones(spark):
    res = _results(spark, [1, 2, 3])  # ideal order: rel 2, 1, 1 — all retrieved
    row = eval_ranking(res, relevance_labels(_docs(spark), QUERIES), k=10).first()
    assert (row["ndcg"], row["mrr"], row["recall"]) == (1.0, 1.0, 1.0)


def test_degraded_ranking_hand_computed(spark):
    # irrelevant doc first, best doc last, doc 3 missing
    res = _results(spark, [4, 2, 1])
    row = eval_ranking(res, relevance_labels(_docs(spark), QUERIES), k=10).first()
    exp_ndcg = _dcg([0, 1, 2]) / _dcg([2, 1, 1])
    assert row["ndcg"] == round6_py(exp_ndcg)
    assert row["mrr"] == 0.5          # first relevant at rank 2
    assert row["recall"] == round6_py(2.0 / 3.0)


def test_k_cutoff_drops_tail(spark):
    # k=2: only ranks 1-2 count; doc 1 (rel 2) at rank 3 is cut
    res = _results(spark, [4, 2, 1])
    row = eval_ranking(res, relevance_labels(_docs(spark), QUERIES), k=2).first()
    exp_ndcg = _dcg([0, 1]) / _dcg([2, 1])
    assert row["ndcg"] == round6_py(exp_ndcg)
    assert row["recall"] == round6_py(1.0 / 3.0)


def test_no_relevant_retrieved(spark):
    res = _results(spark, [4])
    row = eval_ranking(res, relevance_labels(_docs(spark), QUERIES), k=10).first()
    assert (row["ndcg"], row["mrr"], row["recall"]) == (0.0, 0.0, 0.0)


def test_precision_and_err_hand_computed(spark):
    # ranking [4, 2, 1]: rels [0, 1, 2], gmax = 2
    res = _results(spark, [4, 2, 1])
    row = eval_ranking(res, relevance_labels(_docs(spark), QUERIES), k=10).first()
    assert row["precision"] == round6_py(2.0 / 3.0)
    # ERR: R = (2^rel - 1) / 2^gmax -> [0, 1/4, 3/4]
    err, p = 0.0, 1.0
    for rank, rr in [(1, 0.0), (2, 0.25), (3, 0.75)]:
        err = err + p * rr / rank
        p = p * (1.0 - rr)
    assert row["err"] == round6_py(err)
    # perfect ranking has strictly higher ERR than the degraded one
    perfect = eval_ranking(
        _results(spark, [1, 2, 3]),
        relevance_labels(_docs(spark), QUERIES), k=10,
    ).first()
    assert perfect["err"] > row["err"]
    assert perfect["precision"] == 1.0


def test_err_zero_when_nothing_relevant(spark):
    res = _results(spark, [4])
    row = eval_ranking(res, relevance_labels(_docs(spark), QUERIES), k=10).first()
    assert (row["precision"], row["err"]) == (0.0, 0.0)


# --- similarity agreement ----------------------------------------------------


def test_similarity_agreement_overlaps(spark):
    from distributedcodesearchengine_spark.operators.evalrank import (
        similarity_agreement,
    )
    from distributedcodesearchengine_spark.operators.scorer import (
        bm25_topk,
        classic_topk,
        dfr_topk,
    )
    from tests.test_search_after import _index

    texts = [
        "apple banana apple cherry",
        "banana cherry durian fig grape",
        "apple fig",
        "grape grape grape durian",
        "apple apple banana banana cherry",
    ]
    idx = _index(spark, texts)
    q = "apple banana"
    rows = {(r["model_a"], r["model_b"]): r["overlap"]
            for r in similarity_agreement(idx, q, k=3).collect()}
    want = {}
    tops = {
        "bm25": {r["doc_id"] for r in bm25_topk(idx, q, k=3).collect()},
        "classic": {r["doc_id"] for r in classic_topk(idx, q, k=3).collect()},
        "dfr": {r["doc_id"] for r in dfr_topk(idx, q, k=3).collect()},
    }
    for a, b in (("bm25", "classic"), ("bm25", "dfr"), ("classic", "dfr")):
        want[(a, b)] = len(tops[a] & tops[b])
    assert rows == want
    assert all(0 <= v <= 3 for v in rows.values())
