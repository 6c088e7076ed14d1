"""Language-model similarity tests (operators/scorer lmd_topk /
lmjm_topk — Lucene LMDirichletSimilarity / LMJelinekMercerSimilarity,
Zhai & Lafferty SIGIR 2001/2004).

Contract: scores replicate a pure-Python implementation of the Lucene
formulas over the SAME tokenizer output and exact integer corpus stats
(ctf, total tokens); the house chain (1%-of-max threshold, degenerate
backfill, doc_id tie-break) is shared with the Okapi scorer.
"""

import math

import pytest

from distributedcodesearchengine_spark.operators.scorer import (
    bm25_topk,
    lmd_topk,
    lmjm_topk,
    query_term_cprobs,
)
from tests.test_search_after import _index

TEXTS = [
    "apple banana apple cherry",        # doc 0: tf(apple)=2, dl=4
    "banana cherry durian fig grape",   # doc 1: dl=5
    "apple fig",                        # doc 2: dl=2
    "grape grape grape durian",         # doc 3: dl=4
]


def _py_stats(texts):
    toks = [t.split() for t in texts]
    total = sum(len(ts) for ts in toks)
    ctf = {}
    for ts in toks:
        for t in ts:
            ctf[t] = ctf.get(t, 0) + 1
    return toks, total, ctf


def _py_lmd(texts, query_terms, mu=2000.0):
    toks, total, ctf = _py_stats(texts)
    out = {}
    for i, ts in enumerate(toks):
        dl = len(ts)
        s = 0.0
        for t in sorted(set(query_terms)):
            qtf = query_terms.count(t)
            tf = ts.count(t)
            if tf == 0 or t not in ctf:
                continue
            p = ctf[t] / total
            c = math.log(1.0 + tf / (mu * p)) + math.log(mu / (dl + mu))
            s += qtf * max(0.0, c)
        out[i] = s
    return out


def _py_lmjm(texts, query_terms, lam=0.1):
    toks, total, ctf = _py_stats(texts)
    out = {}
    for i, ts in enumerate(toks):
        dl = len(ts)
        s = 0.0
        for t in sorted(set(query_terms)):
            qtf = query_terms.count(t)
            tf = ts.count(t)
            if tf == 0 or t not in ctf:
                continue
            p = ctf[t] / total
            s += qtf * math.log(1.0 + (((1.0 - lam) * tf) / dl) / (lam * p))
        out[i] = s
    return out


def test_cprobs_exact(spark):
    idx = _index(spark, TEXTS)
    got = query_term_cprobs(idx, "apple grape zzznotaword")
    _, total, ctf = _py_stats(TEXTS)
    assert got == [
        ("apple", 1, ctf["apple"] / total),
        ("grape", 1, ctf["grape"] / total),
    ]
    # cached corpus total survives on the handle
    assert idx.extras["_total_tokens"] == total


def test_lmd_matches_python(spark):
    idx = _index(spark, TEXTS)
    got = {r["doc_id"]: r["score"]
           for r in lmd_topk(idx, "apple banana", k=10).collect()}
    want = _py_lmd(TEXTS, ["apple", "banana"])
    mx = max(want.values())
    kept = {d: s for d, s in want.items() if s >= 0.01 * mx}
    assert set(got) == set(kept)
    for d, s in kept.items():
        assert got[d] == pytest.approx(s, abs=1e-9)


def test_lmd_clamp_zero(spark):
    """A long document matching only a very common term goes NEGATIVE
    pre-clamp (length norm dominates) — Lucene clamps its contribution
    to 0, so the doc scores exactly 0, never below."""
    common = " ".join(["noise"] * 50)
    texts = ["noise " + " ".join(f"pad{i:03d}" for i in range(400)), common,
             "signal here"]
    idx = _index(spark, texts)
    toks, total, ctf = _py_stats(texts)
    mu = 50.0
    # pre-clamp contribution for doc 0 is negative by construction
    p = ctf["noise"] / total
    pre = math.log(1.0 + 1 / (mu * p)) + math.log(mu / (len(toks[0]) + mu))
    assert pre < 0
    # the matched score is exactly 0.0 (clamped, never negative) ...
    from distributedcodesearchengine_spark.operators.scorer import (
        contribution_col_lmd,
        query_term_cprobs,
        score_matched,
    )

    raw = {r["doc_id"]: r["score"] for r in score_matched(
        idx, query_term_cprobs(idx, "noise"), contribution_col_lmd(mu)
    ).collect()}
    assert raw[0] == 0.0
    # ... so the healthy top-k (doc 1's score is the positive max)
    # excludes it via the 1%-of-max threshold instead of ranking it
    # with a negative score
    got = {r["doc_id"]: r["score"]
           for r in lmd_topk(idx, "noise", k=10, mu=mu).collect()}
    assert 0 not in got and got[1] > 0


def test_lmjm_matches_python(spark):
    idx = _index(spark, TEXTS)
    got = {r["doc_id"]: r["score"]
           for r in lmjm_topk(idx, "apple apple grape", k=10).collect()}
    want = _py_lmjm(TEXTS, ["apple", "apple", "grape"])
    mx = max(want.values())
    kept = {d: s for d, s in want.items() if s >= 0.01 * mx}
    assert set(got) == set(kept)
    for d, s in kept.items():
        assert got[d] == pytest.approx(s, abs=1e-9)


def test_lm_healthy_where_bm25_degenerate(spark):
    """Every doc contains 'every' -> BM25 idf is epsilon-floored and the
    ranking degenerate; the smoothed LM still separates docs by tf/dl —
    the regime difference the lmd gate key pins."""
    texts = [
        "every aa bb",
        "every " + " ".join(f"p{i:02d}" for i in range(10)),
        "every " + " ".join(f"q{i:02d}" for i in range(20)),
    ]
    idx = _index(spark, texts)
    lm = lmd_topk(idx, "every", k=3, mu=10.0).collect()
    # identical tf -> the Dirichlet length norm alone ranks: shortest
    # doc first, strictly decreasing positive scores; the longest doc
    # clamps to 0 and falls below the 1%-of-max threshold
    assert [r["doc_id"] for r in lm] == [0, 1]
    assert lm[0]["score"] > lm[1]["score"] > 0
    # under BM25 the same query is idf-floored: every doc matches with
    # the epsilon-floor weight, a different regime entirely (all three
    # docs present, scores within the floor's magnitude)
    bm = bm25_topk(idx, "every", k=3).collect()
    assert len(bm) == 3


def test_guards_and_degenerate(spark):
    idx = _index(spark, TEXTS)
    with pytest.raises(ValueError):
        lmd_topk(idx, "apple", mu=0.0)
    with pytest.raises(ValueError):
        lmjm_topk(idx, "apple", lam=1.0)
    assert lmd_topk(idx, "!! ??", k=5).count() == 0  # empty-tokenizing
    # unknown-vocab query -> zero backfill universe (the house chain)
    rows = lmjm_topk(idx, "zzznotaword", k=2).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert all(r["score"] == 0.0 for r in rows)


# --- sparse_vector (learned-sparse seam) -------------------------------------


def test_sparse_vector_matches_python(spark):
    from distributedcodesearchengine_spark.operators.scorer import (
        sparse_vector_topk,
    )

    idx = _index(spark, TEXTS)
    qv = {"apple": 2.0, "grape": 0.5}
    got = {r["doc_id"]: r["score"]
           for r in sparse_vector_topk(idx, qv, k=10).collect()}
    want = {}
    for i, t in enumerate(TEXTS):
        ts = t.split()
        s = 0.0
        for term in sorted(qv):
            tf = ts.count(term)
            if tf:
                s += 1.0 * (qv[term] * math.log(1.0 + tf))
        want[i] = s
    mx = max(want.values())
    kept = {d: s for d, s in want.items() if s >= 0.01 * mx}
    assert set(got) == set(kept)
    for d, s in kept.items():
        assert got[d] == pytest.approx(s, abs=1e-9)
    # no length normalization: doc 0 (tf(apple)=2) must outrank
    # doc 2 (tf=1) regardless of their lengths
    assert got[0] > got[2]


def test_sparse_vector_weight_moves_rank(spark):
    from distributedcodesearchengine_spark.operators.scorer import (
        sparse_vector_topk,
    )

    idx = _index(spark, TEXTS)
    # heavy grape weight -> doc 3 (grape x3) wins; heavy apple -> doc 0
    g = [r["doc_id"] for r in sparse_vector_topk(
        idx, {"apple": 0.2, "grape": 5.0}, k=1).collect()]
    a = [r["doc_id"] for r in sparse_vector_topk(
        idx, {"apple": 5.0, "grape": 0.2}, k=1).collect()]
    assert g == [3] and a == [0]


def test_sparse_vector_guards(spark):
    from distributedcodesearchengine_spark.operators.scorer import (
        sparse_vector_topk,
    )

    idx = _index(spark, TEXTS)
    with pytest.raises(ValueError):
        sparse_vector_topk(idx, {"apple": 0.0})
    assert sparse_vector_topk(idx, {}).count() == 0
    assert sparse_vector_topk(idx, {"!!": 1.0}).count() == 0
