"""DFR / information-based similarity tests (operators/scorer
dfr_topk / ib_topk — Terrier InL2 (Amati & van Rijsbergen TOIS 2002)
and Lucene IBSimilarity LL-DF-H2 (Clinchant & Gaussier SIGIR 2010)).

Contract: scores replicate pure-Python implementations of the
published formulas over the SAME tokenizer output and exact integer
corpus stats (df, N, avgdl); log2 is spelled ln/LN2 with the shared
literal (the evalrank convention); the house chain (1%-of-max
threshold, degenerate backfill, doc_id tie-break) is shared with the
Okapi scorer.
"""

import math

import pytest

from distributedcodesearchengine_spark.operators.scorer import (
    LN2,
    dfr_topk,
    ib_topk,
    query_term_dfs,
)
from tests.test_search_after import _index

TEXTS = [
    "apple banana apple cherry",        # doc 0: tf(apple)=2, dl=4
    "banana cherry durian fig grape",   # doc 1: dl=5
    "apple fig",                        # doc 2: dl=2
    "grape grape grape durian",         # doc 3: dl=4
]


def _py_corpus(texts):
    toks = [t.split() for t in texts]
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks) / n
    df = {}
    for ts in toks:
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    return toks, n, avgdl, df


def _tfn(tf, dl, avgdl):
    return tf * (math.log(1.0 + avgdl / dl) / LN2)


def _py_inl2(texts, query_terms):
    toks, n, avgdl, df = _py_corpus(texts)
    out = {}
    for i, ts in enumerate(toks):
        s = 0.0
        for t in sorted(set(query_terms)):
            tf = ts.count(t)
            if tf == 0 or t not in df:
                continue
            tfn = _tfn(tf, len(ts), avgdl)
            info = math.log((n + 1) / (df[t] + 0.5)) / LN2
            s += query_terms.count(t) * ((tfn / (tfn + 1.0)) * info)
        out[i] = s
    return out


def _py_ib_ll(texts, query_terms):
    toks, n, avgdl, df = _py_corpus(texts)
    out = {}
    for i, ts in enumerate(toks):
        s = 0.0
        for t in sorted(set(query_terms)):
            tf = ts.count(t)
            if tf == 0 or t not in df:
                continue
            tfn = _tfn(tf, len(ts), avgdl)
            lam = (df[t] + 1.0) / float(n + 1)
            s += query_terms.count(t) * math.log(1.0 + tfn / lam)
        out[i] = s
    return out


def test_query_term_dfs_exact(spark):
    idx = _index(spark, TEXTS)
    got = query_term_dfs(idx, "apple grape zzznotaword")
    _, _, _, df = _py_corpus(TEXTS)
    assert got == [("apple", 1, float(df["apple"])), ("grape", 1, float(df["grape"]))]


def test_inl2_matches_python(spark):
    idx = _index(spark, TEXTS)
    got = {r["doc_id"]: r["score"]
           for r in dfr_topk(idx, "apple banana", k=10).collect()}
    want = _py_inl2(TEXTS, ["apple", "banana"])
    mx = max(want.values())
    kept = {d: s for d, s in want.items() if s >= 0.01 * mx}
    assert set(got) == set(kept)
    for d, s in kept.items():
        assert got[d] == pytest.approx(s, abs=1e-9)


def test_ib_matches_python(spark):
    idx = _index(spark, TEXTS)
    got = {r["doc_id"]: r["score"]
           for r in ib_topk(idx, "apple apple grape", k=10).collect()}
    want = _py_ib_ll(TEXTS, ["apple", "apple", "grape"])
    mx = max(want.values())
    kept = {d: s for d, s in want.items() if s >= 0.01 * mx}
    assert set(got) == set(kept)
    for d, s in kept.items():
        assert got[d] == pytest.approx(s, abs=1e-9)


def test_always_positive_no_degenerate_regime(spark):
    """A term in EVERY document (df == N) still carries positive
    information content — log2((N+1)/(N+0.5)) > 0 — so unlike BM25's
    epsilon-floored idf an all-common-term query is healthy: matched
    docs rank with positive scores, nothing backfills at 0."""
    texts = ["common alpha", "common beta", "common gamma common"]
    idx = _index(spark, texts)
    for fn in (dfr_topk, ib_topk):
        got = {r["doc_id"]: r["score"] for r in fn(idx, "common", k=10).collect()}
        assert all(s > 0 for s in got.values())
        # doc 2 (tf=2, dl=3 shortest per-occurrence mass) wins
        assert max(got, key=got.get) == 2


def test_rare_term_beats_common_term(spark):
    """Both models rank the doc matching the rarer term first when tf
    and dl are equal — the information-content ordering BM25's idf
    also produces."""
    texts = ["rare filler", "common filler", "common extra", "common other"]
    idx = _index(spark, texts)
    for fn in (dfr_topk, ib_topk):
        got = fn(idx, "rare common", k=10).collect()
        assert got[0]["doc_id"] == 0


def test_empty_and_oov_queries(spark):
    idx = _index(spark, TEXTS)
    for fn in (dfr_topk, ib_topk):
        assert fn(idx, "!! ??", k=5).count() == 0
        # OOV-only query: no matched docs -> all-zero backfill regime
        rows = fn(idx, "zzznotaword", k=5).collect()
        assert all(r["score"] == 0.0 for r in rows)


# --- classic + boolean similarities ------------------------------------------


def test_classic_matches_python(spark):
    from distributedcodesearchengine_spark.operators.scorer import (
        classic_topk,
        query_term_weights,
    )

    idx = _index(spark, TEXTS)
    idf = {t: i for t, _, i in query_term_weights(idx, "apple banana")}
    got = {r["doc_id"]: r["score"]
           for r in classic_topk(idx, "apple banana", k=10).collect()}
    toks = [t.split() for t in TEXTS]
    want = {}
    for i, ts in enumerate(toks):
        s = 0.0
        for t in sorted(("apple", "banana")):
            tf = ts.count(t)
            if tf and t in idf:
                s += 1.0 * ((idf[t] * idf[t]) * math.sqrt(tf) / math.sqrt(len(ts)))
        want[i] = s
    mx = max(want.values())
    kept = {d: s for d, s in want.items() if s >= 0.01 * mx}
    assert set(got) == set(kept)
    for d, s in kept.items():
        assert got[d] == pytest.approx(s, abs=1e-9)


def test_boolean_sim_ranks_by_matched_mass(spark):
    from distributedcodesearchengine_spark.operators.scorer import (
        boolean_sim_topk,
    )

    idx = _index(spark, TEXTS)
    got = {r["doc_id"]: r["score"]
           for r in boolean_sim_topk(idx, "apple apple banana", k=10).collect()}
    # doc 0 matches both terms: qtf 2 (apple) + 1 (banana) = 3;
    # doc 1 banana only = 1; doc 2 apple only = 2; tf is IRRELEVANT
    assert got[0] == 3.0 and got[2] == 2.0
    assert got[1] == 1.0  # clears the 1%-of-max threshold (1 >= 0.03)
