"""Semantics tests for decay function scoring (operators/decay.py):
multiplier anchor points (1.0 at origin, 0.5 at |d|=1 for both decay
shapes), rank movement toward the origin, degenerate-regime behavior,
and the guards."""

import pytest

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.decay import bm25_decay_topk


def _index(spark, rows):
    pages = spark.createDataFrame(
        [
            (
                f"https://x.example/{i:04d}",
                f"<html><body><p>{text}</p></body></html>".encode(),
                text,
                "en",
                "s1",
            )
            for i, text in enumerate(rows)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages, meta_cols=("source",))


def test_decay_anchor_points(spark):
    # doc_lens 4 (origin), 8 (|d|=1), 12 (|d|=2): every doc matches
    # 'word' -> healthy regime keeps all
    idx = _index(
        spark,
        [
            "word aa bb cc",
            "word aa bb cc dd ee ff gg",
            "word aa bb cc dd ee ff gg hh ii jj kk",
        ],
    )
    for decay in ("gauss", "linear"):
        rows = {
            r.doc_id: r.mult
            for r in bm25_decay_topk(
                idx, "word", col="doc_len", origin=4, scale=4, decay=decay
            ).collect()
        }
        assert rows[0] == 1.0  # at the origin
        assert rows[1] == 0.5  # both shapes hit 0.5 at |d| = 1
        if decay == "linear":
            assert rows[2] == 0.0  # linear reaches zero at |d| = 2
        else:
            assert 0.0 < rows[2] < 0.1  # gauss: 0.5^4 = 0.0625


def test_decay_reranks_toward_origin(spark):
    # doc 0 scores higher on plain BM25 (tf=2, similar length) but is
    # far from the origin; doc 1 (tf=1) sits at the origin and must win
    # under a sharp decay. Filler docs keep df('word') < N/2 so idf is
    # positive (the healthy regime, scores > 0 — a decay multiplier on
    # a NEGATIVE score would raise it instead).
    idx = _index(
        spark,
        [
            "word word aa bb cc dd ee ff gg hh ii jj",  # doc_len 12
            "word aa bb",                               # doc_len 3
            "xx yy zz qq",
            "rr ss tt uu",
            "vv ww xy yz",
        ],
    )
    plain = bm25_decay_topk(
        idx, "word", origin=12, scale=1000, decay="gauss"
    ).collect()
    best_plain = [r.doc_id for r in plain if r.score > 0][0]
    # near-flat decay: BM25 length normalization favors the short doc
    assert best_plain == 1
    decayed = bm25_decay_topk(
        idx, "word", origin=12, scale=2, decay="gauss"
    ).first()
    assert decayed.doc_id == 0  # sharp decay at origin 12 flips the rank


def test_decay_degenerate_zero_regime(spark):
    idx = _index(spark, ["alpha beta", "gamma delta"])
    rows = bm25_decay_topk(idx, "zzzunknown", origin=2, scale=2).collect()
    assert [(r.doc_id, r.score) for r in rows] == [(0, 0.0), (1, 0.0)]


def test_decay_guards(spark):
    idx = _index(spark, ["alpha beta"])
    assert bm25_decay_topk(idx, "!! ??").count() == 0
    with pytest.raises(ValueError):
        bm25_decay_topk(idx, "alpha", decay="exp2")
    with pytest.raises(ValueError):
        bm25_decay_topk(idx, "alpha", scale=0)
    with pytest.raises(ValueError):
        bm25_decay_topk(idx, "alpha", col="doc_len; drop")


# --- field_value_factor --------------------------------------------------------


def test_fvf_multiplier_and_final(spark):
    import math

    from distributedcodesearchengine_spark.operators.decay import bm25_fvf_topk

    idx = _index(
        spark,
        [
            "word aa bb cc",                          # doc_len 4
            "word aa bb cc dd ee ff gg",              # doc_len 8
        ],
    )
    rows = {
        r.doc_id: r
        for r in bm25_fvf_topk(
            idx, "word", col="doc_len", factor=2.0, modifier="log1p"
        ).collect()
    }
    assert rows[0].mult == pytest.approx(2.0 * math.log(5.0), abs=1e-6)
    assert rows[1].mult == pytest.approx(2.0 * math.log(9.0), abs=1e-6)
    # sqrt and none modifiers
    rows = {
        r.doc_id: r.mult
        for r in bm25_fvf_topk(
            idx, "word", col="doc_len", factor=1.0, modifier="sqrt"
        ).collect()
    }
    assert rows[0] == pytest.approx(2.0, abs=1e-9)
    rows = {
        r.doc_id: r.mult
        for r in bm25_fvf_topk(
            idx, "word", col="doc_len", factor=0.5, modifier="none"
        ).collect()
    }
    assert rows[0] == pytest.approx(2.0, abs=1e-9)


def test_fvf_favors_long_docs_and_guards(spark):
    # plain BM25's length norm favors the SHORT doc; a LINEAR field
    # boost (modifier none) outgrows the norm's asymptotically-linear
    # penalty and flips the order toward the long one (log1p cannot —
    # ln grows slower than the norm, which is exactly why ES recommends
    # it for popularity counters: it boosts without overturning rank)
    from distributedcodesearchengine_spark.operators.decay import bm25_fvf_topk
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    idx = _index(
        spark,
        [
            "word aa bb cc",
            "word aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss",
            # filler docs keep df('word') < N/2 so idf stays positive
            "filler one two three",
            "filler four five six",
            "filler seven eight nine",
        ],
    )
    plain = [r.doc_id for r in bm25_topk(idx, "word", k=2).collect()]
    assert plain[0] == 0
    boosted = [
        r.doc_id
        for r in bm25_fvf_topk(
            idx, "word", col="doc_len", factor=1.0, modifier="none"
        ).collect()
    ]
    assert boosted[0] == 1
    with pytest.raises(ValueError):
        bm25_fvf_topk(idx, "word", modifier="log2")
    with pytest.raises(ValueError):
        bm25_fvf_topk(idx, "word", factor=0.0)
    assert bm25_fvf_topk(idx, "; -").count() == 0


# --- random_score ---------------------------------------------------------------


def test_random_score_deterministic_and_seed_sensitive(spark):
    from distributedcodesearchengine_spark.operators.decay import (
        bm25_random_topk,
    )

    idx = _index(
        spark,
        [f"word filler{i:02d} other{i:02d}" for i in range(8)],
    )
    a1 = [(r.doc_id, r.mult) for r in bm25_random_topk(idx, "word", seed="s1").collect()]
    a2 = [(r.doc_id, r.mult) for r in bm25_random_topk(idx, "word", seed="s1").collect()]
    assert a1 == a2  # same seed -> identical ranking forever
    assert all(0.0 <= m < 1.0 for _d, m in a1)
    b = {d: m for d, m in
         ((r.doc_id, r.mult) for r in bm25_random_topk(idx, "word", seed="s2").collect())}
    assert any(b[d] != m for d, m in a1 if d in b)  # new seed -> new draw
    with pytest.raises(ValueError):
        bm25_random_topk(idx, "word", seed="s1'; drop")
    assert bm25_random_topk(idx, "; -").count() == 0


# --- rank_feature query ------------------------------------------------------


def test_rank_feature_saturation_matches_python(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.decay import (
        bm25_rank_feature_topk,
    )
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk
    from tests.test_search_after import _index

    texts = [
        "apple banana apple cherry",
        "banana cherry durian fig grape",
        "apple fig",
        "grape grape grape durian",
    ]
    idx = _index(spark, texts)
    base = {r["doc_id"]: r["score"]
            for r in bm25_topk(idx, "apple banana", k=10).collect()}
    dl = {i: len(t.split()) for i, t in enumerate(texts)}
    got = {r["doc_id"]: r for r in bm25_rank_feature_topk(
        idx, "apple banana", col="doc_len", function="saturation",
        pivot=3.0, boost=2.0, k=10).collect()}
    assert set(got) == set(base)
    for d, r in got.items():
        s = dl[d] / (dl[d] + 3.0)
        assert r["feat"] == pytest.approx(s, abs=1e-6)
        assert r["score"] == pytest.approx(base[d] + 2.0 * s, abs=1e-6)


def test_rank_feature_sigmoid_and_log(spark):
    import math

    import pytest

    from distributedcodesearchengine_spark.operators.decay import (
        bm25_rank_feature_topk,
    )
    from tests.test_search_after import _index

    texts = ["apple one two", "apple " + " ".join(f"w{i}" for i in range(9))]
    idx = _index(spark, texts)
    dl = {0: 3, 1: 10}
    sig = {r["doc_id"]: r["feat"] for r in bm25_rank_feature_topk(
        idx, "apple", function="sigmoid", pivot=5.0, exponent=2.0,
        k=10).collect()}
    for d, n in dl.items():
        xe = math.exp(2.0 * math.log(n))
        pe = math.exp(2.0 * math.log(5.0))
        assert sig[d] == pytest.approx(xe / (xe + pe), abs=1e-6)
    lg = {r["doc_id"]: r["feat"] for r in bm25_rank_feature_topk(
        idx, "apple", function="log", k=10).collect()}
    for d, n in dl.items():
        assert lg[d] == pytest.approx(math.log(1.0 + n), abs=1e-6)


def test_rank_feature_degenerate_ranks_by_feature(spark):
    from distributedcodesearchengine_spark.operators.decay import (
        bm25_rank_feature_topk,
    )
    from tests.test_search_after import _index

    texts = ["aa bb cc", "aa bb cc dd ee ff", "aa bb"]
    idx = _index(spark, texts)
    rows = bm25_rank_feature_topk(
        idx, "zzznotaword", function="saturation", pivot=4.0, k=10
    ).collect()
    assert all(r["base"] == 0.0 for r in rows)
    # saturation is increasing in doc_len -> longest doc first
    assert [r["doc_id"] for r in rows] == [1, 0, 2]


def test_rank_feature_guards(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.decay import (
        bm25_rank_feature_topk,
    )
    from tests.test_search_after import _index

    idx = _index(spark, ["a b"])
    with pytest.raises(ValueError):
        bm25_rank_feature_topk(idx, "a", function="nope")
    with pytest.raises(ValueError):
        bm25_rank_feature_topk(idx, "a", pivot=0.0)
    with pytest.raises(ValueError):
        bm25_rank_feature_topk(idx, "a", boost=-1.0)
    assert bm25_rank_feature_topk(idx, "!! ??").count() == 0
