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
