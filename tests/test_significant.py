"""Semantics tests for significant-terms aggregation
(operators/significant.py) — Spark/DuckDB parity is covered by the
driver gate (significant_terms / significant_terms_degenerate); these
pin the branch behaviors and the JLH arithmetic on handcrafted corpora."""

import math

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.functions.rounding import round6_py
from distributedcodesearchengine_spark.operators.significant import (
    significant_terms,
)


def _index(spark, texts):
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
    return build_index_inmem(spark, pages, meta_cols=("source",))


def test_empty_query_and_unknown_term_guards(spark):
    idx = _index(spark, ["alpha beta", "gamma delta"])
    assert significant_terms(idx, "!! ??").count() == 0
    assert significant_terms(idx, "zzzznotaword").count() == 0


def test_degenerate_regime_is_empty(spark):
    # all-non-positive regime by construction: vocab = {common df=10,
    # filler df=9, alone df=1}, N=10 -> idf_raw = (-3.04, -1.85, +1.85),
    # avg = -1.01, so the epsilon floor (0.25 * avg) is NEGATIVE and
    # every 'common' score is < 0 -> max <= 0 -> the significant-terms
    # contract returns empty (foreground == corpus means nothing is
    # over-represented)
    texts = ["common alone"] + ["common filler"] * 9
    idx = _index(spark, texts)
    out = significant_terms(idx, "common")
    assert out.columns == ["term", "fg_count", "bg_count", "score"]
    assert out.count() == 0


def test_foreground_counts_and_jlh_scores(spark):
    # 'rare' appears in docs 0,1 only -> healthy regime, foreground =
    # {0, 1} (both match, same score, threshold keeps both). 'signal'
    # appears in both foreground docs and NOWHERE else; 'noise' is
    # corpus-wide background and must be filtered by fgp > bgp.
    # N=5 so df('rare')=2 < N/2 -> positive idf -> healthy regime
    texts = [
        "rare signal noise alpha",
        "rare signal noise beta",
        "noise gamma delta",
        "noise epsilon zeta",
        "noise eta theta",
    ]
    idx = _index(spark, texts)
    out = {r["term"]: r for r in significant_terms(idx, "rare", k=50, min_fg=1).collect()}

    # foreground is exactly the two 'rare' docs
    assert out["signal"]["fg_count"] == 2
    assert out["signal"]["bg_count"] == 2
    # JLH for signal: fgp = 2/2 = 1, bgp = 2/5 = 0.4 -> 0.6 * 2.5 = 1.5
    assert math.isclose(out["signal"]["score"], round6_py((1.0 - 0.4) * (1.0 / 0.4)))
    # 'noise' is in every doc: fgp = 1, bgp = 1 -> not over-represented
    assert "noise" not in out
    # terms absent from the foreground never appear
    assert "gamma" not in out and "epsilon" not in out


def test_min_fg_noise_floor(spark):
    # N=5 so df('rare')=2 has positive idf (healthy regime)
    texts = [
        "rare signal alpha",
        "rare signal beta",
        "filler gamma",
        "filler delta",
        "filler mu",
    ]
    idx = _index(spark, texts)
    # alpha/beta each have fg_count 1 -> dropped at min_fg=2; signal kept
    terms2 = {r["term"] for r in significant_terms(idx, "rare", k=50, min_fg=2).collect()}
    assert "signal" in terms2
    assert "alpha" not in terms2 and "beta" not in terms2
    terms1 = {r["term"] for r in significant_terms(idx, "rare", k=50, min_fg=1).collect()}
    assert {"alpha", "beta"} <= terms1


def test_topk_cut_and_tiebreak(spark):
    # two equally-significant terms tie on raw score -> term asc decides
    # N=5 so df('rare')=2 has positive idf (healthy regime)
    texts = [
        "rare aaa bbb",
        "rare aaa bbb",
        "filler one",
        "filler two",
        "filler three",
    ]
    idx = _index(spark, texts)
    rows = significant_terms(idx, "rare", k=2, min_fg=1).collect()
    # 'rare', 'aaa', 'bbb' all have fgp=1, bgp=0.4 -> same score; the
    # k=2 cut keeps the two lexicographically-smallest
    assert [r["term"] for r in rows] == ["aaa", "bbb"]
