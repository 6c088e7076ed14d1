"""Semantics tests for the result-set exploration surfaces
(operators/explore.py) — Spark/DuckDB parity is covered by the driver
gate; these pin branch behaviors on handcrafted corpora (empty query,
degenerate threshold, seed exclusion in both MLT branches)."""

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.explore import (
    bm25_facets,
    more_like_this,
    seed_keywords,
)


def _index(spark, rows):
    pages = spark.createDataFrame(
        [
            (
                f"https://{site}.example/{i:04d}",
                f"<html><body><p>{text}</p></body></html>".encode(),
                text,
                lang,
                src,
            )
            for i, (text, lang, src, site) in enumerate(rows)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages, meta_cols=("source",))


def test_facets_empty_query_guard(spark):
    idx = _index(spark, [("alpha beta", "en", "s1", "a")])
    assert bm25_facets(idx, "!! ??").count() == 0


def test_facets_healthy_counts_thresholded_set_only(spark):
    # 'rare' hits docs 0,1 (en/s1, de/s2); doc 2 never matches and must
    # NOT appear in a healthy-regime facet count
    idx = _index(
        spark,
        [
            ("rare words here indeed", "en", "s1", "a"),
            ("rare other tokens again", "de", "s2", "b"),
            ("совсем unrelated stuff here", "en", "s3", "c"),
        ],
    )
    out = {(r.lang, r.source): r.n_docs for r in bm25_facets(idx, "rare").collect()}
    assert out == {("en", "s1"): 1, ("de", "s2"): 1}


def test_facets_degenerate_counts_whole_corpus(spark):
    # unknown token -> all-zero regime -> every doc is in the result
    # set at score 0, so facets describe the whole corpus
    idx = _index(
        spark,
        [
            ("alpha beta gamma delta", "en", "s1", "a"),
            ("epsilon zeta eta theta", "en", "s1", "a"),
            ("iota kappa lambda mu", "de", "s2", "b"),
        ],
    )
    rows = bm25_facets(idx, "zzzzunknown").collect()
    out = {(r.lang, r.source): (r.n_docs, r.max_score) for r in rows}
    assert out == {("en", "s1"): (2, 0.0), ("de", "s2"): (1, 0.0)}


def test_seed_keywords_rank_by_tfidf(spark):
    # 'special' appears twice in doc 0 and nowhere else -> top keyword;
    # 'shared' is in every doc -> tfidf 0 (ln(N/df)=ln(1)) -> last
    idx = _index(
        spark,
        [
            ("special special unique shared", "en", "s1", "a"),
            ("other words shared", "en", "s1", "a"),
            ("more words shared", "en", "s1", "a"),
        ],
    )
    kw = seed_keywords(idx, 0, m=3)
    assert kw[0][0] == "special"
    assert [t for t, _ in kw][-1] == "shared"


def test_more_like_this_excludes_seed_both_branches(spark):
    idx = _index(
        spark,
        [
            ("apple banana cherry damson", "en", "s1", "a"),
            ("apple banana cherry elder", "en", "s1", "a"),
            ("fig grape hazel walnut", "en", "s1", "a"),
        ],
    )
    res = more_like_this(idx, 0, m=3, k=10).collect()
    ids = [r.doc_id for r in res]
    assert 0 not in ids  # seed excluded
    assert ids[0] == 1  # the near-twin ranks first
    # degenerate regime: tiny corpus can floor every idf non-positive ->
    # all-score<=0 branch; the zero backfill must also exclude the seed
    idx2 = _index(spark, [("same same", "en", "s1", "a"), ("same also", "en", "s1", "a")])
    res2 = more_like_this(idx2, 0, m=2, k=10).collect()
    assert 0 not in [r.doc_id for r in res2]


def test_collapse_diversifies(spark):
    """At most per_group results per collapse value; survivors are each
    group's best; global order preserved among survivors."""
    from collections import Counter

    from distributedcodesearchengine_spark.operators.explore import (
        bm25_collapse_topk,
    )
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    from distributedcodesearchengine_spark.build.indexer import build_index_inmem
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    bm_index = build_index_inmem(spark, generate_pages(spark, 120, seed=3, parts=2))
    q = "parse json"
    col = [r for r in bm25_collapse_topk(bm_index, q, collapse="site", per_group=1, k=10).collect()]
    assert col
    sites = [r["site"] for r in col]
    assert max(Counter(sites).values()) == 1
    # survivors = first-per-site prefix of the full ranking
    full = bm25_topk(bm_index, q, k=500).collect()
    meta = {r["doc_id"]: r["site"] for r in bm_index.docs.select("doc_id", "site").collect()}
    seen, exp = set(), []
    for r in full:
        s = meta[r["doc_id"]]
        if s in seen:
            continue
        seen.add(s)
        exp.append(r["doc_id"])
        if len(exp) == 10:
            break
    assert [r["doc_id"] for r in col] == exp
    # per_group=2 keeps at most two per site and is a superset ordering
    col2 = bm25_collapse_topk(bm_index, q, collapse="site", per_group=2, k=10).collect()
    assert max(Counter(r["site"] for r in col2).values()) <= 2


def test_collapse_degenerate_regime(spark):
    """max score <= 0 (every idf epsilon-floored negative): the whole
    corpus backfills at score 0 and the collapse column still resolves
    — regression for the UNRESOLVED_COLUMN crash on the slim
    score_matched output (ADVICE r3 #1)."""
    from distributedcodesearchengine_spark.operators.explore import (
        bm25_collapse_topk,
    )

    # every term appears in both docs -> every idf_raw < 0 -> eps < 0
    # -> all scores negative -> degenerate branch with scored not None
    idx = _index(
        spark,
        [("same also", "en", "s1", "a"), ("also same", "en", "s2", "b")],
    )
    rows = bm25_collapse_topk(
        idx, "same", collapse="source", per_group=1, k=10
    ).collect()
    # matched docs keep their (negative) scores, exactly like the
    # bm25_topk kept set and the DuckDB mirror's coalesce(s.score, 0.0)
    assert {(r.doc_id, r.source) for r in rows} == {(0, "s1"), (1, "s2")}
    assert all(r.score <= 0.0 for r in rows)
    # scored-is-None flavor (unknown token) hits the same branch
    rows2 = bm25_collapse_topk(
        idx, "zzzunknown", collapse="source", per_group=1, k=10
    ).collect()
    assert len(rows2) == 2 and all(r.score == 0.0 for r in rows2)


def test_collapse_filters_apply_at_f5(spark):
    """Equality filters thread through collapse in both regimes and do
    not change the threshold (it stays on the unfiltered max)."""
    from distributedcodesearchengine_spark.operators.explore import (
        bm25_collapse_topk,
    )

    idx = _index(
        spark,
        [
            ("rare words here indeed", "en", "s1", "a"),
            ("rare other tokens again", "de", "s2", "b"),
            ("plain unrelated stuff here", "en", "s3", "c"),
        ],
    )
    rows = bm25_collapse_topk(
        idx, "rare", collapse="source", per_group=1, k=10,
        filters={"lang": "de"},
    ).collect()
    assert [(r.doc_id, r.source) for r in rows] == [(1, "s2")]
    # degenerate regime: filter narrows the zero-backfill universe
    rows2 = bm25_collapse_topk(
        idx, "zzzunknown", collapse="source", per_group=1, k=10,
        filters={"lang": "en"},
    ).collect()
    assert {r.doc_id for r in rows2} == {0, 2}


def test_count_filter_eliminates_all_kept_rows(spark):
    """Healthy-regime count with a filter matching nothing returns
    (0, 0.0) like the oracle's coalesce(max(score), 0.0) — regression
    for round6_py(None) TypeError (ADVICE r3 #2)."""
    from distributedcodesearchengine_spark.operators.scorer import bm25_count

    idx = _index(
        spark,
        [
            ("rare words here indeed", "en", "s1", "a"),
            ("rare other tokens again", "de", "s2", "b"),
            ("plain unrelated stuff here", "en", "s3", "c"),
        ],
    )
    row = bm25_count(idx, "rare", {"lang": "zz"}).first()
    assert (row["n_hits"], row["max_score"]) == (0, 0.0)


# --- histogram aggregation --------------------------------------------------


def test_histogram_healthy_buckets_thresholded_set_only(spark):
    from distributedcodesearchengine_spark.operators.explore import (
        bm25_histogram,
    )

    # 'rare' hits docs 0,1 (doc_len 4 and 8 -> buckets 0 and 5 at
    # interval 5); doc 2 never matches and must not appear
    idx = _index(
        spark,
        [
            ("rare words here indeed", "en", "s1", "a"),
            ("rare other tokens again and padding to eight", "de", "s2", "b"),
            ("plain unrelated stuff here", "en", "s3", "c"),
        ],
    )
    out = {r["bucket"]: r["n_docs"] for r in bm25_histogram(idx, "rare", interval=5).collect()}
    assert out == {0: 1, 5: 1}


def test_histogram_degenerate_covers_corpus(spark):
    from distributedcodesearchengine_spark.operators.explore import (
        bm25_histogram,
    )

    idx = _index(
        spark,
        [("alpha beta", "en", "s1", "a"), ("gamma delta", "en", "s1", "b")],
    )
    out = bm25_histogram(idx, "zzzznotaword", interval=10).collect()
    # unknown term -> all-zero backfill: every doc lands in a bucket
    assert sum(r["n_docs"] for r in out) == 2
    assert all(r["max_score"] == 0.0 for r in out)


def test_histogram_empty_query_guard(spark):
    from distributedcodesearchengine_spark.operators.explore import (
        bm25_histogram,
    )

    idx = _index(spark, [("alpha beta", "en", "s1", "a")])
    assert bm25_histogram(idx, "!! ??").count() == 0


def test_stats_agg_healthy_and_degenerate(spark):
    from distributedcodesearchengine_spark.operators.explore import (
        bm25_stats_agg,
    )

    idx = _index(
        spark,
        [
            ("rare words here indeed", "en", "s1", "a"),            # len 4
            ("rare other tokens again and padding line", "de", "s2", "b"),
            ("plain unrelated stuff here", "en", "s3", "c"),
        ],
    )
    row = bm25_stats_agg(idx, "rare").first()
    # healthy: only the two 'rare' docs
    assert row["n_docs"] == 2 and row["min_v"] == 4 and row["max_v"] == 7
    assert row["sum_v"] == 11 and abs(row["avg_v"] - 5.5) < 1e-9
    # degenerate (unknown term): whole corpus
    row = bm25_stats_agg(idx, "zzzznotaword").first()
    assert row["n_docs"] == 3
    # empty query guard
    assert bm25_stats_agg(idx, "!! ??").count() == 0


# --- more_like_this unlike ---------------------------------------------------


def test_mlt_unlike_subtracts_negative_terms(spark):
    from distributedcodesearchengine_spark.operators.explore import (
        more_like_this,
        more_like_this_unlike,
        seed_keywords,
    )
    from tests.test_search_after import _index

    texts = [
        "special signal words boiler plate footer",   # 0: seed
        "boiler plate footer unrelated filler",       # 1: unlike (shares boilerplate)
        "special signal words elsewhere today",       # 2: matches the distinctive part
        "boiler plate footer again here",             # 3: matches only boilerplate
        "nothing in common at all",                   # 4
    ]
    idx = _index(spark, texts)
    kw = {t for t, _ in seed_keywords(idx, 0, m=6)}
    assert "boiler" in kw  # the boilerplate IS a seed keyword pre-subtraction
    plain = {r["doc_id"] for r in more_like_this(idx, 0, m=6, k=10).collect()
             if r["score"] > 0}
    unlike = {r["doc_id"]
              for r in more_like_this_unlike(idx, 0, 1, m=6, k=10).collect()
              if r["score"] > 0}
    # plain MLT surfaces the boilerplate-only doc 3; unlike removes it
    assert 3 in plain
    assert 3 not in unlike
    assert 2 in unlike  # the distinctive doc survives
    assert 1 not in unlike  # the negative example itself is excluded


def test_mlt_unlike_disjoint_reduces_to_plain(spark):
    from distributedcodesearchengine_spark.operators.explore import (
        more_like_this,
        more_like_this_unlike,
    )
    from tests.test_search_after import _index

    texts = [
        "alpha beta gamma delta",
        "totally disjoint negative words",
        "alpha beta elsewhere",
        "gamma delta elsewhere",
    ]
    idx = _index(spark, texts)
    a = [(r["doc_id"], r["score"])
         for r in more_like_this(idx, 0, m=4, k=10).collect() if r["doc_id"] != 1]
    b = [(r["doc_id"], r["score"])
         for r in more_like_this_unlike(idx, 0, 1, m=4, k=10).collect()]
    assert [x[0] for x in a] == [x[0] for x in b]


def test_mlt_unlike_guard_and_exhausted(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.explore import (
        more_like_this_unlike,
    )
    from tests.test_search_after import _index

    idx = _index(spark, ["same words here", "same words here too"])
    with pytest.raises(ValueError):
        more_like_this_unlike(idx, 1, 1)
    # every seed keyword shared with the negative -> empty
    assert more_like_this_unlike(idx, 0, 1, m=3).count() == 0
