"""Semantics tests for the ES aggregation extensions (operators/aggs.py)
— Spark/DuckDB parity is covered by the driver gate; these pin branch
behaviors on handcrafted corpora: always-present filters buckets,
[lo, hi) range boundaries, per-bucket independent top_hits rankings,
the rare_terms max_df floor, and the shared guards (empty query,
unsafe names)."""

import pytest

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.aggs import (
    bm25_filters_agg,
    bm25_range_agg,
    bm25_rare_terms,
    bm25_top_hits,
)


def _index(spark, rows):
    pages = spark.createDataFrame(
        [
            (
                f"https://x.example/{i:04d}",
                f"<html><body><p>{text}</p></body></html>".encode(),
                text,
                lang,
                src,
            )
            for i, (text, lang, src) in enumerate(rows)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages, meta_cols=("source",))


# --- filters aggregation ----------------------------------------------------


def test_filters_agg_counts_and_empty_bucket(spark):
    # 'rare' matches docs 0 (en/s1) and 1 (de/s2); doc 2 never matches.
    # The 'fr' bucket matches nothing kept -> still present at 0 / 0.0
    idx = _index(
        spark,
        [
            ("rare words here indeed", "en", "s1"),
            ("rare other tokens again", "de", "s2"),
            ("unrelated filler stuff here", "fr", "s3"),
        ],
    )
    rows = {
        r.bucket: (r.n_docs, r.max_score)
        for r in bm25_filters_agg(
            idx,
            "rare",
            {"en": ("lang", "en"), "de": ("lang", "de"), "fr": ("lang", "fr")},
        ).collect()
    }
    assert set(rows) == {"en", "de", "fr"}
    assert rows["en"][0] == 1 and rows["de"][0] == 1
    assert rows["fr"] == (0, 0.0)
    assert rows["en"][1] > 0 and rows["de"][1] > 0


def test_filters_agg_degenerate_counts_corpus(spark):
    idx = _index(
        spark,
        [
            ("alpha beta gamma", "en", "s1"),
            ("delta epsilon zeta", "en", "s1"),
            ("eta theta iota", "de", "s2"),
        ],
    )
    rows = {
        r.bucket: (r.n_docs, r.max_score)
        for r in bm25_filters_agg(
            idx, "zzzunknown", {"en": ("lang", "en"), "de": ("lang", "de")}
        ).collect()
    }
    assert rows == {"en": (2, 0.0), "de": (1, 0.0)}


def test_filters_agg_guards(spark):
    idx = _index(spark, [("alpha beta", "en", "s1")])
    assert bm25_filters_agg(idx, "!! ??", {"en": ("lang", "en")}).count() == 0
    with pytest.raises(ValueError):
        bm25_filters_agg(idx, "alpha", {})
    with pytest.raises(ValueError):
        bm25_filters_agg(idx, "alpha", {"bad name": ("lang", "en")})
    with pytest.raises(ValueError):
        bm25_filters_agg(idx, "alpha", {"ok": ("lang; drop", "en")})


# --- range aggregation ------------------------------------------------------


def test_range_agg_boundaries_lo_inclusive_hi_exclusive(spark):
    # doc_lens: 2, 4, 6 tokens; all match 'word' -> degenerate? no:
    # every doc contains 'word' so scores are equal and positive ->
    # healthy regime keeps all three
    idx = _index(
        spark,
        [
            ("word tok", "en", "s1"),
            ("word tok tok tok", "en", "s1"),
            ("word tok tok tok tok tok", "en", "s1"),
        ],
    )
    rows = bm25_range_agg(idx, "word", col="doc_len", cuts=(4, 6)).collect()
    by_idx = {r.range_idx: (r.lo, r.hi, r.n_docs) for r in rows}
    # (-inf,4) -> doc_len 2; [4,6) -> doc_len 4; [6,inf) -> doc_len 6
    assert by_idx == {0: (None, 4, 1), 1: (4, 6, 1), 2: (6, None, 1)}


def test_range_agg_empty_range_present_at_zero(spark):
    idx = _index(spark, [("word tok", "en", "s1")])
    rows = bm25_range_agg(idx, "word", col="doc_len", cuts=(100, 200)).collect()
    by_idx = {r.range_idx: (r.n_docs, r.max_score) for r in rows}
    assert by_idx[1] == (0, 0.0) and by_idx[2] == (0, 0.0)
    assert by_idx[0][0] == 1


def test_range_agg_guards(spark):
    idx = _index(spark, [("alpha", "en", "s1")])
    assert bm25_range_agg(idx, "!! ??", cuts=(10,)).count() == 0
    with pytest.raises(ValueError):
        bm25_range_agg(idx, "alpha", cuts=())
    with pytest.raises(ValueError):
        bm25_range_agg(idx, "alpha", cuts=(5, 5))
    with pytest.raises(ValueError):
        bm25_range_agg(idx, "alpha", cuts=(10, 5))


# --- terms + top_hits aggregation -------------------------------------------


def test_top_hits_independent_per_bucket_rankings(spark):
    # 'rare' matches docs 0,1 (en) and 2 (de): each lang bucket gets its
    # own ranking starting at rank 1 — unlike collapse, which would keep
    # only the global best per group inside one top-k
    idx = _index(
        spark,
        [
            ("rare rare words here", "en", "s1"),
            ("rare other tokens again", "en", "s1"),
            ("rare thing entirely new", "de", "s2"),
        ],
    )
    rows = bm25_top_hits(idx, "rare", key="lang", per_bucket=2).collect()
    langs = {}
    for r in rows:
        langs.setdefault(r.lang, []).append((r.rank, r.doc_id))
    assert [rk for rk, _ in langs["en"]] == [1, 2]
    assert [rk for rk, _ in langs["de"]] == [1]
    # doc 0 has tf=2 for 'rare' -> best in the en bucket
    assert langs["en"][0][1] == 0


def test_top_hits_per_bucket_cut(spark):
    idx = _index(
        spark,
        [(f"rare filler{i} words", "en", "s1") for i in range(5)],
    )
    rows = bm25_top_hits(idx, "rare", key="lang", per_bucket=3).collect()
    assert len(rows) == 3
    assert [r.rank for r in rows] == [1, 2, 3]


def test_top_hits_degenerate_covers_corpus(spark):
    idx = _index(
        spark,
        [
            ("alpha beta", "en", "s1"),
            ("gamma delta", "de", "s2"),
        ],
    )
    rows = bm25_top_hits(idx, "zzzunknown", key="lang", per_bucket=5).collect()
    assert {(r.lang, r.doc_id, r.score) for r in rows} == {
        ("en", 0, 0.0),
        ("de", 1, 0.0),
    }


def test_top_hits_empty_query_guard(spark):
    idx = _index(spark, [("alpha", "en", "s1")])
    assert bm25_top_hits(idx, "!! ??").count() == 0


# --- rare_terms aggregation -------------------------------------------------


def test_rare_terms_floor_and_ranking(spark):
    # kept set = all three docs (every doc contains 'shared').
    # Counts: shared=3, two=2 (docs 0,1), uniqa/uniqb/uniqc = 1 each.
    idx = _index(
        spark,
        [
            ("shared two uniqa", "en", "s1"),
            ("shared two uniqb", "en", "s1"),
            ("shared uniqc filler", "en", "s1"),
        ],
    )
    rows = bm25_rare_terms(idx, "shared", max_df=2, k=10).collect()
    got = [(r.term, r.n_docs) for r in rows]
    # rarest first, term asc inside a count tie; 'shared' (3) excluded
    assert got == [
        ("filler", 1),
        ("uniqa", 1),
        ("uniqb", 1),
        ("uniqc", 1),
        ("two", 2),
    ]


def test_rare_terms_k_cut_deterministic(spark):
    idx = _index(
        spark,
        [("shared alpha beta gamma", "en", "s1")],
    )
    rows = bm25_rare_terms(idx, "shared", max_df=5, k=2).collect()
    # all counts are 1 -> term asc decides the cut
    assert [r.term for r in rows] == ["alpha", "beta"]


def test_rare_terms_empty_query_guard(spark):
    idx = _index(spark, [("alpha", "en", "s1")])
    assert bm25_rare_terms(idx, "!! ??").count() == 0


# --- extended_stats aggregation ---------------------------------------------


def test_extended_stats_exact_moments(spark):
    # doc_lens 2, 4, 6 over a healthy all-match query
    idx = _index(
        spark,
        [
            ("word tok", "en", "s1"),
            ("word tok tok tok", "en", "s1"),
            ("word tok tok tok tok tok", "en", "s1"),
        ],
    )
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_extended_stats,
    )

    r = bm25_extended_stats(idx, "word", col="doc_len").first()
    assert (r.n_docs, r.sum_v, r.sum_sq) == (3, 12, 56)
    assert r.avg_v == 4.0
    # population variance: 56/3 - 16 = 8/3
    assert abs(r.variance - 8.0 / 3.0) < 1e-6
    assert abs(r.std_dev - (8.0 / 3.0) ** 0.5) < 1e-6


def test_extended_stats_empty_query_guard(spark):
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_extended_stats,
    )

    idx = _index(spark, [("alpha", "en", "s1")])
    assert bm25_extended_stats(idx, "!! ??").count() == 0


# --- percentile_ranks aggregation -------------------------------------------


def test_percentile_ranks_exact(spark):
    idx = _index(
        spark,
        [
            ("word tok", "en", "s1"),
            ("word tok tok tok", "en", "s1"),
            ("word tok tok tok tok tok", "en", "s1"),
        ],
    )
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_percentile_ranks,
    )

    rows = bm25_percentile_ranks(
        idx, "word", col="doc_len", values=(2, 4, 6)
    ).collect()
    got = {r.value: r.pct for r in rows}
    assert got[2] == pytest.approx(100.0 / 3.0, abs=1e-6)
    assert got[4] == pytest.approx(200.0 / 3.0, abs=1e-6)
    assert got[6] == 100.0


def test_percentile_ranks_guards(spark):
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_percentile_ranks,
    )

    idx = _index(spark, [("alpha", "en", "s1")])
    assert bm25_percentile_ranks(idx, "!! ??", values=(1,)).count() == 0
    with pytest.raises(ValueError):
        bm25_percentile_ranks(idx, "alpha", values=())
    with pytest.raises(ValueError):
        bm25_percentile_ranks(idx, "alpha", values=(5, 5))


# --- value_count / cardinality aggregation ----------------------------------


def test_cardinality_counts_kept_set_only(spark):
    # 'rare' matches docs 0,1 (sources s1, s2); doc 2 (s3) not kept
    idx = _index(
        spark,
        [
            ("rare words here indeed", "en", "s1"),
            ("rare other tokens again", "de", "s2"),
            ("unrelated filler stuff here", "fr", "s3"),
        ],
    )
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_cardinality,
    )

    r = bm25_cardinality(idx, "rare", col="source").first()
    assert (r.n_values, r.n_distinct) == (2, 2)
    # degenerate: whole corpus
    r = bm25_cardinality(idx, "zzzunknown", col="source").first()
    assert (r.n_values, r.n_distinct) == (3, 3)
    # empty query guard
    assert bm25_cardinality(idx, "!! ??").count() == 0


# --- composite aggregation (keyset-paginated buckets) -----------------------


def test_composite_pages_stitch_to_full_order(spark):
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_composite_agg,
    )

    idx = _index(
        spark,
        [
            ("word one", "en", "s1"),
            ("word two", "en", "s2"),
            ("word three", "de", "s1"),
            ("word four", "de", "s2"),
            ("word five", "fr", "s1"),
        ],
    )
    full = bm25_composite_agg(
        idx, "word", keys=("lang", "source"), size=100
    ).collect()
    assert [(r.lang, r.source) for r in full] == sorted(
        (r.lang, r.source) for r in full
    )
    p1 = bm25_composite_agg(idx, "word", keys=("lang", "source"), size=2).collect()
    cursor = (p1[-1].lang, p1[-1].source)
    p2 = bm25_composite_agg(
        idx, "word", keys=("lang", "source"), size=2, after=cursor
    ).collect()
    got = [(r.lang, r.source) for r in p1 + p2]
    assert got == [(r.lang, r.source) for r in full[:4]]
    assert not set(got[:2]) & set(got[2:])


def test_composite_guards(spark):
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_composite_agg,
    )

    idx = _index(spark, [("alpha", "en", "s1")])
    assert bm25_composite_agg(idx, "!! ??").count() == 0
    with pytest.raises(ValueError):
        bm25_composite_agg(idx, "alpha", keys=())
    with pytest.raises(ValueError):
        bm25_composite_agg(idx, "alpha", keys=("lang",), after=("a", "b"))
    with pytest.raises(ValueError):
        bm25_composite_agg(idx, "alpha", keys=("lang; drop",))


# --- multi_terms aggregation -------------------------------------------------


def test_multi_terms_count_order_and_kcut(spark):
    # three (lang, source) combos: en/s1 x2, de/s2 x1, fr/s3 x1 ->
    # count desc puts en/s1 first; tie between de/s2 and fr/s3 breaks
    # key-tuple asc; k=2 cuts after de/s2
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_multi_terms,
    )

    idx = _index(
        spark,
        [
            ("word alpha beta", "en", "s1"),
            ("word gamma delta", "en", "s1"),
            ("word epsilon zeta", "de", "s2"),
            ("word eta theta", "fr", "s3"),
        ],
    )
    rows = bm25_multi_terms(idx, "word", keys=("lang", "source"), k=2).collect()
    assert [(r.lang, r.source, r.n_docs) for r in rows] == [
        ("en", "s1", 2),
        ("de", "s2", 1),
    ]
    # empty-tokenizing query -> typed zero rows; empty keys -> error
    assert bm25_multi_terms(idx, "; -", keys=("lang",)).count() == 0
    with pytest.raises(ValueError):
        bm25_multi_terms(idx, "word", keys=())
    with pytest.raises(ValueError):
        bm25_multi_terms(idx, "word", keys=("lang; drop",))


# --- adjacency_matrix aggregation -------------------------------------------


def test_adjacency_matrix_pairs_and_empty_omitted(spark):
    # en&s1 intersect on docs 0,1; de&s1 never co-occur -> omitted;
    # fr bucket matches nothing -> omitted entirely
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_adjacency_matrix,
    )

    idx = _index(
        spark,
        [
            ("word alpha beta", "en", "s1"),
            ("word gamma delta", "en", "s1"),
            ("word epsilon zeta", "de", "s2"),
        ],
    )
    rows = {
        r.key: r.n_docs
        for r in bm25_adjacency_matrix(
            idx,
            "word",
            {"en": ("lang", "en"), "de": ("lang", "de"),
             "s1": ("source", "s1"), "fr": ("lang", "fr")},
        ).collect()
    }
    assert rows["en"] == 2 and rows["s1"] == 2 and rows["de"] == 1
    assert rows["en&s1"] == 2  # names joined in sorted order
    assert "de&s1" not in rows and "fr" not in rows  # empties omitted
    with pytest.raises(ValueError):
        bm25_adjacency_matrix(idx, "word", {})
    with pytest.raises(ValueError):
        bm25_adjacency_matrix(
            idx, "word",
            {f"f{i}": ("lang", "en") for i in range(9)},  # cap is 8
        )


# --- weighted_avg / matrix_stats ---------------------------------------------


def test_weighted_avg_exact_moments(spark):
    # doc_lens [3, 3, 4], distinct-term counts [3, 2, 4]:
    # sum_w 9, sum_wx 3*3 + 2*3 + 4*4 = 31, wavg 31/9
    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_weighted_avg,
    )

    idx = _index(
        spark,
        [
            ("word aa bb", "en", "s1"),
            ("word word aa", "en", "s1"),
            ("word cc dd ee", "en", "s1"),
        ],
    )
    row = bm25_weighted_avg(idx, "word").first()
    assert (row.n_docs, row.sum_w, row.sum_wx) == (3, 9, 31)
    assert row.wavg == pytest.approx(31.0 / 9.0, abs=1e-6)


def test_matrix_stats_exact_moments(spark):
    # x = doc_len [3, 3, 4], y = distinct terms [3, 2, 4]:
    # var_x = 2/9, var_y = 2/3, cov = 1/3, corr = sqrt(3)/2
    import math

    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_matrix_stats,
    )

    idx = _index(
        spark,
        [
            ("word aa bb", "en", "s1"),
            ("word word aa", "en", "s1"),
            ("word cc dd ee", "en", "s1"),
        ],
    )
    row = bm25_matrix_stats(idx, "word").first()
    assert row.n_docs == 3
    assert row.mean_x == pytest.approx(10.0 / 3.0, abs=1e-6)
    assert row.mean_y == pytest.approx(3.0, abs=1e-6)
    assert row.var_x == pytest.approx(2.0 / 9.0, abs=1e-6)
    assert row.var_y == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert row.cov_xy == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert row.corr == pytest.approx(math.sqrt(3.0) / 2.0, abs=1e-6)


# --- boxplot aggregation ------------------------------------------------------


def test_boxplot_type1_quartiles(spark):
    # doc_lens [4, 8, 8, 12] (n=4): type-1 ranks ceil(n/4)=1,
    # ceil(n/2)=2, ceil(3n/4)=3 -> q1=4, q2=8, q3=8
    from distributedcodesearchengine_spark.operators.aggs import bm25_boxplot

    idx = _index(
        spark,
        [
            ("word aa bb cc", "en", "s1"),
            ("word aa bb cc dd ee ff gg", "en", "s1"),
            ("word hh ii jj kk ll mm nn", "en", "s1"),
            ("word aa bb cc dd ee ff gg hh ii jj kk", "en", "s1"),
        ],
    )
    rows = {r.stat: r.value for r in bm25_boxplot(idx, "word").collect()}
    assert rows == {"min": 4, "q1": 4, "q2": 8, "q3": 8, "max": 12}


def test_boxplot_single_doc_collapses(spark):
    from distributedcodesearchengine_spark.operators.aggs import bm25_boxplot

    idx = _index(spark, [("word aa bb cc", "en", "s1")])
    rows = {r.stat: r.value for r in bm25_boxplot(idx, "word").collect()}
    assert set(rows.values()) == {4}
    assert bm25_boxplot(idx, "; -").count() == 0


# --- random_sampler ----------------------------------------------------------


def test_random_sampler_deterministic_and_scaled(spark):
    import hashlib

    import pytest

    from distributedcodesearchengine_spark.operators.aggs import (
        random_sampler_agg,
    )

    docs = spark.createDataFrame(
        [(i, "one two three four five") for i in range(200)],
        "doc_id long, text string",
    )
    p = 0.25
    r = random_sampler_agg(docs, probability=p, seed="s9").collect()[0]
    thr = int(p * 4294967296.0)
    want = sum(
        1 for i in range(200)
        if int(hashlib.md5(f"s9|{i}".encode()).hexdigest()[:8], 16) < thr
    )
    assert r["n_sampled"] == want
    assert r["est_total"] == pytest.approx(want / p, abs=1e-6)
    assert r["sum_len_sampled"] == want * 5
    assert r["est_sum_len"] == pytest.approx(want * 5 / p, abs=1e-6)
    # p = 1 is the exact aggregation
    full = random_sampler_agg(docs, probability=1.0).collect()[0]
    assert full["n_sampled"] == 200 and full["est_total"] == 200.0
    with pytest.raises(ValueError):
        random_sampler_agg(docs, probability=0.0)
