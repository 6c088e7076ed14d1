"""Semantics tests for the second query-surface wave
(operators/queryext.py): regexp expansion + safe-subset guards,
constant_score filter-context semantics, span_first boundary and
composition contracts, _analyze ordered token streams, sampler /
diversified_sampler windows, and the rescore blend."""

import pytest

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.queryext import (
    analyze_doc,
    analyze_text,
    bm25_regexp_topk,
    bm25_rescore_topk,
    bm25_span_first_topk,
    constant_score_topk,
    expand_regexp,
    parse_safe_regexp,
    sampler_terms,
    span_first_docs,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk


def _index(spark, rows, langs=None, sources=None):
    langs = langs or ["en"] * len(rows)
    sources = sources or ["s1"] * len(rows)
    pages = spark.createDataFrame(
        [
            (
                f"https://x.example/{i:04d}",
                f"<html><body><p>{text}</p></body></html>".encode(),
                text,
                langs[i],
                sources[i],
            )
            for i, text in enumerate(rows)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages, meta_cols=("source",))


# --- regexp ---------------------------------------------------------------


def test_regexp_expansion_whole_term_only(spark):
    idx = _index(spark, ["scan sort slow", "scan xscan scanx", "aa bb"])
    terms = [t for t, _ in expand_regexp(idx, "s(can|ort)")]
    assert terms == ["scan", "sort"]  # not slow, not xscan/scanx


def test_regexp_safe_subset_guards():
    for bad in ("Scan", "a'b", "a\\d", "a{2}", "", "a" * 65, "(unclosed"):
        with pytest.raises(ValueError):
            parse_safe_regexp(bad)
    assert parse_safe_regexp("jo.n+[a-z]?(x|y)*") == "jo.n+[a-z]?(x|y)*"


def test_regexp_single_expansion_matches_plain_topk(spark):
    idx = _index(
        spark,
        ["scan aa bb", "scan scan cc", "dd ee ff", "gg hh ii", "jj kk ll"],
    )
    via_regexp = bm25_regexp_topk(idx, "sc.n").collect()
    plain = bm25_topk(idx, "scan").collect()
    assert [(r.doc_id, r.score) for r in via_regexp] == [
        (r.doc_id, r.score) for r in plain
    ]


def test_regexp_no_match_degenerate_backfill(spark):
    idx = _index(spark, ["aa bb", "cc dd", "ee ff"])
    rows = bm25_regexp_topk(idx, "zz+qq").collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]  # doc_id order
    assert all(r.score == 0.0 for r in rows)


# --- constant_score -------------------------------------------------------


def test_constant_score_filter_context(spark):
    idx = _index(spark, ["aa bb", "bb cc", "cc dd", "ee ff"])
    rows = constant_score_topk(idx, "bb cc", boost=2.5).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]  # any-term match, id order
    assert all(r.score == 2.5 for r in rows)
    assert [r.rank for r in rows] == [1, 2, 3]
    # filter context: a non-matching query is EMPTY (no zero-backfill)
    assert constant_score_topk(idx, "zz").count() == 0
    assert constant_score_topk(idx, "!!").count() == 0  # empty tokenize


# --- span_first -----------------------------------------------------------


def test_span_first_boundary_inclusive(spark):
    idx = _index(
        spark,
        ["word aa bb", "aa word bb", "aa bb word", "aa bb cc"],
    )
    ids = sorted(
        r.doc_id for r in span_first_docs(idx, "word", end=2).collect()
    )
    assert ids == [0, 1]  # pos 3 excluded at end=2; 1-based inclusive
    ids3 = sorted(
        r.doc_id for r in span_first_docs(idx, "word", end=3).collect()
    )
    assert ids3 == [0, 1, 2]


def test_span_first_guards(spark):
    idx = _index(spark, ["aa bb"])
    with pytest.raises(ValueError):
        span_first_docs(idx, "two words", end=3)
    with pytest.raises(ValueError):
        span_first_docs(idx, "aa", end=0)


def test_span_first_wide_end_equals_plain_topk(spark):
    # with end >= every doc length, the filter passes every doc that
    # contains the term — the healthy-regime kept set itself
    idx = _index(
        spark,
        ["aa bb word", "word cc dd", "ee ff gg", "hh ii jj", "kk ll mm"],
    )
    via_span = bm25_span_first_topk(idx, "word", end=1000).collect()
    plain = bm25_topk(idx, "word").collect()
    assert [(r.doc_id, r.score) for r in via_span] == [
        (r.doc_id, r.score) for r in plain if r.score > 0
    ]


# --- _analyze -------------------------------------------------------------


def test_analyze_doc_ordered_stream(spark):
    idx = _index(spark, ["FooBar baz a foo2"])
    rows = analyze_doc(idx, 0).collect()
    assert [(r.pos, r.token) for r in rows] == [
        (1, "foo"), (2, "bar"), (3, "baz"), (4, "foo2")
    ]  # camel split, len>=2 drop of 'a', ORDER preserved
    assert analyze_doc(idx, 999).count() == 0


def test_analyze_text_matches_house_tokenizer(spark):
    from distributedcodesearchengine_spark.oracle.tokenizer import tokenize

    text = "QuickBrown fox-jumps over 3 lazyDogs!"
    rows = analyze_text(spark, text).collect()
    assert [r.token for r in rows] == tokenize(text)
    assert [r.pos for r in rows] == list(range(1, len(rows) + 1))


# --- sampler --------------------------------------------------------------


def test_sampler_full_window_equals_facets(spark):
    idx = _index(
        spark,
        ["word aa", "word bb", "word cc", "dd ee", "ff gg"],
        sources=["s1", "s1", "s2", "s3", "s3"],
    )
    rows = sampler_terms(idx, "word", key="source", shard_size=1000).collect()
    # healthy kept set = the 3 matching docs; full window == plain counts
    assert [(r.source, r.n_docs) for r in rows] == [("s1", 2), ("s2", 1)]


def test_sampler_window_cuts_by_score_then_doc_id(spark):
    # doc 0 has tf=2 (highest score); shard_size=1 keeps only it
    idx = _index(
        spark,
        ["word word aa", "word bb", "word cc", "dd ee", "ff gg"],
        sources=["s1", "s2", "s2", "s3", "s3"],
    )
    rows = sampler_terms(idx, "word", key="source", shard_size=1).collect()
    assert [(r.source, r.n_docs) for r in rows] == [("s1", 1)]


def test_diversified_sampler_caps_per_value(spark):
    idx = _index(
        spark,
        ["word aa", "word bb", "word cc", "dd ee", "ff gg"],
        sources=["s1", "s1", "s2", "s3", "s3"],
    )
    rows = sampler_terms(
        idx, "word", key="source", shard_size=1000,
        dedup_field="source", max_docs_per_value=1,
    ).collect()
    assert [(r.source, r.n_docs) for r in rows] == [("s1", 1), ("s2", 1)]


def test_sampler_guards(spark):
    idx = _index(spark, ["aa bb"])
    with pytest.raises(ValueError):
        sampler_terms(idx, "aa", key="source; DROP")
    with pytest.raises(ValueError):
        sampler_terms(idx, "aa", key="source", shard_size=0)
    assert sampler_terms(idx, "!!", key="source").count() == 0


# --- rescore --------------------------------------------------------------


def test_rescore_phrase_flips_rank(spark):
    # doc 0: high BM25 (tf=2 of 'word') but never the phrase;
    # doc 1: lower BM25, contains 'word up' twice -> rescore wins
    idx = _index(
        spark,
        [
            "word word aa bb",
            "word up cc word up",
            "dd ee ff gg",
            "hh ii jj kk",
            "ll mm nn oo",
        ],
    )
    base = bm25_rescore_topk(idx, "word", "word up", rescore_weight=0.0)
    b = base.collect()
    assert b[0].doc_id == 0  # plain BM25 order at rw=0
    assert all(r.score == r.base for r in b)  # rw=0 blend is the identity
    res = bm25_rescore_topk(idx, "word", "word up", rescore_weight=5.0)
    r = res.collect()
    assert r[0].doc_id == 1 and r[0].n_occur == 2
    assert r[0].score == pytest.approx(r[0].base + 5.0 * 2, abs=1e-6)


def test_rescore_guards(spark):
    idx = _index(spark, ["aa bb"])
    with pytest.raises(ValueError):
        bm25_rescore_topk(idx, "aa", "aa bb", window_size=5, k=10)
    with pytest.raises(ValueError):
        bm25_rescore_topk(idx, "aa", "aa bb", rescore_weight=-1.0)
    assert bm25_rescore_topk(idx, "!!", "aa bb").count() == 0


# --- match_phrase_prefix ----------------------------------------------------


def test_phrase_prefix_matches_any_expansion(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        match_phrase_prefix_topk,
    )

    idx = _index(
        spark,
        [
            "small dup aa",      # 'small du*' -> small dup
            "small dug bb",      # -> small dug
            "small xx dup",      # phrase broken: no match
            "dup small yy",      # wrong order: no match
            "zz qq rr",
        ],
    )
    rows = match_phrase_prefix_topk(idx, "small du").collect()
    assert sorted(r.doc_id for r in rows) == [0, 1]


def test_phrase_prefix_no_expansion_matches_nothing(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        match_phrase_prefix_topk,
    )

    idx = _index(spark, ["small dup aa", "bb cc dd"])
    assert match_phrase_prefix_topk(idx, "small zz").count() == 0
    assert match_phrase_prefix_topk(idx, "!!").count() == 0


def test_phrase_prefix_bare_prefix_is_any_expansion_match(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        match_phrase_prefix_topk,
    )

    idx = _index(spark, ["dup aa", "dug bb", "cc dd", "ee ff", "gg hh"])
    rows = match_phrase_prefix_topk(idx, "du").collect()
    assert sorted(r.doc_id for r in rows if r.score > 0) == [0, 1]


def test_phrase_prefix_expansion_cap(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        match_phrase_prefix_topk,
    )

    # dup appears in 3 docs, dug in 1 -> df-desc cap at 1 keeps only dup
    idx = _index(
        spark,
        ["small dup aa", "small dug bb", "dup cc", "dup dd", "ee ff"],
    )
    rows = match_phrase_prefix_topk(idx, "small du", max_expansions=1).collect()
    assert sorted(r.doc_id for r in rows) == [0]


# --- mget -------------------------------------------------------------------


def test_mget_fetches_in_id_order(spark):
    from distributedcodesearchengine_spark.operators.termvectors import mget

    idx = _index(spark, ["aa bb", "cc dd", "ee ff"])
    rows = mget(idx, [2, 0, 99]).collect()
    assert [r.doc_id for r in rows] == [0, 2]  # absent id 99 yields no row
    assert rows[0].doc_len == 2 and rows[0].lang == "en"
    assert mget(idx, []).count() == 0


# --- events pipeline extensions ---------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )


def test_auto_date_histogram_interval_pick(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        auto_date_histogram,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = _events(spark, [
        (i, t0 + dt.timedelta(minutes=10 * i), 1, "click", 1.0, "{}")
        for i in range(12)  # 110-minute span
    ])
    # target 12: 10-min buckets fit (12 buckets); target 2: needs >= 1h
    fine = auto_date_histogram(ev, "click", target_buckets=12).collect()
    assert fine[0].interval_s == 600 and len(fine) == 12
    coarse = auto_date_histogram(ev, "click", target_buckets=2).collect()
    assert coarse[0].interval_s == 3600 and len(coarse) == 2
    assert sum(r.n_events for r in coarse) == 12
    # no events of the type -> empty
    assert auto_date_histogram(ev, "nope").count() == 0


def test_events_bucket_stats_extremal_keys(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_bucket_stats,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = (
        [(i, t0, 1, "click", 1.0, "{}") for i in range(3)]              # h0: 3
        + [(10 + i, t0 + dt.timedelta(hours=1), 1, "click", 1.0, "{}")  # h1: 1
           for i in range(1)]
        + [(20 + i, t0 + dt.timedelta(hours=2), 1, "click", 1.0, "{}")  # h2: 3
           for i in range(3)]
    )
    r = events_bucket_stats(_events(spark, rows), "click").first()
    assert (r.n_buckets, r.min_n, r.max_n, r.sum_n) == (3, 1, 3, 7)
    assert r.avg_n == pytest.approx(7 / 3, abs=1e-6)
    # ties on max resolve to the FIRST (smallest epoch) bucket
    assert r.max_bucket == int(t0.timestamp())
    assert r.min_bucket == int((t0 + dt.timedelta(hours=1)).timestamp())


def test_events_serial_diff_lag(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_serial_diff,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    counts = [1, 2, 4, 7]
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1, "click", 1.0, "{}"))
            eid += 1
    out = events_serial_diff(_events(spark, rows), "click", lag=2).collect()
    assert [r.diff_n for r in out] == [0, 0, 3, 5]  # first `lag` coalesce to 0
    with pytest.raises(ValueError):
        events_serial_diff(_events(spark, rows), "click", lag=0)


def test_events_bucket_script_and_selector(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_bucket_script,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "purchase", 10.0, "{}"),
        (1, t0, 1, "purchase", 20.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "purchase", 99.0, "{}"),  # 1 event: dropped
    ]
    out = events_bucket_script(_events(spark, rows), "purchase",
                               min_events=2).collect()
    assert len(out) == 1  # the selector dropped the 1-event bucket
    assert out[0].n_events == 2
    assert out[0].total_value == pytest.approx(30.0, abs=1e-6)
    assert out[0].value_per_event == pytest.approx(15.0, abs=1e-6)


# --- span_not ---------------------------------------------------------------


def test_span_not_excludes_windowed_occurrences(spark):
    """Docs where EVERY include span sits inside an exclude window are
    out; one surviving span keeps the doc."""
    from distributedcodesearchengine_spark.operators.queryext import (
        span_not_docs,
    )

    idx = _index(spark, [
        "scan bad aa bb",        # 0: 'scan' 2 before... actually scan@1, bad@2
        "aa scan bad bb",        # 1: scan adjacent before bad
        "aa bad scan bb",        # 2: scan adjacent after bad
        "scan aa bb bad",        # 3: scan far from bad -> survives
        "scan bad aa scan",      # 4: second scan far -> survives
        "aa bb cc dd",           # 5: no scan -> never matches
        "scan aa bb cc",         # 6: no bad -> trivially survives
    ])
    got = {r["doc_id"] for r in
           span_not_docs(idx, "scan", "bad", pre=1, post=1).collect()}
    assert got == {3, 4, 6}
    # asymmetric windows: post only (exclude BEFORE include is allowed)
    got_post = {r["doc_id"] for r in
                span_not_docs(idx, "scan", "bad", pre=0, post=1).collect()}
    # post=1 kills include positions <= e+1 and >= e-0: doc1 scan@2,bad@3:
    # window [3,4] -> scan@2 survives; doc2 bad@2,scan@3: [2,3] kills it
    assert 1 in got_post and 2 not in got_post


def test_span_not_zero_window_is_plain_topk(spark):
    """pre=0/post=0 demands p == e, impossible for distinct terms —
    identical to the unrestricted ranking."""
    from distributedcodesearchengine_spark.operators.queryext import (
        bm25_span_not_topk,
    )

    # 2-of-6 docs keeps 'scan' positive-idf (healthy regime: the
    # identity is over the thresholded kept set; in the degenerate
    # regime the doc_filter correctly trims the zero backfill to
    # include-docs, like every doc_filter operator)
    idx = _index(spark, ["scan aa", "bb scan scan", "cc dd", "ee ff gg",
                         "hh ii", "jj kk"])
    a = [(r.doc_id, r.score) for r in
         bm25_span_not_topk(idx, "scan", "aa", 0, 0).collect()]
    b = [(r.doc_id, r.score) for r in bm25_topk(idx, "scan").collect()]
    assert a == b and a


def test_span_not_guards(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        bm25_span_not_sql,
        span_not_docs,
    )

    idx = _index(spark, ["aa bb"])
    with pytest.raises(ValueError):
        span_not_docs(idx, "two words", "aa")
    with pytest.raises(ValueError):
        span_not_docs(idx, "aa", "bb", pre=-1)
    with pytest.raises(ValueError):
        bm25_span_not_sql("aa", "b c")


# --- terms_enum -------------------------------------------------------------


def test_terms_enum_prefix_order_and_cap(spark):
    from distributedcodesearchengine_spark.operators.queryext import terms_enum

    idx = _index(spark, ["scan sort slow seek", "scan same sort", "aa bb"])
    got = [r.term for r in terms_enum(idx, "s", size=10).collect()]
    assert got == ["same", "scan", "seek", "slow", "sort"]
    assert [r.term for r in terms_enum(idx, "s", size=2).collect()] == [
        "same", "scan",
    ]
    assert [r.term for r in terms_enum(idx, "so", size=10).collect()] == [
        "sort",
    ]
    assert terms_enum(idx, "zz", size=10).count() == 0


def test_terms_enum_keyset_pages_tile_the_full_order(spark):
    from distributedcodesearchengine_spark.operators.queryext import terms_enum

    idx = _index(spark, ["scan sort slow seek same sip sup sat set"])
    full = [r.term for r in terms_enum(idx, "s", size=100).collect()]
    p1 = [r.term for r in terms_enum(idx, "s", size=3).collect()]
    p2 = [
        r.term
        for r in terms_enum(idx, "s", size=3, search_after=p1[-1]).collect()
    ]
    p3 = [
        r.term
        for r in terms_enum(idx, "s", size=3, search_after=p2[-1]).collect()
    ]
    assert p1 + p2 + p3 == full


def test_terms_enum_guards(spark):
    from distributedcodesearchengine_spark.operators.queryext import terms_enum

    idx = _index(spark, ["scan sort"])
    # uppercase folds to the analyzer's lowercase space
    assert [r.term for r in terms_enum(idx, "SC").collect()] == ["scan"]
    for bad_prefix in ("", "a b", "a'b", "ä"):
        with pytest.raises(ValueError):
            terms_enum(idx, bad_prefix)
    with pytest.raises(ValueError):
        terms_enum(idx, "s", size=0)
    with pytest.raises(ValueError):
        terms_enum(idx, "s", search_after=7)


# --- pinned query -----------------------------------------------------------


def test_pinned_provided_order_and_organic_exclusion(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        bm25_pinned_topk,
    )

    idx = _index(spark, [
        "scan sort slow", "scan scan deep", "scan third page",
        "other words here", "scan fourth entry",
    ])
    plain = [r.doc_id for r in bm25_topk(idx, "scan", k=10).collect()]
    got = bm25_pinned_topk(idx, "scan", [3, 0], k=10).collect()
    # pins first, in PROVIDED order (3 before 0), flagged
    assert [(r.rank, r.doc_id, r.pinned) for r in got[:2]] == [
        (1, 3, True), (2, 0, True),
    ]
    # doc 3 never matched: pins with score 0.0
    assert got[0].score == 0.0
    # organic = the plain ranking minus the pinned docs, ranks offset
    organic = [r.doc_id for r in got[2:]]
    assert organic == [d for d in plain if d not in (3, 0)]
    assert all(not r.pinned for r in got[2:])
    assert [r.rank for r in got] == list(range(1, len(got) + 1))


def test_pinned_skips_unknown_truncates_and_guards(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        bm25_pinned_topk,
    )
    import pytest as _pytest

    idx = _index(spark, ["scan sort", "scan deep", "scan third"])
    # unknown id 99 is skipped, known pins keep provided order
    got = bm25_pinned_topk(idx, "scan", [99, 2, 1], k=10).collect()
    assert [(r.rank, r.doc_id) for r in got[:2]] == [(1, 2), (2, 1)]
    # more pins than k: truncated to k, no organic rows
    got = bm25_pinned_topk(idx, "scan", [2, 1, 0], k=2).collect()
    assert [(r.doc_id, r.pinned) for r in got] == [(2, True), (1, True)]
    # empty pins == plain bm25 modulo the pinned column
    a = [(r.rank, r.doc_id, round(r.score, 6))
         for r in bm25_pinned_topk(idx, "scan", [], k=10).collect()]
    b = [(r.rank, r.doc_id, round(r.score, 6))
         for r in bm25_topk(idx, "scan", k=10).collect()]
    assert a == b
    with _pytest.raises(ValueError):
        bm25_pinned_topk(idx, "scan", [1, 1], k=10)


# --- match_bool_prefix -------------------------------------------------------


def test_match_bool_prefix_relaxed_vs_phrase(spark):
    """The bool variant scores docs where the base token and the
    prefix match NON-adjacently (or only one of them matches) — docs
    match_phrase_prefix excludes."""
    from distributedcodesearchengine_spark.operators.queryext import (
        match_bool_prefix_topk,
        match_phrase_prefix_topk,
    )
    from tests.test_search_after import _index

    texts = [
        "quick duck pond",            # adjacent 'quick du*'
        "quick red duck",             # NON-adjacent
        "dusty shelf here",           # prefix only
        "quick fox jumps",            # base only
        "nothing relevant at all",
    ]
    idx = _index(spark, texts)
    bool_ids = {r["doc_id"] for r in match_bool_prefix_topk(
        idx, "quick du", k=10).collect()
        if r["score"] > 0}
    phrase_ids = {r["doc_id"] for r in match_phrase_prefix_topk(
        idx, "quick du", k=10).collect() if r["score"] > 0}
    assert 0 in phrase_ids and 1 not in phrase_ids
    assert {0, 1, 2, 3} <= bool_ids
    assert 4 not in bool_ids


def test_match_bool_prefix_empty_contracts(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        match_bool_prefix_topk,
    )
    from tests.test_search_after import _index

    idx = _index(spark, ["alpha beta"])
    assert match_bool_prefix_topk(idx, "!! ??", k=5).count() == 0
    # no expansion and no base -> matches nothing
    assert match_bool_prefix_topk(idx, "zz", k=5).count() == 0


def test_mterm_vectors_batch(spark):
    from distributedcodesearchengine_spark.operators.termvectors import (
        mterm_vectors,
        term_vectors,
    )
    from tests.test_search_after import _index

    idx = _index(spark, ["apple banana apple", "cherry durian", "apple"])
    out = mterm_vectors(idx, [0, 2, 99]).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["df"]))
    assert set(by_doc) == {0, 2}  # 99 absent -> found:false
    # batch rows equal the per-doc API
    for d in (0, 2):
        single = [(r["term"], r["tf"], r["df"])
                  for r in term_vectors(idx, d).collect()]
        assert by_doc[d] == single
    assert mterm_vectors(idx, []).count() == 0


# --- span_within -------------------------------------------------------------


def test_span_within_envelope_semantics(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.queryext import (
        span_within_docs,
    )
    from tests.test_search_after import _index

    texts = [
        "open little close filler words",     # 0: little inside (open..close) width 2
        "open filler close little words",     # 1: little OUTSIDE the envelope
        "close little open filler words",     # 2: wrong order (close before open)
        "open aa bb cc dd ee ff close little here little",  # 3: envelope too wide at w=4
        "little alone no envelope here",      # 4: no big span
        "open xx little close extra",         # 5: inside, width 3
    ]
    idx = _index(spark, texts)
    got = {r["doc_id"] for r in span_within_docs(
        idx, "little", "open", "close", width=4).collect()}
    assert got == {0, 5}
    # widening the envelope admits doc 3 (width 8 window, little at
    # position 9 is OUTSIDE [1..8]... the little inside must be within
    # the envelope positions, doc 3's littles are after close)
    got8 = {r["doc_id"] for r in span_within_docs(
        idx, "little", "open", "close", width=8).collect()}
    assert got8 == {0, 5}
    with pytest.raises(ValueError):
        span_within_docs(idx, "two words", "open", "close")
    with pytest.raises(ValueError):
        span_within_docs(idx, "little", "open", "close", width=0)


def test_span_within_topk_filters_ranking(spark):
    from distributedcodesearchengine_spark.operators.queryext import (
        bm25_span_within_topk,
    )
    from tests.test_search_after import _index

    texts = [
        "open little close filler words",
        "open filler close little words",
        "unrelated text entirely here",
    ]
    idx = _index(spark, texts)
    rows = bm25_span_within_topk(
        idx, "little", "open", "close", width=4, k=10).collect()
    assert [r["doc_id"] for r in rows] == [0]


# --- synonym_graph (multi-word sources) ---------------------------------------


def test_synonym_graph_adjacency_fires(spark):
    from distributedcodesearchengine_spark.operators.synonyms import (
        expand_query_graph,
    )

    syn = {"world wide": ["www"], "dup": ["copy"]}
    adj = expand_query_graph("world wide web", syn)
    assert adj["www"] == 1 and adj["world"] == 1
    # NON-adjacent tokens never fire the phrase key
    non = expand_query_graph("world other wide", syn)
    assert "www" not in non
    # two non-overlapping occurrences inject twice
    twice = expand_query_graph("world wide and world wide", syn)
    assert twice["www"] == 2
    # longest key wins at equal start
    syn2 = {"aa bb cc": ["x3"], "aa bb": ["x2"]}
    got = expand_query_graph("aa bb cc", syn2)
    assert got["x3"] == 1 and "x2" not in got


def test_synonym_graph_ranking_differs_from_plain(spark):
    from distributedcodesearchengine_spark.operators.synonyms import (
        bm25_synonyms_graph_topk,
        bm25_synonyms_topk,
    )
    from tests.test_search_after import _index

    texts = [
        "copy machine here",       # matches the injected contraction
        "dup table data",          # matches the phrase itself
        "table dup reversed",      # tokens present, NOT adjacent
        "unrelated words",
    ]
    idx = _index(spark, texts)
    syn = {"dup table": ["copy"]}
    g = {r["doc_id"]: r["score"] for r in bm25_synonyms_graph_topk(
        idx, "dup table", syn, k=10).collect() if r["score"] > 0}
    assert 0 in g  # the contraction matched
    # the single-word expander cannot express a phrase key: it leaves
    # the table untouched -> doc 0 scores 0 there
    p = {r["doc_id"]: r["score"] for r in bm25_synonyms_topk(
        idx, "dup table", syn, k=10).collect() if r["score"] > 0}
    assert 0 not in p
