"""query_string mini-language tests (operators/querystring): parser
shapes + F8 validation guards, identity reductions onto each donor
operator (plain/boolean/wildcard/fuzzy/phrase/boost), composition
semantics (pre- vs post-threshold stages), filter precedence, and the
live HTTP endpoint."""

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import pytest

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.querystring import (
    bm25_query_string_sql,
    bm25_query_string_topk,
    parse_query_string,
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


def _ranked(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


# --- parser ----------------------------------------------------------------


def test_parse_all_clause_types():
    p = parse_query_string('+dup -api "row scan" sc* tabl~1 lang:en term^2.5')
    assert p.weighted == {"dup": 1.0, "row": 1.0, "scan": 1.0, "term": 2.5}
    assert p.prefixes == ["sc"]
    assert p.fuzzies == [("tabl", 1)]
    assert p.phrases == ["row scan"]
    assert p.required == ["dup"]
    assert p.excluded == ["api"]
    assert p.filters == {"lang": "en"}


def test_parse_defaults_and_accumulation():
    # bare fuzzy ~ defaults to distance 1 (house contract); repeated
    # terms accumulate; quoted boost multiplies each phrase token
    p = parse_query_string('word~ dup dup "aa bb"^3')
    assert p.fuzzies == [("word", 1)]
    assert p.weighted["dup"] == 2.0
    assert p.weighted["aa"] == 3.0 and p.weighted["bb"] == 3.0
    p2 = parse_query_string("word~2")
    assert p2.fuzzies == [("word", 2)]


def test_parse_colon_tokens_are_text_not_field_errors():
    # unknown field names and URL-ish clauses tokenize as plain text —
    # never an unknown-field error (web text is full of colons)
    p = parse_query_string("http://a.example/path foo:bar lang:en")
    assert p.filters == {"lang": "en"}
    assert "http" in p.weighted and "foo" in p.weighted and "bar" in p.weighted


def test_parse_quoted_single_token_is_plain_term():
    p = parse_query_string('+"table"')
    assert p.phrases == [] and p.required == ["table"]
    assert p.weighted == {"table": 1.0}


def test_parse_unbalanced_quote_is_analyzed_text():
    p = parse_query_string('"dup table')
    assert p.phrases == [] and set(p.weighted) == {"dup", "table"}


def test_parse_guards():
    for bad in ('-"dup table"', "+sc*", "-word~1", "+lang:en", "-source:s1"):
        with pytest.raises(ValueError):
            parse_query_string(bad)


def test_empty_and_filters_only_queries(spark):
    idx = _index(spark, ["aa bb", "cc dd"])
    assert bm25_query_string_topk(idx, "").count() == 0
    assert bm25_query_string_topk(idx, "lang:en").count() == 0
    assert parse_query_string("lang:en").is_empty()


# --- identity reductions ----------------------------------------------------


ROWS = [
    "dup table scan merge",
    "dup dup table row",
    "table row scan api",
    "scan sort slow merge",
    "dup merge batch api",
    "window sort table dup",
]


@pytest.fixture(scope="module")
def idx(spark):
    return _index(
        spark,
        ROWS,
        langs=["en", "en", "de", "en", "de", "en"],
        sources=["s1", "s2", "s1", "s2", "s1", "s2"],
    )


def test_plain_equals_bm25_topk(idx):
    a = _ranked(bm25_query_string_topk(idx, "dup table", k=10))
    b = _ranked(bm25_topk(idx, "dup table", k=10))
    assert a == b and a


def test_boost_equals_multiplicity(idx):
    # term^2 is qtf 2.0 — exactly the multiplicity-2 plain query
    a = _ranked(bm25_query_string_topk(idx, "dup^2 table", k=10))
    b = _ranked(bm25_topk(idx, "dup dup table", k=10))
    assert a == b and a


def test_occur_flags_equal_boolean_topk(idx):
    from distributedcodesearchengine_spark.operators.boolquery import (
        bm25_boolean_topk,
    )

    q = "+dup table -api"
    a = _ranked(bm25_query_string_topk(idx, q, k=10))
    b = _ranked(bm25_boolean_topk(idx, q, k=10))
    assert a == b and a


def test_prefix_equals_wildcard_topk(idx):
    from distributedcodesearchengine_spark.operators.wildcard import (
        bm25_wildcard_topk,
    )

    a = _ranked(bm25_query_string_topk(idx, "dup s*", k=10))
    b = _ranked(bm25_wildcard_topk(idx, "dup s*", k=10))
    assert a == b and a


def test_fuzzy_equals_fuzzy_topk(idx):
    from distributedcodesearchengine_spark.operators.fuzzy import (
        bm25_fuzzy_topk,
    )

    a = _ranked(bm25_query_string_topk(idx, "tabl~1 dup", k=10))
    b = _ranked(bm25_fuzzy_topk(idx, "tabl~1 dup", k=10))
    assert a == b and a


def test_plus_quoted_phrase_equals_bare_phrase(idx):
    """+"a b" must rank EXACTLY like "a b": the phrase predicate is
    already a requirement, and + must not smuggle in a pre-threshold
    constraint that would move the 1%-of-max base."""
    a = _ranked(bm25_query_string_topk(idx, '+"dup table"', k=10))
    b = _ranked(bm25_query_string_topk(idx, '"dup table"', k=10))
    assert a == b and a
    p = parse_query_string('+"dup table"')
    assert p.required == [] and p.phrases == ["dup table"]


def test_quoted_equals_phrase_topk(idx):
    from distributedcodesearchengine_spark.operators.phrase import (
        bm25_phrase_topk,
    )

    a = _ranked(bm25_query_string_topk(idx, '"dup table"', k=10))
    b = _ranked(bm25_phrase_topk(idx, "dup table", k=10))
    assert a == b and a


# --- composition semantics ---------------------------------------------------


def test_must_is_pre_threshold(idx):
    """+merge changes the match set, so the 1%-of-max threshold is
    taken over the constrained set — docs without merge are absent
    even at high unconstrained score."""
    got = {r["doc_id"] for r in bm25_query_string_topk(idx, "+merge dup", k=10).collect()}
    assert got and all(
        "merge" in ROWS[d] for d in got
    )


def test_phrase_is_post_threshold_view(idx):
    """A quoted clause ranks like its unquoted form minus non-phrase
    docs (the phrase contract carried into the language)."""
    unq = _ranked(bm25_query_string_topk(idx, "dup table", k=10))
    quo = _ranked(bm25_query_string_topk(idx, '"dup table"', k=10))
    phrase_docs = {d for d, _ in quo}
    assert quo == [(d, s) for d, s in unq if d in phrase_docs]


def test_multiple_phrases_intersect(idx):
    got = {r["doc_id"] for r in
           bm25_query_string_topk(idx, '"dup table" "table scan"', k=10).collect()}
    want = {i for i, t in enumerate(ROWS) if "dup table" in t and "table scan" in t}
    assert got == want and got


def test_field_clause_filters_and_explicit_wins(idx):
    by_clause = {r["doc_id"] for r in
                 bm25_query_string_topk(idx, "dup lang:de", k=10).collect()}
    assert by_clause and all(ROWS[d] and d in (2, 4) for d in by_clause)
    # explicit API filter outranks the query's own clause
    ex = {r["doc_id"] for r in
          bm25_query_string_topk(idx, "dup lang:de", k=10,
                                 filters={"lang": "en"}).collect()}
    assert ex and all(d in (0, 1, 3, 5) for d in ex)


def test_pure_exclusion_degenerate_backfill(idx):
    """-api alone: nothing scores; zero-backfill over the constrained
    universe in doc_id order (the boolean degenerate contract)."""
    rows = bm25_query_string_topk(idx, "-api", k=10).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 3, 5]
    assert all(r["score"] == 0.0 for r in rows)


def test_sql_mirror_guards():
    with pytest.raises(ValueError):
        bm25_query_string_sql("dup site:x.example")
    assert "WHERE false" in bm25_query_string_sql("")


# --- HTTP endpoint -----------------------------------------------------------


def test_query_string_endpoint(spark):
    from distributedcodesearchengine_spark.api import SearchEngine
    from distributedcodesearchengine_spark.server import serve

    idx = _index(spark, ROWS)
    engine = SearchEngine(idx)
    server = serve(engine, lambda: {}, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        qs = urllib.parse.urlencode(
            {"q": '+dup "dup table" s* -api table^2', "limit": 5}
        )
        with urllib.request.urlopen(f"{base}/query_string?{qs}") as r:
            body = json.loads(r.read())
        assert r.status == 200 and body["results"]
        assert [x["rank"] for x in body["results"]] == list(
            range(1, len(body["results"]) + 1)
        )
        # F8: an invalid combination is a 400, not a silent drop
        qs_bad = urllib.parse.urlencode({"q": '-"dup table"'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/query_string?{qs_bad}")
        assert ei.value.code == 400
    finally:
        server.shutdown()


# --- parser fuzz --------------------------------------------------------------


def test_parser_never_crashes_on_arbitrary_text():
    """Property: on ANY printable string the parser either returns a
    plan or raises the documented ValueError — never any other
    exception, and never a plan with un-analyzed tokens."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import re as _re

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                   max_size=60))
    def _prop(q):
        try:
            p = parse_query_string(q)
        except ValueError:
            return
        for t in p.weighted:
            assert _re.fullmatch(r"[a-z0-9]{2,}", t), (q, t)
        for t in p.required + p.excluded:
            assert _re.fullmatch(r"[a-z0-9]{2,}", t), (q, t)
        for pre in p.prefixes:
            assert _re.fullmatch(r"[a-z0-9]+", pre), (q, pre)
        for w, d in p.fuzzies:
            assert d in (1, 2) and _re.fullmatch(r"[a-z0-9]{2,}", w)

    _prop()
