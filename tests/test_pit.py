"""Point-in-time search, _validate, and _field_caps tests (api.py
open_pit/close_pit/search_pit/validate/field_caps + server endpoints)."""

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import pytest

from distributedcodesearchengine_spark.api import SearchEngine
from distributedcodesearchengine_spark.build.indexer import build_index_inmem


def _index(spark, rows):
    pages = spark.createDataFrame(
        [
            (
                f"https://x.example/{i:04d}",
                f"<html><body><p>{t}</p></body></html>".encode(),
                t,
                "en",
                "s1",
            )
            for i, t in enumerate(rows)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages)


def test_pit_pins_snapshot_across_reload(spark):
    """A pit opened before an index swap keeps serving the OLD corpus;
    plain search serves the new one — the ES PIT consistency contract."""
    old = _index(spark, ["dup alpha", "dup beta", "gamma"])
    new = _index(spark, ["dup zeta only"])
    engine = SearchEngine(old)
    pid = engine.open_pit()
    before = {r["doc_id"] for r in engine.search_pit(pid, "dup", 10).collect()}
    engine.reload_index(new)
    after_pit = {r["doc_id"] for r in engine.search_pit(pid, "dup", 10).collect()}
    assert after_pit == before and len(before) >= 2
    live = [r["url"] for r in engine.search("dup", 10).collect()]
    assert live == ["https://x.example/0000"]
    assert engine.close_pit(pid) is True
    assert engine.close_pit(pid) is False
    with pytest.raises(ValueError):
        engine.search_pit(pid, "dup", 10)


def test_pit_ids_are_unique_and_capped(spark):
    engine = SearchEngine(_index(spark, ["aa bb", "cc dd"]))
    ids = {engine.open_pit() for _ in range(5)}
    assert len(ids) == 5
    # leaked-handle backstop: the 257th open raises
    for _ in range(256 - len(engine._pits)):
        engine.open_pit()
    with pytest.raises(ValueError):
        engine.open_pit()
    engine._pits.clear()


def test_validate_classifies_like_dispatcher(spark):
    engine = SearchEngine(_index(spark, ["dup table scan"]))
    cases = {
        "dup table": "match",
        '"dup table"': "phrase",
        '"dup table"~3': "near",
        "+dup -scan": "boolean",
        "du* table": "wildcard",
        "tabl~1": "fuzzy",
        "dup^2.5 table": "boosted",
    }
    for q, kind in cases.items():
        out = engine.validate(q)
        assert out["valid"] and out["query_type"] == kind, (q, out)
        assert out["tokens"], q
    empty = engine.validate("!! ??")
    assert empty["valid"] and empty["matches_nothing"]


def test_field_caps_lists_schema(spark):
    engine = SearchEngine(_index(spark, ["aa bb"]))
    fields = {f["field"]: f for f in engine.field_caps()}
    assert fields["url"]["searchable"] and fields["lang"]["aggregatable"]
    assert "_embedding" in fields and fields["_embedding"]["searchable"]
    assert fields["tokens"]["searchable"]
    assert not fields["tokens"]["aggregatable"]
    assert fields["doc_len"]["aggregatable"]


def test_pit_endpoints(spark):
    from distributedcodesearchengine_spark.server import serve

    engine = SearchEngine(_index(spark, ["dup alpha", "dup beta"]))
    server = serve(engine, lambda: {}, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def _get(path, **params):
        qs = urllib.parse.urlencode(params)
        with urllib.request.urlopen(f"{base}{path}?{qs}" if qs else f"{base}{path}") as r:
            return r.status, json.loads(r.read())

    try:
        code, body = _get("/pit_open")
        assert code == 200 and body["pit_id"]
        pid = body["pit_id"]
        code, body = _get("/pit_search", pit=pid, q="dup", limit=5)
        assert code == 200 and len(body["results"]) >= 2
        code, body = _get("/validate", q='"dup alpha"')
        assert code == 200 and body["query_type"] == "phrase"
        code, body = _get("/field_caps")
        assert code == 200 and any(
            f["field"] == "url" for f in body["fields"]
        )
        code, body = _get("/pit_close", id=pid)
        assert code == 200 and body["closed"] is True
        # searching a closed pit is the ES search_context_missing -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"{base}/pit_search?pit={pid}&q=dup"
            )
        assert ei.value.code == 400
    finally:
        server.shutdown()
