"""REST surface tests: run the stdlib HTTP server on a background
thread over a built index and exercise every endpoint, including the
reference API's silent-drop validation semantics (server.py:122-133
analog) vs the CLI's error semantics."""

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import pytest

from distributedcodesearchengine_spark.api import SearchEngine
from distributedcodesearchengine_spark.build.checkpoint import (
    build_index_persisted,
)
from distributedcodesearchengine_spark.cli import _stats_dict
from distributedcodesearchengine_spark.server import serve
from distributedcodesearchengine_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("srv")
    pages = generate_pages(spark, 150, seed=31, parts=2)
    idx = build_index_persisted(spark, pages, str(base / "idx"))
    engine = SearchEngine(idx)
    server = serve(engine, lambda: _stats_dict(spark, idx, str(base / "idx")), port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _get(base, path, **params):
    qs = urllib.parse.urlencode(params)
    with urllib.request.urlopen(f"{base}{path}?{qs}" if qs else f"{base}{path}") as r:
        return r.status, json.loads(r.read())


def test_health_and_stats(srv):
    code, body = _get(srv, "/health")
    assert code == 200 and body["status"] == "ok"
    code, body = _get(srv, "/stats")
    assert code == 200 and body["n_docs"] == 150 and body["vocab_size"] > 0
    assert {b["stage"] for b in body["build"]} >= {"docs", "tf", "terms"}


def test_search_endpoint(srv):
    code, body = _get(srv, "/search", q="parse json", limit=5)
    assert code == 200
    rows = body["results"]
    assert len(rows) == 5 and rows[0]["rank"] == 1
    assert rows[0]["score"] >= rows[-1]["score"]


def test_search_quoted_phrase(srv):
    code, body = _get(srv, "/search", q='"alalal alalal"', limit=3)
    assert code == 200
    assert body["results"] and body["results"][0]["rank"] == 1


def test_search_drop_semantics_for_unknown_lang(srv):
    # reference API silently drops invalid filters (server.py:122-133)
    code, plain = _get(srv, "/search", q="parse json", limit=5)
    code2, dropped = _get(srv, "/search", q="parse json", limit=5, lang="xx")
    assert code == code2 == 200
    assert [r["doc_id"] for r in dropped["results"]] == [
        r["doc_id"] for r in plain["results"]
    ]


def test_search_unknown_scorer_is_400(srv):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/search", q="x", scorer="bogus")
    assert ei.value.code == 400
    assert "unknown scorer" in json.loads(ei.value.read())["error"]


def test_suggest_endpoint(srv):
    code, body = _get(srv, "/suggest", prefix="al", limit=5)
    assert code == 200
    sugg = body["suggestions"]
    assert 0 < len(sugg) <= 5
    assert all(s["term"].startswith("al") for s in sugg)
    dfs = [s["df"] for s in sugg]
    assert dfs == sorted(dfs, reverse=True)


def test_missing_q_is_400(srv):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/search")
    assert ei.value.code == 400
