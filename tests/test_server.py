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


def test_root_serves_gui(srv):
    with urllib.request.urlopen(f"{srv}/") as r:
        assert r.status == 200
        assert "text/html" in r.headers["Content-Type"]
        page = r.read().decode()
    assert "spark-bm25" in page and "/search?" in page


def test_malformed_limit_is_400(srv):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/search", q="parse json", limit="abc")
    assert ei.value.code == 400


def test_unknown_path_is_404(srv):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/nope")
    assert ei.value.code == 404


def test_post_index_without_manager_is_400(srv):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/index", {"input": "/tmp/x"})
    assert ei.value.code == 400
    assert "disabled" in json.loads(ei.value.read())["error"]


# --- POST /index surface (reference api/server.py:196-248) ------------------


def _post(base, path, payload):
    data = json.dumps(payload).encode() if not isinstance(payload, bytes) else payload
    req = urllib.request.Request(
        f"{base}{path}", data=data, headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def isrv(spark, tmp_path_factory):
    """Server wired exactly like the CLI serve command: job manager +
    atomic engine reload on build completion."""
    from distributedcodesearchengine_spark.server import IndexJobManager

    base = tmp_path_factory.mktemp("isrv")
    index_dir = str(base / "idx")
    pages = generate_pages(spark, 150, seed=31, parts=2)
    idx = build_index_persisted(spark, pages, index_dir)
    engine = SearchEngine(idx).warm()
    manager = IndexJobManager(
        spark, index_dir,
        on_complete=lambda new: engine.reload_index(new, warm=True),
    )
    server = serve(
        engine,
        lambda: _stats_dict(spark, engine.index, index_dir),
        port=0,
        index_manager=manager,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", str(base)
    server.shutdown()


def test_post_index_async_builds_and_serves(isrv, spark):
    """Queue a build of a NEW corpus over the same index dir, poll job
    status through /stats to complete, then search the new index
    through the same server (the round-2 verdict's done-criterion)."""
    import time

    base, tmp = isrv
    pages_dir = f"{tmp}/pages_async"
    generate_pages(spark, 250, seed=41, parts=2).write.mode("overwrite").parquet(
        pages_dir
    )
    code, body = _post(base, "/index", {"input": pages_dir, "priority": 7})
    assert code == 202 and body["success"] and body["job_id"] >= 1
    job_id = body["job_id"]

    deadline = time.monotonic() + 300
    status = None
    while time.monotonic() < deadline:
        _, stats = _get(base, "/stats")
        job = next(j for j in stats["jobs"] if j["job_id"] == job_id)
        status = job["status"]
        if status in ("complete", "failed"):
            break
        time.sleep(0.5)
    assert status == "complete", job
    assert job["n_docs"] == 250 and job["priority"] == 7

    # the serving engine swapped to the new index
    _, stats = _get(base, "/stats")
    assert stats["n_docs"] == 250
    code, res = _get(base, "/search", q="parse json", limit=5)
    assert code == 200 and len(res["results"]) == 5


def test_post_index_sync_blocks_and_reports(isrv, spark):
    base, tmp = isrv
    pages_dir = f"{tmp}/pages_sync"
    generate_pages(spark, 120, seed=43, parts=2).write.mode("overwrite").parquet(
        pages_dir
    )
    code, body = _post(base, "/index/sync", {"input": pages_dir})
    assert code == 200 and body["success"]
    assert body["status"] == "complete" and body["n_docs"] == 120
    assert body["duration_seconds"] > 0
    _, stats = _get(base, "/stats")
    assert stats["n_docs"] == 120


def test_post_index_missing_input_is_400(isrv):
    base, _ = isrv
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, "/index", {})
    assert ei.value.code == 400


def test_post_index_bad_json_is_400(isrv):
    base, _ = isrv
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, "/index", b"{not json")
    assert ei.value.code == 400


def test_search_batch_endpoint(srv):
    """POST /search/batch scores every query in one plan and keys the
    response by the caller's query ids; results match the single-query
    endpoint rank-for-rank."""
    code, body = _post(
        srv, "/search/batch",
        {"queries": {"a": "parse json", "b": "alalal"}, "limit": 5},
    )
    assert code == 200 and set(body["results"]) == {"a", "b"}
    batch_a = body["results"]["a"]
    assert [r["rank"] for r in batch_a] == list(range(1, len(batch_a) + 1))
    # rank-parity with the single-query surface (which normalizes
    # scores, so compare doc id order only)
    _, single = _get(srv, "/search", q="parse json", limit=5)
    assert [r["doc_id"] for r in batch_a] == [
        r["doc_id"] for r in single["results"]
    ]


def test_search_batch_requires_queries_map(srv):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/search/batch", {"limit": 5})
    assert ei.value.code == 400


def test_job_manager_priority_order():
    """Queue discipline without HTTP or Spark: higher priority drains
    first, FIFO within a priority (the reference publisher's
    priority-queue semantics, queue/publisher.py:68-75)."""
    from distributedcodesearchengine_spark.server import IndexJobManager

    mgr = IndexJobManager(None, "/nonexistent")
    mgr._ensure_worker = lambda: None  # keep the worker thread off
    low = mgr.submit("/pages/low", priority=2)
    high = mgr.submit("/pages/high", priority=9)
    mid1 = mgr.submit("/pages/mid1", priority=5)
    mid2 = mgr.submit("/pages/mid2", priority=5)
    drained = [mgr._q.get_nowait()[1] for _ in range(4)]
    assert drained == [high, mid1, mid2, low]
    assert mgr.status(high)["status"] == "queued"
    assert mgr.status(999)["status"] == "unknown"


def test_post_index_bad_input_dir_fails_job(isrv):
    """A job over a nonexistent pages dir dead-letters in job status
    (status=failed + error), without taking the server down."""
    base, tmp = isrv
    code, body = _post(base, "/index/sync", {"input": f"{tmp}/does_not_exist"})
    assert code == 200 and not body["success"]
    assert body["status"] == "failed" and body["error"]
    # server still healthy
    code, health = _get(base, "/health")
    assert code == 200 and health["status"] == "ok"


def test_api_info(srv):
    code, body = _get(srv, "/api")
    assert code == 200
    assert "POST /search/local" in body["endpoints"]


def test_search_local_builds_and_reindexes_on_path_change(srv, spark, tmp_path_factory):
    """POST /search/local: ad-hoc BM25 over a directory that is NOT the
    served index, rebuilt when the path changes (reference
    api/server.py:291-352 LocalSearchEngine semantics)."""
    base = tmp_path_factory.mktemp("local")
    d1, d2 = str(base / "p1"), str(base / "p2")
    generate_pages(spark, 40, seed=51, parts=1).write.parquet(d1)
    generate_pages(spark, 25, seed=52, parts=1).write.parquet(d2)

    code, body = _post(srv, "/search/local", {"input": d1, "query": "parse json"})
    assert code == 200 and body["indexed_docs"] == 40
    assert body["results"] and body["results"][0]["rank"] == 1
    # same path again: served from the cached ad-hoc index
    code, body = _post(srv, "/search/local", {"input": d1, "query": "http request"})
    assert code == 200 and body["indexed_docs"] == 40
    # path change: re-index
    code, body = _post(srv, "/search/local", {"input": d2, "query": "parse json"})
    assert code == 200 and body["indexed_docs"] == 25


def test_search_local_missing_fields_is_400_and_bad_dir_is_empty(srv):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/search/local", {"input": "/tmp/x"})
    assert e.value.code == 400
    # reference error semantics: bad input dir -> empty results, not 500
    code, body = _post(srv, "/search/local", {"input": "/nonexistent/dir", "query": "q"})
    assert code == 200 and body["results"] == [] and "error" in body


def test_cli_queue_publishes_to_server(isrv, spark, tmp_path_factory, capsys):
    """`queue --sync` is the reference's job-publish CLI: a pure HTTP
    client posting a build to the running server's job surface."""
    from distributedcodesearchengine_spark.cli import main as cli_main

    base, _ = isrv
    pages_dir = str(tmp_path_factory.mktemp("qpub") / "pages")
    generate_pages(spark, 60, seed=77, parts=1).write.parquet(pages_dir)
    rc = cli_main(
        ["queue", "--server", base, "--input", pages_dir, "--sync"], spark=spark
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["success"] is True and out["n_docs"] == 60


def test_cli_queue_unreachable_server_errors(capsys):
    from distributedcodesearchengine_spark.cli import main as cli_main

    rc = cli_main(
        ["queue", "--server", "http://127.0.0.1:1", "--input", "/tmp/x"]
    )
    assert rc == 2
    assert "error" in capsys.readouterr().err


def test_facets_endpoint(srv):
    code, body = _get(srv, "/facets", q="parse json")
    assert code == 200 and body["query"] == "parse json"
    rows = body["facets"]
    assert rows and all({"lang", "site", "n_docs", "max_score"} <= set(r) for r in rows)
    assert sum(r["n_docs"] for r in rows) > 0
    # missing q -> 400
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/facets")
    assert ei.value.code == 400


def test_search_msm_param(srv):
    # msm=1 must equal the plain search result set; a high msm narrows
    code, plain = _get(srv, "/search", q="parse json", limit=10)
    code, m1 = _get(srv, "/search", q="parse json", limit=10, msm=1)
    assert code == 200
    assert [r["doc_id"] for r in m1["results"]] == [
        r["doc_id"] for r in plain["results"]
    ]
    code, m2 = _get(srv, "/search", q="parse json", limit=10, msm=2)
    assert code == 200
    # msm pages carry the standard result schema
    for r in m2["results"]:
        assert {"rank", "doc_id", "url", "score"} <= set(r)


def test_search_after_endpoint(srv):
    # page 1 (no cursor) then page 2 through the returned cursor: the
    # concatenation must equal the first 2k rows of one keyset walk
    code, p1 = _get(srv, "/search_after", q="parse json", limit=3)
    assert code == 200 and p1["results"] and p1["next"] is not None
    code, p2 = _get(
        srv, "/search_after", q="parse json", limit=3,
        after_score=p1["next"]["after_score"], after_doc=p1["next"]["after_doc"],
    )
    assert code == 200
    ids1 = [r["doc_id"] for r in p1["results"]]
    ids2 = [r["doc_id"] for r in p2["results"]]
    assert not set(ids1) & set(ids2)  # pages never overlap
    # page-relative ranks restart at 1
    assert [r["rank"] for r in p2["results"]] == list(range(1, len(ids2) + 1))
    # half a cursor -> 400; missing q -> 400
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/search_after", q="x", after_score=1.0)
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/search_after")
    assert ei.value.code == 400


def test_stats_agg_endpoint(srv):
    code, body = _get(srv, "/stats_agg", q="parse json")
    assert code == 200 and body["query"] == "parse json"
    s = body["stats"]
    assert s and {"n_docs", "min_v", "max_v", "sum_v", "avg_v"} <= set(s)
    assert s["min_v"] <= s["max_v"] and s["n_docs"] > 0
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/stats_agg")
    assert ei.value.code == 400


def test_histogram_endpoint(srv):
    code, body = _get(srv, "/histogram", q="parse json", interval=100)
    assert code == 200 and body["query"] == "parse json"
    rows = body["buckets"]
    assert rows and all({"bucket", "n_docs", "max_score"} <= set(r) for r in rows)
    assert all(r["bucket"] % 100 == 0 for r in rows)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/histogram")
    assert ei.value.code == 400


def test_range_agg_endpoint(srv):
    code, body = _get(srv, "/range_agg", q="parse json", cuts="50,200")
    assert code == 200 and body["query"] == "parse json"
    rows = body["buckets"]
    assert len(rows) == 3  # (-inf,50), [50,200), [200,inf)
    assert [r["range_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["lo"] is None and rows[2]["hi"] is None
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/range_agg")
    assert ei.value.code == 400


def test_filters_agg_endpoint(srv):
    code, body = _get(
        srv, "/filters_agg", q="parse json",
        buckets="en:lang:en,de:lang:de,none:lang:zz",
    )
    assert code == 200
    rows = {r["bucket"]: r for r in body["buckets"]}
    assert set(rows) == {"en", "de", "none"}
    assert rows["none"]["n_docs"] == 0 and rows["none"]["max_score"] == 0.0
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/filters_agg", q="x", buckets="brokenspec")
    assert ei.value.code == 400


def test_top_hits_endpoint(srv):
    code, body = _get(srv, "/top_hits", q="parse json", key="lang",
                      per_bucket=2)
    assert code == 200
    hits = body["hits"]
    assert hits
    per = {}
    for r in hits:
        per.setdefault(r["lang"], []).append(r["rank"])
    for ranks in per.values():
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 2
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/top_hits")
    assert ei.value.code == 400


def test_rare_terms_endpoint(srv):
    code, body = _get(srv, "/rare_terms", q="parse json", max_df=1000000,
                      limit=5)
    assert code == 200
    terms = body["terms"]
    assert terms and len(terms) <= 5
    counts = [r["n_docs"] for r in terms]
    assert counts == sorted(counts)  # rarest first
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/rare_terms")
    assert ei.value.code == 400


def test_significant_endpoint(srv):
    code, body = _get(srv, "/significant", q="parse json", limit=5, min_fg=1)
    assert code == 200 and body["query"] == "parse json"
    rows = body["terms"]
    # degenerate corpora may return []; when rows exist they carry the
    # full schema and are capped at limit
    assert len(rows) <= 5
    for r in rows:
        assert {"term", "fg_count", "bg_count", "score"} <= set(r)
        assert r["fg_count"] >= 1
    # missing q -> 400
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/significant")
    assert ei.value.code == 400


def test_similar_endpoint(srv):
    code, body = _get(srv, "/similar", doc_id=3, limit=5)
    assert code == 200 and body["doc_id"] == 3
    rows = body["results"]
    assert rows and rows[0]["rank"] == 1
    assert all(r["doc_id"] != 3 for r in rows)  # seed excluded
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/similar")
    assert ei.value.code == 400


def test_count_endpoint(srv):
    code, body = _get(srv, "/count", q="parse json")
    assert code == 200 and body["query"] == "parse json"
    assert body["n_hits"] > 0 and body["max_score"] > 0
    # count agrees with an oversized search page
    code, full = _get(srv, "/search", q="parse json", limit=10_000)
    assert body["n_hits"] == len(full["results"])
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/count")
    assert ei.value.code == 400


def test_explain_endpoint(srv):
    code, body = _get(srv, "/explain", q="parse json", limit=3)
    assert code == 200
    rows = body["explanations"]
    assert rows and {"rank", "doc_id", "term", "tf", "idf", "contrib", "score"} <= set(rows[0])
    assert {r["term"] for r in rows} <= {"parse", "json"}
    # every explained doc is one of the top-3 ranks
    assert {r["rank"] for r in rows} <= {1, 2, 3}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/explain")
    assert ei.value.code == 400


def test_search_offset_pages_the_ranked_list(srv):
    _, p1 = _get(srv, "/search", q="parse json", limit=5)
    _, p2 = _get(srv, "/search", q="parse json", limit=5, offset=5)
    _, full = _get(srv, "/search", q="parse json", limit=10)
    r1 = [(r["rank"], r["doc_id"], r["score"]) for r in p1["results"]]
    r2 = [(r["rank"], r["doc_id"], r["score"]) for r in p2["results"]]
    rf = [(r["rank"], r["doc_id"], r["score"]) for r in full["results"]]
    assert r1 + r2 == rf                      # pages tile the full list
    assert [r[0] for r in r2] == [6, 7, 8, 9, 10]  # absolute ranks
    assert r1[0][2] == 1.0                    # page-1 top normalized to 1


def test_search_collapse_and_range_params(srv):
    code, body = _get(srv, "/search", q="parse json", collapse="site", limit=5)
    assert code == 200
    sites = [r["site"] for r in body["results"]]
    assert sites and len(sites) == len(set(sites))  # one per site
    code, body = _get(srv, "/search", q="parse json", len_min=150, len_max=260, limit=5)
    assert code == 200 and body["results"]


def test_search_collapse_honors_filters(srv):
    # the collapse branch forwards lang like the plain branch (ADVICE
    # r3 #3): a valid lang filters, an unknown lang silently drops
    code, body = _get(
        srv, "/search", q="parse json", collapse="site", lang="de", limit=5
    )
    assert code == 200 and body["results"]
    ids = [r["doc_id"] for r in body["results"]]
    _, plain = _get(srv, "/search", q="parse json", lang="de", limit=50)
    assert set(ids) <= {r["doc_id"] for r in plain["results"]}
    _, unfiltered = _get(srv, "/search", q="parse json", collapse="site", limit=5)
    _, dropped = _get(
        srv, "/search", q="parse json", collapse="site", lang="xx", limit=5
    )
    assert [r["doc_id"] for r in dropped["results"]] == [
        r["doc_id"] for r in unfiltered["results"]
    ]


def test_rerank_endpoint(srv):
    code, body = _get(srv, "/rerank", q="parse json", limit=5, depth=15)
    assert code == 200
    rows = body["results"]
    assert len(rows) == 5 and rows[0]["rank"] == 1
    assert {"rerank_score", "bm25_rank", "bm25_score"} <= set(rows[0])
    scores = [r["rerank_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/rerank")
    assert ei.value.code == 400


def test_search_local_failed_build_does_not_poison_previous_path(
    srv, spark, tmp_path_factory
):
    """A failed ad-hoc build must leave the cache EMPTY: previously a
    bad path request popped 'index' but kept 'path', so every later
    request for the old working path skipped the rebuild and KeyError'd
    forever."""
    base = tmp_path_factory.mktemp("localpoison")
    good = str(base / "good")
    generate_pages(spark, 30, seed=61, parts=1).write.parquet(good)

    code, body = _post(srv, "/search/local", {"input": good, "query": "parse json"})
    assert code == 200 and body["indexed_docs"] == 30
    # failed build for a bad path (error surfaced, not 500)
    code, body = _post(
        srv, "/search/local", {"input": "/nonexistent/poison", "query": "q"}
    )
    assert code == 200 and "error" in body
    # the old working path must rebuild cleanly, not KeyError
    code, body = _post(srv, "/search/local", {"input": good, "query": "parse json"})
    assert code == 200 and body.get("indexed_docs") == 30 and "error" not in body


def test_extended_stats_endpoint(srv):
    code, body = _get(srv, "/extended_stats", q="parse json")
    assert code == 200
    s = body["stats"]
    assert {"n_docs", "sum_v", "sum_sq", "avg_v", "variance", "std_dev"} <= set(s)
    assert s["variance"] >= 0 and s["std_dev"] >= 0
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/extended_stats")
    assert ei.value.code == 400


def test_percentile_ranks_endpoint(srv):
    code, body = _get(srv, "/percentile_ranks", q="parse json",
                      values="50,5000")
    assert code == 200
    ranks = {r["value"]: r["pct"] for r in body["ranks"]}
    assert set(ranks) == {50, 5000}
    assert 0.0 <= ranks[50] <= ranks[5000] <= 100.0
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/percentile_ranks")
    assert ei.value.code == 400


def test_cardinality_endpoint(srv):
    code, body = _get(srv, "/cardinality", q="parse json", col="lang")
    assert code == 200
    c = body["cardinality"]
    assert c["n_values"] >= c["n_distinct"] >= 1
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/cardinality")
    assert ei.value.code == 400


def test_decay_search_endpoint(srv):
    code, body = _get(srv, "/decay_search", q="parse json", origin=100,
                      scale=50, decay="linear", limit=5)
    assert code == 200
    rows = body["results"]
    assert rows and len(rows) <= 5
    assert all({"rank", "doc_id", "score", "mult"} <= set(r) for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/decay_search", q="x", decay="bogus")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/decay_search")
    assert ei.value.code == 400


def test_did_you_mean_endpoint(srv):
    code, body = _get(srv, "/did_you_mean", q="parse json")
    assert code == 200
    assert body["corrected"] and len(body["terms"]) == 2
    assert all({"pos", "original", "suggestion", "df", "dist", "corrected"}
               <= set(t) for t in body["terms"])
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/did_you_mean")
    assert ei.value.code == 400


def test_composite_agg_endpoint(srv):
    code, p1 = _get(srv, "/composite_agg", q="parse json", keys="lang",
                    size=2)
    assert code == 200 and p1["buckets"]
    if p1["after"]:
        code, p2 = _get(srv, "/composite_agg", q="parse json", keys="lang",
                        size=2, after=p1["after"])
        assert code == 200
        seen1 = {b["lang"] for b in p1["buckets"]}
        seen2 = {b["lang"] for b in p2["buckets"]}
        assert not seen1 & seen2
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/composite_agg")
    assert ei.value.code == 400


def test_multi_terms_endpoint(srv):
    code, body = _get(srv, "/multi_terms", q="parse json",
                      keys="lang,site", limit=5)
    assert code == 200
    rows = body["buckets"]
    assert rows and len(rows) <= 5
    assert all({"lang", "site", "n_docs"} <= set(r) for r in rows)
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/multi_terms")
    assert ei.value.code == 400


def test_adjacency_matrix_endpoint(srv):
    code, body = _get(
        srv, "/adjacency_matrix", q="parse json",
        filters="en:lang:en,de:lang:de",
    )
    assert code == 200
    rows = {r["key"]: r["n_docs"] for r in body["buckets"]}
    assert rows and all(n > 0 for n in rows.values())  # empties omitted
    assert set(rows) <= {"de", "en", "de&en"}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/adjacency_matrix", q="x", filters="badly-formed")
    assert ei.value.code == 400


def test_weighted_avg_and_matrix_stats_endpoints(srv):
    code, body = _get(srv, "/weighted_avg", q="parse json")
    assert code == 200
    wa = body["weighted_avg"]
    assert wa["n_docs"] > 0 and wa["sum_w"] > 0
    assert wa["wavg"] == pytest.approx(wa["sum_wx"] / wa["sum_w"], abs=1e-5)
    code, body = _get(srv, "/matrix_stats", q="parse json")
    assert code == 200
    ms = body["matrix_stats"]
    assert ms["n_docs"] == wa["n_docs"]
    assert -1.0 - 1e-9 <= ms["corr"] <= 1.0 + 1e-9


def test_boxplot_endpoint(srv):
    code, body = _get(srv, "/boxplot", q="parse json")
    assert code == 200
    bp = body["boxplot"]
    assert set(bp) == {"min", "q1", "q2", "q3", "max"}
    assert bp["min"] <= bp["q1"] <= bp["q2"] <= bp["q3"] <= bp["max"]


def test_fvf_and_random_search_endpoints(srv):
    code, body = _get(srv, "/fvf_search", q="parse json", factor=0.5,
                      modifier="log1p", limit=5)
    assert code == 200
    rows = body["results"]
    assert rows and all({"rank", "doc_id", "score", "mult"} <= set(r) for r in rows)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/fvf_search", q="x", modifier="bogus")
    assert ei.value.code == 400
    code, b1 = _get(srv, "/random_search", q="parse json", seed="s1", limit=5)
    code, b2 = _get(srv, "/random_search", q="parse json", seed="s1", limit=5)
    assert b1["results"] == b2["results"]  # same seed -> same page
    assert all(0.0 <= r["mult"] < 1.0 for r in b1["results"])


def test_termvectors_endpoint(srv):
    code, body = _get(srv, "/termvectors", doc_id=3)
    assert code == 200 and body["found"] is True
    terms = body["terms"]
    assert terms and all({"term", "tf", "df"} <= set(t) for t in terms)
    assert all(t["df"] >= t["tf"] >= 1 or t["df"] >= 1 for t in terms)
    code, body = _get(srv, "/termvectors", doc_id=99999999)
    assert code == 200 and body["found"] is False and body["terms"] == []
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/termvectors")
    assert ei.value.code == 400


def test_regexp_search_endpoint(srv):
    code, body = _get(srv, "/regexp_search", pattern="pars.")
    assert code == 200
    rows = body["results"]
    assert rows and rows[0]["rank"] == 1 and rows[0]["score"] > 0
    # unsafe pattern -> the F8 validation contract (400, like an
    # unknown scorer enum)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/regexp_search", pattern="a\\d")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/regexp_search")
    assert ei.value.code == 400


def test_constant_score_endpoint(srv):
    code, body = _get(srv, "/constant_score", q="parse json", boost=3.0,
                      limit=5)
    assert code == 200
    rows = body["results"]
    assert rows and all(r["score"] == 3.0 for r in rows)
    assert [r["doc_id"] for r in rows] == sorted(r["doc_id"] for r in rows)


def test_span_first_endpoint(srv):
    code, body = _get(srv, "/span_first", term="json", end=1000, limit=5)
    assert code == 200
    assert body["results"] and body["results"][0]["rank"] == 1
    code, narrow = _get(srv, "/span_first", term="json", end=1)
    assert code == 200  # possibly empty, but a valid response
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/span_first")
    assert ei.value.code == 400


def test_analyze_endpoint(srv):
    code, body = _get(srv, "/analyze", text="FooBar baz a foo2")
    assert code == 200
    assert [(t["pos"], t["token"]) for t in body["tokens"]] == [
        (1, "foo"), (2, "bar"), (3, "baz"), (4, "foo2")
    ]
    code, body = _get(srv, "/analyze", doc_id=0)
    assert code == 200 and body["tokens"]
    assert [t["pos"] for t in body["tokens"]] == list(
        range(1, len(body["tokens"]) + 1)
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/analyze")  # neither text nor doc_id
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/analyze", text="x", doc_id=0)  # both
    assert ei.value.code == 400


def test_sampler_endpoint(srv):
    code, body = _get(srv, "/sampler", q="parse json", key="lang",
                      shard_size=20)
    assert code == 200
    buckets = body["buckets"]
    assert buckets and sum(b["n_docs"] for b in buckets) <= 20
    code, div = _get(srv, "/sampler", q="parse json", key="lang",
                     shard_size=20, dedup_field="lang",
                     max_docs_per_value=1)
    assert code == 200
    assert all(b["n_docs"] == 1 for b in div["buckets"])


def test_rescore_endpoint(srv):
    code, body = _get(srv, "/rescore", q="parse json", phrase="parse json",
                      window=20, weight=2.0, limit=5)
    assert code == 200
    rows = body["results"]
    assert rows and rows[0]["rank"] == 1
    for r in rows:
        assert r["score"] == pytest.approx(
            r["base"] + 2.0 * r["n_occur"], abs=2e-6
        )
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/rescore", q="x")
    assert ei.value.code == 400


def test_phrase_prefix_endpoint(srv):
    code, body = _get(srv, "/phrase_prefix", q="parse js", limit=5)
    assert code == 200
    rows = body["results"]
    assert rows and rows[0]["rank"] == 1
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/phrase_prefix")
    assert ei.value.code == 400


def test_mget_endpoint(srv):
    code, body = _get(srv, "/mget", ids="2,0,999999")
    assert code == 200
    docs = body["docs"]
    assert [d["doc_id"] for d in docs] == [0, 2]
    assert all("url" in d and "doc_len" in d for d in docs)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/mget", ids="1,bogus")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/mget")
    assert ei.value.code == 400


def test_search_special_branches_reject_unsupported_params(srv):
    """collapse/msm/range don't implement offset/scorer/hybrid — the
    combination is a 400, never a silently-ignored parameter."""
    for combo in (
        {"q": "parse", "collapse": "source", "offset": 5},
        {"q": "parse", "msm": 2, "scorer": "wand"},
        {"q": "parse", "len_min": 10, "hybrid": 1},
    ):
        qs = urllib.parse.urlencode(combo)
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{srv}/search?{qs}")
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert "not supported" in body["error"]


def test_terms_enum_endpoint(srv):
    code, body = _get(srv, "/terms_enum", prefix="s", size=5)
    assert code == 200
    terms = body["terms"]
    assert 0 < len(terms) <= 5
    assert terms == sorted(terms)
    assert all(t.startswith("s") for t in terms)
    assert body["next_after"] == terms[-1]
    # keyset page 2 resumes strictly after page 1's last term
    code, body2 = _get(srv, "/terms_enum", prefix="s", size=5,
                       after=body["next_after"])
    assert code == 200
    assert all(t > terms[-1] for t in body2["terms"])
    # the two pages tile the front of the full enumeration
    code, full = _get(srv, "/terms_enum", prefix="s", size=10)
    assert (terms + body2["terms"])[:10] == full["terms"][:10]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/terms_enum", size=5)  # missing prefix
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/terms_enum", prefix="a b")  # invalid prefix
    assert ei.value.code == 400


def test_pinned_endpoint(srv):
    code, body = _get(srv, "/pinned", q="parse json", ids="5,2", limit=5)
    assert code == 200
    rows = body["results"]
    assert [(r["rank"], r["doc_id"], r["pinned"]) for r in rows[:2]] == [
        (1, 5, True), (2, 2, True),
    ]
    assert all(not r["pinned"] for r in rows[2:])
    assert len(rows) == 5
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/pinned", q="x")  # missing ids
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/pinned", q="x", ids="1,zz")
    assert ei.value.code == 400


def test_terms_set_endpoint(srv):
    code, body = _get(srv, "/terms_set", q="parse json", limit=10)
    assert code == 200
    rows = body["results"]
    assert len(rows) > 0
    # every result satisfies its own per-doc requirement contract:
    # ranks are 1..n and scores descend
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the per-doc requirement constrains the match set relative to the
    # plain search (terms_set universe is a subset pre-threshold)
    code, plain = _get(srv, "/search", q="parse json", limit=50)
    assert code == 200
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/terms_set", limit=5)  # missing q
    assert ei.value.code == 400


def test_rank_eval_endpoint(srv):
    code, body = _post(srv, "/rank_eval", {
        "queries": {"good": "parse json", "oov": "zzzznotaword"}, "k": 5,
    })
    assert code == 200
    m = body["metrics"]
    g = m["good"]
    assert set(g) == {"ndcg", "mrr", "recall", "precision", "err"}
    assert 0.0 < g["ndcg"] <= 1.0 and 0.0 < g["err"] <= 1.0
    assert 0.0 < g["precision"] <= 1.0
    # an all-OOV query has no labels and no rows: all-zero metrics
    assert m["oov"] == {
        "ndcg": 0.0, "mrr": 0.0, "recall": 0.0, "precision": 0.0, "err": 0.0,
    }
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/rank_eval", {"queries": {}})
    assert ei.value.code == 400


def test_search_sort_param(srv):
    code, body = _get(srv, "/search", q="parse json", sort="doc_len:desc",
                      limit=5)
    assert code == 200
    rows = body["results"]
    assert rows and [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    lens = [r["doc_len"] for r in rows]
    assert lens == sorted(lens, reverse=True)
    code, asc_body = _get(srv, "/search", q="parse json", sort="doc_len:asc",
                          limit=5)
    asc_lens = [r["doc_len"] for r in asc_body["results"]]
    assert asc_lens == sorted(asc_lens)
    # unknown field and bad direction are 400s (F8)
    for bad in ({"q": "x", "sort": "nope"}, {"q": "x", "sort": "doc_len:up"}):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/search", **bad)
        assert ei.value.code == 400
    # sort composed with offset paging is rejected like the other
    # specialized branches
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/search", q="x", sort="doc_len", offset=10)
    assert ei.value.code == 400


# --- similarity / autocomplete / distance_feature / rank_feature surfaces ----


def test_similarity_endpoint_models_and_400(srv):
    import urllib.error

    for model in ("lmd", "lmjm", "dfr", "ib", "classic", "bool"):
        code, body = _get(srv, "/similarity", q="parse json", model=model)
        assert code == 200 and body["model"] == model
        assert len(body["results"]) > 0
        r1 = body["results"][0]
        assert {"rank", "doc_id", "url", "score"} <= set(r1)
        assert r1["score"] > 0
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, "/similarity", q="parse", model="bm42")
    assert e.value.code == 400
    assert "bm42" in json.loads(e.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as e2:
        _get(srv, "/similarity")
    assert e2.value.code == 400


def test_similarity_models_disagree(srv):
    """The four similarities must not all produce the same ranking on
    a multi-term query — pins that model= actually switches scorers."""
    ranks = {}
    for model in ("lmd", "lmjm", "dfr", "ib"):
        _, body = _get(srv, "/similarity", q="parse json data", model=model,
                       limit=10)
        ranks[model] = tuple(r["doc_id"] for r in body["results"])
    assert len(set(ranks.values())) >= 2


def test_autocomplete_endpoint(srv):
    code, body = _get(srv, "/autocomplete", q="parse js")
    assert code == 200
    sugg = body["suggestions"]
    assert all(s["text"].startswith("parse js") for s in sugg)
    counts = [s["count"] for s in sugg]
    assert counts == sorted(counts, reverse=True) or len(counts) <= 1
    # unigram branch
    code, body = _get(srv, "/autocomplete", q="pars")
    assert code == 200
    assert all(s["text"].startswith("pars") for s in body["suggestions"])
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _get(srv, "/autocomplete")


def test_distance_search_endpoint(srv):
    code, body = _get(srv, "/distance_search", q="parse json",
                      lat=40.0, lon=-74.0)
    assert code == 200
    rows = body["results"]
    assert rows and {"rank", "doc_id", "base", "dist_km", "score"} <= set(rows[0])
    for r in rows:
        assert r["score"] >= r["base"]
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, "/distance_search", q="parse")  # missing lat/lon
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e2:
        _get(srv, "/distance_search", q="parse", lat=0.0, lon=0.0, pivot_km=0)
    assert e2.value.code == 400


def test_rank_feature_endpoint(srv):
    code, body = _get(srv, "/rank_feature", q="parse json",
                      function="saturation", pivot=40.0, boost=2.0)
    assert code == 200
    rows = body["results"]
    assert rows and all(r["score"] >= r["base"] for r in rows)
    for r in rows:
        assert 0.0 <= r["feat"] <= 1.0
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, "/rank_feature", q="parse", function="nope")
    assert e.value.code == 400


def test_phrase_suggest_endpoint(srv):
    code, body = _get(srv, "/phrase_suggest", q="parse jsno")
    assert code == 200
    sugg = body["suggestions"]
    assert sugg and all({"text", "score", "n_changed"} <= set(s) for s in sugg)
    scores = [s["score"] for s in sugg]
    assert scores == sorted(scores, reverse=True)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, "/phrase_suggest")
    assert e.value.code == 400


def test_knn_similarity_cutoff(srv):
    _, full = _get(srv, "/knn", q="parse json", limit=10)
    scores = [r["score"] for r in full["results"]]
    assert scores and scores == sorted(scores, reverse=True)
    cut = (scores[0] + scores[-1]) / 2
    _, trimmed = _get(srv, "/knn", q="parse json", limit=10, similarity=cut)
    got = [r["score"] for r in trimmed["results"]]
    assert got == [s for s in scores if s >= cut]
    # every mode accepts the cutoff
    for mode in ("bq", "mrl"):
        _, body = _get(srv, "/knn", q="parse json", limit=10, mode=mode,
                       similarity=0.99999)
        assert all(r["score"] >= 0.99999 for r in body["results"])


def test_ltr_search_endpoint(srv):
    code, body = _get(srv, "/ltr_search", q="parse json", window=15)
    assert code == 200
    rows = body["results"]
    assert rows and {"rank", "doc_id", "base", "n_matched", "score"} <= set(rows[0])
    assert all(r["n_matched"] >= 1 for r in rows[:3])
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, "/ltr_search", q="parse", limit=30, window=10)  # k > window
    assert e.value.code == 400


def test_maxsim_endpoint(srv):
    code, body = _get(srv, "/maxsim", q="parse json")
    assert code == 200
    rows = body["results"]
    assert rows and rows[0]["rank"] == 1
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _get(srv, "/maxsim")


def test_percolate_endpoint(srv):
    code, body = _post(srv, "/percolate", {
        "text": "how to parse JSON data quickly",
        "queries": {
            "json-monitor": "parse json",
            "phrase-monitor": '"parse json"',
            "dead": "zzznothing here",
        },
    })
    assert code == 200
    assert "json-monitor" in body["matched_queries"]
    assert "dead" not in body["matched_queries"]
    # phrase adjacency: 'parse JSON' IS adjacent in the text
    assert "phrase-monitor" in body["matched_queries"]
    code2, body2 = _post(srv, "/percolate", {
        "text": "parse the json later",  # terms present, NOT adjacent
        "queries": {"phrase-monitor": '"parse json"', "loose": "parse json"},
    })
    assert body2["matched_queries"] == ["loose"]
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/percolate", {"queries": {}})
    assert e.value.code == 400


def test_autocomplete_lang_context(srv):
    _, full = _get(srv, "/autocomplete", q="parse js")
    _, ctx = _get(srv, "/autocomplete", q="parse js", lang="en")
    def cnt(body):
        return {s["text"]: s["count"] for s in body["suggestions"]}
    f, c = cnt(full), cnt(ctx)
    # the context slice never counts MORE than the whole corpus, and
    # strictly less in total (the corpus spans several langs)
    assert all(c[t] <= f.get(t, 0) for t in c)
    assert sum(c.values()) < sum(f.values())
