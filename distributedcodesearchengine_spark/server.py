"""Minimal REST surface — the analog of the reference's FastAPI server
(``codesearch/api/server.py:110-280``: /search, /index, /index/sync,
/stats), stdlib-only (``http.server``; this sandbox has no
FastAPI/uvicorn, and the engine needs no web framework: every endpoint
is one engine call).

    python -m distributedcodesearchengine_spark serve --index DIR --port 8099

Endpoints (JSON responses):

    GET  /search?q=...&limit=10&offset=0&lang=en&site=...&source=...&hybrid=1&scorer=auto
                       (auto = sharded layout when present, else exact;
                       wand is the batch-side compressed-postings scorer)
    GET  /count?q=...                     total hits over the kept set
    GET  /explain?q=...&limit=10          per-term score breakdown
    GET  /suggest?prefix=al&limit=10
    GET  /facets?q=...               facet counts over the query's kept set
    GET  /histogram?q=...&col=doc_len&interval=50   ES histogram agg over
                       the kept set (bucket = (col DIV interval) * interval)
    GET  /range_agg?q=...&col=doc_len&cuts=20,40    ES range agg: explicit
                       [lo, hi) buckets from ordered integer cut points
    GET  /filters_agg?q=...&buckets=name:col:value,...   ES filters agg:
                       named equality buckets (always present, 0 if empty)
    GET  /top_hits?q=...&key=lang&per_bucket=3      ES terms+top_hits:
                       independent per-bucket top-n rankings
    GET  /rare_terms?q=...&max_df=2&limit=20        ES rare_terms: the
                       kept set's long-tail terms, rarest first
    GET  /extended_stats?q=...&col=doc_len          ES extended_stats:
                       exact moments + variance/std over the kept set
    GET  /percentile_ranks?q=...&col=doc_len&values=20,40   exact ES
                       percentile_ranks of the probe values
    GET  /cardinality?q=...&col=source              exact value_count +
                       distinct count over the kept set
    GET  /decay_search?q=...&col=doc_len&origin=30&scale=20&decay=gauss
                       ES function_score decay: BM25 * distance decay
    GET  /did_you_mean?q=...&max_dist=1   whole-query spell correction
                       (per-term best dictionary candidate + corrected
                       query string)
    GET  /multi_terms?q=...&keys=lang,source&limit=10   ES multi_terms:
                       compound-key buckets ordered by count desc
    GET  /adjacency_matrix?q=...&filters=name:col:value,...   ES
                       adjacency_matrix: per-filter + pairwise "a&b"
                       intersection counts (empty buckets omitted)
    GET  /weighted_avg?q=...   ES weighted_avg: doc_len weighted by the
                       doc's distinct-term count over the kept set
    GET  /matrix_stats?q=...   ES matrix_stats: covariance/correlation
                       of (doc_len, distinct-term count)
    GET  /boxplot?q=...&col=doc_len   ES boxplot: exact type-1
                       min/q1/q2/q3/max of a numeric column
    GET  /fvf_search?q=...&col=doc_len&factor=0.5&modifier=log1p
                       ES function_score field_value_factor: BM25 *
                       (factor * modifier(col))
    GET  /random_search?q=...&seed=s1   ES function_score random_score:
                       BM25 * deterministic per-(seed, doc_id) uniform
    GET  /termvectors?doc_id=N   ES _termvectors: the doc's indexed
                       terms with tf and corpus df
    GET  /composite_agg?q=...&keys=lang,source&size=10[&after=en,src2]
                       ES composite agg: keyset-paginated facet buckets
                       ("after" in the response carries the cursor)
    GET  /significant?q=...&limit=20&min_fg=2   significant terms of the
                       query's kept set vs the corpus background (JLH)
    GET  /search_after?q=...&limit=20[&after_score=S&after_doc=D]
                       keyset pagination: the next page strictly after
                       the cursor (raw scores; "next" carries the
                       follow-up cursor)
    GET  /similar?doc_id=N&m=5&limit=10   more-like-this retrieval
    GET  /stats                      (+ "jobs": queued/running/complete builds)
    GET  /health
    POST /index        {"input": DIR, "priority": 0-10, "phrase_index": bool}
                       -> 202 {"job_id": N}; a background worker thread
                       drains jobs highest-priority-first through the
                       checkpointed builder (api/server.py:196-221's
                       queue_index analog)
    POST /index/sync   same body -> blocks until built, returns n_docs +
                       duration (api/server.py:223-248's index_sync)
    POST /search/batch {"queries": {"id": "text", ...}, "limit": 10} ->
                       all queries scored in ONE DataFrame plan
                       (bm25_topk_batch — the throughput path; queries
                       whose max score is non-positive return [])
    POST /rank_eval    {"queries": {"name": "text", ...}, "k": 10} ->
                       the ES _rank_eval analog: per-query nDCG / MRR /
                       recall / precision / ERR of the served ranking
                       against corpus-derived graded labels
    POST /search/local {"input": DIR, "query": "...", "limit": 10} ->
                       ad-hoc BM25 over a pages directory that is not
                       the served index; first use (or a path change)
                       builds an in-memory index for it (the reference's
                       POST /search/local LocalSearchEngine semantics,
                       api/server.py:291-352)
    GET  /api          endpoint info map (api/server.py:101-108)

On completion the serving engine atomically swaps to the new index.
Validation semantics mirror the reference API (server.py:122-133):
invalid enum/filter values are silently DROPPED (``on_invalid='drop'``),
unlike the CLI which errors (cli/main.py:69-85) — both behaviors come
from the same ``SearchEngine.search`` flag. Quoted ``q`` runs the
exact-phrase path, like the CLI.

Single-threaded request handling by design: one SparkSession,
driver-side query planning; concurrency at serving scale comes from
running N replicas behind a balancer (the reference's worker-replica
model, ST7), not from threads sharing a driver. The ONE background
thread is the index worker — Spark supports concurrent job submission
from multiple driver threads, and the worker touches the engine only
through the atomic ``reload_index`` swap.
"""

from __future__ import annotations

import json
import queue as _queue
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse


class IndexJobManager:
    """The ``POST /index`` job queue: submitted builds drain through ONE
    daemon worker thread, highest priority first (FIFO within a
    priority) — the Spark analog of the reference's JobPublisher ->
    queue worker pipeline (queue/publisher.py:68-75, worker.py). Each
    job runs the checkpointed resumable builder, so the durable
    per-stage lineage is the index's ``_build_state`` table; this class
    only tracks queue-level status (queued/running/complete/failed),
    surfaced under ``/stats``'s ``jobs`` key."""

    def __init__(self, spark, index_dir: str, on_complete=None):
        self.spark = spark
        self.index_dir = index_dir
        self.on_complete = on_complete  # callback(new Index) after a build
        self.jobs: dict = {}
        self._lock = threading.Lock()
        self._next_id = 1
        self._q: _queue.PriorityQueue = _queue.PriorityQueue()
        self._worker: threading.Thread | None = None

    # -- public ----------------------------------------------------------
    def submit(self, input_path: str, priority: int = 5,
               phrase_index: bool = False) -> int:
        with self._lock:
            job_id = self._next_id
            self._next_id += 1
            self.jobs[job_id] = {
                "job_id": job_id, "input": input_path, "status": "queued",
                "priority": int(priority), "phrase_index": bool(phrase_index),
            }
        # PriorityQueue pops the smallest tuple: negate priority so
        # higher wins; job_id breaks ties FIFO
        self._q.put((-int(priority), job_id))
        self._ensure_worker()
        return job_id

    def run_sync(self, input_path: str, phrase_index: bool = False) -> dict:
        job_id = self.submit(input_path, phrase_index=phrase_index)
        # the worker thread owns execution (one build at a time even
        # when sync and async jobs interleave); block on this job
        while self.status(job_id)["status"] in ("queued", "running"):
            time.sleep(0.05)
        return self.status(job_id)

    def status(self, job_id: int) -> dict:
        with self._lock:
            job = self.jobs.get(job_id)
            return dict(job) if job else {"job_id": job_id, "status": "unknown"}

    def snapshot(self) -> list:
        with self._lock:
            return [dict(j) for _, j in sorted(self.jobs.items())]

    # -- worker ----------------------------------------------------------
    def _ensure_worker(self) -> None:
        with self._lock:
            if self._worker is None or not self._worker.is_alive():
                self._worker = threading.Thread(target=self._drain, daemon=True)
                self._worker.start()

    def _drain(self) -> None:
        while True:
            try:
                _, job_id = self._q.get(timeout=30)
            except _queue.Empty:
                # idle-exit handshake under the manager lock: submit()
                # enqueues then checks worker liveness under the same
                # lock, so either this worker sees the job (non-empty
                # queue -> keep draining) or it has already cleared
                # self._worker and submit starts a fresh one. Without
                # the handshake a job enqueued in the exit window would
                # strand 'queued' forever and wedge /index/sync.
                with self._lock:
                    if not self._q.empty():
                        continue
                    if self._worker is threading.current_thread():
                        self._worker = None
                    return
            self._run(job_id)

    def _run(self, job_id: int) -> None:
        from .build.checkpoint import build_index_persisted
        from .sources.tables import read_input_table

        with self._lock:
            job = self.jobs[job_id]
            job["status"] = "running"
            job["started_at"] = time.time()
        t0 = time.monotonic()
        try:
            pages = read_input_table(self.spark, job["input"])
            idx = build_index_persisted(
                self.spark, pages, self.index_dir,
                phrase_index=job["phrase_index"],
            )
            # swap BEFORE marking complete: "complete" must mean "built
            # AND serving", or a poller could see complete while the
            # engine still serves the old index
            if self.on_complete is not None:
                self.on_complete(idx)
            with self._lock:
                job.update(
                    status="complete",
                    n_docs=idx.n_docs,
                    duration_seconds=round(time.monotonic() - t0, 3),
                )
        except Exception as e:  # noqa: BLE001 - job status carries the error
            with self._lock:
                job.update(
                    status="failed",
                    error=f"{type(e).__name__}: {e}"[:2000],
                    duration_seconds=round(time.monotonic() - t0, 3),
                )


def make_handler(engine, stats_fn, index_manager=None):
    # POST /search/local state: one ad-hoc BM25-only index over the last
    # requested pages directory, rebuilt when the path changes (the
    # reference's LocalSearchEngine re-index-on-path-change semantics,
    # api/server.py:291-352 / engine.py:413-500)
    local_cache: dict = {}

    def _local_index(input_dir: str):
        if local_cache.get("path") != input_dir:
            from .build.indexer import build_index_inmem
            from .sources.tables import read_input_table

            # invalidate BOTH keys before building: a failed build must
            # leave an empty cache, not a 'path' with no 'index' (which
            # would poison every later request for the old working path
            # with a KeyError instead of rebuilding it)
            local_cache.pop("path", None)
            old = local_cache.pop("index", None)
            if old is not None:
                for df in (old.tf, old.docs, old.terms):
                    try:
                        df.unpersist()
                    except Exception:  # noqa: BLE001 - cache hygiene only
                        pass
            local_cache["index"] = build_index_inmem(
                engine.index.spark, read_input_table(engine.index.spark, input_dir)
            )
            local_cache["path"] = input_dir
        return local_cache["index"]

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet
            pass

        def do_POST(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, TypeError) as e:
                return self._send(400, {"error": f"bad JSON body: {e}"})
            if url.path == "/percolate":
                # the ES percolate API: match a DOCUMENT against a
                # registered query set (quoted phrases verified for
                # adjacency). Body: {"text": "...", "queries":
                # {"name": "query", ...}}
                from pyspark.sql import functions as F

                from .functions.udfs import tokenize_udf
                from .operators.percolate import percolate_phrase

                if not isinstance(body, dict) or not isinstance(
                    body.get("queries"), dict
                ) or not body["queries"] or "text" not in body:
                    return self._send(400, {
                        "error": "body must carry 'text' and a "
                        "non-empty 'queries' map"
                    })
                try:
                    names = list(body["queries"].keys())
                    qmap = {i: str(q) for i, q in enumerate(body["queries"].values())}
                    doc = engine.index.spark.createDataFrame(
                        [(0, str(body["text"]))], "doc_id long, text string"
                    ).select("doc_id", tokenize_udf("text").alias("tokens"))
                    hits = percolate_phrase(doc, qmap).collect()
                    matched = sorted(names[r["query_id"]] for r in hits)
                    return self._send(200, {"matched_queries": matched})
                except Exception as e:  # noqa: BLE001 - reference: no 500 bodies
                    return self._send(200, {"matched_queries": [], "error": str(e)})
            if url.path == "/search/batch":
                # multi-query scoring in ONE DataFrame plan — the
                # engine's highest-throughput path (bm25_topk_batch:
                # one broadcast of all query terms, per-query windows).
                # Body: {"queries": {"id": "text", ...}, "limit": 10}
                from .operators.scorer import bm25_topk_batch

                if not isinstance(body, dict) or not isinstance(
                    body.get("queries"), dict
                ) or not body["queries"]:
                    return self._send(
                        400, {"error": "body must carry a non-empty 'queries' map"}
                    )
                try:
                    limit = int(body.get("limit", 10))
                    qmap = {i: str(q) for i, q in enumerate(body["queries"].values())}
                    names = list(body["queries"].keys())
                    res = bm25_topk_batch(engine.index, qmap, k=limit)
                    out: dict = {name: [] for name in names}
                    for r in res.collect():
                        out[names[r["query_id"]]].append(
                            {"rank": r["rank"], "doc_id": r["doc_id"],
                             "score": r["score"]}
                        )
                    return self._send(200, {"results": out})
                except Exception as e:  # noqa: BLE001 - reference: no 500 bodies
                    return self._send(200, {"results": {}, "error": str(e)})
            if url.path == "/rank_eval":
                # the ES _rank_eval API: run the batch ranking for the
                # given queries and score it against the corpus-derived
                # graded labels. Body: {"queries": {"name": "text"},
                # "k": 10} -> per-query ndcg/mrr/recall/precision/err
                if not isinstance(body, dict) or not isinstance(
                    body.get("queries"), dict
                ) or not body["queries"]:
                    return self._send(
                        400, {"error": "body must carry a non-empty 'queries' map"}
                    )
                qmap = {i: str(q) for i, q in enumerate(body["queries"].values())}
                names = list(body["queries"].keys())
                rows = engine.rank_eval(qmap, k=int(body.get("k", 10))).collect()
                by_qid = {r["query_id"]: r for r in rows}
                out = {}
                for i, name in enumerate(names):
                    r = by_qid.get(i)
                    # a query whose every token is OOV produces no
                    # batch rows and no labels — all-zero metrics
                    out[name] = (
                        {k2: r[k2] for k2 in
                         ("ndcg", "mrr", "recall", "precision", "err")}
                        if r is not None
                        else {"ndcg": 0.0, "mrr": 0.0, "recall": 0.0,
                              "precision": 0.0, "err": 0.0}
                    )
                return self._send(200, {"metrics": out})
            if url.path == "/search/local":
                # ad-hoc BM25 search over a pages directory that is not
                # the served index; first use (or a path change) builds
                # an in-memory index for it (reference POST /search/local)
                if not isinstance(body, dict) or not body.get("input") or not body.get("query"):
                    return self._send(
                        400, {"error": "need 'input' (pages dir) and 'query'"}
                    )
                try:
                    from .operators.scorer import bm25_topk

                    idx = _local_index(str(body["input"]))
                    rows = bm25_topk(
                        idx, str(body["query"]), k=int(body.get("limit", 10))
                    ).collect()
                    return self._send(200, {
                        "query": body["query"], "input": body["input"],
                        "indexed_docs": idx.n_docs,
                        "results": [r.asDict() for r in rows],
                    })
                except Exception as e:  # noqa: BLE001 - reference: no 500 bodies
                    return self._send(200, {"results": [], "error": str(e)})
            if url.path in ("/index", "/index/sync"):
                if index_manager is None:
                    return self._send(
                        400, {"error": "indexing disabled (no index manager)"}
                    )
                if not isinstance(body, dict) or not body.get("input"):
                    return self._send(400, {"error": "missing 'input' (pages dir)"})
                try:
                    if url.path == "/index":
                        job_id = index_manager.submit(
                            str(body["input"]),
                            priority=int(body.get("priority", 5)),
                            phrase_index=bool(body.get("phrase_index", False)),
                        )
                        return self._send(202, {
                            "success": True, "job_id": job_id,
                            "message": f"build queued for {body['input']}",
                        })
                    res = index_manager.run_sync(
                        str(body["input"]),
                        phrase_index=bool(body.get("phrase_index", False)),
                    )
                    res["success"] = res.get("status") == "complete"
                    return self._send(200, res)
                except Exception as e:  # noqa: BLE001 - reference: no 500 bodies
                    return self._send(200, {"success": False, "error": str(e)})
            return self._send(404, {"error": f"unknown path {url.path}"})

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                if url.path == "/":
                    # static GUI, like the reference's `/` -> index.html
                    # (api/server.py:87-99); JSON fallback if missing
                    import os

                    page = os.path.join(
                        os.path.dirname(__file__), "static", "index.html"
                    )
                    if os.path.exists(page):
                        with open(page, "rb") as f:
                            body = f.read()
                        self.send_response(200)
                        self.send_header("Content-Type", "text/html; charset=utf-8")
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                        return None
                    return self._send(
                        200,
                        {"name": "spark-bm25 API", "gui": "static/index.html missing"},
                    )
                if url.path == "/api":
                    # API info map (reference api/server.py:101-108)
                    return self._send(200, {
                        "name": "spark-bm25 API",
                        "endpoints": {
                            "GET /search": "query the served index "
                            "(offset= pages; collapse=<field>&per_group=n "
                            "diversifies; len_min/len_max range-filter; "
                            "msm=N minimum_should_match)",
                            "GET /count": "total hits over the kept set",
                            "GET /rerank": "two-stage cross-encoder rerank",
                            "GET /explain": "per-term score breakdown",
                            "GET /suggest": "term autocomplete",
                            "GET /autocomplete": "search-as-you-type "
                            "bigram/ctf completion of the typed text",
                            "GET /phrase_suggest": "context-aware "
                            "whole-phrase spell correction (bigram LM)",
                            "GET /ltr_search": "learning-to-rank "
                            "rescored search (linear feature model)",
                            "GET /maxsim": "ColBERT MaxSim "
                            "late-interaction search over chunk "
                            "embeddings",
                            "POST /percolate": "reverse search: match "
                            "a document against a stored-query map "
                            "(phrases adjacency-verified)",
                            "GET /similarity": "top-k under a non-Okapi "
                            "similarity: model=lmd|lmjm|dfr|ib",
                            "GET /distance_search": "BM25 + "
                            "distance_feature geo-proximity boost "
                            "(lat=, lon=, pivot_km=, boost=)",
                            "GET /rank_feature": "BM25 + rank_feature "
                            "additive boost (function=saturation|log|"
                            "sigmoid, pivot=, boost=)",
                            "GET /facets": "facet counts for a query",
                            "GET /histogram": "numeric-bucket histogram "
                            "over the query's kept set",
                            "GET /stats_agg": "min/max/sum/avg stats of a "
                            "numeric column over the kept set",
                            "GET /range_agg": "explicit-bounds range "
                            "buckets over the kept set",
                            "GET /filters_agg": "named equality-filter "
                            "buckets over the kept set",
                            "GET /top_hits": "per-bucket independent "
                            "top-n rankings over the kept set",
                            "GET /rare_terms": "rarest kept-set terms, "
                            "ascending count",
                            "GET /extended_stats": "exact moments + "
                            "variance/std over the kept set",
                            "GET /percentile_ranks": "exact percentile "
                            "ranks of probe values",
                            "GET /cardinality": "exact value_count + "
                            "distinct count over the kept set",
                            "GET /decay_search": "BM25 rescored by a "
                            "gauss/linear decay of a numeric column",
                            "GET /did_you_mean": "whole-query spell "
                            "correction via SymSpell deletion keys",
                            "GET /multi_terms": "compound-key buckets "
                            "ordered by count over the kept set",
                            "GET /adjacency_matrix": "named filters + "
                            "pairwise intersections (empty omitted)",
                            "GET /weighted_avg": "doc_len weighted by "
                            "distinct-term count over the kept set",
                            "GET /matrix_stats": "covariance/correlation "
                            "of (doc_len, distinct terms)",
                            "GET /boxplot": "exact type-1 quartiles of a "
                            "numeric column over the kept set",
                            "GET /fvf_search": "BM25 * field_value_factor "
                            "(log1p/sqrt/none modifier)",
                            "GET /random_search": "BM25 * seeded "
                            "deterministic random_score",
                            "GET /termvectors": "per-document term vector "
                            "with corpus df",
                            "GET /query_string": "Lucene query_string "
                            'mini-language: +must -not "phrase" pre* w~1 '
                            "term^2.5 lang:en",
                            "GET /boosting": "ES boosting query: "
                            "positive= ranking, negative= matches "
                            "demoted by negative_boost=",
                            "GET /span_not": "include= spans outside "
                            "the pre=/post= window of every exclude= "
                            "span (Lucene SpanNotQuery)",
                            "GET /pit_open": "pin the served index "
                            "snapshot under a point-in-time id",
                            "GET /pit_search": "search a pinned "
                            "snapshot (pit=, q=) — immune to reloads",
                            "GET /pit_close": "release a pit id",
                            "GET /validate": "parse/classify q= "
                            "without executing (ES _validate/query)",
                            "GET /field_caps": "searchable/aggregatable "
                            "fields + types (ES _field_caps)",
                            "GET /knn": "exact cosine kNN of q='s "
                            "embedding (lang= filters during search)",
                            "GET /regexp_search": "whole-term regexp query "
                            "(capped dictionary expansion)",
                            "GET /constant_score": "filter context: every "
                            "match scores exactly boost",
                            "GET /span_first": "term within the first N "
                            "positions (Lucene SpanFirstQuery)",
                            "GET /analyze": "ordered (pos, token) stream "
                            "for text= or doc_id=",
                            "GET /terms_enum": "dictionary prefix "
                            "enumeration, after= keyset pagination",
                            "GET /pinned": "ids= promotions first in "
                            "provided order, organic fills the rest",
                            "GET /sampler": "terms agg over the best "
                            "shard_size kept docs (dedup_field= diversifies)",
                            "GET /rescore": "top-window re-rank by base + "
                            "weight * phrase occurrences",
                            "GET /phrase_prefix": "match_phrase_prefix: "
                            "last token expands as a prefix",
                            "GET /mget": "multi-document fetch by ids=1,2,3",
                            "GET /composite_agg": "keyset-paginated "
                            "facet buckets (cursor in 'after')",
                            "GET /significant": "significant terms of the "
                            "query's result set",
                            "GET /search_after": "keyset pagination "
                            "(after_score+after_doc cursor, raw scores)",
                            "GET /similar": "more-like-this for a doc_id",
                            "GET /stats": "corpus + build/job status",
                            "GET /health": "liveness",
                            "POST /search/batch": "multi-query, one plan",
                            "POST /rank_eval": "ranking quality metrics",
                            "POST /search/local": "ad-hoc dir search",
                            "POST /index": "queue a build",
                            "POST /index/sync": "blocking build",
                        },
                    })
                if url.path == "/health":
                    return self._send(200, {"status": "ok"})
                if url.path == "/stats":
                    # job status must stay readable even while a build
                    # is rewriting the index files the stats queries
                    # read (transient failures are expected mid-build)
                    try:
                        payload = stats_fn()
                    except Exception as e:  # noqa: BLE001
                        payload = {"error": f"stats unavailable: {e}"[:500]}
                    if index_manager is not None:
                        payload["jobs"] = index_manager.snapshot()
                    return self._send(200, payload)
                if url.path == "/suggest":
                    from .operators.snippets import term_suggest

                    rows = term_suggest(
                        engine.index.terms,
                        q.get("prefix", ""),
                        k=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"suggestions": [
                            {"term": r["term"], "df": r["df"]} for r in rows
                        ]},
                    )
                if url.path == "/similarity":
                    if "q" not in q:
                        return self._send(400, {"error": "q parameter required"})
                    res = engine.similarity_search(
                        q["q"], model=q.get("model", "dfr"),
                        limit=int(q.get("limit", 10)),
                        lang=q.get("lang"), site=q.get("site"),
                        source=q.get("source"),
                    )
                    rows = [r.asDict() for r in res.collect()]
                    return self._send(200, {
                        "query": q["q"], "model": q.get("model", "dfr"),
                        "results": rows,
                    })
                if url.path == "/phrase_suggest":
                    if "q" not in q:
                        return self._send(400, {"error": "q parameter required"})
                    rows = engine.phrase_suggest(
                        q["q"], limit=int(q.get("limit", 5)),
                        max_cands=int(q.get("max_cands", 2)),
                    ).collect()
                    return self._send(200, {"query": q["q"], "suggestions": [
                        {"text": r["suggestion"], "score": r["score"],
                         "n_changed": r["n_changed"]} for r in rows
                    ]})
                if url.path == "/ltr_search":
                    if "q" not in q:
                        return self._send(400, {"error": "q parameter required"})
                    res = engine.ltr_search(
                        q["q"], limit=int(q.get("limit", 10)),
                        window_size=int(q.get("window", 20)),
                    )
                    rows = [r.asDict() for r in res.collect()]
                    return self._send(200, {"query": q["q"], "results": rows})
                if url.path == "/maxsim":
                    if "q" not in q:
                        return self._send(400, {"error": "q parameter required"})
                    rows = [r.asDict() for r in engine.maxsim(
                        q["q"], limit=int(q.get("limit", 10))).collect()]
                    return self._send(200, {"query": q["q"], "results": rows})
                if url.path == "/autocomplete":
                    if "q" not in q:
                        return self._send(400, {"error": "q parameter required"})
                    rows = engine.autocomplete(
                        q["q"], limit=int(q.get("limit", 10)),
                        lang=q.get("lang"),
                    ).collect()
                    return self._send(200, {"suggestions": [
                        {"text": r["suggestion"], "count": r["cnt"]}
                        for r in rows
                    ]})
                if url.path == "/distance_search":
                    for p in ("q", "lat", "lon"):
                        if p not in q:
                            return self._send(
                                400, {"error": f"{p} parameter required"}
                            )
                    res = engine.distance_search(
                        q["q"], float(q["lat"]), float(q["lon"]),
                        pivot_km=float(q.get("pivot_km", 1000.0)),
                        boost=float(q.get("boost", 5.0)),
                        limit=int(q.get("limit", 10)),
                    )
                    rows = [r.asDict() for r in res.collect()]
                    return self._send(200, {"query": q["q"], "results": rows})
                if url.path == "/rank_feature":
                    if "q" not in q:
                        return self._send(400, {"error": "q parameter required"})
                    res = engine.rank_feature_search(
                        q["q"], col=q.get("col", "doc_len"),
                        function=q.get("function", "saturation"),
                        pivot=float(q.get("pivot", 40.0)),
                        boost=float(q.get("boost", 2.0)),
                        exponent=float(q.get("exponent", 2.0)),
                        limit=int(q.get("limit", 10)),
                    )
                    rows = [r.asDict() for r in res.collect()]
                    return self._send(200, {"query": q["q"], "results": rows})
                if url.path == "/facets":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.facets(q["q"]).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "facets": [r.asDict() for r in rows]},
                    )
                if url.path == "/stats_agg":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    row = engine.stats_agg(
                        q["q"], col=q.get("col", "doc_len")
                    ).first()
                    return self._send(
                        200,
                        {"query": q["q"],
                         "stats": row.asDict() if row is not None else None},
                    )
                if url.path == "/histogram":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.histogram(
                        q["q"],
                        col=q.get("col", "doc_len"),
                        interval=int(q.get("interval", 50)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "buckets": [r.asDict() for r in rows]},
                    )
                if url.path == "/range_agg":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    cuts = tuple(
                        int(c) for c in q.get("cuts", "20,40").split(",") if c
                    )
                    rows = engine.range_agg(
                        q["q"], col=q.get("col", "doc_len"), cuts=cuts
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "buckets": [r.asDict() for r in rows]},
                    )
                if url.path == "/filters_agg":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    # buckets=name:col:value,name:col:value
                    try:
                        buckets = {}
                        for part in q.get("buckets", "").split(","):
                            name, col, val = part.split(":")
                            buckets[name] = (col, val)
                    except ValueError:
                        return self._send(
                            400,
                            {"error": "buckets must be "
                             "name:col:value[,name:col:value...]"},
                        )
                    rows = engine.filters_agg(q["q"], buckets).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "buckets": [r.asDict() for r in rows]},
                    )
                if url.path == "/top_hits":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.top_hits(
                        q["q"],
                        key=q.get("key", "lang"),
                        per_bucket=int(q.get("per_bucket", 3)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "hits": [r.asDict() for r in rows]},
                    )
                if url.path == "/rare_terms":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.rare_terms(
                        q["q"],
                        max_df=int(q.get("max_df", 2)),
                        limit=int(q.get("limit", 20)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "terms": [r.asDict() for r in rows]},
                    )
                if url.path == "/extended_stats":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    row = engine.extended_stats(
                        q["q"], col=q.get("col", "doc_len")
                    ).first()
                    return self._send(
                        200,
                        {"query": q["q"],
                         "stats": row.asDict() if row is not None else None},
                    )
                if url.path == "/percentile_ranks":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    values = tuple(
                        int(v) for v in q.get("values", "20,40").split(",") if v
                    )
                    rows = engine.percentile_ranks(
                        q["q"], col=q.get("col", "doc_len"), values=values
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "ranks": [r.asDict() for r in rows]},
                    )
                if url.path == "/cardinality":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    row = engine.cardinality(
                        q["q"], col=q.get("col")
                    ).first()
                    return self._send(
                        200,
                        {"query": q["q"],
                         "cardinality":
                             row.asDict() if row is not None else None},
                    )
                if url.path == "/decay_search":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.decay_search(
                        q["q"],
                        col=q.get("col", "doc_len"),
                        origin=int(q.get("origin", 30)),
                        scale=int(q.get("scale", 20)),
                        decay=q.get("decay", "gauss"),
                        limit=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/multi_terms":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    keys = tuple(
                        k for k in q["keys"].split(",") if k
                    ) if "keys" in q else None
                    rows = engine.multi_terms(
                        q["q"], keys=keys, limit=int(q.get("limit", 10))
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "buckets": [r.asDict() for r in rows]},
                    )
                if url.path == "/adjacency_matrix":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    # filters=name:col:value,name:col:value
                    try:
                        filters = {}
                        for part in q.get("filters", "").split(","):
                            name, col, val = part.split(":")
                            filters[name] = (col, val)
                    except ValueError:
                        return self._send(
                            400,
                            {"error": "filters must be "
                             "name:col:value[,name:col:value...]"},
                        )
                    rows = engine.adjacency_matrix(q["q"], filters).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "buckets": [r.asDict() for r in rows]},
                    )
                if url.path == "/weighted_avg":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    row = engine.weighted_avg(q["q"]).first()
                    return self._send(
                        200,
                        {"query": q["q"],
                         "weighted_avg":
                             row.asDict() if row is not None else None},
                    )
                if url.path == "/matrix_stats":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    row = engine.matrix_stats(q["q"]).first()
                    return self._send(
                        200,
                        {"query": q["q"],
                         "matrix_stats":
                             row.asDict() if row is not None else None},
                    )
                if url.path == "/boxplot":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.boxplot(
                        q["q"], col=q.get("col", "doc_len")
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"],
                         "boxplot": {r["stat"]: r["value"] for r in rows}},
                    )
                if url.path == "/fvf_search":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.fvf_search(
                        q["q"],
                        col=q.get("col", "doc_len"),
                        factor=float(q.get("factor", 0.5)),
                        modifier=q.get("modifier", "log1p"),
                        limit=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/random_search":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.random_search(
                        q["q"],
                        seed=q.get("seed", "0"),
                        limit=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/termvectors":
                    if "doc_id" not in q:
                        return self._send(400, {"error": "missing doc_id"})
                    rows = engine.term_vectors(int(q["doc_id"])).collect()
                    return self._send(
                        200,
                        {"doc_id": int(q["doc_id"]), "found": bool(rows),
                         "terms": [r.asDict() for r in rows]},
                    )
                if url.path == "/span_not":
                    if "include" not in q or "exclude" not in q:
                        return self._send(
                            400, {"error": "need include= and exclude="}
                        )
                    rows = engine.span_not(
                        q["include"], q["exclude"],
                        pre=int(q.get("pre", 0)), post=int(q.get("post", 0)),
                        limit=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"include": q["include"], "exclude": q["exclude"],
                         "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/pit_open":
                    return self._send(200, {"pit_id": engine.open_pit()})
                if url.path == "/pit_close":
                    if "id" not in q:
                        return self._send(400, {"error": "missing id"})
                    return self._send(
                        200, {"closed": engine.close_pit(q["id"])}
                    )
                if url.path == "/pit_search":
                    if "pit" not in q or "q" not in q:
                        return self._send(400, {"error": "need pit= and q="})
                    rows = engine.search_pit(
                        q["pit"], q["q"], limit=int(q.get("limit", 10)),
                        lang=q.get("lang"), site=q.get("site"),
                        source=q.get("source"),
                    ).collect()
                    return self._send(
                        200,
                        {"pit_id": q["pit"], "query": q["q"],
                         "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/validate":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    return self._send(200, engine.validate(q["q"]))
                if url.path == "/field_caps":
                    return self._send(200, {"fields": engine.field_caps()})
                if url.path == "/boosting":
                    if "positive" not in q or "negative" not in q:
                        return self._send(
                            400, {"error": "need positive= and negative="}
                        )
                    rows = engine.boosting(
                        q["positive"], q["negative"],
                        negative_boost=float(q.get("negative_boost", 0.5)),
                        limit=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"positive": q["positive"], "negative": q["negative"],
                         "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/knn":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    mode = q.get("mode", "exact")
                    if mode not in engine.KNN_MODES:
                        return self._send(400, {
                            "error": f"unknown mode {mode!r}; "
                            f"valid: {'/'.join(engine.KNN_MODES)}"
                        })
                    ms = q.get("similarity")
                    rows = engine.knn(
                        q["q"], limit=int(q.get("limit", 10)),
                        lang=q.get("lang"), mode=mode,
                        min_sim=float(ms) if ms is not None else None,
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "mode": mode,
                         "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/query_string":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.query_string(
                        q["q"], limit=int(q.get("limit", 10)),
                        lang=q.get("lang"), site=q.get("site"),
                        source=q.get("source"),
                        max_expansions=int(q.get("max_expansions", 16)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"],
                         "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/regexp_search":
                    if "pattern" not in q:
                        return self._send(400, {"error": "missing pattern"})
                    rows = engine.regexp_search(
                        q["pattern"], limit=int(q.get("limit", 10)),
                        max_expansions=int(q.get("max_expansions", 16)),
                    ).collect()
                    return self._send(
                        200,
                        {"pattern": q["pattern"],
                         "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/constant_score":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.constant_score(
                        q["q"], boost=float(q.get("boost", 1.5)),
                        limit=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/span_first":
                    if "term" not in q:
                        return self._send(400, {"error": "missing term"})
                    rows = engine.span_first(
                        q["term"], end=int(q.get("end", 3)),
                        limit=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"term": q["term"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/analyze":
                    if ("text" in q) == ("doc_id" in q):
                        return self._send(
                            400, {"error": "exactly one of text / doc_id"}
                        )
                    rows = engine.analyze(
                        text=q.get("text"),
                        doc_id=int(q["doc_id"]) if "doc_id" in q else None,
                    ).collect()
                    return self._send(
                        200, {"tokens": [r.asDict() for r in rows]}
                    )
                if url.path == "/pinned":
                    if "q" not in q or "ids" not in q:
                        return self._send(400, {"error": "missing q / ids"})
                    try:
                        ids = [int(x) for x in q["ids"].split(",") if x != ""]
                    except ValueError:
                        return self._send(
                            400, {"error": f"bad ids {q['ids']!r}"}
                        )
                    rows = engine.pinned(
                        q["q"], ids, limit=int(q.get("limit", 10))
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/terms_set":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.terms_set(
                        q["q"], limit=int(q.get("limit", 10)),
                        lang=q.get("lang"), site=q.get("site"),
                        source=q.get("source"),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/terms_enum":
                    if "prefix" not in q:
                        return self._send(400, {"error": "missing prefix"})
                    rows = engine.terms_enum(
                        q["prefix"], size=int(q.get("size", 10)),
                        search_after=q.get("after"),
                    ).collect()
                    terms = [r.term for r in rows]
                    return self._send(
                        200,
                        {
                            "prefix": q["prefix"],
                            "terms": terms,
                            "next_after": terms[-1] if terms else None,
                        },
                    )
                if url.path == "/sampler":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.sampler(
                        q["q"], key=q.get("key"),
                        shard_size=int(q.get("shard_size", 50)),
                        limit=int(q.get("limit", 10)),
                        dedup_field=q.get("dedup_field"),
                        max_docs_per_value=int(q.get("max_docs_per_value", 1)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "buckets": [r.asDict() for r in rows]},
                    )
                if url.path == "/phrase_prefix":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.phrase_prefix(
                        q["q"], limit=int(q.get("limit", 10)),
                        max_expansions=int(q.get("max_expansions", 8)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/mget":
                    if "ids" not in q:
                        return self._send(400, {"error": "missing ids"})
                    try:
                        ids = [int(x) for x in q["ids"].split(",") if x != ""]
                    except ValueError:
                        return self._send(400, {"error": "ids must be ints"})
                    rows = engine.mget(ids).collect()
                    return self._send(
                        200, {"docs": [r.asDict() for r in rows]}
                    )
                if url.path == "/rescore":
                    if "q" not in q or "phrase" not in q:
                        return self._send(400, {"error": "missing q / phrase"})
                    rows = engine.rescore(
                        q["q"], q["phrase"],
                        window_size=int(q.get("window", 20)),
                        rescore_weight=float(q.get("weight", 2.0)),
                        limit=int(q.get("limit", 10)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "results": [r.asDict() for r in rows]},
                    )
                if url.path == "/did_you_mean":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.did_you_mean(
                        q["q"], max_dist=int(q.get("max_dist", 1))
                    ).collect()
                    ordered = sorted(rows, key=lambda r: r["pos"])
                    corrected = " ".join(r["suggestion"] for r in ordered)
                    return self._send(
                        200,
                        {"query": q["q"], "corrected": corrected,
                         "any_corrected": any(r["corrected"] for r in rows),
                         "terms": [r.asDict() for r in ordered]},
                    )
                if url.path == "/composite_agg":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    keys = tuple(
                        k for k in q["keys"].split(",") if k
                    ) if "keys" in q else None
                    after = None
                    if "after" in q:
                        # JSON-array cursor (round-trips any value the
                        # operator accepts); bare comma form kept as a
                        # convenience for simple values
                        a = q["after"]
                        if a.startswith("["):
                            after = tuple(json.loads(a))
                        else:
                            after = tuple(a.split(","))
                    # the engine resolves schema-aware default keys; the
                    # cursor extraction below needs the SAME resolution
                    keys = engine._default_keys(keys)
                    rows = engine.composite_agg(
                        q["q"], keys=keys, size=int(q.get("size", 10)),
                        after=after,
                    ).collect()
                    out = [r.asDict() for r in rows]
                    nxt = None
                    # a NULL key value cannot be a keyset cursor — stop
                    # paginating rather than emit a stringified None
                    if out and all(out[-1][k] is not None for k in keys):
                        nxt = json.dumps([out[-1][k] for k in keys])
                    return self._send(
                        200,
                        {"query": q["q"], "buckets": out, "after": nxt},
                    )
                if url.path == "/search_after":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    has_s, has_d = "after_score" in q, "after_doc" in q
                    if has_s != has_d:
                        return self._send(
                            400,
                            {"error": "after_score and after_doc must be "
                             "passed together"},
                        )
                    res = engine.search_after(
                        q["q"],
                        limit=int(q.get("limit", 20)),
                        after_score=float(q["after_score"]) if has_s else None,
                        after_doc=int(q["after_doc"]) if has_d else None,
                        lang=q.get("lang"),
                        site=q.get("site"),
                        source=q.get("source"),
                    )
                    rows = [r.asDict() for r in res.collect()]
                    nxt = None
                    if rows:
                        nxt = {
                            "after_score": rows[-1]["score"],
                            "after_doc": rows[-1]["doc_id"],
                        }
                    return self._send(
                        200,
                        {"query": q["q"], "results": rows, "next": nxt},
                    )
                if url.path == "/significant":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.significant(
                        q["q"],
                        limit=int(q.get("limit", 20)),
                        min_fg=int(q.get("min_fg", 2)),
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "terms": [r.asDict() for r in rows]},
                    )
                if url.path == "/similar":
                    if "doc_id" not in q:
                        return self._send(400, {"error": "missing doc_id"})
                    res = engine.similar(
                        int(q["doc_id"]),
                        m=int(q.get("m", 5)),
                        limit=int(q.get("limit", 10)),
                    )
                    rows = [r.asDict() for r in res.collect()]
                    return self._send(
                        200, {"doc_id": int(q["doc_id"]), "results": rows}
                    )
                if url.path == "/rerank":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    from .functions.rerank import cross_rerank

                    rows = cross_rerank(
                        engine.index, q["q"],
                        k=int(q.get("limit", 10)),
                        depth=int(q.get("depth", 30)),
                    ).collect()
                    return self._send(
                        200, {"query": q["q"], "results": [r.asDict() for r in rows]}
                    )
                if url.path == "/count":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    out = engine.count(
                        q["q"], lang=q.get("lang"), site=q.get("site"),
                        source=q.get("source"),
                    )
                    return self._send(200, {"query": q["q"], **out})
                if url.path == "/explain":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    rows = engine.explain(
                        q["q"], limit=int(q.get("limit", 10))
                    ).collect()
                    return self._send(
                        200,
                        {"query": q["q"], "explanations": [r.asDict() for r in rows]},
                    )
                if url.path == "/search":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    # the specialized branches (collapse / msm / range)
                    # don't implement offset paging, alternate scorers,
                    # or hybrid fusion — reject the combination instead
                    # of silently ignoring the parameter (ADVICE r4)
                    special = [k for k in ("collapse", "msm", "len_min",
                                           "len_max", "sort") if k in q]
                    if special:
                        unsupported = [
                            p for p in ("offset", "scorer", "hybrid")
                            if p in q
                        ]
                        if unsupported:
                            return self._send(400, {
                                "error": f"{'/'.join(unsupported)} not "
                                f"supported with {'/'.join(special)}"
                            })
                    if "collapse" in q:
                        res = engine.collapse(
                            q["q"], field=q["collapse"],
                            per_group=int(q.get("per_group", 1)),
                            limit=int(q.get("limit", 10)),
                            lang=q.get("lang"), site=q.get("site"),
                            source=q.get("source"),
                        )
                        rows = [r.asDict() for r in res.collect()]
                        return self._send(200, {"query": q["q"], "results": rows})
                    if "sort" in q:
                        # ES sort option: "field" or "field:asc|desc"
                        parts = q["sort"].split(":")
                        fld = parts[0]
                        direc = parts[1] if len(parts) > 1 else "desc"
                        if direc not in ("asc", "desc"):
                            return self._send(400, {
                                "error": f"bad sort direction {direc!r}"
                            })
                        try:
                            res = engine.search_sorted(
                                q["q"], sort=fld, asc=(direc == "asc"),
                                limit=int(q.get("limit", 10)),
                            )
                        except ValueError as e:
                            return self._send(400, {"error": str(e)})
                        rows = [r.asDict() for r in res.collect()]
                        return self._send(200, {"query": q["q"], "results": rows})
                    if "msm" in q:
                        res = engine.search_msm(
                            q["q"], limit=int(q.get("limit", 10)),
                            msm=int(q["msm"]),
                            lang=q.get("lang"), site=q.get("site"),
                            source=q.get("source"),
                        )
                        rows = [r.asDict() for r in res.collect()]
                        return self._send(200, {"query": q["q"], "results": rows})
                    if "len_min" in q or "len_max" in q:
                        lo = int(q["len_min"]) if "len_min" in q else None
                        hi = int(q["len_max"]) if "len_max" in q else None
                        res = engine.search_range(
                            q["q"], limit=int(q.get("limit", 10)),
                            ranges={"doc_len": (lo, hi)},
                            lang=q.get("lang"), site=q.get("site"),
                            source=q.get("source"),
                        )
                        rows = [r.asDict() for r in res.collect()]
                        return self._send(200, {"query": q["q"], "results": rows})
                    res = engine.search(
                        q["q"],
                        limit=int(q.get("limit", 10)),
                        lang=q.get("lang"),
                        site=q.get("site"),
                        source=q.get("source"),
                        use_hybrid=q.get("hybrid", "0") in ("1", "true"),
                        scorer=q.get("scorer", "auto"),
                        on_invalid="drop",  # reference API semantics
                        offset=int(q.get("offset", 0)),
                    )
                    rows = [r.asDict() for r in res.collect()]
                    return self._send(200, {"query": q["q"], "results": rows})
                return self._send(404, {"error": f"unknown path {url.path}"})
            except ValueError as e:  # unknown scorer still errors (F8)
                return self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 - mirror reference: no 500 bodies
                return self._send(200, {"results": [], "error": str(e)})

    return Handler


def serve(engine, stats_fn, port: int = 8099, host: str = "127.0.0.1",
          index_manager=None):
    """-> an ``HTTPServer`` (caller runs ``serve_forever`` or, in tests,
    ``handle_request`` on a thread). ``index_manager`` enables the
    ``POST /index`` surface."""
    return HTTPServer(
        (host, port), make_handler(engine, stats_fn, index_manager=index_manager)
    )
