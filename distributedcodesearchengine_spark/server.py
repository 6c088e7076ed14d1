"""Minimal REST surface — the analog of the reference's FastAPI server
(``codesearch/api/server.py:110-176`` /search, ``:250-280`` /stats),
stdlib-only (``http.server``; this sandbox has no FastAPI/uvicorn, and
the engine needs no web framework: every endpoint is one engine call).

    python -m distributedcodesearchengine_spark serve --index DIR --port 8099

Endpoints (GET, JSON responses):

    /search?q=...&limit=10&lang=en&site=...&source=...&hybrid=1&scorer=exact
    /suggest?prefix=al&limit=10
    /stats
    /health

Validation semantics mirror the reference API (server.py:122-133):
invalid enum/filter values are silently DROPPED (``on_invalid='drop'``),
unlike the CLI which errors (cli/main.py:69-85) — both behaviors come
from the same ``SearchEngine.search`` flag. Quoted ``q`` runs the
exact-phrase path, like the CLI.

Single-threaded by design: one SparkSession, driver-side query
planning; concurrency at serving scale comes from running N replicas
behind a balancer (the reference's worker-replica model, ST7), not from
threads sharing a driver.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse


def make_handler(engine, stats_fn):
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

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                if url.path == "/health":
                    return self._send(200, {"status": "ok"})
                if url.path == "/stats":
                    return self._send(200, stats_fn())
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
                if url.path == "/search":
                    if "q" not in q:
                        return self._send(400, {"error": "missing q"})
                    res = engine.search(
                        q["q"],
                        limit=int(q.get("limit", 10)),
                        lang=q.get("lang"),
                        site=q.get("site"),
                        source=q.get("source"),
                        use_hybrid=q.get("hybrid", "0") in ("1", "true"),
                        scorer=q.get("scorer", "exact"),
                        on_invalid="drop",  # reference API semantics
                    )
                    rows = [r.asDict() for r in res.collect()]
                    return self._send(200, {"query": q["q"], "results": rows})
                return self._send(404, {"error": f"unknown path {url.path}"})
            except ValueError as e:  # unknown scorer still errors (F8)
                return self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 - mirror reference: no 500 bodies
                return self._send(200, {"results": [], "error": str(e)})

    return Handler


def serve(engine, stats_fn, port: int = 8099, host: str = "127.0.0.1"):
    """-> an ``HTTPServer`` (caller runs ``serve_forever`` or, in tests,
    ``handle_request`` on a thread)."""
    return HTTPServer((host, port), make_handler(engine, stats_fn))
