"""Command-line entry point — the analog of the reference's Typer CLI
(``codesearch/cli/main.py:44-212``) and its ``/stats`` endpoint
(``api/server.py:250-280``), argparse-based (no extra deps).

    python -m distributedcodesearchengine_spark build  --input DIR --index DIR
    python -m distributedcodesearchengine_spark search QUERY --index DIR [...]
    python -m distributedcodesearchengine_spark stats  --index DIR

F8 entry-point validation (cli/main.py:69-85): unknown enum values
(scorer) and unknown filter values (lang not present in the index) are
CLI errors with the valid choices listed — the API facade can instead
silently drop them (``on_invalid='drop'``, server.py:122-133).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="distributedcodesearchengine_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) a persisted index")
    b.add_argument("--input", required=True, help="pages parquet directory")
    b.add_argument("--index", required=True, help="output index directory")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--n-buckets", type=int, default=None)
    b.add_argument(
        "--phrase-index", action="store_true",
        help="also build the compressed positional index (serves quoted queries)",
    )
    b.add_argument(
        "--sharded-index", action="store_true",
        help="also build the doc-range-sharded serving layout "
        "(enables search --scorer sharded, the low-latency path)",
    )

    k = sub.add_parser(
        "compact",
        help="compact a streamed incremental index into the full "
        "persisted serving layout (no re-extraction)",
    )
    k.add_argument("--stream-index", required=True, help="incremental index directory")
    k.add_argument("--index", required=True, help="output persisted index directory")
    k.add_argument("--no-resume", action="store_true")
    k.add_argument("--n-buckets", type=int, default=None)
    k.add_argument("--phrase-index", action="store_true")
    k.add_argument("--sharded-index", action="store_true")

    s = sub.add_parser("search", help="query a persisted index")
    s.add_argument("query")
    s.add_argument("--index", required=True)
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--lang")
    s.add_argument("--site")
    s.add_argument("--source")
    s.add_argument("--hybrid", action="store_true")
    s.add_argument(
        "--scorer", default="auto",
        help="auto (default: sharded layout when present, else exact), "
        "exact, wand (batch-side compressed-postings scorer), sharded",
    )
    s.add_argument("--json", action="store_true", dest="as_json")
    s.add_argument(
        "--query-string", action="store_true", dest="query_string",
        help='parse the query as the Lucene mini-language '
             '(+must -not "phrase" pre* word~1 term^2.5 lang:en)',
    )

    t = sub.add_parser("stats", help="corpus + build-lineage rollup")
    t.add_argument("--index", required=True)

    fk = sub.add_parser(
        "fsck",
        help="offline index integrity verification (Lucene CheckIndex "
        "analog): stats/doc-id/tf/terms/bucket invariants; exit 2 on "
        "any failed check",
    )
    fk.add_argument("--index", required=True)

    sn = sub.add_parser(
        "snapshot",
        help="fsck-gated atomic index backup with a per-file (size, md5) "
        "manifest (the ES snapshot-API analog); exit 2 on failure",
    )
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True, help="snapshot dir (must not exist)")

    rs = sub.add_parser(
        "restore",
        help="verify a snapshot's manifest inventory, swap it in "
        "atomically, fsck the result; exit 2 on failure",
    )
    rs.add_argument("--snapshot", required=True)
    rs.add_argument("--index", required=True)

    sim = sub.add_parser(
        "similarity",
        help="top-k under a non-Okapi similarity "
        "(lmd/lmjm/dfr/ib/classic/bool)",
    )
    sim.add_argument("query")
    sim.add_argument("--index", required=True)
    sim.add_argument("--model", default="dfr",
                     choices=["lmd", "lmjm", "dfr", "ib", "classic", "bool"])
    sim.add_argument("--limit", type=int, default=10)

    ac = sub.add_parser(
        "autocomplete",
        help="search-as-you-type completion of the typed text "
        "(bigram context / ctf unigram)",
    )
    ac.add_argument("text")
    ac.add_argument("--index", required=True)
    ac.add_argument("--limit", type=int, default=10)

    g = sub.add_parser("suggest", help="term autocomplete under a prefix")
    g.add_argument("prefix")
    g.add_argument("--index", required=True)
    g.add_argument("--limit", type=int, default=10)
    g.add_argument(
        "--fuzzy", action="store_true",
        help="edit-distance-1 'did you mean' instead of prefix match",
    )

    c = sub.add_parser(
        "curate",
        help="training-data curation funnel: dedup -> quality -> "
        "decontaminate -> mixture-sample -> pack, written as parquet",
    )
    c.add_argument("--input", required=True, help="documents parquet (doc_id, text, lang)")
    c.add_argument("--output", required=True, help="output directory for the packed survivor set")
    c.add_argument("--min-tokens", type=int, default=25)
    c.add_argument("--budget", type=int, default=512, help="tokens per training window")
    c.add_argument("--bench-mod", type=int, default=7, help="doc_id modulus carving the held-out eval slice")
    c.add_argument("--ngram", type=int, default=8, help="contamination n-gram width")

    ev = sub.add_parser(
        "eval",
        help="retrieval-quality eval (nDCG@k / MRR / recall@k) of the "
        "index's ranking against corpus-derived graded labels",
    )
    ev.add_argument("--index", required=True)
    ev.add_argument("--queries", required=True,
                    help='JSON object {"id": "query text", ...} or a path to one')
    ev.add_argument("--k", type=int, default=10)

    mg = sub.add_parser(
        "merge",
        help="merge N persisted indexes into one serving index "
        "(Lucene addIndexes: dense id offsets, segments rebuilt with "
        "global idf, no re-extraction)",
    )
    mg.add_argument("--indexes", required=True,
                    help="comma-separated persisted index directories, merge order")
    mg.add_argument("--index", required=True, help="output index directory")
    mg.add_argument("--no-resume", action="store_true")
    mg.add_argument("--n-buckets", type=int, default=None)
    mg.add_argument("--phrase-index", action="store_true")
    mg.add_argument("--sharded-index", action="store_true")

    x = sub.add_parser(
        "export",
        help="token-budget sharded corpus export with a JSON audit "
        "manifest (shard-level order-pinned content digests)",
    )
    x.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    x.add_argument("--output", required=True, help="export directory (data/ + manifest.json)")
    x.add_argument("--shard-tokens", type=int, default=65536, help="token budget per shard")

    v = sub.add_parser("serve", help="REST API over a persisted index")
    v.add_argument("--index", required=True)
    v.add_argument("--port", type=int, default=8099)
    v.add_argument("--host", default="127.0.0.1")

    w = sub.add_parser(
        "worker",
        help="incremental-index worker: drain a pages directory into a "
        "queryable streaming index (the reference queue-consumer loop)",
    )
    w.add_argument("--input", required=True, help="watched pages parquet directory")
    w.add_argument("--index", required=True, help="streaming index directory")
    w.add_argument("--checkpoint", required=True, help="stream checkpoint directory")
    w.add_argument(
        "--follow", action="store_true",
        help="keep consuming new files (default drains what exists and exits, "
        "the reference worker's run_once)",
    )

    u = sub.add_parser(
        "queue",
        help="publish an index-build job to a running server "
        "(thin client for POST /index)",
    )
    u.add_argument("--server", required=True, help="base url, e.g. http://127.0.0.1:8099")
    u.add_argument("--input", required=True, help="pages parquet directory to index")
    u.add_argument("--priority", type=int, default=5)
    u.add_argument("--sync", action="store_true", help="block until built (POST /index/sync)")

    m = sub.add_parser(
        "similar", help="more-like-this: rank docs similar to a seed doc_id"
    )
    m.add_argument("doc_id", type=int)
    m.add_argument("--index", required=True)
    m.add_argument("--limit", type=int, default=10)
    m.add_argument("--terms", type=int, default=5,
                   help="how many of the seed's top tf-idf terms form the query")
    m.add_argument("--json", dest="as_json", action="store_true")

    sub.add_parser("version", help="engine version")
    return p


def _stats_dict(spark, idx, index_dir: str) -> dict:
    from pyspark.sql import functions as F

    from .build.checkpoint import build_metrics_rollup

    return {
        "n_docs": idx.n_docs,
        "avgdl": idx.avgdl,
        "vocab_size": idx.terms.count(),
        "langs": {
            r["lang"]: r["n"]
            for r in idx.docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
        },
        "build": [r.asDict() for r in build_metrics_rollup(spark, index_dir).collect()],
    }


VERSION = "0.3.0"  # round-numbered: bumped each driver round


def main(argv=None, spark=None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "version":
        print(json.dumps({"name": "spark-bm25", "version": VERSION}))
        return 0

    if args.cmd == "queue":
        # no SparkSession needed — pure HTTP client (the reference's
        # `queue` publishes to the broker, cli/main.py:363-398)
        import urllib.request

        path = "/index/sync" if args.sync else "/index"
        req = urllib.request.Request(
            args.server.rstrip("/") + path,
            data=json.dumps(
                {"input": args.input, "priority": args.priority}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as r:
                print(r.read().decode())
            return 0
        except OSError as e:
            body = getattr(e, "read", lambda: b"")()
            print(f"error: {e}" + (f" {body.decode()}" if body else ""), file=sys.stderr)
            return 2

    from .session import get_spark

    spark = spark or get_spark("dcse-cli")

    if args.cmd == "worker":
        from .streaming.incremental import start_incremental_index

        q, indexer = start_incremental_index(
            spark, args.input, args.index, args.checkpoint,
            available_now=not args.follow,
        )
        q.awaitTermination()
        idx = indexer.load()
        print(json.dumps({"n_docs": idx.n_docs, "avgdl": idx.avgdl, "index": args.index}))
        return 0

    if args.cmd == "build":
        from .build.checkpoint import build_index_persisted
        from .sources.tables import read_input_table

        pages = read_input_table(spark, args.input)
        kw = {}
        if args.n_buckets:
            kw["n_buckets"] = args.n_buckets
        if args.phrase_index:
            kw["phrase_index"] = True
        if args.sharded_index:
            kw["sharded_index"] = True
        idx = build_index_persisted(
            spark, pages, args.index, resume=not args.no_resume, **kw
        )
        print(json.dumps({"n_docs": idx.n_docs, "avgdl": idx.avgdl, "index": args.index}))
        return 0

    if args.cmd == "compact":
        from .build.checkpoint import compact_incremental

        kw = {}
        if args.n_buckets:
            kw["n_buckets"] = args.n_buckets
        if args.phrase_index:
            kw["phrase_index"] = True
        if args.sharded_index:
            kw["sharded_index"] = True
        idx = compact_incremental(
            spark, args.stream_index, args.index, resume=not args.no_resume, **kw
        )
        print(json.dumps({"n_docs": idx.n_docs, "avgdl": idx.avgdl, "index": args.index}))
        return 0

    if args.cmd == "search":
        from .api import VALID_SCORERS, SearchEngine
        from .build.checkpoint import load_index

        idx = load_index(spark, args.index)
        engine = SearchEngine(idx)
        try:
            if args.query_string:
                res = engine.query_string(
                    args.query,
                    limit=args.limit,
                    lang=args.lang,
                    site=args.site,
                    source=args.source,
                )
            else:
                res = engine.search(
                    args.query,
                    limit=args.limit,
                    lang=args.lang,
                    site=args.site,
                    source=args.source,
                    use_hybrid=args.hybrid,
                    scorer=args.scorer,
                    on_invalid="error",
                )
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        rows = res.collect()
        if args.as_json:
            for r in rows:
                print(json.dumps(r.asDict()))
        else:
            for r in rows:
                url = r["url"] if "url" in r.__fields__ else ""
                print(f"{r['rank']:>3}  {r['score']:.6f}  {r['doc_id']:>10}  {url}")
        return 0

    if args.cmd == "similar":
        from .api import SearchEngine
        from .build.checkpoint import load_index

        engine = SearchEngine(load_index(spark, args.index))
        rows = engine.similar(args.doc_id, m=args.terms, limit=args.limit).collect()
        if args.as_json:
            for r in rows:
                print(json.dumps(r.asDict()))
        else:
            for r in rows:
                print(f"{r['rank']:>3}  {r['score']:.6f}  {r['doc_id']:>10}  {r['url']}")
        return 0

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from .functions.udfs import tokenize_udf
        from .operators.pipeline import curate_corpus

        d = spark.read.parquet(args.input)
        missing = {"doc_id", "text", "lang"} - set(d.columns)
        if missing:
            print(f"error: input is missing columns {sorted(missing)}", file=sys.stderr)
            return 2
        packed = curate_corpus(
            d.select("doc_id", "text", "lang", tokenize_udf("text").alias("tokens")),
            min_tokens=args.min_tokens,
            n=args.ngram,
            bench_mod=args.bench_mod,
            budget=args.budget,
        )
        packed.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        report = out.agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
            # bins the packed stream OCCUPIES (a straddling last doc
            # spills past max(bin_id), which is only where it starts)
            F.coalesce(
                F.ceil(F.sum("n_tokens") / F.lit(args.budget)), F.lit(0)
            ).alias("n_bins"),
        ).first()
        print(
            json.dumps(
                {
                    "n_input": d.count(),
                    "n_survivors": report["n_docs"],
                    "n_tokens": report["n_tokens"],
                    "n_bins": report["n_bins"],
                    "budget": args.budget,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "eval":
        import os

        from .build.checkpoint import load_index
        from .operators.evalrank import eval_ranking, relevance_labels
        from .operators.scorer import bm25_topk_batch

        raw = args.queries
        if os.path.exists(raw):
            with open(raw) as f:
                raw = f.read()
        try:
            qmap = {int(k): str(v) for k, v in json.loads(raw).items()}
        except (ValueError, AttributeError) as e:
            print(f"error: --queries must be JSON {{id: query}}: {e}", file=sys.stderr)
            return 2
        idx = load_index(spark, args.index)
        res = bm25_topk_batch(idx, qmap, k=args.k)
        labels = relevance_labels(idx.docs, qmap)
        rows = eval_ranking(res, labels, k=args.k).collect()
        print(json.dumps({
            "k": args.k,
            "queries": {str(qid): q for qid, q in qmap.items()},
            "metrics": [r.asDict() for r in rows],
        }))
        return 0

    if args.cmd == "merge":
        from .build.checkpoint import merge_indexes_persisted

        kw = {}
        if args.n_buckets:
            kw["n_buckets"] = args.n_buckets
        srcs = [p for p in args.indexes.split(",") if p]
        idx = merge_indexes_persisted(
            spark,
            srcs,
            args.index,
            resume=not args.no_resume,
            phrase_index=args.phrase_index,
            sharded_index=args.sharded_index,
            **kw,
        )
        print(json.dumps({
            "n_docs": idx.n_docs,
            "avgdl": round(idx.avgdl, 4),
            "merged": len(srcs),
            "index": args.index,
        }))
        return 0

    if args.cmd == "export":
        from .functions.udfs import tokenize_udf
        from .operators.pipeline import export_shards

        d = spark.read.parquet(args.input)
        missing = {"doc_id", "text"} - set(d.columns)
        if missing:
            print(f"error: input is missing columns {sorted(missing)}", file=sys.stderr)
            return 2
        manifest = export_shards(
            d.withColumn("tokens", tokenize_udf("text")),
            args.output,
            budget=args.shard_tokens,
        )
        print(json.dumps({
            "n_shards": manifest["n_shards"],
            "n_docs": sum(s["n_docs"] for s in manifest["shards"]),
            "n_tokens": sum(s["n_tokens"] for s in manifest["shards"]),
            "budget": manifest["budget"],
            "output": args.output,
        }))
        return 0

    if args.cmd == "similarity":
        from .api import SearchEngine
        from .build.checkpoint import load_index

        idx = load_index(spark, args.index)
        engine = SearchEngine(idx)
        rows = engine.similarity_search(
            args.query, model=args.model, limit=args.limit
        ).collect()
        for r in rows:
            print(f"{r['rank']:>3}  {r['score']:.6f}  {r['doc_id']:>10}  {r['url']}")
        return 0

    if args.cmd == "autocomplete":
        from .build.checkpoint import load_index
        from .operators.snippets import completion_suggest

        idx = load_index(spark, args.index)
        rows = completion_suggest(idx.docs, args.text, k=args.limit).collect()
        for r in rows:
            print(f"{r['cnt']:>8}  {r['suggestion']}")
        return 0

    if args.cmd == "suggest":
        from .build.checkpoint import load_index
        from .operators.snippets import spell_suggest_symspell, term_suggest

        idx = load_index(spark, args.index)
        if args.fuzzy:
            rows = spell_suggest_symspell(idx.terms, args.prefix, k=args.limit)
        else:
            rows = term_suggest(idx.terms, args.prefix, k=args.limit)
        for r in rows.collect():
            print(f"{r['df']:>8}  {r['term']}")
        return 0

    if args.cmd == "stats":
        from .build.checkpoint import load_index

        idx = load_index(spark, args.index)
        print(json.dumps(_stats_dict(spark, idx, args.index), default=str, indent=2))
        return 0

    if args.cmd == "fsck":
        from .build.fsck import fsck_index

        report = fsck_index(spark, args.index)
        print(json.dumps(report, indent=2))
        return 0 if report["ok"] else 2

    if args.cmd == "snapshot":
        from .build.snapshot import snapshot_index

        try:
            manifest = snapshot_index(spark, args.index, args.out)
        except Exception as e:  # noqa: BLE001 - contract: error line + exit 2
            print(f"error: {e}")
            return 2
        print(json.dumps(
            {"snapshot": args.out, "n_files": manifest["n_files"],
             "total_bytes": manifest["total_bytes"],
             "entries": manifest["entries"]}, indent=2))
        return 0

    if args.cmd == "restore":
        from .build.snapshot import restore_index

        try:
            report = restore_index(spark, args.snapshot, args.index)
        except Exception as e:  # noqa: BLE001 - contract: error line + exit 2
            print(f"error: {e}")
            return 2
        print(json.dumps(
            {"restored": args.index,
             "n_files": report["manifest"]["n_files"],
             "total_bytes": report["manifest"]["total_bytes"]}, indent=2))
        return 0

    if args.cmd == "serve":
        from .api import SearchEngine
        from .build.checkpoint import load_index
        from .server import IndexJobManager, serve

        idx = load_index(spark, args.index)
        engine = SearchEngine(idx).warm()
        manager = IndexJobManager(
            spark, args.index,
            on_complete=lambda new: engine.reload_index(new, warm=True),
        )
        srv = serve(
            engine,
            # engine.index, not idx: stats must reflect POST /index swaps
            lambda: _stats_dict(spark, engine.index, args.index),
            port=args.port,
            host=args.host,
            index_manager=manager,
        )
        print(
            json.dumps({"serving": f"http://{args.host}:{args.port}", "n_docs": idx.n_docs}),
            flush=True,
        )
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    return 1  # pragma: no cover


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
