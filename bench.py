#!/usr/bin/env python
"""Benchmark harness (driver contract + BENCH/BASELINE.md evidence).

Runs the headline pipeline on ``local[$SPARK_GRAFT_CPUS]``:

  1. index build over the deterministic synthetic pages corpus sized to
     the SF of ``$SPARK_GRAFT_SF_DIR`` (sf0.1 -> 600k pages, matching
     FIXTURES.md's bench scale): extract -> tokenize -> doc ids ->
     tf/df/idf -> compressed postings segments  => docs/sec
  2. the reference query set, scored as ONE batch DataFrame plan
     (operators/scorer.bm25_topk_batch)                 => queries/sec
  3. single-query latency via the block-max WAND path (reported, not a
     throughput metric)

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {...per-stage/per-query sec...}, "sf": ...,
   "docs_per_sec": ..., "queries_per_sec": ..., "cpus": ...}

Scaling evidence (BASELINE.md): run this with SPARK_GRAFT_CPUS=8 and
=32 on the same input (BENCH/run_scaling.py automates it); efficiency =
(T_8 / T_32) / 4 per stage.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


# Reference query set (reference README.md:159-169, tests/test_search.py)
REFERENCE_QUERIES = [
    "JSON parsing",
    "parse json",
    "send HTTP request",
    "validate email address",
    "async database query",
    "json json parser",
    "parseJSON HTTPClient2",
    "read the file path",
    "base64 encode token",
    "camelCaseSplitter utf8Decoder",
]


def build_query_set(n_queries: int = 100) -> dict:
    """Reference queries + deterministic synthetic 2-4 term queries over
    the corpus vocabulary (mixing Zipf-common and rare terms), so the
    query-throughput measurement amortizes fixed job overhead across a
    real batch instead of timing scheduler latency."""
    from distributedcodesearchengine_spark.sources.corpus import VOCAB

    queries = dict(enumerate(REFERENCE_QUERIES, start=1))
    qid = len(queries) + 1
    i = 0
    while len(queries) < n_queries:
        # deterministic index mix: a common term, a mid term, a rare term
        a = VOCAB[(i * 7) % 50]
        b = VOCAB[50 + (i * 31) % 900]
        c = VOCAB[1000 + (i * 131) % 4000]
        q = [a, b, c, VOCAB[(i * 13) % 200]][: 2 + i % 3]
        queries[qid] = " ".join(q)
        qid += 1
        i += 1
    return queries

WAND_LATENCY_QUERIES = ["parse json", "parseJSON HTTPClient2"]


def tree_cpu_seconds() -> float:
    """CPU seconds consumed so far, for per-stage deltas — the
    accounting that separates 'the stage burned more cores' from 'the
    stage sat on a fixed shared resource' in BENCH/BASELINE.md.

    Primary source: the cgroup ``cpuacct.usage`` counter — monotonic
    and inclusive of short-lived python workers, which a /proc
    process-tree walk silently loses when Spark tears them down
    mid-stage (observed as negative per-stage deltas). It is whole-VM,
    but the sandbox runs nothing else (ambient 'load' is host steal the
    guest counter never sees). Fallback: the /proc tree walk."""
    try:
        with open("/sys/fs/cgroup/cpuacct/cpuacct.usage") as f:
            return int(f.read()) / 1e9
    except (OSError, ValueError):
        pass
    hz = os.sysconf("SC_CLK_TCK")
    info = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                data = f.read().decode("latin1")
        except OSError:
            continue
        rest = data[data.rindex(")") + 2 :].split()
        ppid = int(rest[1])
        ticks = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        info[int(d)] = (ppid, ticks)
    children: dict = {}
    for pid, (ppid, _) in info.items():
        children.setdefault(ppid, []).append(pid)
    total = 0
    stack = [os.getpid()]
    while stack:
        p = stack.pop()
        if p in info:
            total += info[p][1]
            stack.extend(children.get(p, []))
    return total / hz


def wait_for_quiet(max_wait: float, threshold: float, interval: float = 5.0):
    """Load gate: the sandbox host shows phantom load (1-min load 0.3-21
    with no local processes) that inflates identical runs up to 2.5x.
    Wait up to ``max_wait`` sec for load_avg_1m < ``threshold`` so the
    recorded number measures the engine, not the neighbor; return
    (waited_sec, trace) with the sampled trace as evidence either way."""
    t0 = time.monotonic()
    trace = []
    while True:
        load = round(os.getloadavg()[0], 2)
        trace.append(load)
        if load < threshold or (time.monotonic() - t0) >= max_wait:
            return round(time.monotonic() - t0, 1), trace
        time.sleep(interval)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(int(6_000_000 * sf))))
    query_reps = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_REPS", "3"))
    load_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "300"))
    load_max = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "6"))

    from distributedcodesearchengine_spark.build.indexer import build_index_inmem
    from distributedcodesearchengine_spark.operators.wand import wand_topk
    from distributedcodesearchengine_spark.session import get_spark
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    # tmpfs scratch for shuffle + the bench artifacts: the sandbox VM's
    # disk is throttled/shared; a real 4N-executor cluster brings 4N
    # disks, so fixed-disk IO would systematically understate scaling
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/dcse-spark-local")
        os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)
    spark = get_spark("dcse-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict = {}
    cpu: dict = {}

    # --- stage 0 (NOT part of the build metric): materialize the input
    # table once — the engine's contract input is an existing
    # Iceberg/parquet pages table, not on-the-fly generation. The parquet
    # is cached on disk and shared by the local[8]/local[32] scaling runs.
    scratch = "/dev/shm/dcse" if os.path.isdir("/dev/shm") else "/tmp"
    pages_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_PAGES", f"{scratch}/dcse_bench_pages_n{n_pages}_s42"
    )
    tg = time.monotonic()
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        # fixed 64 output files: identical input layout for every
        # parallelism level, and enough splits to feed local[32]
        generate_pages(spark, n_pages, seed=42, parts=64).write.mode(
            "overwrite"
        ).parquet(pages_dir)
    timings["generate_input"] = round(time.monotonic() - tg, 3)
    pages = spark.read.parquet(pages_dir)

    # --- load gate before the timed stages (evidence either way: the
    # trace records what the host looked like while we waited)
    waited, load_trace = wait_for_quiet(load_wait, load_max)
    gate = {
        "load_wait_sec": waited,
        "load_at_start": load_trace[-1],
        "load_trace": load_trace[-24:],
        "window_opened": load_trace[-1] < load_max,
    }

    # --- stage 1: index build (extract -> tokenize -> tf/idf -> postings),
    # ending in the PERSISTED index layout: tf parquet range-partitioned +
    # sorted by term (row-group min/max pruning serves term lookups),
    # plus the compressed postings segments
    index_dir = os.path.join(os.path.dirname(pages_dir), f"dcse_bench_index_{cpus}")
    from distributedcodesearchengine_spark.operators.scorer import Index
    from distributedcodesearchengine_spark.operators.sharded import (
        build_sharded_postings,
        sharded_batch_topk,
        sharded_single_topk,
    )
    from distributedcodesearchengine_spark.operators.stats import (
        build_docs,
        corpus_stats,
        term_freqs,
        terms_with_idf,
    )

    # shard count is an INDEX property (fixed across cluster sizes so the
    # scaling comparison runs the same index): ~128 shards
    shard_width = max(4096, n_pages // 128)

    def run_build():
        """One full build rep: docs cached once (token arrays feed tf +
        postings); the tf relation goes STRAIGHT to parquet (columnar,
        compressed) — never a deserialized row cache — and every
        downstream consumer reads the parquet. Returns per-stage wall +
        cpu and the built Index handle."""
        tm: dict = {}
        cp: dict = {}
        t0 = time.monotonic()
        c0 = tree_cpu_seconds()
        docs = build_docs(pages).persist()
        n_docs_built, avgdl = corpus_stats(docs)
        ta = time.monotonic(); ca = tree_cpu_seconds()
        tm["sub_docs"] = round(ta - t0, 3); cp["sub_docs"] = round(ca - c0, 3)
        term_freqs(docs).write.mode("overwrite").parquet(os.path.join(index_dir, "tf"))
        tb = time.monotonic(); cb = tree_cpu_seconds()
        tm["sub_tf_write"] = round(tb - ta, 3); cp["sub_tf_write"] = round(cb - ca, 3)
        tf = spark.read.parquet(os.path.join(index_dir, "tf"))
        terms_with_idf(tf, n_docs_built).write.mode("overwrite").parquet(
            os.path.join(index_dir, "terms")
        )
        tc = time.monotonic(); cc = tree_cpu_seconds()
        tm["sub_terms"] = round(tc - tb, 3); cp["sub_terms"] = round(cc - cb, 3)
        terms = spark.read.parquet(os.path.join(index_dir, "terms"))
        index = Index(
            spark=spark, docs=docs, tf=tf, terms=terms,
            n_docs=n_docs_built, avgdl=avgdl,
        )
        tm["build_tf_idf"] = round(tc - t0, 3)
        cp["build_tf_idf"] = round(cc - c0, 3)

        # postings stage: the doc-SHARDED serving layout (each shard
        # holds complete posting fragments for its doc range ->
        # shard-local query evaluation)
        t1 = time.monotonic()
        sharded = build_sharded_postings(
            index.tf, index.terms, index.n_docs, index.avgdl,
            shard_width=shard_width,
        )
        (
            sharded.write.mode("overwrite")
            .partitionBy("range_id")
            .parquet(os.path.join(index_dir, "postings"))
        )
        t_end = time.monotonic(); c_end = tree_cpu_seconds()
        tm["build_postings"] = round(t_end - t1, 3)
        cp["build_postings"] = round(c_end - cc, 3)
        tm["index_build_total"] = round(t_end - t0, 3)
        return tm, cp, index

    t_wall0 = time.monotonic()
    # PER-REP load gating (round-3 lesson: one opening gate is not
    # enough — load can spike mid-run and the artifact then records the
    # phantom-load lottery instead of engine capability). Each rep
    # re-gates and records load at its own start AND end. 'clean' means
    # the rep STARTED under the threshold — the only moment where load
    # is observable ambient load: our own 32-thread build legitimately
    # drives the 1-min loadavg to ~16+, so load_end mixes self-load
    # with any phantom and cannot gate (it stays in the trace as
    # evidence). All reps run (min improves monotonically with
    # cache/JIT warmth); docs_per_sec reports min over clean reps when
    # any exist, else min over all, and the embedded attempts trace is
    # the proof of whether a quiet window ever existed.
    max_build_reps = int(os.environ.get("SPARK_GRAFT_BENCH_BUILD_REPS", "3"))
    rep_wait = float(os.environ.get("SPARK_GRAFT_BENCH_REP_LOAD_WAIT", "210"))
    # the inter-rep wait targets a TIGHTER threshold than the clean
    # criterion: after our own ~16-load build the 1-min loadavg needs
    # ~60*ln(16/2)s to decay, and a rep that starts at 5.9 is still
    # half-contaminated by the previous rep's tail
    rep_load_max = float(
        os.environ.get("SPARK_GRAFT_BENCH_REP_LOAD_MAX", str(min(load_max, 2.0)))
    )
    build_attempts = []
    best = best_clean = None
    index = None
    for rep in range(max(1, max_build_reps)):
        if rep > 0:
            wait_for_quiet(rep_wait, rep_load_max)
        load_start = round(os.getloadavg()[0], 2)
        if index is not None:
            index.docs.unpersist()
        tm, cp, index = run_build()
        load_end = round(os.getloadavg()[0], 2)
        clean = load_start < load_max
        build_attempts.append(
            {
                "wall": tm["index_build_total"],
                "load_start": load_start,
                "load_end": load_end,
                "clean": clean,
            }
        )
        if best is None or tm["index_build_total"] < best[0]["index_build_total"]:
            best = (tm, cp)
        if clean and (
            best_clean is None
            or tm["index_build_total"] < best_clean[0]["index_build_total"]
        ):
            best_clean = (tm, cp)
    timings, cpu = best_clean if best_clean is not None else best
    build_reps = [a["wall"] for a in build_attempts]
    t_build = timings["index_build_total"]

    # --- warm the serving layout (NOT part of the build metric): pin
    # terms + sharded postings in executor storage — the long-lived
    # server does exactly this at startup (api.SearchEngine.warm)
    tw = time.monotonic()
    qindex = index
    qindex.tf = spark.read.parquet(os.path.join(index_dir, "tf"))
    qindex.terms = spark.read.parquet(os.path.join(index_dir, "terms")).persist()
    qindex.terms.count()
    qindex.postings = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .coalesce(cpus)  # one cached partition per core: 1-wave scans
        .persist()
    )
    qindex.postings.count()
    timings["warm_serving"] = round(time.monotonic() - tw, 3)

    # --- stage 2: batch query throughput against the warmed sharded
    # index: shard-local numpy scoring, tiny global top-k merge.
    # min-of-reps: the batch is cheap to repeat and the phantom load is
    # not — each rep is a full 100-query batch
    # gate the serving section too: the batch otherwise starts under the
    # build's own decaying 1-min load (~14) compounded by any phantom,
    # and the min-of-reps records a load draw, not serving capability
    serve_gate_wait, serve_gate_trace = wait_for_quiet(rep_wait, rep_load_max)
    query_set = build_query_set(100)
    c2 = tree_cpu_seconds()
    batch_reps = []
    n_result_rows = 0
    for _ in range(max(1, query_reps)):
        t2 = time.monotonic()
        n_result_rows = len(
            sharded_batch_topk(qindex, query_set, k=10, shard_width=shard_width).collect()
        )
        batch_reps.append(round(time.monotonic() - t2, 3))
    t_batch = min(batch_reps)
    timings["query_batch_total"] = t_batch
    cpu["query_batch_total"] = round(tree_cpu_seconds() - c2, 3)
    n_queries = len(query_set)

    # --- stage 3: single-query latency — the sharded serving path (one
    # applyInPandas pass + tiny merge, block-max pruned) and the WAND
    # path (4 driver-synchronized rounds); both rank-identical to v1.
    # min of 3 reps each (scheduler-round-bound, so variance is noise)
    for i, q in enumerate(WAND_LATENCY_QUERIES):
        reps = []
        for _ in range(3):
            tq = time.monotonic()
            sharded_single_topk(qindex, q, k=10, shard_width=shard_width).collect()
            reps.append(time.monotonic() - tq)
        timings[f"sharded_q{i + 1}"] = round(min(reps), 3)
    for i, q in enumerate(WAND_LATENCY_QUERIES):
        reps = []
        for _ in range(2):
            tq = time.monotonic()
            wand_topk(index, q, k=10).collect()
            reps.append(time.monotonic() - tq)
        timings[f"wand_q{i + 1}"] = round(min(reps), 3)

    total = time.monotonic() - t_wall0
    out = {
        "metric": "bm25_index_build+query_throughput",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "cpu_seconds": cpu,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "load_gate": gate,
        "serve_gate": {
            "wait_sec": serve_gate_wait,
            "load_at_start": serve_gate_trace[-1],
        },
        "build_reps": build_reps,
        "build_attempts": build_attempts,
        "build_capability_clean": best_clean is not None,
        "batch_reps": batch_reps,
        "sf": sf,
        "n_docs": n_pages,
        "docs_per_sec": round(n_pages / t_build, 1),
        "queries_per_sec": round(n_queries / t_batch, 2),
        "n_result_rows": n_result_rows,
        "cpus": cpus,
    }
    spark.stop()

    # --- stage 4 (once per bench, after spark.stop frees the 48g
    # heap): the spark-submit --py-files packaging path — the north
    # rule's run mode and the one deploy surface the bench never timed.
    # Zip the package deterministically, then `spark-submit build` over
    # the SAME sf pages and `spark-submit search` from a cwd OUTSIDE
    # the repo with PYTHONPATH scrubbed, so the shipped zip is the only
    # package source (the tests/test_submit.py discipline, at bench
    # scale). Wall times land in queries{} as submit_build /
    # submit_search; skipped silently when spark-submit is absent or
    # SPARK_GRAFT_BENCH_SUBMIT=0.
    spark_submit = "/opt/spark/bin/spark-submit"
    if (
        os.environ.get("SPARK_GRAFT_BENCH_SUBMIT", "1") != "0"
        and os.path.exists(spark_submit)
    ):
        import shutil
        import subprocess
        import tempfile

        repo = os.path.dirname(os.path.abspath(__file__))
        try:
            sys.path.insert(0, os.path.join(repo, "tools"))
            import make_pyfiles

            zip_path = str(make_pyfiles.build(
                os.path.join(scratch, "dcse_submit_pkg.zip")
            ))
            sub_index = os.path.join(
                os.path.dirname(pages_dir), f"dcse_submit_index_{cpus}"
            )
            shutil.rmtree(sub_index, ignore_errors=True)
            env = dict(os.environ)
            env["PYSPARK_PYTHON"] = sys.executable
            env["PYSPARK_DRIVER_PYTHON"] = sys.executable
            env.pop("PYTHONPATH", None)
            base = [
                spark_submit, "--master", f"local[{cpus}]",
                "--driver-memory", "24g",
                "--conf", f"spark.sql.shuffle.partitions={cpus}",
                "--conf", "spark.sql.adaptive.enabled=true",
                "--py-files", zip_path,
                os.path.join(repo, "tools", "submit_job.py"),
            ]
            t_sb = time.monotonic()
            r1 = subprocess.run(
                base + ["build", "--input", pages_dir, "--index", sub_index],
                cwd=tempfile.gettempdir(), env=env,
                capture_output=True, text=True, timeout=900,
            )
            if r1.returncode == 0:
                timings["submit_build"] = round(time.monotonic() - t_sb, 3)
                t_sq = time.monotonic()
                r2 = subprocess.run(
                    base + [
                        "search", WAND_LATENCY_QUERIES[0],
                        "--index", sub_index, "--limit", "10",
                    ],
                    cwd=tempfile.gettempdir(), env=env,
                    capture_output=True, text=True, timeout=300,
                )
                if r2.returncode == 0 and r2.stdout.strip():
                    timings["submit_search"] = round(
                        time.monotonic() - t_sq, 3
                    )
            shutil.rmtree(sub_index, ignore_errors=True)
        except Exception:  # noqa: BLE001 - deploy-surface probe must never
            pass           # fail the bench artifact

    print(json.dumps(out))


if __name__ == "__main__":
    main()
