#!/usr/bin/env python
"""Noop-sink stage isolation for the bench pipeline (guide §1.4).

``bench.py`` is FROZEN for driver measurement; this harness exists for
optimization work: it times each build/query sub-step in isolation with
the noop sink (computation cost without the real sink) so a change can
be attributed to the stage it touches. Labels land in the (disabled by
default) UI via setJobDescription.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [stage ...]

Stages: scan, ids, docs, tf, tf_hof, tf_write, terms, sharded, sharded_write,
batch, wand. Default: all.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _cpu_seconds() -> float:
    """Whole-VM CPU counter (cgroup cpuacct) — robust to host steal,
    which makes WALL times on this sandbox a lottery (load 0.3-25 with
    no local processes). Per-stage CPU deltas are the trustworthy
    'work done' signal; wall is reported alongside with the load trace."""
    try:
        with open("/sys/fs/cgroup/cpuacct/cpuacct.usage") as f:
            return int(f.read()) / 1e9
    except (OSError, ValueError):
        return time.process_time()


def _gate(max_wait: float = 240.0, threshold: float = 2.0) -> float:
    t0 = time.monotonic()
    while True:
        load = os.getloadavg()[0]
        if load < threshold or (time.monotonic() - t0) >= max_wait:
            return round(load, 2)
        time.sleep(5)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "1"))
    gate_wait = float(os.environ.get("SPARK_GRAFT_EXTRA_GATE_WAIT", "0"))
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(int(6_000_000 * sf))))
    want = set(sys.argv[1:])

    def on(stage: str) -> bool:
        return not want or stage in want

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/dcse-spark-local")
        os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)

    from distributedcodesearchengine_spark.operators.sharded import (
        build_sharded_postings,
    )
    from distributedcodesearchengine_spark.operators.stats import (
        build_docs,
        corpus_stats,
        term_freqs,
        term_freqs_hof,
        terms_with_idf,
    )
    from distributedcodesearchengine_spark.session import get_spark
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    spark = get_spark("dcse-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    scratch = "/dev/shm/dcse" if os.path.isdir("/dev/shm") else "/tmp"
    pages_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_PAGES", f"{scratch}/dcse_bench_pages_n{n_pages}_s42"
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        generate_pages(spark, n_pages, seed=42, parts=64).write.mode(
            "overwrite"
        ).parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    out_dir = f"{scratch}/dcse_bench_extra_{cpus}"

    t: dict = {}
    c: dict = {}
    loads: dict = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(stage, fn):
        """min-of-reps wall + min CPU delta, load-gated per rep when
        SPARK_GRAFT_EXTRA_GATE_WAIT is set (same discipline as the
        frozen bench.py: record capability, not the phantom-load
        lottery)."""
        walls, cpus_d, lds = [], [], []
        for _ in range(max(1, reps)):
            if gate_wait:
                lds.append(_gate(gate_wait))
            else:
                lds.append(round(os.getloadavg()[0], 2))
            sc.setJobDescription(f"bench_extra: {stage}")
            t0 = time.monotonic()
            c0 = _cpu_seconds()
            fn()
            walls.append(round(time.monotonic() - t0, 3))
            cpus_d.append(round(_cpu_seconds() - c0, 3))
            sc.setJobDescription(None)
        t[stage] = min(walls)
        c[stage] = min(cpus_d)
        loads[stage] = lds

    if on("scan"):
        timed("scan", lambda: noop(pages))
    if on("ids"):
        from pyspark.sql import functions as F

        from distributedcodesearchengine_spark.operators.doc_ids import (
            assign_doc_ids,
        )

        slim = pages.select(
            "url",
            F.regexp_extract(
                "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1
            ).alias("site"),
            "lang",
            "html",
        )
        ids = assign_doc_ids(
            slim, "url", None, dedup=True, dedup_tie=F.md5(F.col("html"))
        )
        timed("ids", lambda: noop(ids.select("doc_id", "url")))
        ids.unpersist()

    docs = None
    if on("docs") or on("tf") or on("tf_hof") or on("tf_write") or on(
        "terms"
    ) or on("sharded") or on("sharded_write") or on("batch") or on("wand"):
        def build_and_stat():
            nonlocal docs
            if docs is not None:
                # Spark's cache manager dedups by analyzed plan: without
                # the unpersist a second rep would read the first rep's
                # cache and time nothing
                docs.unpersist(blocking=True)
            docs = build_docs(pages).persist()
            corpus_stats(docs)

        timed("docs", build_and_stat)

    if on("tf"):
        timed("tf", lambda: noop(term_freqs(docs)))
    if on("tf_hof"):
        timed("tf_hof", lambda: noop(term_freqs_hof(docs)))
    if on("tf_write") or on("terms") or on("sharded") or on("sharded_write"):
        timed(
            "tf_write",
            lambda: term_freqs(docs).write.mode("overwrite").parquet(
                os.path.join(out_dir, "tf")
            ),
        )
        tf = spark.read.parquet(os.path.join(out_dir, "tf"))
        n_docs, avgdl = corpus_stats(docs)

        def write_terms():
            terms_with_idf(tf, n_docs).write.mode("overwrite").parquet(
                os.path.join(out_dir, "terms")
            )

        if on("terms"):
            timed("terms", write_terms)
        else:
            write_terms()
        terms = spark.read.parquet(os.path.join(out_dir, "terms"))
        shard_width = max(4096, n_pages // 128)
        if on("sharded"):
            timed(
                "sharded",
                lambda: noop(
                    build_sharded_postings(
                        tf, terms, n_docs, avgdl, shard_width=shard_width
                    )
                ),
            )
        if on("sharded_write"):
            timed(
                "sharded_write",
                lambda: build_sharded_postings(
                    tf, terms, n_docs, avgdl, shard_width=shard_width
                )
                .write.mode("overwrite")
                .partitionBy("range_id")
                .parquet(os.path.join(out_dir, "postings")),
            )

    print(json.dumps({
        "sf": sf, "cpus": cpus, "stages": t, "cpu_seconds": c,
        "load_at_start": loads,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
