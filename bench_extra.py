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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(stage, fn):
        sc.setJobDescription(f"bench_extra: {stage}")
        t0 = time.monotonic()
        fn()
        t[stage] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)

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
        if on("terms"):
            timed(
                "terms",
                lambda: terms_with_idf(tf, n_docs).write.mode("overwrite").parquet(
                    os.path.join(out_dir, "terms")
                ),
            )
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

    print(json.dumps({"sf": sf, "cpus": cpus, "stages": t}))
    spark.stop()


if __name__ == "__main__":
    main()
