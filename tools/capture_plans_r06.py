#!/usr/bin/env python
"""Capture .explain("formatted") for the r06-touched query paths.

Usage:  python tools/capture_plans_r06.py <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for each captured plan. Run once
with suffix=before from a worktree at the round-start commit and once
with suffix=after from the final tree (the judge checks plan claims in
OPTIMIZATION_r06.md against these files).

Names: build_docs, term_freqs, sharded_postings, embedding_near_dup,
plus any gate key from __spark_entry__.queries() (captured over
/root/testdata/sf0.001).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from distributedcodesearchengine_spark.operators.sharded import (
        build_sharded_postings,
    )
    from distributedcodesearchengine_spark.operators.stats import (
        build_docs,
        corpus_stats,
        term_freqs,
        terms_with_idf,
    )
    from distributedcodesearchengine_spark.session import get_spark
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    spark = get_spark("dcse-plan-capture", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    pages = generate_pages(spark, 1000, seed=7, parts=4)
    docs = build_docs(pages).persist()
    n_docs, avgdl = corpus_stats(docs)
    scratch = "/tmp/dcse_plan_capture"
    term_freqs(docs).write.mode("overwrite").parquet(os.path.join(scratch, "tf"))
    tf = spark.read.parquet(os.path.join(scratch, "tf"))
    terms_with_idf(tf, n_docs).write.mode("overwrite").parquet(
        os.path.join(scratch, "terms")
    )
    terms = spark.read.parquet(os.path.join(scratch, "terms"))

    def emit(name: str, df) -> None:
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(explain_str(df))
        print("wrote", p)

    from distributedcodesearchengine_spark.operators.postings import build_postings

    builders = {
        "build_docs": lambda: build_docs(pages),
        "term_freqs": lambda: term_freqs(docs),
        "sharded_postings": lambda: build_sharded_postings(
            tf, terms, n_docs, avgdl, shard_width=256
        ),
        "wand_postings": lambda: build_postings(
            tf, terms, n_docs, avgdl, target_row_postings=256
        ),
    }
    entry_keys = [n for n in names if n not in builders]
    if entry_keys:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __spark_entry__ as entry

        qmap = entry.queries()
    for name in names:
        if name in builders:
            emit(name, builders[name]())
        else:
            emit(name, qmap[name](spark, "/root/testdata/sf0.001"))
    spark.stop()


if __name__ == "__main__":
    main()
