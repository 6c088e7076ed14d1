"""applyInPandasWithState running per-site totals: state accumulates
across micro-batches AND across separate stream runs (checkpointed
state store), and the final totals equal the batch groupBy."""

import os

from pyspark.sql import functions as F

from distributedcodesearchengine_spark.sources.corpus import generate_pages
from distributedcodesearchengine_spark.streaming.stateful import (
    start_site_totals_stream,
)


def test_stateful_site_totals(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    import glob
    import shutil

    pages = generate_pages(spark, 120, seed=8, parts=2).persist()
    c1 = pages.where("warc_ts < '2024-01-01 00:13:00'").persist()
    c2 = pages.subtract(c1)
    # the file source lists files directly under the path — stage each
    # chunk and copy its part file into the input dir root
    for name, df in [("c1", c1), ("c2", c2)]:
        staging = str(tmp_path / f"_stage_{name}")
        df.coalesce(1).write.parquet(staging)
        shutil.copy(
            glob.glob(staging + "/part-*.parquet")[0],
            os.path.join(input_dir, name + ".parquet"),
        )
        # run after each chunk: state must carry across runs
        q = start_site_totals_stream(spark, input_dir, ckpt, str(tmp_path / "out"))
        q.awaitTermination(300)

    got = {
        r["site"]: (r["n_docs"], r["total_chars"])
        for r in spark.read.parquet(str(tmp_path / "out") + "/batch=*")
        .groupBy("site").agg(
            F.max("n_docs").alias("n_docs"), F.max("total_chars").alias("total_chars")
        ).collect()
    }
    want = {
        r["site"]: (r["n"], r["c"])
        for r in pages.select(
            F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("site"), "text"
        )
        .groupBy("site")
        .agg(F.count("*").alias("n"), F.sum(F.length("text")).alias("c"))
        .collect()
    }
    # every site that appears in both chunks must show the CUMULATIVE
    # total (state carried across runs), and totals match the batch agg
    for site, totals in want.items():
        assert got[site] == totals, (site, got.get(site), totals)
    pages.unpersist()
    c1.unpersist()
