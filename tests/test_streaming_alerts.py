"""Streaming percolator e2e: drain a pages directory in micro-batches,
assert the accumulated alerts equal the BATCH percolation of the same
pages (streaming == batch parity), and that a redelivered batch does
not duplicate alerts (overwrite-by-batch idempotency)."""

import os

import pytest

from distributedcodesearchengine_spark.sources.corpus import generate_pages
from distributedcodesearchengine_spark.streaming.alerts import (
    StreamingPercolator,
    start_alert_stream,
)

QUERIES = {1: "parse json", 2: '"send request"', 3: "zzznothing matches"}


def _batch_expected(spark, pages):
    """Batch-mode percolation of the same pages -> {(url, query_id)}."""
    import pyspark.sql.functions as F

    from distributedcodesearchengine_spark.functions.udfs import (
        extract_text_udf,
        tokenize_udf,
    )
    from distributedcodesearchengine_spark.operators.percolate import (
        percolate_phrase,
    )

    docs = pages.select(
        "url",
        tokenize_udf(extract_text_udf(F.col("html"))).alias("tokens"),
    ).withColumn("doc_id", F.abs(F.xxhash64("url")))
    hits = percolate_phrase(docs.select("doc_id", "tokens"), QUERIES)
    return {
        (r["url"], r["query_id"])
        for r in hits.join(docs.select("doc_id", "url"), "doc_id").collect()
    }


def test_alert_stream_matches_batch_and_is_idempotent(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    alerts_dir = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    pages = generate_pages(spark, 200, seed=17, parts=2).persist()
    pages.write.mode("overwrite").parquet(input_dir + "/c1")

    q, perc = start_alert_stream(
        spark, input_dir + "/c1", alerts_dir, ckpt + "/1", QUERIES
    )
    q.awaitTermination(300)
    got = {(r["url"], r["query_id"]) for r in perc.alerts().collect()}
    want = _batch_expected(spark, pages)
    assert got == want
    assert want  # non-vacuous: the query set fires on this corpus
    # the dead query never fires
    assert all(qid != 3 for _, qid in got)

    # redelivery: replay the same directory under a FRESH checkpoint —
    # batch ids restart at 0, so overwrite-by-batch replaces rather
    # than duplicates
    q2, perc2 = start_alert_stream(
        spark, input_dir + "/c1", alerts_dir, ckpt + "/2", QUERIES
    )
    q2.awaitTermination(300)
    again = [
        (r["url"], r["query_id"]) for r in perc2.alerts().collect()
    ]
    assert len(again) == len(set(again))  # no duplicate alert rows
    assert set(again) == want


def test_alert_stream_guard(spark, tmp_path):
    with pytest.raises(ValueError):
        StreamingPercolator(spark, str(tmp_path / "a"), {})
