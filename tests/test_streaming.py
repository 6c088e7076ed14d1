"""Structured Streaming incremental index: drain a pages directory in
micro-batches, assert the resulting index answers queries identically
(by url + score) to a batch-built index over the same pages, and that
redelivered/duplicate urls are not double-indexed."""

import os

import pytest

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.sources.corpus import generate_pages
from distributedcodesearchengine_spark.streaming.incremental import (
    start_incremental_index,
)

QUERIES = ["JSON parsing", "parseJSON HTTPClient2", "send HTTP request"]


def test_incremental_stream_index(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    index_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    # two arrival chunks + a duplicate redelivery of chunk 1
    all_pages = generate_pages(spark, 300, seed=9, parts=2).persist()
    c1 = all_pages.filter("warc_ts < '2024-01-01 00:32:30'")
    c2 = all_pages.filter("warc_ts >= '2024-01-01 00:32:30'")
    c1.write.mode("overwrite").parquet(input_dir + "/c1")
    q, indexer = start_incremental_index(
        spark, input_dir + "/c1", index_dir, ckpt + "/1"
    )
    q.awaitTermination(300)
    n1 = indexer.load().n_docs
    assert 0 < n1 < 300

    # chunk 2 + chunk-1 duplicates into a second stream directory pass
    c2.write.mode("overwrite").parquet(input_dir + "/c2")
    c1.write.mode("append").parquet(input_dir + "/c2")  # redelivery
    q2, indexer = start_incremental_index(
        spark, input_dir + "/c2", index_dir, ckpt + "/2"
    )
    q2.awaitTermination(300)

    streamed = indexer.load()
    assert streamed.n_docs == 300  # dedup on redelivery

    batch_index = build_index_inmem(spark, all_pages)
    for query in QUERIES:
        a = [
            (r["url"], round(r["score"], 9))
            for r in bm25_topk(streamed, query, k=10).collect()
        ]
        b = [
            (r["url"], round(r["score"], 9))
            for r in bm25_topk(batch_index, query, k=10).collect()
        ]
        # ids differ (arrival order vs url rank) but the scored results
        # must agree as (url, score) sets and in score order
        assert sorted(a, key=lambda x: (-x[1], x[0])) == sorted(
            b, key=lambda x: (-x[1], x[0])
        ), query
    all_pages.unpersist()


def test_same_batch_id_redelivery(spark, tmp_path):
    """Crash-redelivery of the SAME batch id must be idempotent: the
    batch's own pre-crash write must not feed the url dedup (which would
    filter the batch to empty and clobber the subdir), and a partial
    (no-_SUCCESS) write must be cleanly rebuilt."""
    from distributedcodesearchengine_spark.streaming.incremental import (
        IncrementalIndexer,
    )

    index_dir = str(tmp_path / "idx")
    pages = generate_pages(spark, 60, seed=3, parts=2).persist()
    b1 = pages.filter("warc_ts < '2024-01-01 00:06:30'").persist()
    b2 = pages.subtract(b1)

    ix = IncrementalIndexer(spark, index_dir, run_tag="t")
    ix.process_batch(b1, 0)
    ix.process_batch(b2, 1)
    base = ix.load()
    docs0 = {(r.url, r.doc_id) for r in base.docs.collect()}

    # committed redelivery of batch 1 -> short-circuit, nothing changes
    ix.process_batch(b2, 1)
    assert {(r.url, r.doc_id) for r in ix.load().docs.collect()} == docs0

    # partial-crash redelivery: drop _SUCCESS to simulate a mid-write
    # crash, then redeliver -> subdir rebuilt with identical content
    os.remove(os.path.join(index_dir, "tf/batch=t_1/_SUCCESS"))
    ix.process_batch(b2, 1)
    after = ix.load()
    assert {(r.url, r.doc_id) for r in after.docs.collect()} == docs0
    assert after.n_docs == base.n_docs
    pages.unpersist()
    b1.unpersist()


def test_compact_incremental_to_serving_layout(spark, tmp_path, capsys):
    """Lifecycle close: stream-ingest -> compact (no re-extraction,
    arrival-order ids preserved) -> serve from the compressed postings
    (WAND) and sharded layouts, rank-identical to the exact scorer over
    the stream index."""
    import json

    from distributedcodesearchengine_spark.build.checkpoint import load_index
    from distributedcodesearchengine_spark.cli import main
    from distributedcodesearchengine_spark.operators.wand import wand_topk

    input_dir = str(tmp_path / "in")
    stream_dir = str(tmp_path / "stream")
    index_dir = str(tmp_path / "compacted")
    generate_pages(spark, 200, seed=31, parts=2).write.parquet(input_dir)
    q, indexer = start_incremental_index(
        spark, input_dir, stream_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    streamed = indexer.load()
    assert streamed.n_docs == 200

    rc = main(
        ["compact", "--stream-index", stream_dir, "--index", index_dir,
         "--sharded-index"],
        spark=spark,
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["n_docs"] == 200

    compacted = load_index(spark, index_dir)
    assert compacted.n_docs == 200
    for query in QUERIES:
        exact = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(streamed, query, k=10).collect()
        ]
        wand = [
            (r["doc_id"], round(r["score"], 9))
            for r in wand_topk(compacted, query, k=10).collect()
        ]
        # ids preserved through compaction -> exact tuple identity
        assert exact == wand, query
    # resume no-op: a second compact over the same stream is instant
    rc = main(
        ["compact", "--stream-index", stream_dir, "--index", index_dir,
         "--sharded-index"],
        spark=spark,
    )
    assert rc == 0


def test_streaming_content_dedup(spark, tmp_path):
    """content_dedup=True drops re-crawled content at NEW urls across
    micro-batches (and within a batch), while distinct content still
    indexes; off by default, alias urls index as separate docs."""
    from pyspark.sql import functions as F

    from distributedcodesearchengine_spark.streaming.incremental import (
        IncrementalIndexer,
    )

    pages = generate_pages(spark, 40, seed=21, parts=2).persist()
    urls = sorted(r["url"] for r in pages.select("url").collect())
    b1 = pages.filter(F.col("url").isin(urls[:20])).persist()
    # batch 2: 10 fresh pages + 5 of batch 1's pages under alias urls
    fresh = pages.filter(F.col("url").isin(urls[20:30]))
    alias = (
        pages.filter(F.col("url").isin(urls[:5]))
        .withColumn("url", F.concat(F.lit("https://mirror.example/"), F.col("url")))
    )
    # in-batch twins: the same aliased content twice more
    alias2 = alias.withColumn("url", F.concat(F.col("url"), F.lit("?x=1")))
    b2 = fresh.unionByName(alias).unionByName(alias2).persist()

    idx_dir = str(tmp_path / "dd")
    ix = IncrementalIndexer(spark, idx_dir, run_tag="t", content_dedup=True)
    ix.process_batch(b1, 0)
    ix.process_batch(b2, 1)
    got = ix.load()
    # 20 + 10 fresh; all 10 alias rows (5 contents x 2 urls) dropped
    assert got.n_docs == 30
    urls = {r["url"] for r in got.docs.select("url").collect()}
    assert not any("mirror.example" in u for u in urls)

    # control: content_dedup off -> aliases index as separate docs
    idx2 = str(tmp_path / "nodd")
    ix2 = IncrementalIndexer(spark, idx2, run_tag="t")
    ix2.process_batch(b1, 0)
    ix2.process_batch(b2, 1)
    assert ix2.load().n_docs == 40  # 20 + 10 + 10 alias rows

    # redelivery of batch 1 stays a no-op with the sidecar present
    ix.process_batch(b1, 0)
    assert ix.load().n_docs == 30
    pages.unpersist()


def test_ids_stable_across_repartitioned_replay(spark, tmp_path):
    """Batch doc_ids are a pure function of the admitted url set: the
    same batch content replayed with a different physical partitioning
    (1 vs 8 partitions, shuffled row order) must assign IDENTICAL
    (url, doc_id) pairs — the per-bucket offset scheme may not leak
    input-layout artifacts into ids (and must keep them contiguous
    from the offset)."""
    from distributedcodesearchengine_spark.streaming.incremental import (
        _docs_delta,
    )

    pages = generate_pages(spark, 120, seed=17, parts=3).persist()
    a = _docs_delta(pages.coalesce(1), 40, ())
    b = _docs_delta(pages.repartition(8, "html"), 40, ())
    ids_a = {(r.url, r.doc_id) for r in a.collect()}
    ids_b = {(r.url, r.doc_id) for r in b.collect()}
    assert ids_a == ids_b
    got = sorted(i for _, i in ids_a)
    assert got == list(range(40, 40 + 120))
    pages.unpersist()
