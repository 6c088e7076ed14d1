"""Checkpointed, resumable multi-stage index build (north rule; M5).

Stage graph (each stage writes parquet under ``index_dir`` and appends a
lineage+metrics row to ``_build_state``):

    docs -> stats -> tf -> terms -> postings (per term_bucket groups)

Resume semantics: a stage (or, for postings, a bucket group) is skipped
iff a ``complete`` state row exists with a matching input fingerprint
and its output exists. Postings are built in bucket groups written via
dynamic partition overwrite — an interrupt between groups leaves a
consistent prefix, and the re-run rebuilds ONLY the missing buckets
(the tf input is pre-filtered by a JVM-side md5 bucket expression that
bit-matches the Python ``term_bucket``). This is the Spark re-expression
of the reference's idempotent delete-then-insert re-index unit
(``repo_indexer.py:148-162``, SURVEY §2.9 ST6) plus the durable-queue
resume (ST1-ST4) — state lives in a table, not a broker.

The reference's scaling defect this replaces: every add triggered a full
O(corpus) BM25 rebuild and a whole-index pickle (bm25_index.py:102-115,
204-217); here re-building bucket B touches only B's partitions.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from datetime import datetime, timezone
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.postings import (
    DEFAULT_BLOCK,
    DEFAULT_TARGET_ROW_POSTINGS,
    N_BUCKETS,
    build_postings,
)
from ..operators.scorer import Index
from ..operators.stats import build_docs, term_freqs, terms_with_idf
from ..schemas import BUILD_STATE

STATE_DIR = "_build_state"


def jvm_term_bucket(col, n_buckets: int):
    """JVM md5 bucket, bit-identical to operators.postings.term_bucket."""
    return (
        F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    ).cast("int")


def _now():
    return datetime.now(timezone.utc).replace(tzinfo=None)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


class BuildState:
    """Append-only lineage + metrics table under ``index_dir``."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.path = os.path.join(index_dir, STATE_DIR)

    def read(self) -> Optional[DataFrame]:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def completed(self, stage: str, fingerprint: str) -> set:
        """-> set of completed partition_ids for the stage (-1 = whole)."""
        st = self.read()
        if st is None:
            return set()
        rows = (
            st.where(
                (F.col("stage") == stage)
                & (F.col("status") == "complete")
                & (F.col("input_fingerprint") == fingerprint)
            )
            .select("partition_id")
            .collect()
        )
        return {r["partition_id"] for r in rows}

    def mark(
        self,
        stage: str,
        fingerprint: str,
        rows: int,
        nbytes: int,
        wall_ms: float,
        partition_ids: Sequence[int] = (-1,),
        status: str = "complete",
        error: Optional[str] = None,
    ):
        recs = [
            (
                stage, int(p), fingerprint, int(rows), int(nbytes),
                float(wall_ms), status, _now(),
                (error[:2000] if error else None),
            )
            for p in partition_ids
        ]
        df = self.spark.createDataFrame(recs, schema=BUILD_STATE)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def errors(self) -> Optional[DataFrame]:
        """The dead-letter view (ST3): every failed work unit with its
        exception, for inspection/requeue."""
        st = self.read()
        if st is None:
            return None
        return st.where(F.col("status") == "failed").orderBy("updated_at")


class BuildError(RuntimeError):
    """Raised when some postings bucket groups failed after retries; the
    successful groups ARE committed and the failures are recorded in
    ``_build_state`` (status='failed', error=<exception>) — re-running
    with resume=True rebuilds only the failed buckets."""

    def __init__(self, failed_buckets: Sequence[int], last_error: str):
        self.failed_buckets = list(failed_buckets)
        super().__init__(
            f"postings build failed for buckets {self.failed_buckets}: {last_error}"
        )


def _fingerprint(**kw) -> str:
    return hashlib.sha256(json.dumps(kw, sort_keys=True).encode()).hexdigest()[:16]


def build_index_persisted(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    resume: bool = True,
    meta_cols: tuple = (),
    block_size: int = DEFAULT_BLOCK,
    target_row_postings: int = DEFAULT_TARGET_ROW_POSTINGS,
    n_buckets: int = N_BUCKETS,
    bucket_groups: int = 4,
    fail_after_groups: Optional[int] = None,
    priorities: Optional[dict] = None,
    group_retries: int = 2,
    poison_buckets: Optional[set] = None,
    phrase_index: bool = False,
    phrase_shard_width: int = 65536,
    sharded_index: bool = False,
    sharded_width: int = 65536,
    fuzzy_index: bool = False,
    docs_src: Optional[DataFrame] = None,
) -> Index:
    """Build (or resume) the persisted index at ``index_dir``.

    ``docs_src``: pre-extracted docs rows (doc_id, url, site, lang,
    *meta_cols, tokens, doc_len) that become the ``docs`` stage
    VERBATIM — no extract/tokenize pass, ids preserved. This is the
    compaction input seam (``compact_incremental``): a streamed
    incremental index already paid for extraction and holds
    arrival-order ids that must survive into the serving layout.
    ``pages`` is ignored when ``docs_src`` is given.

    ``priorities``: optional {bucket: 0-10} (higher first) — the analog
    of the reference's priority queue (queue/publisher.py:68-75);
    unlisted buckets default to 5. ``group_retries``: attempts per
    postings bucket-group before it is dead-lettered to ``_build_state``
    (status='failed' + error) and the remaining groups continue —
    worker.py:144-158's requeue/DLQ semantics.

    ``fail_after_groups`` is a test hook simulating a hard interrupt
    after N postings bucket-groups (raises RuntimeError mid-build);
    ``poison_buckets`` is a test hook making any group containing one of
    those buckets raise (a poison work unit, exercising the DLQ path).
    """
    os.makedirs(index_dir, exist_ok=True)
    state = BuildState(spark, index_dir)
    # input fingerprint = row count + order-insensitive content
    # signature (url + html crc sums), so re-running with resume=True
    # over CHANGED content of the same cardinality rebuilds instead of
    # silently returning a stale index. For the docs_src (compaction)
    # path the token stream stands in for html as the content signal.
    if docs_src is not None:
        # doc_id is part of the identity here: the same content
        # re-streamed in a different arrival order assigns different
        # ids, and a resume that kept the old id layout would break the
        # "arrival-order ids preserved" contract silently
        meta_vals = [F.col(c).cast("string") for c in ("lang", *meta_cols)]
        sig = docs_src.agg(
            F.count("*").alias("n"),
            F.sum(
                F.crc32(F.concat_ws("|", F.col("doc_id").cast("string"), F.col("url")))
            ).alias("us"),
            F.sum(F.crc32(F.concat_ws(" ", F.col("tokens")))).alias("hs"),
            F.sum(F.crc32(F.concat_ws("|", *meta_vals))).alias("ms"),
        ).first()
    else:
        # lang + meta VALUES are content too: a metadata-only change
        # (one row's lang flips) must rebuild, not resume — lang feeds
        # filters/facets/partitioning and the old fingerprint only
        # covered url + html
        meta_vals = [F.col(c).cast("string") for c in ("lang", *meta_cols)]
        sig = pages.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32(F.col("url"))).alias("us"),
            F.sum(F.crc32(F.col("html"))).alias("hs"),
            F.sum(F.crc32(F.concat_ws("|", *meta_vals))).alias("ms"),
        ).first()
    fp = _fingerprint(
        n_pages=int(sig["n"]),
        url_sig=int(sig["us"] or 0),
        html_sig=int(sig["hs"] or 0),
        meta_sig=int(sig["ms"] or 0),
        meta_cols=list(meta_cols),
        block_size=block_size,
        target=target_row_postings,
        n_buckets=n_buckets,
    )

    def stage_done(stage: str, fingerprint: str) -> bool:
        return (
            resume
            and -1 in state.completed(stage, fingerprint)
            and os.path.exists(os.path.join(index_dir, stage))
        )

    def run_stage(stage: str, fn, fingerprint: Optional[str] = None) -> None:
        fpr = fingerprint or fp
        if stage_done(stage, fpr):
            return
        t0 = time.monotonic()
        rows = fn(os.path.join(index_dir, stage))
        wall = (time.monotonic() - t0) * 1000
        state.mark(stage, fpr, rows, _dir_bytes(os.path.join(index_dir, stage)), wall)

    # --- stage: docs (partitioned by lang — the Spark analog of the
    # reference's keyword payload indexes on the filter columns,
    # vector_store.py:135-149: lang-filtered queries prune partitions)
    def _docs(out):
        d = docs_src if docs_src is not None else build_docs(pages, meta_cols=meta_cols)
        d.write.mode("overwrite").partitionBy("lang").parquet(out)
        return spark.read.parquet(out).count()

    run_stage("docs", _docs)
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))

    # --- stage: embeddings (the vector-sink analog, vector_store.py:157-208;
    # deterministic mock embedder — swap for a real model UDF in prod)
    def _embeddings(out):
        from ..api import build_doc_embeddings

        build_doc_embeddings(docs).write.mode("overwrite").parquet(out)
        return spark.read.parquet(out).count()

    run_stage("embeddings", _embeddings)

    # --- stage: stats
    def _stats(out):
        docs.agg(
            F.count("*").alias("n_docs"),
            (F.sum("doc_len").cast("double") / F.count("*")).alias("avgdl"),
        ).coalesce(1).write.mode("overwrite").parquet(out)
        return 1

    run_stage("stats", _stats)
    srow = spark.read.parquet(os.path.join(index_dir, "stats")).first()
    n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"])

    # --- stage: tf
    def _tf(out):
        term_freqs(docs).write.mode("overwrite").parquet(out)
        return spark.read.parquet(out).count()

    run_stage("tf", _tf)
    tf = spark.read.parquet(os.path.join(index_dir, "tf"))

    # --- stage: terms — prefix-prunable dictionary layout: partitioned
    # by the leading character and term-sorted within each partition, so
    # an autocomplete prefix probe prunes to one partition directory and
    # the pushed StringStartsWith predicate then prunes parquet row
    # groups via min/max stats (a contiguous byte range, never a
    # full-vocab scan — operators/snippets.term_suggest)
    def _terms(out):
        t = terms_with_idf(tf, n_docs).withColumn(
            "term_pfx", F.substring("term", 1, 1)
        )
        (
            t.repartition("term_pfx")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_pfx")
            .parquet(out)
        )
        return spark.read.parquet(out).count()

    run_stage("terms", _terms)
    terms = spark.read.parquet(os.path.join(index_dir, "terms"))

    # --- stage: fuzzy_keys (optional) — the SymSpell deletion-key
    # relation (operators/fuzzy.deletion_key_relation), built ONCE
    # beside the term dictionary so fuzzy queries point-probe a
    # key-prefix-partitioned artifact instead of exploding the whole
    # vocabulary per query. Key-sorted within partitions: the pushed
    # key-IN predicate then prunes row groups via min/max stats.
    if fuzzy_index:
        from ..operators.fuzzy import deletion_key_relation

        def _fuzzy(out):
            # range-partition on the full key, NOT hash-on-key_pfx: the
            # prefix has <= 37 distinct values, so repartition("key_pfx")
            # would funnel the entire O(|vocab|*L^2) relation through at
            # most 37 tasks. Ranging on key keeps full parallelism, each
            # task stays key-sorted (row-group pruning intact), and a
            # task's rows map to 1-2 Hive key_pfx partitions — multiple
            # files per partition is fine for the pruned point-probe read.
            (
                deletion_key_relation(terms)
                .repartitionByRange("key")
                .sortWithinPartitions("key")
                .write.mode("overwrite")
                .partitionBy("key_pfx")
                .parquet(out)
            )
            return spark.read.parquet(out).count()

        run_stage("fuzzy_keys", _fuzzy)

    # --- stage: positional (optional) — the compressed phrase index.
    # shard_width is a LAYOUT property of this stage (doc_id = off +
    # range_id*width at query time), so it is folded into the stage
    # fingerprint: resuming with a different width rebuilds instead of
    # silently keeping an incompatible layout.
    if phrase_index:
        from ..operators.positional import build_positional_index

        fp_pos = _fingerprint(base=fp, phrase_shard_width=phrase_shard_width)

        def _positional(out):
            build_positional_index(
                docs, shard_width=phrase_shard_width, n_buckets=n_buckets
            ).write.mode("overwrite").partitionBy("term_bucket").parquet(out)
            return spark.read.parquet(out).count()

        run_stage("positional", _positional, fingerprint=fp_pos)

    # --- stage: sharded (optional) — the doc-range-sharded serving
    # layout (operators/sharded.py): each shard holds complete posting
    # fragments for its doc range, so queries score shard-locally in
    # one pass. Like the positional stage, shard width is a LAYOUT
    # property folded into the stage fingerprint.
    if sharded_index:
        from ..operators.sharded import build_sharded_postings

        fp_shard = _fingerprint(base=fp, sharded_width=sharded_width)

        def _sharded(out):
            build_sharded_postings(
                tf, terms, n_docs, avgdl,
                shard_width=sharded_width, block_size=block_size,
                n_buckets=n_buckets,
            ).write.mode("overwrite").partitionBy("range_id").parquet(out)
            return spark.read.parquet(out).count()

        run_stage("sharded", _sharded, fingerprint=fp_shard)

    # --- stage: postings, per bucket group (partition-level lineage)
    post_dir = os.path.join(index_dir, "postings")
    done_buckets = state.completed("postings", fp) if resume else set()
    all_buckets = list(range(n_buckets))
    missing = [b for b in all_buckets if b not in done_buckets]
    if missing:
        if not done_buckets and os.path.exists(post_dir):
            # fresh postings build for THIS fingerprint into a dir
            # holding a previous build's partitions: dynamic overwrite
            # only replaces buckets the new build writes, so partitions
            # the new bucket set never touches (n_buckets reduced, or a
            # bucket empty under the new vocabulary) would survive and
            # serve stale postings — wipe first. A mid-build resume
            # (done_buckets non-empty) keeps its partial lineage.
            import shutil

            shutil.rmtree(post_dir)
        # ST1 priority scheduling: higher-priority buckets land in
        # earlier (contiguous) groups, so an interrupt after group k has
        # completed the k highest-priority slices first
        prio = priorities or {}
        missing.sort(key=lambda b: (-prio.get(b, 5), b))
        size = max(1, -(-len(missing) // bucket_groups))
        groups: List[List[int]] = [
            missing[i : i + size] for i in range(0, len(missing), size)
        ]
        # scope the dynamic-overwrite setting: restore the session value
        # afterwards so later mode("overwrite") writes keep their
        # static semantics
        try:
            prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        except Exception:  # noqa: BLE001
            prev_mode = None
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        failed: List[int] = []
        last_err = ""
        import threading

        mark_lock = threading.Lock()

        def run_group(gi: int, group: List[int]) -> None:
            nonlocal last_err
            t0 = time.monotonic()
            err: Optional[Exception] = None
            for _attempt in range(max(1, group_retries)):
                try:
                    if poison_buckets and set(group) & set(poison_buckets):
                        raise ValueError(
                            f"poisoned work unit: buckets {sorted(set(group) & set(poison_buckets))}"
                        )
                    tf_g = tf.where(
                        jvm_term_bucket(F.col("term"), n_buckets).isin(group)
                    )
                    p = build_postings(
                        tf_g, terms, n_docs, avgdl,
                        block_size=block_size,
                        target_row_postings=target_row_postings,
                        n_buckets=n_buckets,
                    )
                    p.write.mode("overwrite").partitionBy("term_bucket").parquet(
                        post_dir
                    )
                    err = None
                    break
                except Exception as e:  # noqa: BLE001
                    err = e
            wall = (time.monotonic() - t0) * 1000
            # the lineage table is append-mode parquet whose commit
            # protocol stages under a SHARED _temporary dir — serialized
            # so concurrent groups cannot clobber each other's commit
            with mark_lock:
                if err is None:
                    state.mark(
                        "postings", fp, -1, _dir_bytes(post_dir), wall,
                        partition_ids=group,
                    )
                else:
                    # dead-letter the unit; the other groups continue
                    state.mark(
                        "postings", fp, -1, 0, wall, partition_ids=group,
                        status="failed", error=f"{type(err).__name__}: {err}",
                    )
                    failed.extend(group)
                    last_err = f"{type(err).__name__}: {err}"

        # group concurrency (guide §2.6: overlap independent jobs so one
        # group's straggler tail back-fills with the next group's tasks).
        # Concurrent dynamic-overwrite writes are safe: each write job
        # stages under its own .spark-staging-<jobId> and the groups'
        # term_bucket partition sets are disjoint. The test hooks
        # (simulated interrupt / poison units) and single-group builds
        # keep the sequential path — their committed-prefix semantics
        # are ordering-dependent.
        pool_n = int(os.environ.get("SPARK_GRAFT_BUILD_GROUP_CONCURRENCY", "2"))
        concurrent_ok = (
            pool_n > 1 and len(groups) > 1 and fail_after_groups is None
            and not poison_buckets
        )
        try:
            if concurrent_ok:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=pool_n) as pool:
                    list(pool.map(lambda t: run_group(*t), enumerate(groups)))
            else:
                for gi, group in enumerate(groups):
                    if fail_after_groups is not None and gi >= fail_after_groups:
                        raise RuntimeError(
                            f"simulated interrupt before bucket group {gi} ({group})"
                        )
                    run_group(gi, group)
        finally:
            if prev_mode is not None:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
            else:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        if failed:
            raise BuildError(failed, last_err)

    meta = {
        "n_buckets": n_buckets,
        "block_size": block_size,
        "target_row_postings": target_row_postings,
        "fingerprint": fp,
    }
    meta_path = os.path.join(index_dir, "_meta.json")
    pos_dir = os.path.join(index_dir, "positional")
    shard_dir = os.path.join(index_dir, "sharded")
    old_meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old_meta = json.load(f)
    # layout widths: record the width used this build, or — when the
    # optional stage is off but its parquet from an earlier build
    # persists on disk — preserve the previously recorded width so
    # load_index keeps reconstructing doc ids against the real layout
    if phrase_index:
        meta["phrase_shard_width"] = phrase_shard_width
    elif os.path.exists(pos_dir) and "phrase_shard_width" in old_meta:
        meta["phrase_shard_width"] = int(old_meta["phrase_shard_width"])
    if sharded_index:
        meta["sharded_width"] = sharded_width
    elif os.path.exists(shard_dir) and "sharded_width" in old_meta:
        meta["sharded_width"] = int(old_meta["sharded_width"])
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    postings = spark.read.parquet(post_dir)
    idx = Index(
        spark=spark,
        docs=docs,
        tf=tf,
        terms=terms,
        n_docs=n_docs,
        avgdl=avgdl,
        postings=postings,
        n_buckets=n_buckets,
        path=index_dir,
    )
    if phrase_index:
        # match load_index: quoted queries on the freshly built handle
        # must take the persisted positional path, not the tokens-scan
        # fallback (phrase.py bm25_phrase_topk dispatches on extras)
        idx.extras["positional"] = spark.read.parquet(pos_dir)
        idx.extras["phrase_shard_width"] = phrase_shard_width
    if sharded_index:
        idx.extras["sharded"] = spark.read.parquet(shard_dir)
        idx.extras["sharded_width"] = sharded_width
    fz_dir = os.path.join(index_dir, "fuzzy_keys")
    if os.path.exists(fz_dir):
        idx.extras["fuzzy_keys"] = spark.read.parquet(fz_dir)
    emb_dir = os.path.join(index_dir, "embeddings")
    if os.path.exists(emb_dir):
        # match load_index: the freshly built handle serves the semantic
        # path without recomputing the embeddings stage it just wrote
        idx.extras["embeddings"] = spark.read.parquet(emb_dir)
    return idx


def build_metrics_rollup(spark: SparkSession, index_dir: str) -> DataFrame:
    """A6 stats-rollup surface (the /stats endpoint analog,
    api/server.py:250-280): per-stage lineage + metrics rollup over the
    ``_build_state`` table — work units, rows, bytes, wall time, last
    update, failure counts."""
    st = BuildState(spark, index_dir).read()
    if st is None:
        raise FileNotFoundError(f"no {STATE_DIR} under {index_dir}")
    return (
        st.groupBy("stage", "status")
        .agg(
            F.count("*").alias("n_units"),
            F.sum("rows").alias("rows"),
            F.max("bytes").alias("bytes"),
            F.sum("wall_ms").alias("wall_ms"),
            F.max("updated_at").alias("last_update"),
        )
        .orderBy("stage", "status")
    )


def compact_incremental(
    spark: SparkSession, stream_dir: str, index_dir: str, **build_kw
) -> Index:
    """Compact a streamed incremental index (streaming/incremental.py)
    into the full persisted serving layout — postings segments, and
    optionally the sharded / positional layouts — WITHOUT re-extracting:
    the accumulated stream docs (already extracted + tokenized, with
    arrival-order insertion ids) become the build's ``docs`` stage
    verbatim via ``docs_src``, and every downstream stage runs with the
    standard per-bucket lineage, resume, and DLQ semantics.

    This is the merge policy the incremental module's docstring
    promises: micro-batches keep the index queryable on the exact
    scorer; compaction batches the idf-dependent segment build
    (block-max scores depend on global idf, so segments are rebuilt in
    bulk, not per-batch — the same reasoning as real engines' tiered
    merges).
    """
    # the stream layout is docs/batch=<id>/ subdirs: partition discovery
    # infers a spurious `batch` column that must not leak into the
    # serving docs schema
    docs = spark.read.parquet(os.path.join(stream_dir, "docs")).drop("batch")
    return build_index_persisted(
        spark, pages=None, index_dir=index_dir, docs_src=docs, **build_kw
    )


def merge_indexes_persisted(
    spark: SparkSession, index_dirs, out_dir: str, **build_kw
) -> Index:
    """Merge N persisted indexes into ONE on-disk serving index — the
    Lucene ``IndexWriter.addIndexes`` analog (query-time federation's
    offline counterpart, ``build/indexer.federate_indexes``).

    Id layout is Lucene's: shard 0 keeps its ids, shard i offsets by
    the cumulative doc count (dense ``bases``), so the merged id space
    stays contiguous for the range-sharded serving layouts — and when
    the shards partition a corpus by url order, the merged ids equal
    the monolithic build's url-rank ids exactly (tuple-identity
    tested). The already-extracted docs rows flow through the
    checkpointed builder's ``docs_src`` seam — NO re-extraction — and
    every downstream stage (tf, terms, postings, sharded, positional)
    rebuilds over the merged corpus, so block-max bounds and idf are
    GLOBAL quantities of the merged index, never stale per-shard ones
    (the reason real engines rebuild segments on merge rather than
    concatenating them)."""
    from .indexer import federate_indexes

    idxs = [load_index(spark, d) for d in index_dirs]
    bases, acc = [], 0
    for idx in idxs:
        bases.append(acc)
        acc += int(idx.n_docs)
    fed = federate_indexes(idxs, bases=bases) if len(idxs) > 1 else idxs[0]
    return build_index_persisted(
        spark, pages=None, index_dir=out_dir, docs_src=fed.docs, **build_kw
    )


def load_index(spark: SparkSession, index_dir: str) -> Index:
    srow = spark.read.parquet(os.path.join(index_dir, "stats")).first()
    post_dir = os.path.join(index_dir, "postings")
    meta_path = os.path.join(index_dir, "_meta.json")
    n_buckets = N_BUCKETS
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            n_buckets = int(json.load(f).get("n_buckets", N_BUCKETS))
    idx = Index(
        spark=spark,
        docs=spark.read.parquet(os.path.join(index_dir, "docs")),
        tf=spark.read.parquet(os.path.join(index_dir, "tf")),
        terms=spark.read.parquet(os.path.join(index_dir, "terms")),
        n_docs=int(srow["n_docs"]),
        avgdl=float(srow["avgdl"]),
        postings=spark.read.parquet(post_dir) if os.path.exists(post_dir) else None,
        n_buckets=n_buckets,
        path=index_dir,
    )
    emb_dir = os.path.join(index_dir, "embeddings")
    if os.path.exists(emb_dir):
        idx.extras["embeddings"] = spark.read.parquet(emb_dir)
    pos_dir = os.path.join(index_dir, "positional")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if os.path.exists(pos_dir):
        idx.extras["positional"] = spark.read.parquet(pos_dir)
        idx.extras["phrase_shard_width"] = int(meta.get("phrase_shard_width", 65536))
    shard_dir = os.path.join(index_dir, "sharded")
    if os.path.exists(shard_dir):
        idx.extras["sharded"] = spark.read.parquet(shard_dir)
        idx.extras["sharded_width"] = int(meta.get("sharded_width", 65536))
    fz_dir = os.path.join(index_dir, "fuzzy_keys")
    if os.path.exists(fz_dir):
        idx.extras["fuzzy_keys"] = spark.read.parquet(fz_dir)
    return idx
