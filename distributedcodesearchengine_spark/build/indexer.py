"""Index build orchestration.

``build_index_inmem`` assembles the uncompressed index as cached
DataFrames — the unit-test / interactive path. The persisted,
checkpoint-resumable multi-stage build (parquet segments + _build_state
lineage) lives in ``build/checkpoint.py`` (SURVEY §7.1 M5).

This replaces the reference's O(total-corpus) rebuild-on-every-add
(``bm25_index.py:102-115``) with independent DataFrame stages whose
partial aggregations Catalyst executes map-side; nothing here is
per-document Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.postings import (
    DEFAULT_BLOCK,
    DEFAULT_TARGET_ROW_POSTINGS,
    N_BUCKETS,
    build_postings,
)
from ..operators.scorer import Index
from ..operators.stats import build_docs, corpus_stats, term_freqs, terms_with_idf


def build_index_inmem(
    spark: SparkSession,
    pages: DataFrame,
    cache: bool = True,
    meta_cols: tuple = (),
    cache_tf: bool = True,
) -> Index:
    """``cache_tf=False`` recomputes tf from the cached docs on each
    consumer instead of materializing it — trades (parallel, scalable)
    CPU for memory bandwidth; wins on bandwidth-saturated hosts."""
    docs = build_docs(pages, meta_cols=meta_cols)
    if cache:
        docs = docs.persist()
    n, avgdl = corpus_stats(docs)
    tf = term_freqs(docs)
    terms = terms_with_idf(tf, n)
    if cache:
        if cache_tf:
            tf = tf.persist()
        terms = terms.persist()
    return Index(spark=spark, docs=docs, tf=tf, terms=terms, n_docs=n, avgdl=avgdl)


def remove_docs(index: Index, condition) -> Index:
    """Delete-by-predicate + stats rebuild — the reference's
    ``remove_by_repo`` (bm25_index.py:172-202), which rebuilds the whole
    in-memory corpus without the doomed entries. Spark form: an anti
    filter on docs/tf plus recomputed global stats (df/idf/avgdl change
    when docs leave). Doc ids are retained (the reference REASSIGNS
    positions on removal; we keep ids stable — like Iceberg
    ``DELETE WHERE`` — because ids are referenced by persisted segments;
    rank tie-breaks stay deterministic either way).

    ``condition``: a boolean Column over docs rows; matching docs are
    REMOVED.
    """
    from ..operators.stats import corpus_stats, terms_with_idf

    spark = index.spark
    keep_docs = index.docs.where(~condition)
    keep_ids = keep_docs.select("doc_id")
    tf = index.tf.join(keep_ids, "doc_id", "left_semi")
    n, avgdl = corpus_stats(keep_docs)
    terms = terms_with_idf(tf, n)
    return Index(
        spark=spark, docs=keep_docs, tf=tf, terms=terms, n_docs=n, avgdl=avgdl
    )


def add_postings(
    index: Index,
    block_size: int = DEFAULT_BLOCK,
    target_row_postings: int = DEFAULT_TARGET_ROW_POSTINGS,
    n_buckets: int = N_BUCKETS,
    cache: bool = True,
) -> Index:
    """Build the compressed postings segments onto an existing index."""
    p = build_postings(
        index.tf,
        index.terms,
        index.n_docs,
        index.avgdl,
        block_size=block_size,
        target_row_postings=target_row_postings,
        n_buckets=n_buckets,
    )
    index.postings = p.persist() if cache else p
    index.n_buckets = n_buckets
    return index


def federate_indexes(indexes, shard_bits: int = 40, bases=None) -> Index:
    """N independently-built indexes -> ONE logical index with EXACT
    global statistics — the distributed-serving composition (Lucene's
    sharded IndexSearcher, or per-crawl indexes queried as one corpus).

    Semantics contract (rank-identity-tested): a query over the
    federation scores exactly like the same query over a monolithic
    index built from the concatenated corpora —
    - doc ids re-key to disjoint spaces (shard i << ``shard_bits``;
      per-shard ids must stay under 2^shard_bits), a constant-time
      per-row expression, no max() coordination between shards;
    - N and per-term df merge as exact integer sums — df comes from the
      shards' vocab-sized terms relations (one groupBy over k_i-row
      inputs), NEVER by re-counting the unioned corpus-sized tf;
    - avgdl recomputes from the exact integer doc_len sum over the
      unioned docs (a column-pruned scan) — summing the shards'
      avgdl_i * n_i would round differently than the monolithic build;
    - idf re-derives from the merged df via the shared epsilon-floor
      stage (operators/stats.idf_detail_from_df), because the floor's
      vocabulary average is a GLOBAL quantity no shard knows alone.

    The unioned docs/tf stay lazy partition-unions (no shuffle at
    federation time); queries prune and score through them exactly as
    over a single index.

    ``bases``: optional explicit per-shard id offsets replacing the
    ``i << shard_bits`` spaces — the OFFLINE merge path passes dense
    cumulative doc counts (Lucene's addIndexes id layout: shard 0 keeps
    its ids, shard 1 starts at n_0, ...), which keeps the merged id
    space contiguous for the range-sharded serving layouts. Query-time
    federation keeps the default shifted spaces (constant-time, no
    cross-shard coordination needed).
    """
    spark = indexes[0].spark
    if len(indexes) == 1:
        return indexes[0]
    offsets = bases if bases is not None else [i << shard_bits for i in range(len(indexes))]

    def _rekey(df: DataFrame, i: int) -> DataFrame:
        return df.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(int(offsets[i]))).cast("long")
        )

    docs = tf = None
    for i, idx in enumerate(indexes):
        d, t = _rekey(idx.docs, i), _rekey(idx.tf, i)
        docs = d if docs is None else docs.unionByName(d, allowMissingColumns=True)
        tf = t if tf is None else tf.unionByName(t, allowMissingColumns=True)
    n = sum(int(idx.n_docs) for idx in indexes)
    total_len = docs.agg(F.sum("doc_len").alias("s")).first()["s"]
    avgdl = float(total_len) / float(n)
    dfs = None
    for idx in indexes:
        part = idx.terms.select("term", "df")
        dfs = part if dfs is None else dfs.unionByName(part)
    merged_df = dfs.groupBy("term").agg(F.sum("df").cast("long").alias("df"))
    from ..operators.stats import idf_detail_from_df

    terms = idf_detail_from_df(merged_df, n).select("term", "df", "idf")
    return Index(
        spark=spark, docs=docs, tf=tf, terms=terms, n_docs=n, avgdl=avgdl
    )
