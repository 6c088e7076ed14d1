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
