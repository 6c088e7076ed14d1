"""Spark-side implementations for the driver contract in __spark_entry__.py.

Each function takes (spark, sf_dir) and returns a DataFrame whose column
names/types and values match the paired DuckDB SQL from
``functions/sql_oracle.py`` (floats rounded to 6 dp on both sides;
doc_id reported as the ORIGINAL documents.doc_id parsed back from the
engine's url key, so the oracle never needs to model engine-internal
ids).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build.indexer import build_index_inmem
from .operators.scorer import Index, bm25_topk
from .operators.stats import corpus_stats, term_freqs, terms_with_idf_detail
from .sources.tables import documents_as_pages, load_table

_INDEX_CACHE: Dict[str, Index] = {}


def get_documents_index(spark: SparkSession, sf_dir: str) -> Index:
    key = f"{sf_dir}|{id(spark)}"
    if key not in _INDEX_CACHE:
        pages = documents_as_pages(spark, sf_dir)
        idx = build_index_inmem(spark, pages, meta_cols=("source",))
        # keep raw-idf detail around for the stats queries
        idx.extras["terms_detail"] = terms_with_idf_detail(idx.tf, idx.n_docs).persist()
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


def _orig_doc_id(col="url"):
    return F.regexp_extract(col, r"(\d+)$", 1).cast("long").alias("doc_id")


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = get_documents_index(spark, sf_dir)
    return (
        idx.docs.select(_orig_doc_id(), F.col("doc_len").cast("long").alias("n_tokens"))
        .orderBy("doc_id")
    )


def corpus_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = get_documents_index(spark, sf_dir)
    detail = idx.extras["terms_detail"]
    n, avgdl = idx.n_docs, idx.avgdl
    agg = detail.agg(
        F.count("*").alias("vocab_size"),
        F.sum(F.when(F.col("idf_raw") < 0, 1).otherwise(0)).alias("n_floored"),
    )
    return agg.select(
        F.lit(n).cast("long").alias("n_docs"),
        F.lit(round(avgdl, 6)).alias("avgdl"),
        F.col("vocab_size"),
        F.col("n_floored").cast("long").alias("n_floored"),
    )


def term_df_topk(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    idx = get_documents_index(spark, sf_dir)
    return (
        idx.terms.orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .select("term", "df", F.round("idf", 6).alias("idf"))
    )


IDF_SAMPLE_TERMS = ["json", "query", "row", "scan", "spark", "table", "the"]


def idf_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = get_documents_index(spark, sf_dir)
    return (
        idx.terms.where(F.col("term").isin(IDF_SAMPLE_TERMS))
        .select("term", "df", F.round("idf", 6).alias("idf"))
        .orderBy("term")
    )


def bm25_query(
    spark: SparkSession,
    sf_dir: str,
    query: str,
    k: int = 10,
    lang: Optional[str] = None,
    source: Optional[str] = None,
) -> DataFrame:
    idx = get_documents_index(spark, sf_dir)
    filters = {}
    if lang:
        filters["lang"] = lang
    if source:
        filters["source"] = source
    res = bm25_topk(idx, query, k=k, filters=filters or None)
    return res.select(
        "rank", _orig_doc_id(), F.round("score", 6).alias("score")
    ).orderBy("rank")


def lang_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang")
    )
