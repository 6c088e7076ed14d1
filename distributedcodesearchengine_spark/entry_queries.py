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
from .functions.rounding import round6, round6_py
from .operators.scorer import Index, bm25_topk
from .operators.stats import corpus_stats, term_freqs, terms_with_idf_detail
from .sources.tables import documents_as_pages, load_table

_INDEX_CACHE: Dict[str, Index] = {}


def clear_index_cache() -> None:
    """Unpersist and drop every cached gate index — long-lived services
    embedding this module must call this between corpora or the per-
    (sf_dir, session) persisted DataFrames accumulate executor memory."""
    for idx in _INDEX_CACHE.values():
        for df in (idx.tf, idx.docs, idx.terms, *idx.extras.values()):
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 - non-DF extras / dead session
                pass
    _INDEX_CACHE.clear()


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
        F.lit(round6_py(avgdl)).alias("avgdl"),
        F.col("vocab_size"),
        F.col("n_floored").cast("long").alias("n_floored"),
    )


def term_df_topk(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    idx = get_documents_index(spark, sf_dir)
    return (
        idx.terms.orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .select("term", "df", round6("idf").alias("idf"))
    )


IDF_SAMPLE_TERMS = ["json", "query", "row", "scan", "spark", "table", "the"]


def idf_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = get_documents_index(spark, sf_dir)
    return (
        idx.terms.where(F.col("term").isin(IDF_SAMPLE_TERMS))
        .select("term", "df", round6("idf").alias("idf"))
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
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_facets_q(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Facet sidebar counts over the BM25 kept set (operators/explore)."""
    from .operators.explore import bm25_facets

    idx = get_documents_index(spark, sf_dir)
    return bm25_facets(idx, query)


def bm25_histogram_q(
    spark: SparkSession, sf_dir: str, query: str, interval: int = 50
) -> DataFrame:
    """Histogram aggregation over the BM25 kept set (operators/explore)."""
    from .operators.explore import bm25_histogram

    idx = get_documents_index(spark, sf_dir)
    return bm25_histogram(idx, query, col="doc_len", interval=interval)


def bm25_stats_agg_q(
    spark: SparkSession, sf_dir: str, query: str
) -> DataFrame:
    """Stats aggregation over the BM25 kept set (operators/explore)."""
    from .operators.explore import bm25_stats_agg

    idx = get_documents_index(spark, sf_dir)
    return bm25_stats_agg(idx, query, col="doc_len")


def bm25_filters_agg_q(
    spark: SparkSession, sf_dir: str, query: str
) -> DataFrame:
    """Named-filter-bucket counts over the BM25 kept set
    (operators/aggs.bm25_filters_agg — the ES filters agg)."""
    from .operators.aggs import bm25_filters_agg

    idx = get_documents_index(spark, sf_dir)
    return bm25_filters_agg(
        idx,
        query,
        buckets={"de": ("lang", "de"), "en": ("lang", "en"),
                 "s7": ("source", "src7")},
    )


def bm25_range_agg_q(
    spark: SparkSession, sf_dir: str, query: str, cuts=(20, 40)
) -> DataFrame:
    """Explicit-bounds range buckets of doc_len over the BM25 kept set
    (operators/aggs.bm25_range_agg — the ES range agg)."""
    from .operators.aggs import bm25_range_agg

    idx = get_documents_index(spark, sf_dir)
    return bm25_range_agg(idx, query, col="doc_len", cuts=cuts)


def bm25_top_hits_q(
    spark: SparkSession, sf_dir: str, query: str, per_bucket: int = 3
) -> DataFrame:
    """Per-lang independent top-n rankings over the BM25 kept set
    (operators/aggs.bm25_top_hits — ES terms agg + top_hits)."""
    from .operators.aggs import bm25_top_hits

    idx = get_documents_index(spark, sf_dir)
    return bm25_top_hits(idx, query, key="lang", per_bucket=per_bucket)


def bm25_rare_terms_q(
    spark: SparkSession, sf_dir: str, query: str, max_df: int = 2, k: int = 20
) -> DataFrame:
    """Rarest terms of the BM25 kept set (operators/aggs.bm25_rare_terms
    — the ES rare_terms agg)."""
    from .operators.aggs import bm25_rare_terms

    idx = get_documents_index(spark, sf_dir)
    return bm25_rare_terms(idx, query, max_df=max_df, k=k)


def bm25_extended_stats_q(
    spark: SparkSession, sf_dir: str, query: str
) -> DataFrame:
    """Extended stats (exact moments + variance/std) of doc_len over
    the BM25 kept set (operators/aggs.bm25_extended_stats)."""
    from .operators.aggs import bm25_extended_stats

    idx = get_documents_index(spark, sf_dir)
    return bm25_extended_stats(idx, query, col="doc_len")


def bm25_percentile_ranks_q(
    spark: SparkSession, sf_dir: str, query: str, values=(20, 40)
) -> DataFrame:
    """Exact percentile ranks of doc_len probes over the BM25 kept set
    (operators/aggs.bm25_percentile_ranks)."""
    from .operators.aggs import bm25_percentile_ranks

    idx = get_documents_index(spark, sf_dir)
    return bm25_percentile_ranks(idx, query, col="doc_len", values=values)


def bm25_cardinality_q(
    spark: SparkSession, sf_dir: str, query: str
) -> DataFrame:
    """Exact value_count + distinct count of source over the BM25 kept
    set (operators/aggs.bm25_cardinality)."""
    from .operators.aggs import bm25_cardinality

    idx = get_documents_index(spark, sf_dir)
    return bm25_cardinality(idx, query, col="source")


def bm25_decay_q(
    spark: SparkSession, sf_dir: str, query: str, decay: str = "gauss",
    origin: int = 30, scale: int = 20, k: int = 10
) -> DataFrame:
    """Decay function scoring (ES function_score gauss/linear) over the
    BM25 kept set (operators/decay.bm25_decay_topk)."""
    from .operators.decay import bm25_decay_topk

    idx = get_documents_index(spark, sf_dir)
    return bm25_decay_topk(
        idx, query, col="doc_len", origin=origin, scale=scale,
        decay=decay, k=k,
    )


def bm25_boosting_q(
    spark: SparkSession, sf_dir: str, positive: str, negative: str,
    negative_boost: float = 0.5, k: int = 10,
) -> DataFrame:
    """ES boosting query gate entry: BM25(positive) with negative
    matches demoted by negative_boost (operators/boosting)."""
    from .operators.boosting import bm25_boosting_topk

    idx = get_documents_index(spark, sf_dir)
    return bm25_boosting_topk(
        idx, positive, negative, negative_boost=negative_boost, k=k
    )


def did_you_mean_q(
    spark: SparkSession, sf_dir: str, query: str, max_dist: int = 1
) -> DataFrame:
    """Whole-query spell correction (operators/snippets.did_you_mean)
    via the persisted SymSpell deletion-key relation."""
    from .operators.snippets import did_you_mean

    idx = get_documents_index(spark, sf_dir)
    return did_you_mean(idx, query, max_dist=max_dist)


def bm25_composite_agg_q(
    spark: SparkSession, sf_dir: str, query: str, size: int = 5, after=None
) -> DataFrame:
    """Keyset-paginated (lang, source) facet buckets over the BM25 kept
    set (operators/aggs.bm25_composite_agg — the ES composite agg)."""
    from .operators.aggs import bm25_composite_agg

    idx = get_documents_index(spark, sf_dir)
    return bm25_composite_agg(
        idx, query, keys=("lang", "source"), size=size, after=after
    )


def significant_terms_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 20, min_fg: int = 2
) -> DataFrame:
    """Significant-terms aggregation over the BM25 kept set
    (operators/significant): term-space result-set analytics."""
    from .operators.significant import significant_terms

    idx = get_documents_index(spark, sf_dir)
    return significant_terms(idx, query, k=k, min_fg=min_fg)


def bm25_search_after_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """Keyset-paginated page 2 (operators/scorer.bm25_topk_after): run
    page 1, take its last row's RAW (score, doc_id) as the cursor, and
    fetch the next page through the keyset cut. The oracle reaches the
    same rows as the rank window k+1..2k, so this entry pins
    keyset == offset-window row-for-row across engines."""
    from .operators.scorer import bm25_topk, bm25_topk_after

    idx = get_documents_index(spark, sf_dir)
    page1 = bm25_topk(idx, query, k=k).orderBy("rank").collect()
    if len(page1) < k:
        # a first page shorter than k has no continuation
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    last = page1[-1]
    res = bm25_topk_after(
        idx, query, k=k, after=(float(last["score"]), int(last["doc_id"]))
    )
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def more_like_this_q(
    spark: SparkSession, sf_dir: str, seed_doc_id: int, m: int = 5, k: int = 10
) -> DataFrame:
    """MLT retrieval (operators/explore) — gate corpus doc ids equal the
    table's doc_id (documents_as_pages), so the seed passes through and
    result ids parse back from the url key like every BM25 entry."""
    from .operators.explore import more_like_this

    idx = get_documents_index(spark, sf_dir)
    res = more_like_this(idx, seed_doc_id, m=m, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_sharded_query(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """The sharded low-latency serving path as a gate entry: build the
    doc-range-sharded layout over the documents index (cached on the
    handle) and serve through sharded_single_topk — rank- and
    score-identical to the exact scorer, so it shares the bm25_topk_sql
    oracle (degenerate queries exercise the documented exact-path
    fallback inside the operator)."""
    from dataclasses import replace

    from .operators.sharded import build_sharded_postings, sharded_single_topk

    idx = get_documents_index(spark, sf_dir)
    width = 64  # ~8 shards at the gate's 500-doc corpus
    if "sharded" not in idx.extras:
        sh = build_sharded_postings(
            idx.tf, idx.terms, idx.n_docs, idx.avgdl, shard_width=width
        ).persist()
        idx.extras["sharded"] = sh
        idx.extras["sharded_width"] = width
    sidx = replace(idx, postings=idx.extras["sharded"])
    res = sharded_single_topk(sidx, query, k=k, shard_width=width)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_phrase_query(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """Quoted-query gate entry: BM25 ranking over exact-phrase docs."""
    from .operators.phrase import bm25_phrase_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_phrase_topk(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def query_string_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """query_string gate entry: the Lucene mini-language compiled onto
    the house primitives (operators/querystring)."""
    from .operators.querystring import bm25_query_string_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_query_string_topk(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_boolean_query_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """Boolean occur-flag gate entry: BM25 under +required/-excluded."""
    from .operators.boolquery import bm25_boolean_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_boolean_topk(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_boosted_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """Query-time clause-boost gate entry (operators/boostquery)."""
    from .operators.boostquery import bm25_boosted_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_boosted_topk(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_msm_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10, msm: int = 2
) -> DataFrame:
    """minimum_should_match gate entry (operators/boolquery)."""
    from .operators.boolquery import bm25_topk_msm

    idx = get_documents_index(spark, sf_dir)
    res = bm25_topk_msm(idx, query, k=k, msm=msm)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_terms_set_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """terms_set gate entry (operators/boolquery): per-doc
    minimum_should_match from the deterministic doc_id % 3 + 1
    derivation."""
    from .operators.boolquery import bm25_topk_terms_set

    idx = get_documents_index(spark, sf_dir)
    res = bm25_topk_terms_set(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_near_query_q(
    spark: SparkSession, sf_dir: str, query: str, w: int, k: int = 10
) -> DataFrame:
    """NEAR gate entry: BM25 over docs with all terms in a w-window."""
    from .operators.proximity import bm25_proximity_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_proximity_topk(idx, query, w, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_ordered_near_query_q(
    spark: SparkSession, sf_dir: str, query: str, w: int, k: int = 10
) -> DataFrame:
    """Ordered-NEAR gate entry: BM25 over docs whose tokens contain the
    query sequence IN ORDER within a w-window."""
    from .operators.proximity import bm25_ordered_near_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_ordered_near_topk(idx, query, w, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_wildcard_query_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    max_expansions: int = 16,
) -> DataFrame:
    """Wildcard gate entry: BM25 over capped prefix expansions."""
    from .operators.wildcard import bm25_wildcard_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_wildcard_topk(idx, query, k=k, max_expansions=max_expansions)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_fuzzy_query_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    max_expansions: int = 16,
) -> DataFrame:
    """Fuzzy gate entry: BM25 over edit-distance expansions."""
    from .operators.fuzzy import bm25_fuzzy_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_fuzzy_topk(idx, query, k=k, max_expansions=max_expansions)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25f_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    w_title: float = 2.0, w_body: float = 1.0, title_chars: int = 60,
) -> DataFrame:
    """BM25F gate entry: title := the first ``title_chars`` characters
    of the text (deterministic on both engines; at weight 2 the short
    field genuinely reranks vs single-field BM25 — asserted in
    tests/test_bm25f.py), body := the full text."""
    from .operators.fields import FieldSpec, bm25f_topk

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, title_chars).alias("title"),
        F.col("text").alias("body"),
    )
    fields = [FieldSpec("title", w_title, 0.75), FieldSpec("body", w_body, 0.75)]
    res = bm25f_topk(d, query, fields, k=k)
    return res.select("rank", "doc_id", round6("score").alias("score")).orderBy(
        "rank"
    )


def dismax_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    tie: float = 0.0, w_title: float = 2.0, w_body: float = 1.0,
    title_chars: int = 60,
) -> DataFrame:
    """DisMax (best_fields) gate entry over the same synthetic
    title/body split as bm25f_q — each field scored as its own BM25
    index, combined max + tie * rest."""
    from .operators.fields import FieldSpec, dismax_topk

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, title_chars).alias("title"),
        F.col("text").alias("body"),
    )
    fields = [FieldSpec("title", w_title, 0.75), FieldSpec("body", w_body, 0.75)]
    res = dismax_topk(d, query, fields, k=k, tie=tie)
    return res.select("rank", "doc_id", round6("score").alias("score")).orderBy(
        "rank"
    )


def bm25_clickboost_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    weight: float = 0.2,
) -> DataFrame:
    """Click-prior boosted BM25 gate entry (events join)."""
    from .operators.explore import bm25_clickboost_topk

    idx = get_documents_index(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    res = bm25_clickboost_topk(idx, query, events, k=k, weight=weight)
    return (
        res.join(idx.docs.select("doc_id", "url"), "doc_id")
        .select("rank", _orig_doc_id(), "score", "n_clicks")
        .orderBy("rank")
    )


def bm25_federated_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """Federation gate entry: split the corpus by doc_id parity, build
    two INDEPENDENT indexes, federate, and search — the exact-global-
    stats merge makes the result identical to the monolithic oracle
    for healthy queries (original ids parse back from urls, so the
    re-keyed federated id space never reaches the compare)."""
    from .build.indexer import build_index_inmem, federate_indexes

    from .operators.scorer import query_term_weights, score_matched

    key = f"fed|{sf_dir}|{id(spark)}"
    if key not in _INDEX_CACHE:
        pages = documents_as_pages(spark, sf_dir)
        orig = F.regexp_extract("url", r"(\d+)$", 1).cast("long")
        shards = [
            build_index_inmem(
                spark, pages.where(orig % 2 == i), meta_cols=("source",)
            )
            for i in (0, 1)
        ]
        _INDEX_CACHE[key] = federate_indexes(shards)
    fed = _INDEX_CACHE[key]
    # The top-k CUT must happen in the original id space: federated ids
    # re-key per shard, so an exact-score tie AT the k boundary would
    # keep a different doc than the monolithic oracle if cut by internal
    # id (observed at sf0.1: two docs tied at the kth score, one per
    # parity shard). Scores are bit-identical to monolithic (exact
    # merged stats + canonical fold), so re-expressing only the cut on
    # (score desc, original id asc) — the oracle's ordering — makes the
    # kept SET shard-layout-independent. No rank column: within-tie
    # rank is still presentation-order, the compare key is (doc_id,
    # score).
    from .oracle.tokenizer import tokenize as _tok

    if not _tok(query):
        # empty-query guard, mirroring bm25_topk (and the oracle):
        # a query with no tokens returns NO rows, not a zero backfill
        return spark.createDataFrame([], "doc_id long, score double")
    ocol = F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("orig")
    qw = query_term_weights(fed, query)
    cand = mx = None
    if qw:
        cand = (
            score_matched(fed, qw)
            .join(fed.docs.select("doc_id", "url"), "doc_id")
            .select(ocol, "score")
        )
        mx = cand.agg(F.max("score").alias("m")).first()["m"]
    if mx is not None and mx > 0:
        kept = cand.where(F.col("score") >= F.lit(0.01 * mx))
    else:
        # degenerate regime mirrors finalize_topk's zero-backfill, on
        # original ids: k smallest-orig zero rows via a narrow TakeOrdered
        zeros = fed.docs.select(ocol, F.lit(0.0).alias("score"))
        if cand is not None:
            zeros = zeros.join(cand.select("orig"), "orig", "left_anti")
            kept = cand.unionByName(zeros.orderBy("orig").limit(k))
        else:
            kept = zeros.orderBy("orig").limit(k)
    top = kept.orderBy(F.desc("score"), F.asc("orig")).limit(k)
    return top.select(
        F.col("orig").alias("doc_id"), round6("score").alias("score")
    ).orderBy("doc_id")


def query_snippets_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """(rank, doc_id, snippet) for the query's BM25 top-k. Snippet term
    priority contract: query-token order, first occurrence wins (static,
    so the DuckDB oracle derives the same order without corpus stats)."""
    from .operators.snippets import query_snippets
    from .oracle.tokenizer import tokenize

    res = bm25_query(spark, sf_dir, query, k=k)
    seen: list = []
    for t in tokenize(query):
        if t not in seen:
            seen.append(t)
    return query_snippets(res, load_table(spark, sf_dir, "documents"), seen)


def highlighted_snippets_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """(rank, doc_id, fragment): marked snippets for the BM25 top-k."""
    from .operators.snippets import highlighted_snippets
    from .oracle.tokenizer import tokenize

    res = bm25_query(spark, sf_dir, query, k=k)
    seen: list = []
    for t in tokenize(query):
        if t not in seen:
            seen.append(t)
    return highlighted_snippets(res, load_table(spark, sf_dir, "documents"), seen)


def term_suggest_q(
    spark: SparkSession, sf_dir: str, prefix: str, k: int = 10
) -> DataFrame:
    from .operators.snippets import term_suggest

    idx = get_documents_index(spark, sf_dir)
    return term_suggest(idx.terms, prefix, k=k)


def lang_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


def highlights(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """P11/P12 highlight + truncation projections."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.substring("text", 1, 200).alias("highlight"),
            F.substring("text", 1, 80).alias("snippet"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def cosine_topk_q(spark: SparkSession, sf_dir: str, text: str, k: int = 10) -> DataFrame:
    from .functions.embed import cosine_topk, mock_embed_text

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = mock_embed_text(text, 64)
    res = cosine_topk(emb, qvec, k, id_col="vec_id")
    return res.select("rank", "vec_id", round6("score").alias("score"))


def cosine_topk_filtered_q(
    spark: SparkSession, sf_dir: str, text: str, k: int = 10,
    label: Optional[int] = None, lang: Optional[str] = None,
) -> DataFrame:
    """ES kNN-with-filter gate entry: exact cosine top-k over the
    filtered candidate set (functions/embed.cosine_topk_filtered) —
    label = embeddings-side pushdown filter, lang = documents-side
    id semi-join."""
    from pyspark.sql import functions as F

    from .functions.embed import cosine_topk_filtered, mock_embed_text

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = mock_embed_text(text, 64)
    id_filter = None
    if lang is not None:
        id_filter = (
            load_table(spark, sf_dir, "documents")
            .where(F.col("lang") == lang)
            .select("doc_id")
        )
    res = cosine_topk_filtered(
        emb, qvec, k, label=label, id_filter=id_filter, id_col="vec_id"
    )
    return res.select("rank", "vec_id", round6("score").alias("score"))


# note: the driver's documents corpus has a ~30-word vocab where only
# 'dup' has positive idf — these queries are pinned to it so each
# query's max score is positive (the batch scorer leaves the
# all-non-positive degenerate backfill to the per-query path, which the
# other gate queries exercise)
BATCH_QUERIES = {1: "dup", 2: "dup table row", 3: "dup dup scan"}


def bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch multi-query scorer over the documents corpus."""
    from .operators.scorer import bm25_topk_batch

    idx = get_documents_index(spark, sf_dir)
    res = bm25_topk_batch(idx, BATCH_QUERIES, k=10)
    return res.select(
        "query_id", "rank", "doc_id", round6("score").alias("score")
    ).orderBy("query_id", "rank")


def removal_rebuild(spark: SparkSession, sf_dir: str, source: str = "src7") -> DataFrame:
    """Delete-by-predicate + stats rebuild (reference remove_by_repo,
    bm25_index.py:172-202): corpus stats and a term-df sample after
    removing one source's documents."""
    from .build.indexer import remove_docs

    idx = get_documents_index(spark, sf_dir)
    smaller = remove_docs(idx, F.col("source") == source)
    stats = smaller.terms.agg(
        F.count("*").alias("vocab_size"), F.sum("df").alias("total_df")
    )
    return stats.select(
        F.lit(smaller.n_docs).cast("long").alias("n_docs"),
        F.lit(round6_py(smaller.avgdl)).alias("avgdl"),
        F.col("vocab_size"),
        F.col("total_df").cast("long").alias("total_df"),
    )


def bm25_range_q(
    spark: SparkSession, sf_dir: str, query: str, lo=None, hi=None, k: int = 10
) -> DataFrame:
    """Range-filtered BM25 gate entry (doc_len between lo and hi)."""
    from .operators.scorer import bm25_topk_range

    idx = get_documents_index(spark, sf_dir)
    res = bm25_topk_range(idx, query, k=k, ranges={"doc_len": (lo, hi)})
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def rerank_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10, depth: int = 20
) -> DataFrame:
    """Cross-encoder rerank gate entry (BM25 recall -> pair-model
    precision; deterministic mock model)."""
    from .functions.rerank import cross_rerank

    idx = get_documents_index(spark, sf_dir)
    return cross_rerank(idx, query, k=k, depth=depth)


def count_q(
    spark: SparkSession, sf_dir: str, query: str, lang: str = None
) -> DataFrame:
    """Total-hits gate entry (n_hits, max_score over the kept set)."""
    from .operators.scorer import bm25_count

    idx = get_documents_index(spark, sf_dir)
    filters = {"lang": lang} if lang else None
    return bm25_count(idx, query, filters)


def explain_q(spark: SparkSession, sf_dir: str, query: str, k: int = 10) -> DataFrame:
    """Score-explain gate entry (per-term breakdown of the top-k)."""
    from .operators.scorer import explain_topk

    idx = get_documents_index(spark, sf_dir)
    return explain_topk(idx, query, k=k)


def retrieval_eval_q(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """nDCG@k / MRR / recall@k of the batch BM25 ranking against the
    corpus-derived graded labels (rel = distinct query terms present;
    internal ids == table doc_ids on this corpus, sources/tables.py)."""
    from .operators.evalrank import eval_ranking, relevance_labels
    from .operators.scorer import bm25_topk_batch

    idx = get_documents_index(spark, sf_dir)
    res = bm25_topk_batch(idx, BATCH_QUERIES, k=k)
    labels = relevance_labels(docs_with_tokens(spark, sf_dir), BATCH_QUERIES)
    return eval_ranking(res, labels, k=k)


def docs_with_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.udfs import tokenize_udf

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text", tokenize_udf("text").alias("tokens"))


def docs_with_tokens_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_with_tokens plus the lang column (DSIR's target slice)."""
    from .functions.udfs import tokenize_udf

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", "text", tokenize_udf("text").alias("tokens")
    )


def _cross_split(spark: SparkSession, sf_dir: str):
    """Deterministic new/old corpus split for the cross-dedup gate:
    old = even doc_ids; new = odd doc_ids PLUS re-keyed exact copies of
    every 50th doc (those land in old, so the exact stage is
    non-vacuous — the raw table has no exact twins) — near-dup 'dup'
    twins straddle the parity split on their own."""
    d = docs_with_tokens(spark, sf_dir)
    old = d.where(F.col("doc_id") % 2 == 0)
    copies = d.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    new = d.where(F.col("doc_id") % 2 == 1).unionByName(copies)
    return new, old


def cross_dedup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.crossdedup import cross_lsh_pairs

    new, old = _cross_split(spark, sf_dir)
    return cross_lsh_pairs(new, old)


def cross_dedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.crossdedup import cross_dedup_survivors

    new, old = _cross_split(spark, sf_dir)
    return cross_dedup_survivors(new, old)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing over the pages adaptation (stubbed
    deterministic decoder; rows-only driver check — not SQL-expressible)."""
    from .operators.multimodal import extract_media_features

    pages = documents_as_pages(spark, sf_dir).withColumn(
        "doc_id", F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    )
    return extract_media_features(pages, payload_col="html", id_col="doc_id").orderBy(
        "doc_id"
    )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_media_features, resize_plan

    pages = documents_as_pages(spark, sf_dir).withColumn(
        "doc_id", F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    )
    media = extract_media_features(pages, payload_col="html", id_col="doc_id")
    return resize_plan(media, 224, 224)


def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_media_features, frame_sample

    pages = documents_as_pages(spark, sf_dir).withColumn(
        "doc_id", F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    )
    media = extract_media_features(
        pages, payload_col="html", id_col="doc_id", kind="video"
    )
    return frame_sample(media, every_n=8).orderBy("doc_id", "frame_idx")


def rrf_hybrid(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10, boosted: bool = False
) -> DataFrame:
    """J1/J2(/J3)+T2/T4/T5 hybrid merge: cosine list over embeddings
    (vec_id keyed) fused with the BM25 list over documents."""
    from .functions.embed import cosine_topk, mock_embed_text
    from .functions.sql_oracle import DRIVER_BOOST_RULES
    from .operators.rrf import boost_col, rrf_merge

    idx = get_documents_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = mock_embed_text(query, 64)
    sem = cosine_topk(emb, qvec, 2 * k, id_col="vec_id").withColumnRenamed(
        "vec_id", "doc_id"
    )
    bm = (
        bm25_topk(idx, query, k=2 * k)
        .select("rank", _orig_doc_id(), "score")
    )
    boost_df = None
    if boosted:
        docs = load_table(spark, sf_dir, "documents")
        boost_df = docs.select(
            "doc_id",
            boost_col(F.col("source"), F.col("lang"), rules=DRIVER_BOOST_RULES).alias(
                "boost"
            ),
        )
    merged = rrf_merge(sem, bm, query=query, boost=boost_df, limit=k)
    return merged.select(
        "rank",
        "doc_id",
        round6("score").alias("score"),
        round6("semantic_score").alias("semantic_score"),
        round6("bm25_score").alias("bm25_score"),
    ).orderBy("rank")


def bm25_multi_terms_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10
) -> DataFrame:
    """Compound-key (lang, source) buckets ordered by count over the
    BM25 kept set (operators/aggs.bm25_multi_terms — ES multi_terms)."""
    from .operators.aggs import bm25_multi_terms

    idx = get_documents_index(spark, sf_dir)
    return bm25_multi_terms(idx, query, keys=("lang", "source"), k=k)


def bm25_adjacency_matrix_q(
    spark: SparkSession, sf_dir: str, query: str
) -> DataFrame:
    """Named-filter intersection counts over the BM25 kept set
    (operators/aggs.bm25_adjacency_matrix — ES adjacency_matrix)."""
    from .operators.aggs import bm25_adjacency_matrix

    idx = get_documents_index(spark, sf_dir)
    return bm25_adjacency_matrix(
        idx,
        query,
        filters={"de": ("lang", "de"), "en": ("lang", "en"),
                 "s7": ("source", "src7")},
    )


def bm25_weighted_avg_q(
    spark: SparkSession, sf_dir: str, query: str
) -> DataFrame:
    """doc_len weighted by distinct-term count over the BM25 kept set
    (operators/aggs.bm25_weighted_avg — ES weighted_avg)."""
    from .operators.aggs import bm25_weighted_avg

    idx = get_documents_index(spark, sf_dir)
    return bm25_weighted_avg(idx, query)


def bm25_matrix_stats_q(
    spark: SparkSession, sf_dir: str, query: str
) -> DataFrame:
    """Covariance/correlation of (doc_len, distinct-term count) over
    the BM25 kept set (operators/aggs.bm25_matrix_stats — ES
    matrix_stats)."""
    from .operators.aggs import bm25_matrix_stats

    idx = get_documents_index(spark, sf_dir)
    return bm25_matrix_stats(idx, query)


def bm25_boxplot_q(
    spark: SparkSession, sf_dir: str, query: str
) -> DataFrame:
    """Exact type-1 quartiles of doc_len over the BM25 kept set
    (operators/aggs.bm25_boxplot — ES boxplot agg)."""
    from .operators.aggs import bm25_boxplot

    idx = get_documents_index(spark, sf_dir)
    return bm25_boxplot(idx, query, col="doc_len")


def bm25_fvf_q(
    spark: SparkSession, sf_dir: str, query: str,
    factor: float = 0.5, modifier: str = "log1p", k: int = 10,
) -> DataFrame:
    """field_value_factor function scoring over the BM25 kept set
    (operators/decay.bm25_fvf_topk — ES function_score)."""
    from .operators.decay import bm25_fvf_topk

    idx = get_documents_index(spark, sf_dir)
    return bm25_fvf_topk(
        idx, query, col="doc_len", factor=factor, modifier=modifier, k=k
    )


def bm25_random_q(
    spark: SparkSession, sf_dir: str, query: str, seed: str = "0",
    k: int = 10,
) -> DataFrame:
    """Seeded deterministic random_score over the BM25 kept set
    (operators/decay.bm25_random_topk — ES function_score)."""
    from .operators.decay import bm25_random_topk

    idx = get_documents_index(spark, sf_dir)
    return bm25_random_topk(idx, query, seed=seed, k=k)


def term_vectors_q(
    spark: SparkSession, sf_dir: str, doc_id: int = 3
) -> DataFrame:
    """Per-document term vector with corpus df (operators/termvectors
    — the ES _termvectors API)."""
    from .operators.termvectors import term_vectors

    idx = get_documents_index(spark, sf_dir)
    return term_vectors(idx, doc_id=doc_id)


def bm25_regexp_q(
    spark: SparkSession, sf_dir: str, pattern: str, k: int = 10,
    max_expansions: int = 16,
) -> DataFrame:
    """Regexp-query gate entry: BM25 over the capped whole-term regexp
    expansion (operators/queryext.bm25_regexp_topk — the ES regexp
    query)."""
    from .operators.queryext import bm25_regexp_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_regexp_topk(idx, pattern, k=k, max_expansions=max_expansions)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def constant_score_q(
    spark: SparkSession, sf_dir: str, query: str, boost: float = 1.5,
    k: int = 10,
) -> DataFrame:
    """constant_score gate entry (operators/queryext — ES filter
    context: every matching doc scores exactly boost)."""
    from .operators.queryext import constant_score_topk

    idx = get_documents_index(spark, sf_dir)
    return constant_score_topk(idx, query, boost=boost, k=k)


def bm25_span_first_q(
    spark: SparkSession, sf_dir: str, term: str, end: int = 3, k: int = 10,
) -> DataFrame:
    """span_first gate entry (operators/queryext — Lucene
    SpanFirstQuery composed with the BM25 chain as a doc_filter)."""
    from .operators.queryext import bm25_span_first_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_span_first_topk(idx, term, end=end, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_span_not_q(
    spark: SparkSession, sf_dir: str, include: str, exclude: str,
    pre: int = 0, post: int = 0, k: int = 10,
) -> DataFrame:
    """span_not gate entry (operators/queryext — Lucene SpanNotQuery
    with pre/post windows, composed post-threshold like span_first)."""
    from .operators.queryext import bm25_span_not_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_span_not_topk(idx, include, exclude, pre=pre, post=post, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def analyze_doc_q(
    spark: SparkSession, sf_dir: str, doc_id: int = 3
) -> DataFrame:
    """_analyze gate entry: the ordered token stream of a stored doc
    (operators/queryext.analyze_doc — pins cross-engine tokenizer
    ORDER agreement, which the tf bags cannot)."""
    from .operators.queryext import analyze_doc

    idx = get_documents_index(spark, sf_dir)
    return analyze_doc(idx, doc_id=doc_id)


def sampler_terms_q(
    spark: SparkSession, sf_dir: str, query: str, key: str = "source",
    shard_size: int = 50, k: int = 10, dedup_field=None,
    max_docs_per_value: int = 1,
) -> DataFrame:
    """sampler / diversified_sampler agg gate entry
    (operators/queryext.sampler_terms)."""
    from .operators.queryext import sampler_terms

    idx = get_documents_index(spark, sf_dir)
    return sampler_terms(
        idx, query, key=key, shard_size=shard_size, k=k,
        dedup_field=dedup_field, max_docs_per_value=max_docs_per_value,
    )


def bm25_rescore_q(
    spark: SparkSession, sf_dir: str, query: str, phrase: str,
    window_size: int = 20, rescore_weight: float = 2.0, k: int = 10,
) -> DataFrame:
    """rescore gate entry (operators/queryext.bm25_rescore_topk — the
    ES native rescore with a phrase rescorer over the top window)."""
    from .operators.queryext import bm25_rescore_topk

    idx = get_documents_index(spark, sf_dir)
    return bm25_rescore_topk(
        idx, query, phrase, window_size=window_size,
        rescore_weight=rescore_weight, k=k,
    )


def match_phrase_prefix_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    max_expansions: int = 8,
) -> DataFrame:
    """match_phrase_prefix gate entry (operators/queryext — the ES
    match_phrase_prefix query: last token expands as a prefix, docs
    must contain the phrase with ANY expansion in the last slot)."""
    from .operators.queryext import match_phrase_prefix_topk

    idx = get_documents_index(spark, sf_dir)
    res = match_phrase_prefix_topk(idx, query, k=k,
                                   max_expansions=max_expansions)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def mget_q(spark: SparkSession, sf_dir: str, doc_ids=(1, 3, 7)) -> DataFrame:
    """_mget gate entry (operators/termvectors.mget — multi-document
    fetch by id; pins the engine's url<->doc_id assignment)."""
    from .operators.termvectors import mget

    idx = get_documents_index(spark, sf_dir)
    return mget(idx, doc_ids)


def terms_enum_q(
    spark: SparkSession, sf_dir: str, prefix: str, size: int = 10,
    search_after=None,
) -> DataFrame:
    """_terms_enum gate entry (operators/queryext.terms_enum —
    dictionary prefix enumeration with keyset pagination)."""
    from .operators.queryext import terms_enum

    idx = get_documents_index(spark, sf_dir)
    return terms_enum(idx, prefix, size=size, search_after=search_after)


def cross_fields_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    w_title: float = 2.0, w_body: float = 1.0, title_chars: int = 60,
) -> DataFrame:
    """cross_fields gate entry over the same synthetic title/body split
    as bm25f_q / dismax_q — each term scores against its best field,
    summed per doc (operators/fields.cross_fields_topk)."""
    from .operators.fields import FieldSpec, cross_fields_topk

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, title_chars).alias("title"),
        F.col("text").alias("body"),
    )
    fields = [FieldSpec("title", w_title, 0.75), FieldSpec("body", w_body, 0.75)]
    res = cross_fields_topk(d, query, fields, k=k)
    return res.select("rank", "doc_id", round6("score").alias("score")).orderBy(
        "rank"
    )


def bm25_pinned_q(
    spark: SparkSession, sf_dir: str, query: str, pinned_ids=(7, 3),
    k: int = 10,
) -> DataFrame:
    """pinned-query gate entry (operators/queryext.bm25_pinned_topk —
    the ES pinned query: promotions first in provided order)."""
    from .operators.queryext import bm25_pinned_topk

    idx = get_documents_index(spark, sf_dir)
    return bm25_pinned_topk(idx, query, list(pinned_ids), k=k)


def bm25_sort_q(
    spark: SparkSession, sf_dir: str, query: str, asc: bool = False,
    k: int = 10,
) -> DataFrame:
    """Sort-by-field search over the BM25 kept set (operators/explore).
    doc_ids here are the table ids (sources/tables.py identity)."""
    from .operators.explore import bm25_sort_topk

    idx = get_documents_index(spark, sf_dir)
    return bm25_sort_topk(idx, query, sort="doc_len", asc=asc, k=k)


def bm25plus_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    delta: float = 1.0,
) -> DataFrame:
    """BM25+ variant gate entry (operators/scorer.bm25plus_topk)."""
    from .operators.scorer import bm25plus_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25plus_topk(idx, query, k=k, delta=delta)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def lmd_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    mu: float = 2000.0,
) -> DataFrame:
    """LM Dirichlet similarity gate entry (operators/scorer.lmd_topk)."""
    from .operators.scorer import lmd_topk

    idx = get_documents_index(spark, sf_dir)
    res = lmd_topk(idx, query, k=k, mu=mu)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def lmjm_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    lam: float = 0.1,
) -> DataFrame:
    """LM Jelinek-Mercer similarity gate entry (operators/scorer.lmjm_topk)."""
    from .operators.scorer import lmjm_topk

    idx = get_documents_index(spark, sf_dir)
    res = lmjm_topk(idx, query, k=k, lam=lam)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def dfr_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
) -> DataFrame:
    """DFR InL2 similarity gate entry (operators/scorer.dfr_topk)."""
    from .operators.scorer import dfr_topk

    idx = get_documents_index(spark, sf_dir)
    res = dfr_topk(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def ib_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
) -> DataFrame:
    """IB LL-DF-H2 similarity gate entry (operators/scorer.ib_topk)."""
    from .operators.scorer import ib_topk

    idx = get_documents_index(spark, sf_dir)
    res = ib_topk(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def distance_feature_q(
    spark: SparkSession, sf_dir: str, query: str,
    center_lat: float = 40.0, center_lon: float = -74.0,
    pivot_km: float = 1000.0, boost: float = 5.0, k: int = 10,
) -> DataFrame:
    """ES distance_feature gate entry (operators/geo
    .bm25_distance_feature_topk): the md5 position seed is the
    ORIGINAL doc id (extracted from url) so both engines derive the
    same coordinates."""
    from .operators.geo import bm25_distance_feature_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_distance_feature_topk(
        idx, query, center_lat, center_lon, pivot_km=pivot_km,
        boost=boost, k=k,
        id_col=F.regexp_extract("url", r"(\d+)$", 1).cast("long"),
    )
    return res.select(
        "rank", _orig_doc_id(), "base", "dist_km", "score"
    ).orderBy("rank")


def bm25_rank_feature_q(
    spark: SparkSession, sf_dir: str, query: str,
    function: str = "saturation", pivot: float = 40.0,
    boost: float = 2.0, exponent: float = 2.0, k: int = 10,
) -> DataFrame:
    """rank_feature additive boost over the BM25 kept set
    (operators/decay.bm25_rank_feature_topk — ES RankFeatureQuery)."""
    from .operators.decay import bm25_rank_feature_topk

    idx = get_documents_index(spark, sf_dir)
    return bm25_rank_feature_topk(
        idx, query, col="doc_len", function=function, pivot=pivot,
        boost=boost, exponent=exponent, k=k,
    )


def combined_fields_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    w_title: float = 2.0, w_body: float = 1.0, title_chars: int = 60,
) -> DataFrame:
    """combined_fields gate entry over the bm25f_q synthetic
    title/body split (operators/fields.combined_fields_topk)."""
    from .operators.fields import combined_fields_topk

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, title_chars).alias("title"),
        F.col("text").alias("body"),
    )
    res = combined_fields_topk(
        d, query, [("title", w_title), ("body", w_body)], k=k
    )
    return res.select("rank", "doc_id", round6("score").alias("score")).orderBy(
        "rank"
    )


def phrase_suggest_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 5,
    max_cands: int = 2, max_dist: int = 1,
) -> DataFrame:
    """Context-aware phrase correction (operators/snippets
    .phrase_suggest): SymSpell candidates x Laplace bigram-LM
    ranking."""
    from .operators.snippets import phrase_suggest

    idx = get_documents_index(spark, sf_dir)
    return phrase_suggest(idx, query, k=k, max_cands=max_cands,
                          max_dist=max_dist)


def sparse_vector_q(
    spark: SparkSession, sf_dir: str, query_vector: dict, k: int = 10,
) -> DataFrame:
    """ES sparse_vector gate entry (operators/scorer
    .sparse_vector_topk): explicit token->weight map (the learned-
    sparse API shape) with literal stand-in weights."""
    from .operators.scorer import sparse_vector_topk

    idx = get_documents_index(spark, sf_dir)
    res = sparse_vector_topk(idx, query_vector, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def linear_hybrid_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    w_sem: float = 0.5, w_lex: float = 0.5,
) -> DataFrame:
    """ES linear retriever gate entry: minmax-normalized weighted
    fusion of the cosine and BM25 overfetch lists (operators/rrf
    .linear_hybrid_topk)."""
    from .functions.embed import cosine_topk, mock_embed_text
    from .operators.rrf import linear_hybrid_topk

    idx = get_documents_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = mock_embed_text(query, 64)
    sem = cosine_topk(emb, qvec, 2 * k, id_col="vec_id").withColumnRenamed(
        "vec_id", "doc_id"
    ).select("doc_id", "score")
    bm = bm25_topk(idx, query, k=2 * k).select(_orig_doc_id(), "score")
    return linear_hybrid_topk(sem, bm, k=k, w_sem=w_sem, w_lex=w_lex).orderBy(
        "rank"
    )


def match_bool_prefix_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    max_expansions: int = 8,
) -> DataFrame:
    """ES match_bool_prefix gate entry (operators/queryext
    .match_bool_prefix_topk)."""
    from .operators.queryext import match_bool_prefix_topk

    idx = get_documents_index(spark, sf_dir)
    res = match_bool_prefix_topk(idx, query, k=k,
                                 max_expansions=max_expansions)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def ltr_rescore_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    window_size: int = 20,
) -> DataFrame:
    """LTR rescorer gate entry (operators/ltr.ltr_rescore_topk) with
    the deterministic default linear weights."""
    from .operators.ltr import ltr_rescore_topk

    idx = get_documents_index(spark, sf_dir)
    return ltr_rescore_topk(idx, query, k=k, window_size=window_size)


def mterm_vectors_q(
    spark: SparkSession, sf_dir: str, doc_ids=(3, 7, 11, 999999)
) -> DataFrame:
    """Multi-document term vectors (operators/termvectors
    .mterm_vectors — the ES _mtermvectors API; the absent id yields
    no rows)."""
    from .operators.termvectors import mterm_vectors

    idx = get_documents_index(spark, sf_dir)
    return mterm_vectors(idx, doc_ids=doc_ids)


def classic_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
) -> DataFrame:
    """Lucene ClassicSimilarity gate entry (operators/scorer
    .classic_topk)."""
    from .operators.scorer import classic_topk

    idx = get_documents_index(spark, sf_dir)
    res = classic_topk(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def boolean_sim_q(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
) -> DataFrame:
    """Lucene BooleanSimilarity gate entry (operators/scorer
    .boolean_sim_topk)."""
    from .operators.scorer import boolean_sim_topk

    idx = get_documents_index(spark, sf_dir)
    res = boolean_sim_topk(idx, query, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def more_like_this_unlike_q(
    spark: SparkSession, sf_dir: str, seed_doc_id: int,
    unlike_doc_id: int, m: int = 5, k: int = 10,
) -> DataFrame:
    """MLT with a negative example (operators/explore
    .more_like_this_unlike)."""
    from .operators.explore import more_like_this_unlike

    idx = get_documents_index(spark, sf_dir)
    res = more_like_this_unlike(idx, seed_doc_id, unlike_doc_id, m=m, k=k)
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_span_within_q(
    spark: SparkSession, sf_dir: str, little: str, big_first: str,
    big_last: str, width: int = 6, k: int = 10,
) -> DataFrame:
    """span_within gate entry (operators/queryext — Lucene
    SpanWithinQuery with a span_near big envelope)."""
    from .operators.queryext import bm25_span_within_topk

    idx = get_documents_index(spark, sf_dir)
    res = bm25_span_within_topk(
        idx, little, big_first, big_last, width=width, k=k
    )
    return res.select(
        "rank", _orig_doc_id(), round6("score").alias("score")
    ).orderBy("rank")


def bm25_excluded_ids_q(
    spark: SparkSession, sf_dir: str, query: str, exclude_ids,
    k: int = 10,
) -> DataFrame:
    """Rule-retriever exclude gate entry (operators/boostquery
    .bm25_topk_exclude)."""
    from .operators.boostquery import bm25_topk_exclude

    idx = get_documents_index(spark, sf_dir)
    return bm25_topk_exclude(idx, query, exclude_ids, k=k)
