"""Result-set exploration surfaces over the exact BM25 scorer:
faceted result counts and more-like-this retrieval.

- ``bm25_facets``: the search-UI facet sidebar — per-(lang, source)
  document counts and best score over the set the relative threshold
  keeps (BEFORE metadata filters, the same set the reference exposes as
  its result array, bm25_index.py:149-164 — a facet count must describe
  what the user could reach by filtering, so it is computed upstream of
  the filters).
- ``more_like_this``: Lucene/Elasticsearch-style MLT — the seed
  document's top-m tf-idf terms become the query (qtf=1 each), scored
  through the standard BM25 pipeline with the seed excluded from the
  result set.

Both are pure compositions of the scorer-v1 stages (score_matched /
finalize_topk), inheriting their plan shape: term-pruned tf scan,
broadcast query side, canonical term-sorted contribution fold. DuckDB
oracles are in functions/sql_oracle.py (bm25_facets_sql /
more_like_this_sql) next to the BM25 CTE chain they mirror.

Scale notes: facets in the healthy regime join ONLY the thresholded
candidates against the docs metadata (a docvalues join on survivors —
the corpus-wide left join exists only in the degenerate all-zero branch,
where the answer is by definition corpus-sized). MLT's keyword lookup
collects m rows for one doc_id (a pushed point filter on the tf
relation), never a corpus pass.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6
from ..oracle.tokenizer import tokenize
from .scorer import Index, finalize_topk, query_term_weights, score_matched

FACET_KEYS: Tuple[str, str] = ("lang", "source")


def bm25_facets(
    index: Index, query: str, keys: Sequence[str] = FACET_KEYS
) -> DataFrame:
    """(*keys, n_docs, max_score) — facet counts over the BM25 kept set.

    Mirrors finalize_topk's branch structure: healthy max (> 0) keeps
    only thresholded matched docs (metadata joined onto the candidates),
    degenerate/all-zero keeps every document with unmatched rows at
    score 0 — the reference's result array, aggregated by facet key.
    """
    spark = index.spark
    meta = index.docs.select("doc_id", *keys)
    empty = spark.createDataFrame(
        [], ", ".join(f"{c} string" for c in keys) + ", n_docs long, max_score double"
    )
    if not tokenize(query):
        return empty  # empty-query guard (F7)
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    if scored is not None:
        scored = scored.persist()
        mx = scored.agg(F.max("score").alias("mx")).first()["mx"]
    else:
        mx = None
    if mx is not None and mx > 0:
        kept = scored.where(F.col("score") >= F.lit(0.01 * mx)).join(meta, "doc_id")
    else:
        # degenerate: every doc is in the result set, unmatched at 0.0 —
        # corpus-sized by definition, so the corpus-wide left join IS
        # the minimal plan here (never taken by a healthy query)
        right = (
            scored.select("doc_id", "score")
            if scored is not None
            else spark.createDataFrame([], "doc_id long, score double")
        )
        kept = meta.join(right, "doc_id", "left").withColumn(
            "score", F.coalesce(F.col("score"), F.lit(0.0))
        )
    out = (
        kept.groupBy(*keys)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            round6(F.max("score")).alias("max_score"),
        )
        .orderBy(*keys)
    )
    if scored is not None:
        # the persist handle stays on the index for LRU-1 eviction by
        # the next scorer call (same discipline as _cache_scored)
        old = index.extras.pop("_scored_cache", None)
        if old is not None:
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 - already gone / dead session
                pass
        index.extras["_scored_cache"] = scored
    return out


def seed_keywords(index: Index, seed_doc_id: int, m: int = 5) -> list:
    """[(term, idf)] — the seed doc's top-m terms by tf-idf
    (tf * ln(N/df), ties tfidf desc then term asc — the doc_keywords
    ranking), with the BM25 idf attached for scoring. A pushed point
    filter on doc_id collects m rows; no corpus pass."""
    kw = (
        index.tf.where(F.col("doc_id") == int(seed_doc_id))
        .select("term", "tf")
        .join(index.terms.select("term", "df", "idf"), "term")
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log(F.lit(float(index.n_docs)) / F.col("df").cast("double")),
        )
        .orderBy(F.desc("tfidf"), F.asc("term"))
        .limit(int(m))
        .collect()
    )
    return [(r["term"], float(r["idf"])) for r in kw]


def more_like_this(
    index: Index, seed_doc_id: int, m: int = 5, k: int = 10
) -> DataFrame:
    """(rank, doc_id, url, score) — BM25 top-k for the seed document's
    top-m tf-idf terms (qtf=1 each), seed excluded from the result set
    in BOTH branches (matched and degenerate zero-backfill)."""
    seed = int(seed_doc_id)
    kw = seed_keywords(index, seed, m)
    if not kw:
        return index.spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = [(t, 1.0, idf) for t, idf in sorted(kw)]
    scored = score_matched(index, qweights).where(F.col("doc_id") != seed)
    # the seed must not resurface through the degenerate zero backfill
    # (finalize_topk draws it from index.docs) — hand it a seedless view
    idx2 = replace(index, docs=index.docs.where(F.col("doc_id") != seed))
    return finalize_topk(idx2, scored, k)
