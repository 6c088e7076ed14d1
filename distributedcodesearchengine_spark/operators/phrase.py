"""Positional index + exact-phrase queries (fulltext-tier extension).

The reference engine is strictly bag-of-words — BM25Okapi over token
multisets (``codesearch/storage/bm25_index.py:117-170``) with no
positional information anywhere — so "exact phrase" queries, the other
half of a production full-text engine's query surface, are added here
as a from-scratch Spark-native component.

Design (scale-first):

* ``positional_postings`` — the positional index relation
  ``(term, doc_id, tf, positions array<int>)`` built with ONE
  ``posexplode`` + one groupBy: exactly the tf build's shuffle shape
  (partial-agg friendly, salt-free because per-(term,doc) groups are
  bounded by document length, not corpus size). At serving scale this
  relation is partition-pruned by term the same way the BM25 postings
  are (``term_bucket`` column available via the same helper).

* ``phrase_occurrences`` — the standard positional-intersection: for an
  n-term phrase, slot i contributes its term's (doc_id, pos - i) pairs
  and the phrase's occurrences are the (doc_id, aligned-start) tuples
  present in ALL slots. Expressed as n-1 equi-joins on
  ``(doc_id, p0)`` whose inputs are the PHRASE TERMS' postings only —
  the corpus is touched once by the (prunable) term filter, never
  joined against itself. Repeated-term phrases ("table table") work
  naturally: each slot re-reads the same posting at a different offset.

Equality contract: DuckDB oracles count occurrences per doc with a
token-list slice scan (``phrase_occurrences_sql``); Spark and oracle
must agree on (doc_id, n_occur) exactly (driver gate + pytest).
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..oracle.tokenizer import tokenize


def positional_postings(
    docs: DataFrame, terms: Optional[Sequence[str]] = None
) -> DataFrame:
    """docs(doc_id, tokens) -> (term, doc_id, tf, positions sorted).

    ``terms`` restricts the build to a term subset (query-time use);
    the full-index build leaves it None.
    """
    pos = docs.select("doc_id", F.posexplode("tokens").alias("pos", "term"))
    if terms is not None:
        pos = pos.where(F.col("term").isin([str(t) for t in terms]))
    return pos.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def phrase_occurrences(docs: DataFrame, phrase: str) -> DataFrame:
    """-> (doc_id, n_occur) for docs containing the EXACT token phrase
    (tokenized with the engine tokenizer, so "Row-Scan!" matches the
    tokens ['row','scan']). Only docs with n_occur >= 1 are returned.
    """
    toks = tokenize(phrase)
    spark = docs.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long, n_occur long")
    pos = docs.select("doc_id", F.posexplode("tokens").alias("pos", "term"))
    pos = pos.where(F.col("term").isin(sorted(set(toks))))
    # slot i: positions of toks[i], re-based to the phrase start
    parts = [
        pos.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("p0")
        )
        for i, t in enumerate(toks)
    ]
    joined = reduce(lambda a, b: a.join(b, ["doc_id", "p0"]), parts)
    return joined.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_occur"))


def phrase_match(docs: DataFrame, phrase: str) -> DataFrame:
    """Gate shape: (doc_id, n_occur) ordered by doc_id."""
    return phrase_occurrences(docs, phrase).orderBy("doc_id")


def phrase_topk(docs: DataFrame, phrase: str, k: int = 10) -> DataFrame:
    """Phrase-frequency top-k: (rank, doc_id, n_occur), ties by doc_id
    ascending (the engine-wide tie-break contract, bm25_index.py:169)."""
    occ = phrase_occurrences(docs, phrase)
    return (
        # TakeOrderedAndProject top-k first; the rank window then runs
        # over k rows only (single-partition is fine at that size)
        occ.orderBy(F.desc("n_occur"), F.asc("doc_id"))
        .limit(int(k))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("n_occur"), F.asc("doc_id"))),
        )
        .select("rank", "doc_id", "n_occur")
    )


def bm25_phrase_topk(index, phrase: str, k: int = 10, filters=None) -> DataFrame:
    """Quoted-query search: BM25 top-k restricted to docs containing the
    EXACT phrase -> (rank, doc_id, url, score).

    Composition contract: the phrase's tokens are scored bag-of-words
    (A3), the relative threshold applies against the UNfiltered max
    (F4), and the phrase predicate joins the metadata filters at the F5
    stage (post-threshold) as a doc-set semi-join — so a quoted query
    ranks exactly like its unquoted form, minus non-phrase docs. The
    degenerate all-non-positive regime (common terms, negative floored
    idf) inherits the reference's keep-everything branch, again
    restricted to phrase docs.

    The phrase doc-set comes from the persisted compressed positional
    index when the Index carries one (``extras['positional']``, written
    by ``build_index_persisted(phrase_index=True)``); otherwise from the
    join-based matcher over docs.tokens. Both produce identical sets
    (tested), so the serving path is a pure physical choice.
    """
    from .scorer import finalize_topk, query_term_weights, score_matched

    spark = index.spark
    if not tokenize(phrase):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    if "positional" in index.extras:
        from .positional import phrase_occurrences_indexed

        occ = phrase_occurrences_indexed(
            index.extras["positional"],
            phrase,
            shard_width=index.extras.get("phrase_shard_width", 65536),
            n_buckets=index.n_buckets,
        ).select("doc_id")
    else:
        occ = phrase_occurrences(index.docs, phrase).select("doc_id")
    qweights = query_term_weights(index, phrase)
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, doc_filter=occ)


# --- DuckDB oracles ---------------------------------------------------------


def _phrase_occ_cte(phrase: str) -> str:
    toks = tokenize(phrase)
    n = len(toks)
    lit = "[" + ", ".join(f"'{t}'" for t in toks) + "]"
    return (
        "occ AS (SELECT doc_id, len(list_filter("
        f"generate_series(1, len(toks) - {n - 1}), "
        f"i -> toks[i:i+{n - 1}] = {lit})) AS n_occur FROM docs)"
    )


def phrase_match_sql(toks_cte: str, phrase: str) -> str:
    return (
        f"WITH {toks_cte}, {_phrase_occ_cte(phrase)} "
        "SELECT doc_id, n_occur FROM occ WHERE n_occur > 0 ORDER BY doc_id"
    )


def phrase_topk_sql(toks_cte: str, phrase: str, k: int = 10) -> str:
    return (
        f"WITH {toks_cte}, {_phrase_occ_cte(phrase)} "
        "SELECT CAST(row_number() OVER (ORDER BY n_occur DESC, doc_id ASC) AS INT)"
        " AS rank, doc_id, n_occur "
        f"FROM occ WHERE n_occur > 0 ORDER BY n_occur DESC, doc_id ASC LIMIT {int(k)}"
    )
