"""The ES ``boosting`` query — positive matches rank normally, and
docs that ALSO match the negative part are demoted by multiplying
their score with ``negative_boost`` (0 <= nb < 1). The classic
"prefer X, softly avoid Y" ranking tool: unlike ``-term`` exclusion
the demoted docs stay in the result set, and unlike a filter the
demotion composes with relevance.

Semantics (deterministic, engine-portable):

* the positive query runs the standard BM25 chain — threshold on the
  unfiltered max, degenerate all-zero backfill — so the boosting
  query's match set IS the positive query's match set (ES: the
  negative part never admits or removes documents);
* a doc matches the negative part when it contains ANY of the
  negative query's tokens (the any-of contract ``-term`` exclusion
  already uses, operators/boolquery.excluded_doc_set);
* the demotion applies AFTER the relative threshold, exactly like the
  clickboost / decay / field_value_factor function-score family: it
  rescores what matched, never changes what matched. Final ordering
  binds the RAW product (score * nb), ties doc_id asc;
* nb = 0 is legal (ES allows it): negative docs sink to score 0 and
  rank among the zero ties by doc_id;
* in the degenerate all-non-positive regime every product is 0 * nb
  = 0, so the operator returns the rows plain BM25 would (tested).

Reference parity: the reference is a bag-of-words ranker with no
negative-preference surface (codesearch/storage/bm25_index.py:117-170);
this is the remaining classic function-score composition, added
Spark-first on the house kept-set spine.

Scale shape: the negative doc set derives from the NEGATIVE terms'
postings only (term-pruned scan, the same bounded shape as exclusion)
and left-joins onto the thresholded candidates — corpus-wide work
exists only in the degenerate branch, where the answer is
corpus-sized by definition. The k-cut is a TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6, round6_sql, sql_double
from ..oracle.tokenizer import tokenize
from .explore import _kept_with_cols
from .scorer import Index


def _check_nb(negative_boost: float) -> float:
    nb = float(negative_boost)
    if not (0.0 <= nb < 1.0):
        raise ValueError(
            f"negative_boost must be in [0, 1): {negative_boost!r}"
        )
    return nb


def bm25_boosting_topk(
    index: Index,
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    k: int = 10,
) -> DataFrame:
    """(rank, doc_id, score, mult) — BM25(positive) top-k with docs
    containing any negative token demoted by ``negative_boost``."""
    nb = _check_nb(negative_boost)
    spark = index.spark
    if not tokenize(positive):
        return spark.createDataFrame(
            [], "rank int, doc_id long, score double, mult double"
        )
    kept = _kept_with_cols(index, positive, [])
    neg_terms = sorted(set(tokenize(negative)))
    if neg_terms:
        neg = (
            index.tf.where(F.col("term").isin(neg_terms))
            .select("doc_id")
            .distinct()
            .withColumn("_neg", F.lit(1))
        )
        kept = kept.join(neg, "doc_id", "left")
        mult = F.when(F.col("_neg") == 1, F.lit(nb)).otherwise(F.lit(1.0))
    else:
        mult = F.lit(1.0)
    final = (F.col("score") * mult).alias("final")
    boosted = kept.select("doc_id", "score", mult.alias("mult"), final)
    top = boosted.orderBy(F.desc("final"), F.asc("doc_id")).limit(int(k))
    w = Window.orderBy(F.desc("final"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "doc_id",
        round6("final").alias("score"),
        round6("mult").alias("mult"),
    )


def bm25_boosting_sql(
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    k: int = 10,
) -> str:
    """DuckDB mirror: the shared kept chain + the identical
    ``score * CASE WHEN <any-of negative> THEN nb ELSE 1.0 END``
    operand sequence, ordered on the RAW final."""
    from ..functions.sql_oracle import kept_cte_sql

    nb = _check_nb(negative_boost)
    chain = kept_cte_sql(positive)
    if chain is None:
        return (
            "SELECT 1::INT AS rank, 1::BIGINT AS doc_id, 0.0 AS score, "
            "0.0 AS mult WHERE false"
        )
    neg_terms = sorted(set(tokenize(negative)))
    if neg_terms:
        lst = ", ".join(f"'{t}'" for t in neg_terms)
        mult = (
            f"CASE WHEN doc_id IN (SELECT doc_id FROM tf WHERE term IN ({lst})) "
            f"THEN {sql_double(nb)} ELSE 1.0 END"
        )
    else:
        mult = "1.0"
    return (
        f"{chain}, "
        f"boosted AS (SELECT doc_id, score, {mult} AS mult, "
        f"score * ({mult}) AS final FROM kept) "
        "SELECT CAST(row_number() OVER (ORDER BY final DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('final')} AS score, {round6_sql('mult')} AS mult "
        f"FROM boosted ORDER BY final DESC, doc_id ASC LIMIT {int(k)}"
    )
