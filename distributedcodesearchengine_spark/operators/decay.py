"""Decay function scoring — the ES ``function_score`` decay functions
(gauss / linear) over the BM25 kept set: the query score is multiplied
by a distance decay of a numeric docs column from an origin, the
classic recency / target-length boost.

Semantics (Elasticsearch's published decay definitions, decay point
fixed at the ES default 0.5-at-scale):

- gauss:  mult = exp(ln(0.5) * d * d)        with d = (col - origin) / scale
- linear: mult = max(0.0, 1.0 - 0.5 * |d|)   (reaches 0.5 at |d| = 1,
          hits zero at |d| = 2 — the straight-line analog)

Like the clickboost J3-stage precedent (operators/explore.
bm25_clickboost_topk), the multiplier applies AFTER the relative
threshold: decay rescores what matched, it never admits non-matching
documents, and the kept set stays the reference's result array. In the
degenerate all-zero regime every product is 0 * mult = 0, so ranking
stays doc_id order and the operator returns the rows plain BM25 would.

Cross-engine parity: ln(0.5) is a Python-computed constant embedded on
both sides (F.lit / sql_double); the distance is spelled
``(col - origin) * 1.0 / scale`` with integer origin/scale so both
engines execute the identical operand sequence; exp is the same libm
lane every existing ln/exp oracle already proves bit-stable. Ordering
binds the RAW final score (rounded only at the output projection).

Scale notes: the decay column joins onto the THRESHOLDED candidates
only (a docvalues lookup on survivors — the corpus-wide join exists
only in the degenerate branch, where the answer is corpus-sized by
definition); the k-cut is a TakeOrderedAndProject over the kept rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6, round6_sql, sql_double
from ..oracle.tokenizer import tokenize
from .explore import _kept_with_cols
from .scorer import Index

_LN_HALF = math.log(0.5)
_DECAYS = ("gauss", "linear")


def _check(col: str, origin: int, scale: int, decay: str) -> None:
    from .aggs import _check_name

    _check_name(col, "column name")
    if decay not in _DECAYS:
        raise ValueError(f"decay must be one of {_DECAYS}: {decay!r}")
    if int(scale) <= 0:
        raise ValueError(f"scale must be positive: {scale!r}")


def _mult_col(col: str, origin: int, scale: int, decay: str):
    d = (F.col(col).cast("double") - F.lit(float(int(origin)))) * F.lit(
        1.0
    ) / F.lit(float(int(scale)))
    if decay == "gauss":
        return F.exp(F.lit(_LN_HALF) * d * d)
    return F.greatest(F.lit(0.0), F.lit(1.0) - F.lit(0.5) * F.abs(d))


def _mult_sql(col: str, origin: int, scale: int, decay: str) -> str:
    d = f"(CAST({col} AS DOUBLE) - {sql_double(float(int(origin)))}) * 1.0 / {sql_double(float(int(scale)))}"
    if decay == "gauss":
        return f"exp({sql_double(_LN_HALF)} * ({d}) * ({d}))"
    return f"greatest(0.0, 1.0 - 0.5 * abs({d}))"


def bm25_decay_topk(
    index: Index,
    query: str,
    col: str = "doc_len",
    origin: int = 30,
    scale: int = 20,
    decay: str = "gauss",
    k: int = 10,
) -> DataFrame:
    """(rank, doc_id, score, mult) — BM25 top-k with the final score
    bm25 * decay_mult(col), ties (score desc, doc_id asc)."""
    _check(col, origin, scale, decay)
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, score double, mult double"
        )
    kept = _kept_with_cols(index, query, [col])
    mult = _mult_col(col, origin, scale, decay)
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


def bm25_decay_sql(
    query: str,
    col: str = "doc_len",
    origin: int = 30,
    scale: int = 20,
    decay: str = "gauss",
    k: int = 10,
) -> str:
    """DuckDB mirror of bm25_decay_topk: the shared kept chain
    (sql_oracle.kept_cte_sql) with the identical multiplier operand
    sequence, ordered on the RAW final."""
    from ..functions.sql_oracle import kept_cte_sql

    _check(col, origin, scale, decay)
    chain = kept_cte_sql(query, [col])
    if chain is None:
        return (
            "SELECT 1::INT AS rank, 1::BIGINT AS doc_id, 0.0 AS score, "
            "0.0 AS mult WHERE false"
        )
    mult = _mult_sql(col, origin, scale, decay)
    return (
        f"{chain}, "
        "boosted AS ("
        f"  SELECT doc_id, {mult} AS mult, score * ({mult}) AS final FROM kept) "
        "SELECT CAST(row_number() OVER (ORDER BY final DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('final')} AS score, {round6_sql('mult')} AS mult "
        f"FROM boosted ORDER BY final DESC, doc_id ASC LIMIT {int(k)}"
    )
