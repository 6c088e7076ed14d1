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


# ---------------------------------------------------------------------------
# field_value_factor (ES function_score field_value_factor)
# ---------------------------------------------------------------------------

_MODIFIERS = ("log1p", "sqrt", "none")


def _fvf_check(col: str, factor: float, modifier: str) -> None:
    from .aggs import _check_name

    _check_name(col, "column name")
    if modifier not in _MODIFIERS:
        raise ValueError(f"modifier must be one of {_MODIFIERS}: {modifier!r}")
    if not (float(factor) > 0.0):
        raise ValueError(f"factor must be positive: {factor!r}")


def _fvf_mult_col(col: str, factor: float, modifier: str):
    x = F.col(col).cast("double")
    if modifier == "log1p":
        m = F.log(F.lit(1.0) + x)
    elif modifier == "sqrt":
        m = F.sqrt(x)
    else:
        m = x
    return F.lit(float(factor)) * m


def _fvf_mult_sql(col: str, factor: float, modifier: str) -> str:
    x = f"CAST({col} AS DOUBLE)"
    if modifier == "log1p":
        m = f"ln(1.0 + {x})"
    elif modifier == "sqrt":
        m = f"sqrt({x})"
    else:
        m = x
    return f"{sql_double(float(factor))} * {m}"


def bm25_fvf_topk(
    index: Index,
    query: str,
    col: str = "doc_len",
    factor: float = 0.5,
    modifier: str = "log1p",
    k: int = 10,
) -> DataFrame:
    """(rank, doc_id, score, mult) — the ES ``function_score``
    ``field_value_factor`` with boost_mode multiply: final =
    bm25 * (factor * modifier(col)), modifier one of log1p
    (ln(1 + x), the ES default recommendation — saturates popularity
    counters), sqrt, none. Applied AFTER the relative threshold like
    decay/clickboost — it rescores what matched, never admits
    non-matching docs; the degenerate all-zero regime returns plain-BM25
    rows unchanged (0 * mult = 0). ln/sqrt are the proven bit-stable
    libm lanes; factor embeds via F.lit / sql_double; ordering binds
    the RAW final."""
    _fvf_check(col, factor, modifier)
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, score double, mult double"
        )
    kept = _kept_with_cols(index, query, [col])
    mult = _fvf_mult_col(col, factor, modifier)
    boosted = kept.select(
        "doc_id", "score", mult.alias("mult"),
        (F.col("score") * mult).alias("final"),
    )
    top = boosted.orderBy(F.desc("final"), F.asc("doc_id")).limit(int(k))
    w = Window.orderBy(F.desc("final"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "doc_id",
        round6("final").alias("score"),
        round6("mult").alias("mult"),
    )


def bm25_fvf_sql(
    query: str,
    col: str = "doc_len",
    factor: float = 0.5,
    modifier: str = "log1p",
    k: int = 10,
) -> str:
    """DuckDB mirror of bm25_fvf_topk: the shared kept chain with the
    identical multiplier operand sequence, ordered on the RAW final."""
    from ..functions.sql_oracle import kept_cte_sql

    _fvf_check(col, factor, modifier)
    chain = kept_cte_sql(query, [col])
    if chain is None:
        return (
            "SELECT 1::INT AS rank, 1::BIGINT AS doc_id, 0.0 AS score, "
            "0.0 AS mult WHERE false"
        )
    mult = _fvf_mult_sql(col, factor, modifier)
    return (
        f"{chain}, "
        "boosted AS ("
        f"  SELECT doc_id, {mult} AS mult, score * ({mult}) AS final FROM kept) "
        "SELECT CAST(row_number() OVER (ORDER BY final DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('final')} AS score, {round6_sql('mult')} AS mult "
        f"FROM boosted ORDER BY final DESC, doc_id ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# random_score (ES function_score random_score, seeded)
# ---------------------------------------------------------------------------

_RAND_DENOM = 4294967296  # 2^32 — the 8-hex-char md5 prefix's range


def _rand_mult_col(seed: str):
    h = F.md5(
        F.encode(
            F.concat(F.lit(str(seed) + ":"), F.col("doc_id").cast("string")),
            "utf-8",
        )
    )
    num = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    return num / F.lit(float(_RAND_DENOM))


def _rand_mult_sql(seed: str) -> str:
    h = f"md5('{seed}:' || CAST(doc_id AS VARCHAR))"
    num = f"CAST(('0x' || substr({h}, 1, 8))::BIGINT AS DOUBLE)"
    return f"{num} / CAST({_RAND_DENOM} AS DOUBLE)"


def bm25_random_topk(
    index: Index, query: str, seed: str = "0", k: int = 10
) -> DataFrame:
    """(rank, doc_id, score, mult) — the ES ``function_score``
    ``random_score`` with a seed and boost_mode multiply: final =
    bm25 * r where r in [0, 1) is the deterministic per-(seed, doc_id)
    uniform md5(seed:doc_id) 8-hex-char prefix / 2^32 — the same
    portable hash-bucket lane mixture_sample / minhash use, and the
    reproducible-shuffle primitive a result-diversification A/B test
    needs (same seed => same ranking forever, new seed => fresh
    shuffle). Applied post-threshold like decay/fvf; the degenerate
    all-zero regime returns plain-BM25 rows unchanged. The seed is
    validated against the filter-value charset since it reaches the
    oracle's literal position."""
    from .aggs import _check_value

    _check_value(str(seed))
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, score double, mult double"
        )
    kept = _kept_with_cols(index, query, [])
    mult = _rand_mult_col(seed)
    boosted = kept.select(
        "doc_id", "score", mult.alias("mult"),
        (F.col("score") * mult).alias("final"),
    )
    top = boosted.orderBy(F.desc("final"), F.asc("doc_id")).limit(int(k))
    w = Window.orderBy(F.desc("final"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "doc_id",
        round6("final").alias("score"),
        round6("mult").alias("mult"),
    )


def bm25_random_sql(query: str, seed: str = "0", k: int = 10) -> str:
    """DuckDB mirror of bm25_random_topk: identical hash lane
    (('0x' || hex)::BIGINT is the DuckDB analog of Spark's
    conv(hex, 16, 10) — the chunk-embed precedent), identical division,
    ordered on the RAW final."""
    from ..functions.sql_oracle import kept_cte_sql
    from .aggs import _check_value

    _check_value(str(seed))
    chain = kept_cte_sql(query, [])
    if chain is None:
        return (
            "SELECT 1::INT AS rank, 1::BIGINT AS doc_id, 0.0 AS score, "
            "0.0 AS mult WHERE false"
        )
    mult = _rand_mult_sql(seed)
    return (
        f"{chain}, "
        "boosted AS ("
        f"  SELECT doc_id, {mult} AS mult, score * ({mult}) AS final FROM kept) "
        "SELECT CAST(row_number() OVER (ORDER BY final DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('final')} AS score, {round6_sql('mult')} AS mult "
        f"FROM boosted ORDER BY final DESC, doc_id ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# rank_feature query (ES RankFeatureQuery: saturation / log / sigmoid)
# ---------------------------------------------------------------------------

_RF_FUNCTIONS = ("saturation", "log", "sigmoid")


def _rf_check(col: str, function: str, pivot: float, boost: float,
              exponent: float) -> None:
    from .aggs import _check_name

    _check_name(col, "column name")
    if function not in _RF_FUNCTIONS:
        raise ValueError(f"function must be one of {_RF_FUNCTIONS}: {function!r}")
    if not (float(pivot) > 0.0):
        raise ValueError(f"pivot must be positive: {pivot!r}")
    if not (float(boost) >= 0.0):
        raise ValueError(f"boost must be >= 0: {boost!r}")
    if not (float(exponent) > 0.0):
        raise ValueError(f"exponent must be positive: {exponent!r}")


def _rf_feature_col(col: str, function: str, pivot: float, exponent: float):
    x = F.col(col).cast("double")
    p = F.lit(float(pivot))
    if function == "saturation":
        return x / (x + p)
    if function == "log":
        return F.log(F.lit(1.0) + x)
    # sigmoid: x^e / (x^e + pivot^e), spelled exp(e*ln(.)) on BOTH
    # engines (pow is an unproven libm lane; exp/ln are the proven
    # ones) with the x <= 0 guard pinning the feature to 0
    e = F.lit(float(exponent))
    xe = F.exp(e * F.log(x))
    pe = F.exp(e * F.log(p))
    return F.when(x <= 0, F.lit(0.0)).otherwise(xe / (xe + pe))


def _rf_feature_sql(col: str, function: str, pivot: float,
                    exponent: float) -> str:
    x = f"CAST({col} AS DOUBLE)"
    p = sql_double(float(pivot))
    if function == "saturation":
        return f"{x} / ({x} + {p})"
    if function == "log":
        return f"ln(1.0 + {x})"
    e = sql_double(float(exponent))
    xe = f"exp({e} * ln({x}))"
    pe = f"exp({e} * ln({p}))"
    return f"CASE WHEN {x} <= 0 THEN 0.0 ELSE {xe} / ({xe} + {pe}) END"


def bm25_rank_feature_topk(
    index: Index,
    query: str,
    col: str = "doc_len",
    function: str = "saturation",
    pivot: float = 40.0,
    boost: float = 2.0,
    exponent: float = 2.0,
    k: int = 10,
) -> DataFrame:
    """(rank, doc_id, base, feat, score) — the ES ``rank_feature``
    query as a bool-should clause: final = base + boost * S(x) with x
    a numeric document feature (a rank_feature field — popularity,
    pagerank, url_length...; here any docs column) and S one of

    - ``saturation``: x / (x + pivot) (the ES default shape),
    - ``log``: ln(1 + x),
    - ``sigmoid``: x^e / (x^e + pivot^e), spelled exp(e*ln(.)).

    ADDITIVE like distance_feature (every kept doc gets the boost; in
    the degenerate all-zero regime ranking collapses to the feature
    order), unlike field_value_factor's multiplicative boost_mode —
    the ES distinction between the two surfaces. Same minimal plan:
    the kept chain gains one projection and a TakeOrdered."""
    _rf_check(col, function, pivot, boost, exponent)
    spark = index.spark
    out = "rank int, doc_id long, base double, feat double, score double"
    if not tokenize(query):
        return spark.createDataFrame([], out)
    kept = _kept_with_cols(index, query, [col])
    s = _rf_feature_col(col, function, pivot, exponent)
    boosted = kept.select(
        "doc_id", F.col("score").alias("base"), s.alias("feat"),
        (F.col("score") + F.lit(float(boost)) * s).alias("final"),
    )
    top = boosted.orderBy(F.desc("final"), F.asc("doc_id")).limit(int(k))
    w = Window.orderBy(F.desc("final"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", round6("base").alias("base"),
        round6("feat").alias("feat"), round6("final").alias("score"),
    )


def bm25_rank_feature_sql(
    query: str,
    col: str = "doc_len",
    function: str = "saturation",
    pivot: float = 40.0,
    boost: float = 2.0,
    exponent: float = 2.0,
    k: int = 10,
) -> str:
    """DuckDB mirror of bm25_rank_feature_topk over the kept chain."""
    from ..functions.sql_oracle import kept_cte_sql

    _rf_check(col, function, pivot, boost, exponent)
    chain = kept_cte_sql(query, [col])
    if chain is None:
        return (
            "SELECT 1::INT AS rank, 1::BIGINT AS doc_id, 0.0 AS base, "
            "0.0 AS feat, 0.0 AS score WHERE false"
        )
    s = _rf_feature_sql(col, function, pivot, exponent)
    b = sql_double(float(boost))
    return (
        f"{chain}, "
        "boosted AS ("
        f"  SELECT doc_id, score AS base, {s} AS feat, "
        f"  score + {b} * ({s}) AS final FROM kept) "
        "SELECT CAST(row_number() OVER (ORDER BY final DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('base')} AS base, {round6_sql('feat')} AS feat, "
        f"{round6_sql('final')} AS score "
        f"FROM boosted ORDER BY final DESC, doc_id ASC LIMIT {int(k)}"
    )
