"""Learning-to-rank rescorer (the ES 8.12+ LTR rescorer surface:
feature extraction + model scoring over a bounded rescore window).

Reference analog: the reference serves plain BM25 rankings
(codesearch/search/bm25_index.py); LTR is the standard production step
above it — re-rank the top ``window_size`` candidates with a model over
per-(query, doc) features. The model here is a LINEAR scorer with an
injectable weight artifact (the train_centroids / train_pq_codebooks
seam discipline: a deterministic SQL-derivable default, a save/load
JSON artifact, and a real trained model drops in without touching the
plan); tree ensembles would ride the same feature relation through the
classify mapInPandas seam.

Features (fixed order — the weight vector's contract):
    f0  bm25      raw kept-chain score
    f1  n_matched distinct query terms present in the doc
    f2  ln_dl     ln(1 + doc_len) (the proven ln lane)
    f3  max_tf    max per-term tf among the query's terms

Scale: the window is a TakeOrdered k-row cut of the kept chain; the
feature pass is ONE term-pruned tf scan aggregated per doc
(map-side-combinable count/max) joined onto the window's <= window_size
rows. Nothing corpus-sized moves after the kept chain.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6, round6_sql, sql_double
from ..oracle.tokenizer import tokenize

# deterministic default weights (f0..f3) — a plausible hand model:
# BM25 dominates, matched-term coverage helps, mild length prior,
# small tf bonus. The artifact seam replaces them wholesale.
DEFAULT_LTR_WEIGHTS = (1.0, 0.5, -0.1, 0.05)


def save_ltr(path: str, weights: Sequence[float]) -> None:
    """Persist a linear LTR model artifact (JSON, atomic rename)."""
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump({"weights": [float(w) for w in weights]}, f)
    os.replace(tmp, path)


def load_ltr(path: str) -> tuple:
    with open(path) as f:
        return tuple(float(w) for w in json.load(f)["weights"])


def ltr_rescore_topk(
    index,
    query: str,
    weights: Optional[Sequence[float]] = None,
    window_size: int = 20,
    k: int = 10,
) -> DataFrame:
    """(rank, doc_id, base, n_matched, score) — re-rank the top
    ``window_size`` BM25 candidates by the linear model over the
    feature vector; docs outside the window keep their original
    ranking below it (ES rescore semantics — for k <= window_size the
    global top-k IS the window's re-ranked top-k, enforced). The dot
    product chains the four terms in fixed feature order on both
    engines."""
    from .explore import _kept_with_cols
    from .scorer import query_term_weights

    spark = index.spark
    if int(k) > int(window_size):
        raise ValueError(f"k ({k}) must be <= window_size ({window_size})")
    w = tuple(float(x) for x in (weights or DEFAULT_LTR_WEIGHTS))
    if len(w) != 4:
        raise ValueError(f"need exactly 4 feature weights: {w!r}")
    out = "rank int, doc_id long, base double, n_matched long, score double"
    if not tokenize(query):
        return spark.createDataFrame([], out)
    kept = _kept_with_cols(index, query, ["doc_len"])
    win = kept.orderBy(F.desc("score"), F.asc("doc_id")).limit(
        int(window_size)
    )
    uniq = sorted({t for t, _, _ in query_term_weights(index, query)})
    if uniq:
        feats = (
            index.tf.where(F.col("term").isin(uniq))
            .groupBy("doc_id")
            .agg(
                F.countDistinct("term").cast("long").alias("n_matched"),
                F.max("tf").cast("long").alias("max_tf"),
            )
        )
        j = win.join(feats, "doc_id", "left")
    else:
        j = win.withColumn("n_matched", F.lit(None).cast("long")).withColumn(
            "max_tf", F.lit(None).cast("long")
        )
    nm = F.coalesce(F.col("n_matched"), F.lit(0)).cast("double")
    mt = F.coalesce(F.col("max_tf"), F.lit(0)).cast("double")
    ldl = F.log(F.lit(1.0) + F.col("doc_len").cast("double"))
    ltr = (
        F.lit(w[0]) * F.col("score")
        + F.lit(w[1]) * nm
        + F.lit(w[2]) * ldl
        + F.lit(w[3]) * mt
    )
    scored = j.select(
        "doc_id",
        F.col("score").alias("base"),
        F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias(
            "n_matched"
        ),
        ltr.alias("ltr"),
    )
    ww = Window.orderBy(F.desc("ltr"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("ltr"), F.asc("doc_id"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(ww))
        .select(
            "rank", "doc_id", round6("base").alias("base"), "n_matched",
            round6("ltr").alias("score"),
        )
    )


def ltr_rescore_sql(
    query: str,
    weights: Optional[Sequence[float]] = None,
    window_size: int = 20,
    k: int = 10,
) -> str:
    """DuckDB mirror of ltr_rescore_topk: the kept chain + window cut
    + the term-pruned feature agg + the identical fixed-order dot."""
    from ..functions.sql_oracle import kept_cte_sql

    if int(k) > int(window_size):
        raise ValueError(f"k ({k}) must be <= window_size ({window_size})")
    w = tuple(float(x) for x in (weights or DEFAULT_LTR_WEIGHTS))
    if len(w) != 4:
        raise ValueError(f"need exactly 4 feature weights: {w!r}")
    chain = kept_cte_sql(query, ["doc_len"])
    if chain is None:
        return (
            "SELECT 1::INT AS rank, 1::BIGINT AS doc_id, 0.0 AS base, "
            "1::BIGINT AS n_matched, 0.0 AS score WHERE false"
        )
    toks = sorted(set(tokenize(query)))
    tlist = ", ".join(f"'{t}'" for t in toks)
    ws = [sql_double(x) for x in w]
    ltr = (
        f"{ws[0]} * win.score + {ws[1]} * CAST(coalesce(ft.n_matched, 0) AS DOUBLE) "
        f"+ {ws[2]} * ln(1.0 + CAST(win.doc_len AS DOUBLE)) "
        f"+ {ws[3]} * CAST(coalesce(ft.max_tf, 0) AS DOUBLE)"
    )
    return (
        f"{chain}, "
        "win AS (SELECT doc_id, doc_len, score FROM kept "
        f"ORDER BY score DESC, doc_id ASC LIMIT {int(window_size)}), "
        f"ft AS (SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS n_matched, "
        f"CAST(max(tf) AS BIGINT) AS max_tf FROM tf WHERE term IN ({tlist}) "
        "GROUP BY doc_id), "
        "blended AS (SELECT win.doc_id, win.score AS base, "
        "CAST(coalesce(ft.n_matched, 0) AS BIGINT) AS n_matched, "
        f"{ltr} AS ltr FROM win LEFT JOIN ft USING (doc_id)) "
        "SELECT CAST(row_number() OVER (ORDER BY ltr DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('base')} AS base, n_matched, "
        f"{round6_sql('ltr')} AS score "
        f"FROM blended ORDER BY ltr DESC, doc_id ASC LIMIT {int(k)}"
    )
