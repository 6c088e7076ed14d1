"""BM25F multi-field ranking (title/body field weights).

The classic fulltext-tier extension the single-field engine lacks:
Lucene/Elasticsearch rank multi-field documents by combining per-field
term frequencies BEFORE saturation, so a term hit in a short weighted
title counts more than the same hit buried in the body — the "simple
BM25F" of Robertson & Zaragoza, *The Probabilistic Relevance Framework:
BM25 and Beyond* (2009), §"BM25F" (public literature; the reference
engine scores one concatenated field, ``bm25_index.py:117-170``, so
this is a strict superset surface).

Semantics, per query token t with multiplicity qtf and fields f with
weight ``w_f`` and length-normalization slope ``b_f``:

    B_f(d)   = (1 - b_f) + b_f * len_f(d) / avgdl_f
    tfw(t,d) = sum_f  w_f * tf_f(t,d) / B_f(d)     (fixed field order)
    score    = sum_t  qtf * idf(t) * tfw / (k1 + tfw)

- ``len_f`` / ``avgdl_f`` are per-field (all docs, incl. empty fields;
  an all-empty field gets avgdl := 1.0 so B_f stays finite — its tf is
  identically 0 so the value never matters, only the non-NaN shape).
- ``df(t)`` is DOCUMENT-level: a doc contains t if ANY field does.
  idf reuses the engine's rank_bm25 chain with the canonical
  term-sorted epsilon-floor fold (operators/stats.idf_detail_from_df),
  so BM25F and BM25 agree on the idf of every term.
- Saturation has no (k1+1) numerator factor — the standard BM25F form;
  for a single field with weight 1 the ranking (not the score) of a
  one-term query is identical to BM25 because x/(k1+x) and
  x*(k1+1)/(x+k1) are both increasing in x = tf/B (unit-tested).
- The relative 1%-of-max threshold, degenerate all-zero backfill and
  (score desc, doc_id asc) tie-break mirror the house BM25 contract
  (operators/scorer.finalize_topk) so results compose with the same
  serving conventions.

Scale shape: one tokenize pass per field (Arrow-batched pandas UDF,
lazily localCheckpoint-ed so the three consumers — per-field length
stats, the tf explode, the per-doc length join — evaluate it once), ONE
(doc_id, term) shuffle with the per-field counts as conditional-sum
columns (map-side combinable), a term-pruned broadcast join for the
query side, and candidates-only joins after that. At serving scale the
per-field tf columns live in the persisted index (a wider postings
value, same layout) instead of a per-query corpus scan.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from functools import reduce
from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..oracle.tokenizer import tokenize
from .stats import K1, idf_detail_from_df


@dataclass(frozen=True)
class FieldSpec:
    """One scored field: ``name`` is a TEXT column on the docs input."""

    name: str
    weight: float
    b: float = 0.75


_EMPTY = "rank int, doc_id long, score double"


def bm25f_topk(
    docs: DataFrame,
    query: str,
    fields: Sequence[FieldSpec],
    k: int = 10,
    k1: float = K1,
) -> DataFrame:
    """BM25F top-k over ``docs(doc_id, <field text columns...>)`` ->
    (rank, doc_id, score), raw (unrounded) scores."""
    spark = docs.sparkSession
    toks = tokenize(query)
    if not toks:
        return spark.createDataFrame([], _EMPTY)
    counts = Counter(toks)
    uniq = sorted(counts)
    nf = len(fields)

    from ..functions.udfs import tokenize_udf

    parts = [
        docs.select(
            "doc_id", F.lit(i).alias("fld"), tokenize_udf(F.col(fs.name)).alias("toks")
        )
        for i, fs in enumerate(fields)
    ]
    stacked = reduce(DataFrame.unionByName, parts)
    # slim field-stacked relation, tokenized ONCE (lazy localCheckpoint:
    # materialized by the stats action below, then reused by the tf
    # explode and the per-doc length aggregation without re-running the
    # UDF per consumer)
    slim = stacked.select(
        "doc_id", "fld", F.size("toks").alias("flen"), "toks"
    ).localCheckpoint(eager=False)

    srows = slim.groupBy("fld").agg(
        F.sum("flen").alias("s"), F.count("*").alias("n")
    ).collect()
    by = {int(r["fld"]): r for r in srows}
    if not by:
        return spark.createDataFrame([], _EMPTY)
    n_docs = int(by[0]["n"])
    # exact integer sum / count, same arithmetic as the SQL mirror;
    # all-empty field -> 1.0 (see module docstring)
    avgdl = [
        (float(by[i]["s"]) * 1.0 / n_docs) if by[i]["s"] else 1.0 for i in range(nf)
    ]

    lens = slim.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("fld") == i, F.col("flen")))
            .cast("long")
            .alias(f"len_{i}")
            for i in range(nf)
        ]
    )
    tfp = (
        slim.where(F.col("flen") > 0)
        .select("doc_id", "fld", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(
            *[
                F.sum(F.when(F.col("fld") == i, 1).otherwise(0))
                .cast("long")
                .alias(f"tf_{i}")
                for i in range(nf)
            ]
        )
    )
    df_rel = tfp.groupBy("term").agg(F.count("*").alias("df"))
    idf = idf_detail_from_df(df_rel, n_docs).select("term", "idf")

    qdf = spark.createDataFrame(
        [(t, float(counts[t])) for t in uniq], "term string, qtf double"
    )
    cand = (
        tfp.where(F.col("term").isin(uniq))
        .join(F.broadcast(qdf), "term")
        .join(idf.where(F.col("term").isin(uniq)), "term")
        .join(lens, "doc_id")
    )
    tfw = None
    for i, fs in enumerate(fields):
        bi = F.lit(1.0 - fs.b) + F.lit(fs.b) * F.col(f"len_{i}").cast(
            "double"
        ) / F.lit(avgdl[i])
        ti = F.lit(fs.weight) * (F.col(f"tf_{i}").cast("double") / bi)
        tfw = ti if tfw is None else tfw + ti
    cand = cand.withColumn("tfw", tfw).withColumn(
        "contrib",
        F.col("qtf") * (F.col("idf") * (F.col("tfw") / (F.lit(k1) + F.col("tfw")))),
    )
    # canonical term-sorted fold -> engine-deterministic doubles
    scored = cand.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    mxv = scored.agg(F.max("score").alias("m")).first()["m"]
    if mxv is not None and mxv > 0:
        # matched-only fast path: unmatched rows can never pass the 1% cut
        res = scored.where(F.col("score") >= F.lit(0.01 * mxv))
    else:
        # all-zero / non-positive regime: zero-score backfill in doc_id
        # order, narrow TakeOrdered — never a corpus-wide sort
        zeros = (
            docs.select("doc_id")
            .join(scored.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(0.0).alias("score"))
            .orderBy("doc_id")
            .limit(k)
        )
        res = scored.select("doc_id", "score").unionByName(zeros)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        res.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "score")
    )


def bm25f_topk_sql(
    query: str,
    fields_sql: Sequence[Tuple[str, float, float]],
    k: int = 10,
    k1: float = K1,
    table: str = "documents",
) -> str:
    """DuckDB mirror: ``fields_sql`` = [(text_expr, weight, b), ...] in
    the SAME order as the Spark ``fields`` — every literal ((1-b), w,
    avgdl guard, threshold) is written so both engines evaluate the
    identical IEEE-754 operand sequence."""
    from ..functions.rounding import round6_sql, sql_double
    from ..functions.sql_oracle import EPSILON, tokenize_col

    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    nf = len(fields_sql)
    tok_cols = ", ".join(
        f"{tokenize_col(expr)} AS t{i}" for i, (expr, _, _) in enumerate(fields_sql)
    )
    len_cols = ", ".join(f"len(t{i}) AS len_{i}" for i in range(nf))
    avg_cols = ", ".join(
        f"CASE WHEN sum(len_{i}) = 0 OR sum(len_{i}) IS NULL THEN 1.0 "
        f"ELSE sum(len_{i}) * 1.0 / count(*) END AS avg_{i}"
        for i in range(nf)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS fld, unnest(t{i}) AS term FROM f" for i in range(nf)
    )
    tf_cols = ", ".join(
        f"CAST(sum(CASE WHEN fld = {i} THEN 1 ELSE 0 END) AS BIGINT) AS tf_{i}"
        for i in range(nf)
    )
    tfw = " + ".join(
        f"({sql_double(w)} * (tfp.tf_{i} / "
        f"({sql_double(1.0 - b)} + {sql_double(b)} * lens.len_{i} / (SELECT avg_{i} FROM stats))))"
        for i, (_, w, b) in enumerate(fields_sql)
    )
    return (
        f"WITH f AS (SELECT doc_id, {tok_cols} FROM {table}), "
        f"lens AS (SELECT doc_id, {len_cols} FROM f), "
        f"stats AS (SELECT count(*) AS n_docs, {avg_cols} FROM lens), "
        f"u AS ({unions}), "
        f"tfp AS (SELECT doc_id, term, {tf_cols} FROM u GROUP BY doc_id, term), "
        "dfreq AS (SELECT term, count(*) AS df FROM tfp GROUP BY term), "
        "idf0 AS (SELECT term, df, ln((SELECT n_docs FROM stats) - df + 0.5) "
        "- ln(df + 0.5) AS idf_raw FROM dfreq), "
        # two-level md5-bucket fold — same canonical order as
        # stats.idf_detail_from_df and the main oracle's epsv lane
        f"epsv AS (SELECT {EPSILON} * (sum(s ORDER BY b) / sum(n)) AS eps FROM "
        "(SELECT substr(md5(term), 1, 3) AS b, "
        "sum(idf_raw ORDER BY term) AS s, count(*) AS n "
        "FROM idf0 GROUP BY 1)), "
        "idf AS (SELECT term, CASE WHEN idf_raw < 0 THEN (SELECT eps FROM epsv) "
        "ELSE idf_raw END AS idf FROM idf0), "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS (SELECT tfp.doc_id, tfp.term, "
        f"  qt.qtf * (idf.idf * (({tfw}) / ({sql_double(k1)} + ({tfw})))) AS c "
        "  FROM tfp JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN lens ON lens.doc_id = tfp.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS (SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM lens d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )
