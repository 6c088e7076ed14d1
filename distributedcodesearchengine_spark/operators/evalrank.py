"""Retrieval-quality evaluation harness: nDCG@k, MRR, recall@k,
precision@k, ERR@k (the ES _rank_eval metric set).

The measurement layer every search engine ships beside its scorer
(Lucene's benchmarks module, TREC eval — public IR methodology;
Järvelin & Kekäläinen 2002 for nDCG). The reference repo tests rank
identity but never *quality*; at 100 TB the eval harness is what
detects a silently-degraded ranker after an index or analyzer change,
so it's a first-class distributed operator here, not a notebook script.

Relevance labels are derived deterministically from the corpus itself —
``rel(q, d)`` = number of DISTINCT query terms document d contains
(graded, 0..|q|) — so the whole evaluation is a pure function of
(corpus, query set) and the DuckDB oracle can replicate it exactly:
labels, the ranking under test, and the metrics all run on both engines
and must agree bit-for-bit.

Metric arithmetic is written on the engine-portable lanes:

- DCG discount uses ``ln(rank+1) / LN2`` with LN2 a Python-computed
  literal embedded in BOTH engines (the raw ``log2`` builtin is an
  unproven lane; ln is bit-parity-proven here).
- DCG / ideal-DCG sums fold in canonical rank order (``sum(... ORDER
  BY rank)`` / the array_sort fold) — per-query k-row folds.
- Ideal ranking ties (equal rel) break by doc_id; the gain sequence is
  identical either way, the pinned order just keeps the fold canonical.

Scale shape: labels are one broadcast join of the tiny (query, term)
relation against the distinct-token explode plus one (query, doc)
groupBy; metrics are per-query k-row aggregations windowed/grouped by
query_id — parallel across queries, nothing corpus-wide after the
label join.
"""

from __future__ import annotations

import math
from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6, round6_sql, sql_double
from ..oracle.tokenizer import tokenize

LN2 = math.log(2.0)


def relevance_labels(docs: DataFrame, queries: Dict[int, str]) -> DataFrame:
    """(query_id, doc_id, rel) over docs(doc_id, tokens): graded rel =
    count of distinct query terms the doc contains (rows only where
    rel >= 1)."""
    spark = docs.sparkSession
    rows = []
    for qid, q in queries.items():
        for t in sorted(set(tokenize(q))):
            rows.append((int(qid), t))
    qdf = spark.createDataFrame(rows, "query_id int, term string")
    doc_terms = docs.select(
        "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
    )
    return (
        doc_terms.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("int").alias("rel"))
    )


def _gain(rank_col, rel_col):
    return (F.pow(F.lit(2.0), rel_col) - F.lit(1.0)) / (
        F.log(rank_col + F.lit(1.0)) / F.lit(LN2)
    )


def eval_ranking(
    results: DataFrame, labels: DataFrame, k: int = 10
) -> DataFrame:
    """results(query_id, rank, doc_id) + labels -> one row per query:
    (query_id, ndcg, mrr, recall, precision, err), 6-dp rounded.
    precision = relevant-retrieved / retrieved (ES _rank_eval
    precision); err = Expected Reciprocal Rank (Chapelle et al. 2009)
    with gmax = the query's max observed grade."""
    gmax = labels.groupBy("query_id").agg(F.max("rel").alias("gmax"))
    r = (
        results.where(F.col("rank") <= k)
        .join(labels, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn("g", _gain(F.col("rank"), F.col("rel")))
        .join(F.broadcast(gmax), "query_id", "left")
        # ERR stopping probability (Chapelle et al. 2009): R =
        # (2^rel - 1) / 2^gmax with gmax the query's max observed
        # grade — exact dyadic rationals on both engines; rel 0 -> 0,
        # and R < 1 strictly so the continue-probability never hits 0
        .withColumn(
            "rr",
            (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
            / F.pow(F.lit(2.0), F.col("gmax")),
        )
    )
    # ERR's sequential (err, p) state folds in rank order as a
    # 2-element double array on BOTH engines (Spark aggregate ==
    # DuckDB list_reduce with a prepended [0, 1] initial state) — the
    # identical op sequence, so parity is exact
    err_fold = F.element_at(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rank").cast("double").alias("r"),
                        F.col("rr").alias("v"),
                    )
                )
            ),
            F.array(F.lit(0.0), F.lit(1.0)),
            lambda acc, x: F.array(
                F.element_at(acc, 1)
                + F.element_at(acc, 2) * x["v"] / x["r"],
                F.element_at(acc, 2) * (F.lit(1.0) - x["v"]),
            ),
        ),
        1,
    )
    per_q = r.groupBy("query_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", "g"))),
            F.lit(0.0),
            lambda acc, x: acc + x["g"],
        ).alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("frank"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("long").alias("hits"),
        F.count("*").cast("long").alias("cnt"),
        err_fold.alias("err"),
    )
    wi = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        labels.where(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(wi))
        .where(F.col("irank") <= k)
        .withColumn("g", _gain(F.col("irank"), F.col("rel")))
        .groupBy("query_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("irank", "g"))),
                F.lit(0.0),
                lambda acc, x: acc + x["g"],
            ).alias("idcg")
        )
    )
    n_rel = (
        labels.where(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_rel"))
    )
    out = per_q.join(ideal, "query_id", "left").join(n_rel, "query_id", "left")
    return out.select(
        "query_id",
        round6(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(0.0)
        ).alias("ndcg"),
        round6(
            F.when(
                F.col("frank").isNotNull(), F.lit(1.0) / F.col("frank")
            ).otherwise(0.0)
        ).alias("mrr"),
        round6(
            F.when(
                F.col("n_rel") > 0,
                F.col("hits") * F.lit(1.0) / F.col("n_rel"),
            ).otherwise(0.0)
        ).alias("recall"),
        round6(
            F.when(
                F.col("cnt") > 0, F.col("hits") * F.lit(1.0) / F.col("cnt")
            ).otherwise(0.0)
        ).alias("precision"),
        round6(F.coalesce(F.col("err"), F.lit(0.0))).alias("err"),
    ).orderBy("query_id")


def eval_ranking_sql(
    results_sql: str,
    toks_cte: str,
    queries: Dict[int, str],
    k: int = 10,
) -> str:
    """DuckDB mirror: ``results_sql`` yields (query_id, rank, doc_id
    [, ...]); ``toks_cte`` provides docs(doc_id, toks)."""
    qrows = []
    for qid, q in sorted(queries.items()):
        for t in sorted(set(tokenize(q))):
            qrows.append(f"({int(qid)}, '{t}')")
    qvals = ", ".join(qrows)
    gain = f"(2.0 ^ rel - 1.0) / (ln(rank + 1.0) / {sql_double(LN2)})"
    igain = f"(2.0 ^ rel - 1.0) / (ln(irank + 1.0) / {sql_double(LN2)})"
    return (
        f"WITH {toks_cte}, "
        f"res AS ({results_sql}), "
        f"qt(query_id, term) AS (VALUES {qvals}), "
        "dterms AS (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM docs), "
        "labels AS (SELECT query_id, doc_id, CAST(count(*) AS INT) AS rel "
        "FROM dterms JOIN qt USING (term) GROUP BY query_id, doc_id), "
        "gm AS (SELECT query_id, max(rel) AS gmax FROM labels GROUP BY query_id), "
        "r AS (SELECT res.query_id, res.rank, res.doc_id, coalesce(l.rel, 0) AS rel, "
        "((2.0 ^ coalesce(l.rel, 0)) - 1.0) / (2.0 ^ gm.gmax) AS rr "
        "FROM res LEFT JOIN labels l ON l.query_id = res.query_id AND l.doc_id = res.doc_id "
        "LEFT JOIN gm ON gm.query_id = res.query_id "
        f"WHERE res.rank <= {int(k)}), "
        f"d AS (SELECT query_id, sum({gain} ORDER BY rank) AS dcg, "
        "min(CASE WHEN rel > 0 THEN rank END) AS frank, "
        "CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits, "
        "CAST(count(*) AS BIGINT) AS cnt, "
        "list_reduce(list_prepend([0.0e0, 1.0e0], "
        "list([rr, CAST(rank AS DOUBLE)] ORDER BY rank)), "
        "(acc, x) -> [acc[1] + acc[2] * x[1] / x[2], "
        "acc[2] * (1.0e0 - x[1])])[1] AS err "
        "FROM r GROUP BY query_id), "
        "il AS (SELECT query_id, doc_id, rel, row_number() OVER "
        "(PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS irank "
        "FROM labels WHERE rel > 0), "
        f"i AS (SELECT query_id, sum({igain} ORDER BY irank) AS idcg "
        f"FROM il WHERE irank <= {int(k)} GROUP BY query_id), "
        "nr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel "
        "FROM labels WHERE rel > 0 GROUP BY query_id) "
        "SELECT d.query_id, "
        f"{round6_sql('CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg ELSE 0.0 END')} AS ndcg, "
        f"{round6_sql('CASE WHEN d.frank IS NOT NULL THEN 1.0 / d.frank ELSE 0.0 END')} AS mrr, "
        f"{round6_sql('CASE WHEN nr.n_rel > 0 THEN d.hits * 1.0 / nr.n_rel ELSE 0.0 END')} AS recall, "
        f"{round6_sql('CASE WHEN d.cnt > 0 THEN d.hits * 1.0 / d.cnt ELSE 0.0 END')} AS precision, "
        f"{round6_sql('coalesce(d.err, 0.0)')} AS err "
        "FROM d LEFT JOIN i USING (query_id) LEFT JOIN nr USING (query_id) "
        "ORDER BY d.query_id"
    )


# ---------------------------------------------------------------------------
# similarity-agreement harness (pairwise top-k overlap between models)
# ---------------------------------------------------------------------------


def similarity_agreement(index, query: str, k: int = 10):
    """(model_a, model_b, overlap, k) — pairwise top-k set overlap
    between scoring models (bm25 / classic / dfr) for one query: the
    model-selection diagnostic (retrieval_eval's sibling — high
    overlap means a swap is low-risk for this query class; low
    overlap means run the labeled eval before switching). Each
    model's top-k is its own deterministic total order, so the
    integer overlaps are exact cross-engine; the m-row result
    assembles driver-side like ann_recall."""
    from .scorer import bm25_topk, classic_topk, dfr_topk

    models = [
        ("bm25", bm25_topk),
        ("classic", classic_topk),
        ("dfr", dfr_topk),
    ]
    tops = {
        name: {r["doc_id"] for r in fn(index, query, k=int(k)).collect()}
        for name, fn in models
    }
    rows = []
    for i in range(len(models)):
        for j in range(i + 1, len(models)):
            a, b = models[i][0], models[j][0]
            rows.append((a, b, len(tops[a] & tops[b]), int(k)))
    return index.spark.createDataFrame(
        rows, "model_a string, model_b string, overlap long, k int"
    )


def similarity_agreement_sql(query: str, k: int = 10) -> str:
    """DuckDB mirror: each model's full mirror statement wrapped as a
    subquery (nested WITH inside a parenthesized source — the
    percolate_phrase precedent), pairwise intersection counts."""
    from ..functions.sql_oracle import bm25_topk_sql, dfr_sql
    from .scorer import classic_sql

    stmts = {
        "bm25": bm25_topk_sql(query, k=int(k)),
        "classic": classic_sql(query, k=int(k)),
        "dfr": dfr_sql(query, k=int(k)),
    }
    names = list(stmts)
    selects = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            selects.append(
                f"SELECT '{a}' AS model_a, '{b}' AS model_b, "
                "CAST((SELECT count(*) FROM "
                f"(SELECT doc_id FROM ({stmts[a]})) xa "
                f"WHERE doc_id IN (SELECT doc_id FROM ({stmts[b]}))) AS BIGINT) "
                f"AS overlap, {int(k)} AS k"
            )
    return " UNION ALL ".join(selects)
