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


def _field_term_contribs(
    docs: DataFrame,
    query: str,
    fields: Sequence[FieldSpec],
    k1: float = K1,
):
    """Shared per-(doc, term) per-field BM25 contribution relation for
    the field-combining queries (DisMax best_fields, cross_fields):
    each field scored as its OWN index — per-field df, per-field
    epsilon-floor idf, per-field length normalization — one tokenize
    pass per field over a lazily-checkpointed stacked relation, ONE
    (doc_id, term) shuffle with per-field conditional-sum tf columns,
    term-pruned broadcast query join. Returns ``(cand, nf)`` with
    contribution columns ``c_0..c_{nf-1}``, or None for an
    empty-tokenizing query / empty corpus."""
    spark = docs.sparkSession
    toks = tokenize(query)
    if not toks:
        return None
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
    slim = stacked.select(
        "doc_id", "fld", F.size("toks").alias("flen"), "toks"
    ).localCheckpoint(eager=False)

    srows = slim.groupBy("fld").agg(
        F.sum("flen").alias("s"), F.count("*").alias("n")
    ).collect()
    by = {int(r["fld"]): r for r in srows}
    if not by:
        return None
    n_docs = int(by[0]["n"])
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
    # PER-FIELD document frequencies and idf (each field is its own
    # index: the fold runs over that field's term space)
    idfs = []
    for i in range(nf):
        df_i = (
            tfp.where(F.col(f"tf_{i}") > 0)
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
        idfs.append(
            idf_detail_from_df(df_i, n_docs)
            .select("term", F.col("idf").alias(f"idf_{i}"))
        )

    qdf = spark.createDataFrame(
        [(t, float(counts[t])) for t in uniq], "term string, qtf double"
    )
    cand = (
        tfp.where(F.col("term").isin(uniq))
        .join(F.broadcast(qdf), "term")
        .join(lens, "doc_id")
    )
    for i in range(nf):
        cand = cand.join(
            idfs[i].where(F.col("term").isin(uniq)), "term", "left"
        )
    # per-field BM25 contribution; tf_i = 0 rows contribute exactly 0
    # (coalesce keeps the NULL idf of a field-absent term from
    # poisoning the fold — the product is 0 either way)
    for i, fs in enumerate(fields):
        bi = F.lit(1.0 - fs.b) + F.lit(fs.b) * F.col(f"len_{i}").cast(
            "double"
        ) / F.lit(avgdl[i])
        cand = cand.withColumn(
            f"c_{i}",
            F.col("qtf")
            * (
                F.coalesce(F.col(f"idf_{i}"), F.lit(0.0))
                * (
                    F.col(f"tf_{i}").cast("double") * F.lit(k1 + 1.0)
                    / (F.col(f"tf_{i}").cast("double") + F.lit(k1) * bi)
                )
            ),
        )
    return cand, nf


def dismax_topk(
    docs: DataFrame,
    query: str,
    fields: Sequence[FieldSpec],
    k: int = 10,
    tie: float = 0.0,
    k1: float = K1,
) -> DataFrame:
    """DisMax ("best_fields") multi-field top-k over ``docs(doc_id,
    <field text columns...>)`` -> (rank, doc_id, score), raw scores.

    The OTHER classic multi-field combiner (Lucene
    DisjunctionMaxQuery / Elasticsearch multi_match type=best_fields):
    where BM25F blends term frequencies across fields BEFORE saturation
    (a doc matching a little everywhere accumulates), DisMax scores
    each field as its OWN BM25 index — per-field df, per-field idf
    (epsilon-floor fold over that field's term space), per-field length
    normalization — and combines per document as

        score = max_f(w_f * S_f) + tie * (sum_f(w_f * S_f) - max_f(...))

    so the single best-matching field dominates and ``tie`` (0..1)
    controls how much the other fields contribute (tie=0 is pure
    dismax; tie=1 degrades to the weighted sum). The right choice when
    fields are DISJOINT descriptions of the same thing (title vs body:
    a doc matching the whole query in its title should not be outranked
    by one matching half the query in both).

    Threshold / degenerate / (score desc, doc_id asc) conventions match
    the house BM25 contract. Scale shape is bm25f_topk's: one tokenize
    pass per field over a lazily-checkpointed stacked relation, ONE
    (doc_id, term) shuffle with per-field conditional-sum tf columns,
    term-pruned broadcast query join, candidates-only joins after.
    """
    got = _field_term_contribs(docs, query, fields, k1)
    if got is None:
        return docs.sparkSession.createDataFrame([], _EMPTY)
    cand, nf = got

    def _fold(i: int):
        # closure factory, NOT a default-arg lambda: pyspark maps the
        # lambda's parameter count onto the HOF signature, so a bound
        # `i=i` third parameter breaks the 2-arg aggregate merge fn
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", f"c_{i}"))),
            F.lit(0.0),
            lambda acc, x: acc + x[f"c_{i}"],
        ).alias(f"s_{i}")

    scored = cand.groupBy("doc_id").agg(*[_fold(i) for i in range(nf)])
    fscores = [F.lit(fields[i].weight) * F.col(f"s_{i}") for i in range(nf)]
    dis = fscores[0] if nf == 1 else F.greatest(*fscores)
    tot = fscores[0]
    for fs_col in fscores[1:]:
        tot = tot + fs_col
    scored = scored.select(
        "doc_id", (dis + F.lit(float(tie)) * (tot - dis)).alias("score")
    )
    return _finalize_field_scored(docs, scored, k)


def _finalize_field_scored(docs: DataFrame, scored: DataFrame, k: int) -> DataFrame:
    """Shared threshold / degenerate-backfill / rank tail of the
    field-combining scorers (the house F4/F7/T1 contract)."""
    mxv = scored.agg(F.max("score").alias("m")).first()["m"]
    if mxv is not None and mxv > 0:
        res = scored.where(F.col("score") >= F.lit(0.01 * mxv))
    else:
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


def cross_fields_topk(
    docs: DataFrame,
    query: str,
    fields: Sequence[FieldSpec],
    k: int = 10,
    k1: float = K1,
) -> DataFrame:
    """``multi_match type=cross_fields`` — the TERM-CENTRIC multi-field
    combiner (Lucene ``BlendedTermQuery`` with tie_breaker = 0): each
    query TERM scores against its best field, and the document score is
    the sum over terms of those per-term maxima:

        score = sum_t max_f(w_f * c_f(t, doc))

    The right choice when the query's terms are SCATTERED across fields
    describing one entity (first name in ``title``, last name in
    ``body``): best_fields requires one field to carry the whole query
    to rank well, cross_fields lets each term pick its field — a doc
    with half the query in each field beats one with half the query in
    one field, exactly the inversion of DisMax's contract (tested as a
    rank flip between the two operators on the same corpus).

    Per-field statistics (df, epsilon-floor idf, length normalization)
    are each field's own, shared with DisMax via
    ``_field_term_contribs``; per-term maxima fold per doc in canonical
    term order. Threshold / degenerate / tie-break conventions are the
    house BM25 contract; scale shape is DisMax's (one stacked tokenize
    pass, ONE (doc_id, term) shuffle, candidates-only joins).
    """
    got = _field_term_contribs(docs, query, fields, k1)
    if got is None:
        return docs.sparkSession.createDataFrame([], _EMPTY)
    cand, nf = got
    weighted = [F.lit(fields[i].weight) * F.col(f"c_{i}") for i in range(nf)]
    best = weighted[0] if nf == 1 else F.greatest(*weighted)
    scored = (
        cand.withColumn("best", best)
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "best"))),
                F.lit(0.0),
                lambda acc, x: acc + x["best"],
            ).alias("score")
        )
    )
    return _finalize_field_scored(docs, scored, k)


def _field_contrib_sql(
    query: str,
    fields_sql: Sequence[Tuple[str, float, float]],
    k1: float = K1,
    table: str = "documents",
):
    """Shared DuckDB CTE prefix of the field-combining mirrors, through
    the per-(doc, term) ``contrib`` relation with columns
    ``c_0..c_{nf-1}`` (per-field dfreq/idf chains, each with the
    canonical two-level epsilon fold over that field's term space).
    Returns None for an empty-tokenizing query."""
    from ..functions.rounding import sql_double
    from ..functions.sql_oracle import EPSILON, tokenize_col

    toks = tokenize(query)
    if not toks:
        return None
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
    idf_ctes = []
    for i in range(nf):
        idf_ctes.append(
            f"dfreq{i} AS (SELECT term, count(*) AS df FROM tfp "
            f"WHERE tf_{i} > 0 GROUP BY term), "
            f"idf0_{i} AS (SELECT term, df, "
            "ln((SELECT n_docs FROM stats) - df + 0.5) - ln(df + 0.5) AS idf_raw "
            f"FROM dfreq{i}), "
            f"epsv{i} AS (SELECT {EPSILON} * (sum(s ORDER BY b) / sum(n)) AS eps FROM "
            "(SELECT substr(md5(term), 1, 3) AS b, "
            "sum(idf_raw ORDER BY term) AS s, count(*) AS n "
            f"FROM idf0_{i} GROUP BY 1)), "
            f"idf{i} AS (SELECT term, CASE WHEN idf_raw < 0 THEN "
            f"(SELECT eps FROM epsv{i}) ELSE idf_raw END AS idf FROM idf0_{i})"
        )
    c_cols = []
    for i, (_, _, b) in enumerate(fields_sql):
        bi = (
            f"{sql_double(1.0 - b)} + {sql_double(b)} * lens.len_{i} "
            f"/ (SELECT avg_{i} FROM stats)"
        )
        c_cols.append(
            f"qt.qtf * (coalesce(idf{i}.idf, 0.0) * "
            f"(tfp.tf_{i} * {k1 + 1.0} / (tfp.tf_{i} + {k1} * ({bi})))) AS c_{i}"
        )
    idf_joins = " ".join(
        f"LEFT JOIN idf{i} ON idf{i}.term = tfp.term" for i in range(nf)
    )
    return (
        f"WITH f AS (SELECT doc_id, {tok_cols} FROM {table}), "
        f"lens AS (SELECT doc_id, {len_cols} FROM f), "
        f"stats AS (SELECT count(*) AS n_docs, {avg_cols} FROM lens), "
        f"u AS ({unions}), "
        f"tfp AS (SELECT doc_id, term, {tf_cols} FROM u GROUP BY doc_id, term), "
        + ", ".join(idf_ctes) + ", "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        f"contrib AS (SELECT tfp.doc_id, tfp.term, {', '.join(c_cols)} "
        f"  FROM tfp JOIN qt ON qt.term = tfp.term "
        f"  {idf_joins} "
        "  JOIN lens ON lens.doc_id = tfp.doc_id)"
    )


_FIELD_TAIL_SQL = (
    "mx AS (SELECT max(score) AS m FROM scored), "
    "kept AS (SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
    "  FROM lens d LEFT JOIN scored s USING (doc_id) "
    "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
    "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
    "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
    "doc_id, {score_out} AS score "
    "FROM kept ORDER BY score DESC, doc_id ASC LIMIT {k}"
)


def dismax_topk_sql(
    query: str,
    fields_sql: Sequence[Tuple[str, float, float]],
    k: int = 10,
    tie: float = 0.0,
    k1: float = K1,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``dismax_topk``: the shared per-field contrib
    prefix, per-field ordered contribution sums, then the greatest +
    tie blend written operand-for-operand like the Spark column
    expression."""
    from ..functions.rounding import round6_sql, sql_double

    prefix = _field_contrib_sql(query, fields_sql, k1, table)
    if prefix is None:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    nf = len(fields_sql)
    s_cols = ", ".join(f"sum(c_{i} ORDER BY term) AS s_{i}" for i in range(nf))
    fscores = [
        f"({sql_double(w)} * s_{i})" for i, (_, w, _) in enumerate(fields_sql)
    ]
    dis = fscores[0] if nf == 1 else "greatest(" + ", ".join(fscores) + ")"
    tot = " + ".join(fscores)
    final = f"({dis}) + {sql_double(tie)} * (({tot}) - ({dis}))"
    return (
        f"{prefix}, "
        f"persum AS (SELECT doc_id, {s_cols} FROM contrib GROUP BY doc_id), "
        f"scored AS (SELECT doc_id, {final} AS score FROM persum), "
        + _FIELD_TAIL_SQL.format(score_out=round6_sql("score"), k=int(k))
    )


def cross_fields_topk_sql(
    query: str,
    fields_sql: Sequence[Tuple[str, float, float]],
    k: int = 10,
    k1: float = K1,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``cross_fields_topk``: the shared per-field
    contrib prefix, then ONE term-ordered sum of the per-term
    greatest(w_f * c_f) maxima per document."""
    from ..functions.rounding import round6_sql, sql_double

    prefix = _field_contrib_sql(query, fields_sql, k1, table)
    if prefix is None:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    nf = len(fields_sql)
    weighted = [
        f"({sql_double(w)} * c_{i})" for i, (_, w, _) in enumerate(fields_sql)
    ]
    best = weighted[0] if nf == 1 else "greatest(" + ", ".join(weighted) + ")"
    return (
        f"{prefix}, "
        f"scored AS (SELECT doc_id, sum({best} ORDER BY term) AS score "
        "FROM contrib GROUP BY doc_id), "
        + _FIELD_TAIL_SQL.format(score_out=round6_sql("score"), k=int(k))
    )


# ---------------------------------------------------------------------------
# combined_fields query (ES): term-centric pseudo-field BM25
# ---------------------------------------------------------------------------


def combined_fields_topk(
    docs: DataFrame,
    query: str,
    fields: Sequence[Tuple[str, float]],
    k: int = 10,
    k1: float = K1,
    b: float = 0.75,
) -> DataFrame:
    """(rank, doc_id, score) — the ES ``combined_fields`` query: all
    fields merge into ONE synthetic field BEFORE scoring —

        tf'(t,d) = sum_f w_f * tf_f(t,d)     (fixed field order)
        dl'(d)   = sum_f w_f * len_f(d)
        avgdl'   = (sum_f w_f * S_f) / N     (S_f = exact Σ len_f)
        score    = sum_t qtf * idf(t) * tf'*(k1+1)/(tf' + k1*(1-b+b*dl'/avgdl'))

    — standard Okapi on the pseudo-field with ONE shared b, which is
    exactly how it differs from the house BM25F (per-field B_f
    normalization before combination) and dismax/cross_fields (per-
    field scoring). ES requires w_f >= 1 (enforced). df is document
    level (any field), idf the engine's epsilon-floored chain, and the
    threshold / degenerate-backfill / tie-break contract is the
    shared house spine.

    Scale shape identical to bm25f_topk: one tokenize pass per field
    into a localCheckpoint-ed stacked relation, ONE (doc_id, term)
    shuffle with per-field conditional sums, term-pruned broadcast
    query join, candidates-only joins after. avgdl' derives from
    per-field exact integer sums (2 longs per field to the driver),
    never a float avg fold."""
    spark = docs.sparkSession
    toks = tokenize(query)
    if not toks:
        return spark.createDataFrame([], _EMPTY)
    for _, w in fields:
        if not float(w) >= 1.0:
            raise ValueError(f"combined_fields weights must be >= 1: {w!r}")
    counts = Counter(toks)
    uniq = sorted(counts)
    nf = len(fields)

    from ..functions.udfs import tokenize_udf

    parts = [
        docs.select(
            "doc_id", F.lit(i).alias("fld"), tokenize_udf(F.col(name)).alias("toks")
        )
        for i, (name, _) in enumerate(fields)
    ]
    stacked = reduce(DataFrame.unionByName, parts)
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
    # avgdl' from exact integer per-field sums, fixed field order
    acc = 0.0
    for i, (_, w) in enumerate(fields):
        acc = acc + float(w) * float(by[i]["s"] or 0)
    avgdlc = acc / n_docs if acc else 1.0

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
    tfc = None
    dlc = None
    for i, (_, w) in enumerate(fields):
        ti = F.lit(float(w)) * F.col(f"tf_{i}").cast("double")
        li = F.lit(float(w)) * F.col(f"len_{i}").cast("double")
        tfc = ti if tfc is None else tfc + ti
        dlc = li if dlc is None else dlc + li
    norm = tfc + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dlc / F.lit(avgdlc)
    )
    cand = cand.withColumn(
        "contrib",
        F.col("qtf") * (F.col("idf") * (tfc * F.lit(k1 + 1.0) / norm)),
    )
    scored = cand.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc_, x: acc_ + x["contrib"],
        ).alias("score")
    )
    mxv = scored.agg(F.max("score").alias("m")).first()["m"]
    if mxv is not None and mxv > 0:
        res = scored.where(F.col("score") >= F.lit(0.01 * mxv))
    else:
        zeros = (
            docs.select("doc_id")
            .join(scored.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(0.0).alias("score"))
            .orderBy("doc_id")
            .limit(k)
        )
        res = scored.select("doc_id", "score").unionByName(zeros)
    w_ = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        res.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w_))
        .select("rank", "doc_id", "score")
    )


def combined_fields_topk_sql(
    query: str,
    fields_sql: Sequence[Tuple[str, float]],
    k: int = 10,
    k1: float = K1,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB mirror of combined_fields_topk: ``fields_sql`` =
    [(text_expr, weight), ...] in the SAME order; avgdl' spelled from
    the identical exact integer sums in the identical order."""
    from ..functions.rounding import round6_sql, sql_double
    from ..functions.sql_oracle import EPSILON, tokenize_col

    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    for _, w in fields_sql:
        if not float(w) >= 1.0:
            raise ValueError(f"combined_fields weights must be >= 1: {w!r}")
    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    nf = len(fields_sql)
    tok_cols = ", ".join(
        f"{tokenize_col(expr)} AS t{i}" for i, (expr, _) in enumerate(fields_sql)
    )
    len_cols = ", ".join(f"len(t{i}) AS len_{i}" for i in range(nf))
    sum_cols = ", ".join(
        f"CAST(sum(len_{i}) AS BIGINT) AS s_{i}" for i in range(nf)
    )
    # acc = ((0.0 + w0*S0) + w1*S1) ... — the Python fold order
    acc = "0.0"
    for i, (_, w) in enumerate(fields_sql):
        acc = f"({acc} + {sql_double(float(w))} * CAST(s_{i} AS DOUBLE))"
    avg_expr = (
        f"CASE WHEN {acc} = 0.0 THEN 1.0 "
        f"ELSE {acc} / (SELECT n_docs FROM stats0) END"
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS fld, unnest(t{i}) AS term FROM f" for i in range(nf)
    )
    tf_cols = ", ".join(
        f"CAST(sum(CASE WHEN fld = {i} THEN 1 ELSE 0 END) AS BIGINT) AS tf_{i}"
        for i in range(nf)
    )
    tfc = " + ".join(
        f"{sql_double(float(w))} * CAST(tfp.tf_{i} AS DOUBLE)"
        for i, (_, w) in enumerate(fields_sql)
    )
    dlc = " + ".join(
        f"{sql_double(float(w))} * CAST(lens.len_{i} AS DOUBLE)"
        for i, (_, w) in enumerate(fields_sql)
    )
    norm = (
        f"({tfc}) + {sql_double(k1)} * ({sql_double(1.0 - b)} + "
        f"{sql_double(b)} * ({dlc}) / (SELECT a FROM stats))"
    )
    return (
        f"WITH f AS (SELECT doc_id, {tok_cols} FROM {table}), "
        f"lens AS (SELECT doc_id, {len_cols} FROM f), "
        f"stats0 AS (SELECT count(*) AS n_docs, {sum_cols} FROM lens), "
        f"stats AS (SELECT n_docs, {avg_expr} AS a FROM stats0), "
        f"u AS ({unions}), "
        f"tfp AS (SELECT doc_id, term, {tf_cols} FROM u GROUP BY doc_id, term), "
        "dfreq AS (SELECT term, count(*) AS df FROM tfp GROUP BY term), "
        "idf0 AS (SELECT term, df, ln((SELECT n_docs FROM stats) - df + 0.5) "
        "- ln(df + 0.5) AS idf_raw FROM dfreq), "
        f"epsv AS (SELECT {EPSILON} * (sum(s ORDER BY b) / sum(n)) AS eps FROM "
        "(SELECT substr(md5(term), 1, 3) AS b, "
        "sum(idf_raw ORDER BY term) AS s, count(*) AS n "
        "FROM idf0 GROUP BY 1)), "
        "idf AS (SELECT term, CASE WHEN idf_raw < 0 THEN (SELECT eps FROM epsv) "
        "ELSE idf_raw END AS idf FROM idf0), "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS (SELECT tfp.doc_id, tfp.term, "
        f"  qt.qtf * (idf.idf * (({tfc}) * {sql_double(k1 + 1.0)} / ({norm}))) AS c "
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
