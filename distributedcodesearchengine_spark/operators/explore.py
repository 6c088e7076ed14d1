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

from ..functions.rounding import round6, sql_double
from ..oracle.tokenizer import tokenize
from .scorer import Index, finalize_topk, query_term_weights, score_matched

FACET_KEYS: Tuple[str, str] = ("lang", "source")


def _kept_with_cols(index: Index, query: str, cols: Sequence[str]):
    """The BM25 kept set with the requested docs columns attached ->
    (doc_id, *cols, score), or None for an empty-tokenizing query (F7).

    Shared spine of the aggregation family (facets / histogram / stats):
    mirrors finalize_topk's branch structure — healthy max (> 0) keeps
    only thresholded matched docs (a docvalues join on candidates only),
    degenerate/all-zero keeps every document with unmatched rows at
    score 0 (the reference's result array; corpus-sized by definition,
    so the corpus-wide left join IS the minimal plan there). The scored
    candidate set persists via the scorer's LRU-1 handle discipline so
    the caller's action reads the cache, and the next query evicts it.
    """
    from .scorer import _cache_scored

    spark = index.spark
    if not tokenize(query):
        return None
    meta = index.docs.select("doc_id", *cols)
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    if scored is not None:
        scored = _cache_scored(index, scored)
        mx = scored.agg(F.max("score").alias("mx")).first()["mx"]
    else:
        mx = None
    slim = scored.select("doc_id", "score") if scored is not None else None
    if mx is not None and mx > 0:
        return slim.where(F.col("score") >= F.lit(0.01 * mx)).join(meta, "doc_id")
    right = (
        slim
        if slim is not None
        else spark.createDataFrame([], "doc_id long, score double")
    )
    return meta.join(right, "doc_id", "left").withColumn(
        "score", F.coalesce(F.col("score"), F.lit(0.0))
    )


def bm25_facets(
    index: Index, query: str, keys: Sequence[str] = FACET_KEYS
) -> DataFrame:
    """(*keys, n_docs, max_score) — facet counts over the BM25 kept set
    (see _kept_with_cols for the branch semantics)."""
    kept = _kept_with_cols(index, query, keys)
    if kept is None:
        return index.spark.createDataFrame(
            [],
            ", ".join(f"{c} string" for c in keys)
            + ", n_docs long, max_score double",
        )
    return (
        kept.groupBy(*keys)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            round6(F.max("score")).alias("max_score"),
        )
        .orderBy(*keys)
    )


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


def click_prior(events: DataFrame, event_type: str = "click") -> DataFrame:
    """events -> (doc_id, n_clicks) — the per-document engagement
    prior: count of ``event_type`` events keyed by the event's document
    reference (props.k). One map-side-combinable groupBy; at serving
    scale this is a periodically refreshed doc-keyed artifact, not a
    per-query scan."""
    return (
        events.where(F.col("event_type") == event_type)
        .select(F.get_json_object("props", "$.k").cast("long").alias("doc_id"))
        .where(F.col("doc_id").isNotNull())
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_clicks"))
    )


def bm25_clickboost_topk(
    index: Index,
    query: str,
    events: DataFrame,
    k: int = 10,
    weight: float = 0.2,
    event_type: str = "click",
) -> DataFrame:
    """(rank, doc_id, score, n_clicks) — BM25 reranked by the
    engagement prior: final = bm25 * (1 + weight * ln(1 + n_clicks)).

    The boost applies AFTER the relative threshold (the kept set is the
    reference's result array — popularity rescores what matched, it
    never admits non-matching docs), mirroring the J3 boost stage's
    position in the hybrid pipeline. ln is the engine-portable lane.
    The prior joins onto the THRESHOLDED candidates only (bounded),
    never corpus-wide; in the degenerate all-zero regime every final
    score is 0 * boost = 0, so ranking stays doc_id order and the
    operator returns the same rows plain BM25 would.
    """
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, score double, n_clicks long"
        )
    prior = click_prior(events, event_type)
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    if scored is not None:
        # LRU-1 persist parked on the index handle (the _cache_scored
        # discipline): the max action below AND the caller's collect of
        # the returned lazy top-k both read the scored subtree — the old
        # form unpersisted before return, so the caller's action
        # recomputed the whole scoring join uncached
        from .scorer import _cache_scored

        scored = _cache_scored(index, scored)
        mx = scored.agg(F.max("score").alias("mx")).first()["mx"]
    else:
        mx = None
    if mx is not None and mx > 0:
        kept = scored.select("doc_id", "score").where(
            F.col("score") >= F.lit(0.01 * mx)
        )
    else:
        right = (
            scored.select("doc_id", "score")
            if scored is not None
            else spark.createDataFrame([], "doc_id long, score double")
        )
        kept = (
            index.docs.select("doc_id")
            .join(right, "doc_id", "left")
            .withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
        )
    boosted = (
        kept.join(prior, "doc_id", "left")
        .withColumn("n_clicks", F.coalesce(F.col("n_clicks"), F.lit(0).cast("long")))
        .withColumn(
            "final",
            F.col("score")
            * (F.lit(1.0) + F.lit(float(weight)) * F.log(F.lit(1.0) + F.col("n_clicks"))),
        )
    )
    top = boosted.orderBy(F.desc("final"), F.asc("doc_id")).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("final"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", round6("final").alias("score"), "n_clicks"
    )


def bm25_clickboost_sql(
    query: str, k: int = 10, weight: float = 0.2, event_type: str = "click"
) -> str:
    """Oracle mirror of bm25_clickboost_topk over the shared CTE chain."""
    from collections import Counter

    from ..functions.sql_oracle import K1, B, _docs_cte, round6_sql

    toks = tokenize(query)
    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))), "
        "prior AS (SELECT CAST(props->>'k' AS BIGINT) AS doc_id, "
        "  CAST(count(*) AS BIGINT) AS n_clicks FROM events "
        f"  WHERE event_type = '{event_type}' AND (props->>'k') IS NOT NULL "
        "  GROUP BY 1), "
        "boosted AS (SELECT kept.doc_id, "
        "  kept.score * (1.0 + "
        f"{sql_double(weight)} * ln(1.0 + coalesce(prior.n_clicks, 0))) AS final, "
        "  coalesce(prior.n_clicks, CAST(0 AS BIGINT)) AS n_clicks "
        "  FROM kept LEFT JOIN prior USING (doc_id)) "
        "SELECT CAST(row_number() OVER (ORDER BY final DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('final')} AS score, n_clicks "
        f"FROM boosted ORDER BY final DESC, doc_id ASC LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# field-collapse diversification


def bm25_collapse_topk(
    index, query: str, collapse: str = "source", per_group: int = 1, k: int = 10,
    filters=None,
):
    """Diversified top-k (the Elasticsearch ``collapse`` analog): at
    most ``per_group`` results per value of the ``collapse`` field —
    the anti-domination control a web SERP runs so one domain can't
    fill the page. Semantics: rank the kept set exactly as bm25_topk
    would, keep each group's best ``per_group`` rows (per-group rank by
    score desc, doc_id asc), then the global top-k of the survivors
    with ranks renumbered.

    Plan: the per-group rank is a window PARTITIONED BY the collapse
    key over the thresholded candidate set — parallel across groups,
    bounded by candidates, never a corpus-wide single-partition sort;
    the global top-k is the usual TakeOrderedAndProject.
    """
    from pyspark.sql.window import Window

    from ..oracle.tokenizer import tokenize
    from .scorer import query_term_weights, score_matched

    spark = index.spark
    out_schema = f"rank int, doc_id long, {collapse} string, score double"
    if not tokenize(query):
        return spark.createDataFrame([], out_schema)
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    if scored is not None:
        mx = scored.agg(F.max("score").alias("m")).first()["m"]
    else:
        mx = None
    if mx is not None and mx > 0:
        kept = scored.where(F.col("score") >= F.lit(0.01 * mx))
    else:
        need0 = [c for c in dict.fromkeys([collapse, *(filters or {})])]
        zeros = index.docs
        if scored is not None:
            zeros = zeros.join(scored.select("doc_id"), "doc_id", "left_anti")
        # the zero rows take their metadata straight from the docs
        # projection — joining the corpus-sized zero set back onto docs
        # for columns docs already has would be a corpus-scale self-join
        zeros = zeros.select("doc_id", *need0, F.lit(0.0).alias("score"))
        if scored is not None:
            # only the (slim, candidate-sized) scored side joins for
            # metadata it lacks
            s = scored
            miss = [c for c in need0 if c not in s.columns]
            if miss:
                s = s.join(index.docs.select("doc_id", *miss), "doc_id")
            kept = s.select("doc_id", *need0, "score").unionByName(zeros)
        else:
            kept = zeros
    # metadata columns join from docs on the thresholded candidates only
    # (docvalues lookup); equality filters apply at the F5 stage — after
    # the unfiltered-max threshold, before the per-group window — the
    # same ordering finalize_topk uses
    from .scorer import _apply_filters

    need = [c for c in dict.fromkeys([collapse, *(filters or {})])
            if c not in kept.columns]
    if need:
        kept = kept.join(index.docs.select("doc_id", *need), "doc_id")
    kept = _apply_filters(kept, filters)
    wg = Window.partitionBy(collapse).orderBy(F.desc("score"), F.asc("doc_id"))
    surv = (
        kept.withColumn("_g", F.row_number().over(wg))
        .where(F.col("_g") <= int(per_group))
    )
    wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        surv.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(wr))
        .select("rank", "doc_id", collapse, "score")
    )


def bm25_collapse_sql(
    query: str, collapse: str = "source", per_group: int = 1, k: int = 10,
    filters=None,
) -> str:
    """DuckDB mirror of ``bm25_collapse_topk`` (kept chain + per-group
    window + global top-k)."""
    from collections import Counter

    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import _docs_cte
    from ..oracle.tokenizer import tokenize

    K1, B = 1.5, 0.75
    toks = tokenize(query)
    if not toks:
        return (
            f"SELECT 1 AS rank, 1::BIGINT AS doc_id, '' AS {collapse}, "
            "0.0 AS score WHERE false"
        )
    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        f"  SELECT d.doc_id, d.{collapse}, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))"
        + "".join(
            f" AND d.{c} = '{v}'" for c, v in sorted((filters or {}).items())
        )
        + "), "
        "surv AS (SELECT * FROM (SELECT kept.*, row_number() OVER "
        f"(PARTITION BY {collapse} ORDER BY score DESC, doc_id ASC) AS _g FROM kept) "
        f"WHERE _g <= {int(per_group)}) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {collapse}, {round6_sql('score')} AS score "
        f"FROM surv ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )


def bm25_histogram(
    index: Index, query: str, col: str = "doc_len", interval: int = 50
) -> DataFrame:
    """(bucket, n_docs, max_score) — the ES ``histogram`` aggregation
    over the BM25 kept set: numeric bucketing of ``col`` (a docs
    column) at fixed ``interval`` width, bucket = (col DIV interval) *
    interval (integer arithmetic — engine-parity-trivial). Branch
    semantics are _kept_with_cols's (the facets spine)."""
    kept = _kept_with_cols(index, query, [col])
    if kept is None:
        return index.spark.createDataFrame(
            [], "bucket long, n_docs long, max_score double"
        )
    bucket = F.expr(f"CAST(({col} DIV {int(interval)}) * {int(interval)} AS BIGINT)")
    return (
        kept.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            round6(F.max("score")).alias("max_score"),
        )
        .orderBy("bucket")
    )


def bm25_stats_agg(
    index: Index, query: str, col: str = "doc_len"
) -> DataFrame:
    """(n_docs, min_v, max_v, sum_v, avg_v) — the ES ``stats``
    aggregation of a numeric docs column over the BM25 kept set (one
    row). min/max/sum are exact integers; avg = sum * 1.0 / n computed
    with the identical operand sequence on both engines. An empty kept
    set (possible only via the empty-query guard — the degenerate
    branch keeps the whole corpus) yields zero rows."""
    kept = _kept_with_cols(index, query, [col])
    if kept is None:
        return index.spark.createDataFrame(
            [],
            "n_docs long, min_v long, max_v long, sum_v long, avg_v double",
        )
    return kept.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min(col).cast("long").alias("min_v"),
        F.max(col).cast("long").alias("max_v"),
        F.sum(col).cast("long").alias("sum_v"),
        round6(
            F.sum(col).cast("double") * F.lit(1.0) / F.count("*")
        ).alias("avg_v"),
    )


def bm25_histogram_sql(
    query: str, col: str = "doc_len", interval: int = 50
) -> str:
    """DuckDB mirror of bm25_histogram: the shared kept chain
    (sql_oracle.kept_cte_sql) bucketed by (col // interval) * interval.
    ``col`` must be a doclen-relation column (doc_len) or a documents
    column reachable through it."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    chain = kept_cte_sql(query, [col])
    if chain is None:
        return (
            "SELECT 1::BIGINT AS bucket, 1::BIGINT AS n_docs, "
            "0.0 AS max_score WHERE false"
        )
    return (
        f"{chain} "
        f"SELECT CAST(({col} // {int(interval)}) * {int(interval)} AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        f"{round6_sql('max(score)')} AS max_score "
        "FROM kept GROUP BY 1 ORDER BY bucket"
    )

def bm25_stats_agg_sql(query: str, col: str = "doc_len") -> str:
    """DuckDB mirror of bm25_stats_agg: the shared kept chain reduced
    to one stats row; avg written as sum * 1.0 / count(*) — the same
    operand sequence as the Spark column expression."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    chain = kept_cte_sql(query, [col])
    if chain is None:
        return (
            "SELECT 1::BIGINT AS n_docs, 1::BIGINT AS min_v, 1::BIGINT AS max_v, "
            "1::BIGINT AS sum_v, 0.0 AS avg_v WHERE false"
        )
    return (
        f"{chain} "
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(min({col}) AS BIGINT) AS min_v, CAST(max({col}) AS BIGINT) AS max_v, "
        f"CAST(sum({col}) AS BIGINT) AS sum_v, "
        f"{round6_sql(f'sum({col}) * 1.0 / count(*)')} AS avg_v "
        "FROM kept"
    )

def bm25_sort_topk(
    index, query: str, sort: str = "doc_len", asc: bool = False, k: int = 10
) -> DataFrame:
    """(rank, doc_id, sort_value, score) — the ES ``sort`` option: the
    query defines the MATCH SET (the standard threshold/degenerate
    kept-set semantics, unchanged), but the top-k is cut by a document
    FIELD instead of the score ((sort asc|desc, doc_id asc) total
    order; the BM25 score still rides along, like ES returning _score
    with track_scores). Plan: the shared kept-set spine + one
    TakeOrderedAndProject — no global sort."""
    from pyspark.sql.window import Window

    spark = index.spark
    out_schema = f"rank int, doc_id long, {sort} long, score double"
    kept = _kept_with_cols(index, query, [sort])
    if kept is None:
        return spark.createDataFrame([], out_schema)
    order = [
        F.asc(sort) if asc else F.desc(sort),
        F.asc("doc_id"),
    ]
    top = kept.orderBy(*order).limit(int(k))
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "doc_id",
        F.col(sort).cast("long").alias(sort),
        round6("score").alias("score"),
    )


def bm25_sort_sql(
    query: str, sort: str = "doc_len", asc: bool = False, k: int = 10
) -> str:
    """DuckDB mirror of bm25_sort_topk on the shared kept chain."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    chain = kept_cte_sql(query, [sort])
    if chain is None:
        return (
            f"SELECT 1 AS rank, 1::BIGINT AS doc_id, 1::BIGINT AS {sort}, "
            "0.0 AS score WHERE false"
        )
    d = "ASC" if asc else "DESC"
    return (
        f"{chain} "
        f"SELECT CAST(row_number() OVER (ORDER BY {sort} {d}, doc_id ASC) AS INT) "
        f"AS rank, doc_id, CAST({sort} AS BIGINT) AS {sort}, "
        f"{round6_sql('score')} AS score "
        f"FROM kept ORDER BY {sort} {d}, doc_id ASC LIMIT {int(k)}"
    )


def more_like_this_unlike(
    index: Index, seed_doc_id: int, unlike_doc_id: int, m: int = 5,
    k: int = 10,
) -> DataFrame:
    """(rank, doc_id, url, score) — the ES more_like_this ``unlike``
    parameter: the seed's top-m tf-idf terms MINUS every term the
    negative-example document contains ("like this, but not like
    that" — steering MLT away from the shared boilerplate axis). The
    unlike doc's term set is a second pushed point filter (|doc|
    terms collected, no corpus pass); both seed and unlike doc are
    excluded from the result in both branches. With a disjoint unlike
    doc the ranking reduces to plain more_like_this (tested)."""
    seed, neg = int(seed_doc_id), int(unlike_doc_id)
    if seed == neg:
        raise ValueError("seed and unlike must differ")
    kw = seed_keywords(index, seed, m)
    if not kw:
        return index.spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    neg_terms = {
        r["term"]
        for r in index.tf.where(F.col("doc_id") == neg)
        .select("term")
        .collect()
    }
    kw = [(t, i) for t, i in kw if t not in neg_terms]
    if not kw:
        # every seed keyword is shared with the negative example —
        # nothing distinctive remains (ES: no query terms -> no hits)
        return index.spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = [(t, 1.0, idf) for t, idf in sorted(kw)]
    scored = score_matched(index, qweights).where(
        ~F.col("doc_id").isin([seed, neg])
    )
    idx2 = replace(
        index, docs=index.docs.where(~F.col("doc_id").isin([seed, neg]))
    )
    return finalize_topk(idx2, scored, k)


def more_like_this_unlike_sql(
    seed_doc_id: int, unlike_doc_id: int, m: int = 5, k: int = 10
) -> str:
    """DuckDB mirror of more_like_this_unlike: the more_like_this
    chain with the unlike doc's term set anti-joined out of the
    keyword cut (keyword ranking FIRST, subtraction after — matching
    the engine's collect-then-filter order), both ids excluded."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import B, K1 as K1_, _docs_cte

    seed, neg = int(seed_doc_id), int(unlike_doc_id)
    if seed == neg:
        raise ValueError("seed and unlike must differ")

    return (
        f"WITH {_docs_cte()}, "
        "kw0 AS (SELECT tf.term, "
        "  CAST(tf.tf AS DOUBLE) * ln(CAST((SELECT n_docs FROM stats) AS DOUBLE) / dfreq.df) AS tfidf "
        f"  FROM tf JOIN dfreq USING (term) WHERE tf.doc_id = {seed} "
        f"  ORDER BY tfidf DESC, term ASC LIMIT {int(m)}), "
        f"negt AS (SELECT term FROM tf WHERE doc_id = {neg}), "
        "kw AS (SELECT term FROM kw0 WHERE term NOT IN (SELECT term FROM negt)), "
        "qt AS (SELECT term, 1.0 AS qtf FROM kw), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1_ + 1.0} / "
        f"      (tf.tf + {K1_} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        f"  JOIN doclen dl ON dl.doc_id = tf.doc_id "
        f"  WHERE tf.doc_id NOT IN ({seed}, {neg})), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        f"  WHERE d.doc_id NOT IN ({seed}, {neg}) "
        "    AND (SELECT count(*) FROM kw) > 0 "
        "    AND ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )
