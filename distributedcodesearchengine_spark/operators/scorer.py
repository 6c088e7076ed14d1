"""Exact BM25 scorer v1 — pure DataFrame plan (SURVEY §2.5 A3, §2.4 J5,
§2.3 F4/F5, §2.6 T1).

Query plan shape (the reference's stages c-f re-expressed lazily):

    broadcast(query terms with idf)  INNER JOIN  tf on term
      [inner is correct: missing query terms contribute 0 — J5]
    -> per-(term,doc) contribution  qtf * idf * tf*(k1+1)/(tf + k1*(...))
    -> groupBy(doc_id): sum contributions in canonical (term-sorted)
       order via aggregate(array_sort(collect_list(...))) so tied docs
       get bit-identical scores (SURVEY §7.3.1)
    -> relative threshold score >= 0.01*max  (max over the UNFILTERED
       scored set — reference applies the threshold before metadata
       filters, bm25_index.py:149-164)
    -> metadata equality filters (lang / site)
    -> orderBy(score desc, doc_id asc).limit(k)  => TakeOrderedAndProject
       (asc doc_id = the reference's stable-sort corpus-order tie-break)

Degenerate branches replicated from the reference:
- empty query tokens -> empty result (bm25_index.py:140-141)
- no term matches at all -> all scores are 0, max=0 -> threshold -inf ->
  ALL docs survive with score 0 (then filters, doc_id order, limit)
- max score <= 0 (possible via the epsilon floor going negative on tiny
  corpora) -> unmatched zero-score docs OUTRANK matched negative docs;
  we union them in.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle.tokenizer import tokenize
from .stats import B, K1


@dataclass
class Index:
    """Handle to a built index (DataFrames + global stats)."""

    spark: SparkSession
    docs: DataFrame  # (doc_id, url, site, lang, tokens, doc_len)
    tf: DataFrame  # (term, doc_id, tf, doc_len) — slim; meta joins from docs
    terms: DataFrame  # (term, df, idf)
    n_docs: int
    avgdl: float
    postings: Optional[DataFrame] = None  # compressed segments (M3+)
    n_buckets: int = 64  # postings term_bucket count (index property)
    path: Optional[str] = None
    extras: dict = field(default_factory=dict)


def query_term_weights(index: Index, query: str) -> List[tuple]:
    """[(term, qtf, idf)] for the query's tokens (with multiplicity).

    Collects idf for the |q| query terms only — a term-pruned lookup
    against the terms table (parquet predicate pushdown on term), never a
    full-vocab scan. Unknown terms get idf 0 and can be dropped (they
    contribute 0 to every doc — J5 inner-join semantics).
    """
    toks = tokenize(query)
    if not toks:
        return []
    counts = Counter(toks)
    uniq = sorted(counts)
    idf_rows = (
        index.terms.where(F.col("term").isin(uniq)).select("term", "idf").collect()
    )
    idf = {r["term"]: float(r["idf"]) for r in idf_rows}
    return [(t, counts[t], idf[t]) for t in uniq if t in idf]


def contribution_col(k1: float = K1, b: float = B) -> F.Column:
    """w(t,d) * qtf — expects columns tf, doc_len, idf, qtf, _avgdl."""
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("doc_len").cast("double") / F.col("_avgdl")
    )
    return F.col("qtf") * (F.col("idf") * (tf * F.lit(k1 + 1.0) / norm))


def meta_columns(df: DataFrame) -> List[str]:
    """Filterable metadata columns denormalized into an index DataFrame."""
    skip = {"term", "doc_id", "tf", "doc_len", "tokens", "url", "score"}
    return [c for c in df.columns if c not in skip]


def score_matched(
    index: Index, qweights: List[tuple], contrib_col: Optional[F.Column] = None
) -> DataFrame:
    """-> (doc_id, *meta, score) for docs matching >= 1 query term.
    ``contrib_col`` swaps the per-(doc, term) contribution expression
    (default: the house BM25Okapi ``contribution_col()``) — the seam
    the BM25+ variant scorer rides; the canonical term-sorted fold and
    every downstream threshold/degenerate stage are shared."""
    spark = index.spark
    qdf = spark.createDataFrame(
        [(t, float(q), i) for t, q, i in qweights], "term string, qtf double, idf double"
    )
    uniq_terms = [t for t, _, _ in qweights]
    matched = (
        index.tf.where(F.col("term").isin(uniq_terms))  # pushed to the scan
        .join(F.broadcast(qdf), "term")
        .withColumn("_avgdl", F.lit(index.avgdl))
        .withColumn(
            "contrib",
            contrib_col if contrib_col is not None else contribution_col(),
        )
    )
    # canonical term-sorted summation per doc -> deterministic doubles
    return (
        matched.groupBy("doc_id", *meta_columns(index.tf))
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
    )


def _check_filter_cols(
    index: Index,
    filters: Optional[Dict[str, str]],
    scored: Optional[DataFrame] = None,
) -> None:
    """Fail fast (ValueError) on filter columns the index doesn't have:
    the docvalues joins in finalize_topk / bm25_count / bm25_topk_after
    would otherwise throw Spark's UNRESOLVED_COLUMN AnalysisException
    deep inside plan building — see _apply_filters for the contract."""
    unknown = [
        c
        for c in (filters or {})
        if c not in index.docs.columns
        and (scored is None or c not in scored.columns)
    ]
    if unknown:
        raise ValueError(
            f"unknown filter column(s) {unknown}; this index has "
            f"{sorted(c for c in index.docs.columns if c != 'tokens')}"
        )


def _apply_filters(df: DataFrame, filters: Optional[Dict[str, str]]) -> DataFrame:
    # Unknown filter COLUMN -> ValueError at plan-build time (the
    # serving layer's F8 contract turns it into HTTP 400 / CLI exit 2).
    # Distinct from an unknown filter VALUE, which keeps the silent
    # no-match drop semantics — the column set is an index-schema fact
    # the caller got wrong, not a data miss. Without this, an index
    # built without an optional metadata column (e.g. `source`) leaked
    # Spark's UNRESOLVED_COLUMN analysis error through every filtered
    # route (found by the tests/test_server_sweep.py degenerate sweep).
    unknown = [k for k in (filters or {}) if k not in df.columns]
    if unknown:
        raise ValueError(
            f"unknown filter column(s) {unknown}; this index has "
            f"{sorted(c for c in df.columns if c not in ('tokens', 'score'))}"
        )
    for key, want in (filters or {}).items():
        df = df.where(F.col(key) == want)
    return df


def _cache_scored(index: Index, scored: DataFrame) -> DataFrame:
    """Persist the scored candidate set for the duration of one query.

    ``finalize_topk`` uses the scored subtree TWICE — once for the
    unfiltered-max threshold action, once in the returned top-k plan —
    so without a persist the term-pruned scan + broadcast join + agg
    runs twice per query (at any scale; the candidate set is bounded by
    docs matching >= 1 query term, MEMORY_AND_DISK spills if that is
    large). LRU-1 on the index handle: each query evicts the previous
    query's cache, so a long-lived serving session holds at most one."""
    old = index.extras.pop("_scored_cache", None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 - already gone / dead session
            pass
    scored = scored.persist()
    index.extras["_scored_cache"] = scored
    return scored


def finalize_topk(
    index: Index,
    scored: Optional[DataFrame],
    k: int,
    filters: Optional[Dict[str, str]] = None,
    doc_filter: Optional[DataFrame] = None,
    candidate_semi: Optional[DataFrame] = None,
    candidate_anti: Optional[DataFrame] = None,
) -> DataFrame:
    """Shared post-scoring stage: relative threshold (on the UNfiltered
    max), degenerate all-zero handling, metadata filters, stable top-k,
    rank. ``scored`` is (doc_id, score [, meta...]) or None when the
    query had tokens but none are in the vocabulary. Filter columns not
    present on the scored rows are joined from the docs table (a
    docvalues lookup on candidates only — the tf/postings relations stay
    slim).

    ``doc_filter`` (a doc_id DataFrame) is a set-valued metadata filter
    applied at the SAME stage as the equality filters (F5,
    post-threshold) via left_semi join — the phrase predicate of a
    quoted query uses this.

    ``candidate_semi`` / ``candidate_anti`` (doc_id DataFrames) are
    PRE-threshold constraints: they restrict the match set itself (both
    the scored rows feeding the unfiltered max AND the degenerate
    zero-backfill universe) — the boolean ``+``/``-`` occur flags of
    operators/boolquery use these. Distinct stage from ``doc_filter``
    by design: a boolean query is a different query whose max is taken
    over its own match set; a phrase/metadata filter is a post-threshold
    view of the unfiltered ranking (the reference's F4-before-F5
    ordering)."""
    needed = list(filters or {})
    _check_filter_cols(index, filters, scored)

    def _constrain(df: DataFrame) -> DataFrame:
        if candidate_semi is not None:
            df = df.join(candidate_semi.select("doc_id"), "doc_id", "left_semi")
        if candidate_anti is not None:
            df = df.join(candidate_anti.select("doc_id"), "doc_id", "left_anti")
        return df

    def _apply_all(df: DataFrame) -> DataFrame:
        df = _apply_filters(df, filters)
        if doc_filter is not None:
            df = df.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
        return df
    if scored is not None:
        scored = _constrain(scored)
        missing = [c for c in needed if c not in scored.columns]
        if missing:
            scored = scored.join(
                index.docs.select("doc_id", *missing), "doc_id"
            )
        scored = _cache_scored(index, scored)
        mx = scored.agg(F.max("score").alias("mx")).first()["mx"]
    else:
        mx = None

    if mx is not None and mx > 0:
        res = _apply_all(scored.where(F.col("score") >= F.lit(0.01 * mx)))
    else:
        # all-zero or all-non-positive: zero-score (unmatched) docs are in
        # the reference's result array too. They all tie at 0.0 and rank
        # among ties is doc_id order, so the global top-k needs at most
        # the k smallest-doc_id zero rows AFTER filters — a narrow
        # TakeOrderedAndProject, never a corpus-wide full-width sort
        # (at 10^12 docs an unknown-token query must not sort the corpus)
        zeros = _constrain(index.docs)
        if scored is not None:
            zeros = zeros.join(scored.select("doc_id"), "doc_id", "left_anti")
        zeros = _apply_all(
            zeros.select("doc_id", *needed, F.lit(0.0).alias("score"))
        ).orderBy("doc_id").limit(k)
        if scored is not None:
            res = _apply_all(
                scored.select("doc_id", *needed, "score")
            ).unionByName(zeros)
        else:
            res = zeros
    top_small = res.select("doc_id", "score").orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(k)
    # broadcast the k winners against the big docs table (never the
    # reverse — docs is the 10^12-row side)
    top = index.docs.select("doc_id", "url").join(
        F.broadcast(top_small), "doc_id", "inner"
    )
    # rank over <= k collected-size rows; window is fine at this size
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "url", "score"
    )


def bm25_topk_after(
    index: Index,
    query: str,
    k: int = 10,
    after: Optional[tuple] = None,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Keyset ("search_after") pagination — the Elasticsearch
    search_after analog: the next ``k`` rows of the SAME total ranking
    strictly after the cursor ``after = (score, doc_id)`` (the last row
    of the previous page, RAW unrounded score), without the
    offset-paging cost of re-fetching ``offset + k`` rows.

    (score, doc_id) is the ranking's total order (score desc, doc_id
    asc — T1), so "after the cursor" is exactly
    ``score < s OR (score = s AND doc_id > d)`` — an exact cut even
    through score ties at the page boundary. The plan's top-k stays
    ``limit k`` REGARDLESS of page depth (offset paging's
    TakeOrdered(k + offset) grows with depth — at page 1000 of a
    10^12-doc corpus that difference is the serving cost). Threshold /
    degenerate / filter semantics match bm25_topk row-for-row: page
    continuation is a pure window of the same ranking (the gate oracle
    pins page 2 against the rank-window formulation). ``after=None``
    degrades to the plain first page. Returned ``rank`` is the
    PAGE-RELATIVE position (1..k) — absolute ranks are what keyset
    paging gives up, exactly like Elasticsearch.
    """
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    _check_filter_cols(index, filters, scored)

    def _after(df: DataFrame) -> DataFrame:
        if after is None:
            return df
        s, d = float(after[0]), int(after[1])
        return df.where(
            (F.col("score") < F.lit(s))
            | ((F.col("score") == F.lit(s)) & (F.col("doc_id") > F.lit(d)))
        )

    needed = list(filters or {})
    if scored is not None:
        missing = [c for c in needed if c not in scored.columns]
        if missing:
            scored = scored.join(index.docs.select("doc_id", *missing), "doc_id")
        scored = _cache_scored(index, scored)
        mx = scored.agg(F.max("score").alias("mx")).first()["mx"]
    else:
        mx = None
    if mx is not None and mx > 0:
        res = _after(
            _apply_filters(scored.where(F.col("score") >= F.lit(0.01 * mx)), filters)
        )
    else:
        # degenerate regime: the keyset predicate applies BEFORE the
        # narrow zero cut, so the k smallest-doc_id zeros AFTER the
        # cursor survive — still a TakeOrdered limit k, never a
        # corpus-wide sort
        zeros = index.docs
        if scored is not None:
            zeros = zeros.join(scored.select("doc_id"), "doc_id", "left_anti")
        zeros = _after(
            _apply_filters(
                zeros.select("doc_id", *needed, F.lit(0.0).alias("score")), filters
            )
        ).orderBy("doc_id").limit(k)
        if scored is not None:
            res = _after(
                _apply_filters(scored.select("doc_id", *needed, "score"), filters)
            ).unionByName(zeros.select("doc_id", *needed, "score"))
        else:
            res = zeros
    top_small = res.select("doc_id", "score").orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(k)
    top = index.docs.select("doc_id", "url").join(
        F.broadcast(top_small), "doc_id", "inner"
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "url", "score"
    )


def attach_urls_ranked(index: Index, ranked: List[tuple]) -> DataFrame:
    """``ranked``: the k winners as (doc_id, score), already
    thresholded/ordered driver-side -> (rank, doc_id, url, score).

    The url docvalues lookup is a pushed ``doc_id IN (...)`` pruned
    scan over the docs table — a k-row point lookup against the sort
    key, never a broadcast join that streams the corpus-sized docs
    relation through the executor (at the 10^12-doc design point a
    per-query full docs pass is the scale flaw this replaces)."""
    ids = [int(d) for d, _ in ranked]
    urls = {
        r["doc_id"]: r["url"]
        for r in index.docs.where(F.col("doc_id").isin(ids))
        .select("doc_id", "url")
        .collect()
    }
    data = [
        (i, int(d), urls.get(int(d)), float(s))
        for i, (d, s) in enumerate(ranked, start=1)
    ]
    return index.spark.createDataFrame(
        data, "rank int, doc_id long, url string, score double"
    )


def bm25_topk_batch(
    index: Index,
    queries: Dict[int, str],
    k: int = 10,
    contrib_col: Optional[F.Column] = None,
) -> DataFrame:
    """Score a whole query SET in one DataFrame plan ->
    (query_id, rank, doc_id, score).

    The throughput path: one broadcast join of all query terms against
    the tf index, one aggregation keyed by (query_id, doc_id), per-query
    threshold and top-k via windows PARTITIONED BY query_id (parallel
    across queries — no single-partition window). Matches the per-query
    scorer rank-for-rank on the normal path; degenerate all-zero /
    unknown-token queries are the per-query scorer's job (they need the
    full-corpus zero backfill) and are skipped here.
    """
    from collections import Counter

    from pyspark.sql.window import Window

    spark = index.spark
    rows = []
    for qid, q in queries.items():
        for t, qtf in sorted(Counter(tokenize(q)).items()):
            rows.append((int(qid), t, float(qtf)))
    qdf = spark.createDataFrame(rows, "query_id int, term string, qtf double")
    uniq_terms = sorted({t for _, t, _ in rows})
    # term-pruned idf lookup joined to the tiny query side (never
    # broadcast the full vocab)
    qterms = (
        index.terms.select("term", "idf")
        .where(F.col("term").isin(uniq_terms))
        .join(F.broadcast(qdf), "term")
    )
    matched = (
        index.tf.where(F.col("term").isin(uniq_terms))
        .join(F.broadcast(qterms), "term")
        .withColumn("_avgdl", F.lit(index.avgdl))
        .withColumn(
            "contrib",
            contrib_col if contrib_col is not None else contribution_col(),
        )
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    wmax = Window.partitionBy("query_id")
    wrank = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("_mx", F.max("score").over(wmax))
        .where((F.col("_mx") <= 0) | (F.col("score") >= 0.01 * F.col("_mx")))
        .withColumn("rank", F.row_number().over(wrank))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_topk_range(
    index: Index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
    ranges: Optional[Dict[str, tuple]] = None,
) -> DataFrame:
    """BM25 top-k with numeric RANGE filters (the date/length-range
    facet every search surface carries beside the equality filters):
    ``ranges`` maps a docs column to an inclusive (lo, hi) bound —
    either side None for open-ended. Ranges apply at the same F5
    post-threshold stage as the equality filters, via the set-valued
    ``doc_filter`` mechanism the phrase predicate uses (a left_semi
    join of the bounded doc set onto the thresholded candidates — the
    doc-side predicate pushes to the docs scan, candidates stay the
    small side)."""
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    doc_filter = None
    if ranges:
        d = index.docs
        for col, (lo, hi) in sorted(ranges.items()):
            if lo is not None:
                d = d.where(F.col(col) >= lo)
            if hi is not None:
                d = d.where(F.col(col) <= hi)
        doc_filter = d.select("doc_id")
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, doc_filter=doc_filter)


def bm25_count(
    index: Index, query: str, filters: Optional[Dict[str, str]] = None
) -> DataFrame:
    """Total-hits count — 1 row (n_hits, max_score): the size of the
    threshold-kept set AFTER metadata filters plus its max score (the
    'About N results' line; the reference returns only top-k, so this
    is the missing aggregate view of the same kept set). Semantics
    mirror finalize_topk exactly: relative threshold on the unfiltered
    max, degenerate all-zero regime counts the whole filtered universe
    (every doc 'matches' at score 0, reference array semantics)."""
    from ..functions.rounding import round6_py

    spark = index.spark
    out_schema = "n_hits long, max_score double"
    if not tokenize(query):
        return spark.createDataFrame([(0, 0.0)], out_schema)
    qweights = query_term_weights(index, query)
    needed = list(filters or {})
    _check_filter_cols(index, filters)
    if not qweights:
        n = _apply_filters(index.docs, filters).count()
        return spark.createDataFrame([(int(n), 0.0)], out_schema)
    scored = score_matched(index, qweights)
    missing = [c for c in needed if c not in scored.columns]
    if missing:
        scored = scored.join(index.docs.select("doc_id", *missing), "doc_id")
    scored = _cache_scored(index, scored)
    mx = scored.agg(F.max("score").alias("m")).first()["m"]
    if mx is not None and mx > 0:
        row = (
            _apply_filters(scored.where(F.col("score") >= F.lit(0.01 * mx)), filters)
            .agg(F.count("*").alias("n"), F.max("score").alias("m"))
            .first()
        )
        # filters can eliminate every kept row -> max over zero rows is
        # NULL; mirror the oracle's coalesce(max(score), 0.0)
        m = row["m"] if row["m"] is not None else 0.0
        return spark.createDataFrame(
            [(int(row["n"]), float(round6_py(m)))], out_schema
        )
    # all-zero / non-positive: filtered universe, zero rows cap the max
    row = _apply_filters(scored, filters).agg(
        F.count("*").alias("n"), F.max("score").alias("m")
    ).first()
    zeros_n = (
        _apply_filters(index.docs, filters)
        .join(scored.select("doc_id"), "doc_id", "left_anti")
        .count()
    )
    n = int(row["n"]) + int(zeros_n)
    m = float(row["m"]) if row["m"] is not None else 0.0
    if zeros_n > 0:
        m = max(m, 0.0)
    return spark.createDataFrame([(n, float(round6_py(m)))], out_schema)


_EXPLAIN_SCHEMA = (
    "rank int, doc_id long, term string, qtf double, tf long, doc_len long, "
    "idf double, contrib double, score double"
)


def explain_topk(
    index: Index,
    query: str,
    k: int = 10,
    contrib_col: Optional[F.Column] = None,
) -> DataFrame:
    """Per-term score breakdown for the query's top-k docs — the Lucene
    ``Explanation`` / Elasticsearch ``explain=true`` surface: one row
    per (ranked doc, matched query term) with every factor of the BM25
    product (qtf, tf, doc_len, idf, contribution) plus the doc's rank
    and total score, ordered (rank, term). Zero-score backfill docs of
    a degenerate query have no matched terms and therefore no rows
    (nothing to explain) — mirrored by the oracle's inner join.

    Plan: the ranked top-k (a k-row relation) broadcasts against the
    term-pruned matched-contribution rows — the scorer's own join
    shape, never a corpus scan beyond the pushed term filter."""
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame([], _EXPLAIN_SCHEMA)
    qweights = query_term_weights(index, query)
    if not qweights:
        return spark.createDataFrame([], _EXPLAIN_SCHEMA)
    top = bm25_topk(index, query, k=k, contrib_col=contrib_col).select(
        "rank", "doc_id", "score"
    )
    qdf = spark.createDataFrame(
        [(t, float(q), i) for t, q, i in qweights],
        "term string, qtf double, idf double",
    )
    uniq_terms = [t for t, _, _ in qweights]
    matched = (
        index.tf.where(F.col("term").isin(uniq_terms))
        .join(F.broadcast(qdf), "term")
        .withColumn("_avgdl", F.lit(index.avgdl))
        .withColumn(
            "contrib",
            contrib_col if contrib_col is not None else contribution_col(),
        )
    )
    from ..functions.rounding import round6

    return (
        matched.join(F.broadcast(top), "doc_id")
        .select(
            "rank",
            "doc_id",
            "term",
            "qtf",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_len").cast("long").alias("doc_len"),
            round6("idf").alias("idf"),
            round6("contrib").alias("contrib"),
            round6("score").alias("score"),
        )
        .orderBy("rank", "term")
    )


def bm25_topk(
    index: Index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
    contrib_col: Optional[F.Column] = None,
) -> DataFrame:
    """Exact top-k search (scorer v1, uncompressed index) ->
    (rank, doc_id, url, score). Rank-identical to the reference contract
    (oracle.bm25.BM25Oracle.search). ``contrib_col`` swaps the scoring
    contribution (the score_matched seam) for similarity variants."""
    spark = index.spark
    if not tokenize(query):
        # empty-query guard (bm25_index.py:140-141)
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = query_term_weights(index, query)
    scored = (
        score_matched(index, qweights, contrib_col=contrib_col)
        if qweights
        else None
    )
    return finalize_topk(index, scored, k, filters)


def contribution_col_plus(
    delta: float = 1.0, k1: float = K1, b: float = B
) -> F.Column:
    """BM25+ (Lv & Zhai, CIKM 2011) contribution: the Okapi term joins
    a ``+ delta`` lower bound INSIDE the idf product — a document
    containing a query term always outscores one that lacks it, however
    long the document (the long-doc penalty Okapi over-applies).
    delta=0 is bit-identical to ``contribution_col`` (tested)."""
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("doc_len").cast("double") / F.col("_avgdl")
    )
    return F.col("qtf") * (
        F.col("idf") * (tf * F.lit(k1 + 1.0) / norm + F.lit(float(delta)))
    )


def bm25plus_topk(
    index: Index,
    query: str,
    k: int = 10,
    delta: float = 1.0,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """BM25+ top-k -> (rank, doc_id, url, score): the Okapi scorer with
    the Lv & Zhai lower-bound delta, sharing the entire house chain
    (term-pruned scan, broadcast query join, canonical term-sorted
    fold, 1%-of-max threshold, degenerate backfill, doc_id tie-break) —
    only the contribution expression differs."""
    if float(delta) < 0:
        raise ValueError(f"delta must be >= 0: {delta!r}")
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = query_term_weights(index, query)
    scored = (
        score_matched(index, qweights, contribution_col_plus(delta))
        if qweights
        else None
    )
    return finalize_topk(index, scored, k, filters)


# --------------------------------------------------------------------------
# Language-model similarities (Lucene LMDirichletSimilarity /
# LMJelinekMercerSimilarity — Zhai & Lafferty, SIGIR 2001/2004)
# --------------------------------------------------------------------------


def query_term_cprobs(index: Index, query: str) -> List[tuple]:
    """[(term, qtf, cprob)] — collection language-model probabilities
    for the query's in-vocabulary terms: cprob = ctf / total_tokens,
    where ctf is the collection term frequency (sum of tf over docs)
    and total_tokens = sum(doc_len) over the corpus.

    Plan: ctf comes from a term-pruned tf scan (|q| groups, the
    collect_idf lookup class — never a full-vocab aggregation at query
    time); total_tokens is one exact-integer corpus reduction cached on
    the index handle for its lifetime (the avgdl class of stat — at
    scale it is a build artifact, here derived once per handle).
    Parity: both factors are exact integers <= 2^53, so the single
    IEEE division is bit-identical to the mirror's
    CAST(ctf AS DOUBLE) / CAST(total AS DOUBLE).
    """
    toks = tokenize(query)
    if not toks:
        return []
    counts = Counter(toks)
    uniq = sorted(counts)
    total = index.extras.get("_total_tokens")
    if total is None:
        row = index.docs.agg(F.sum("doc_len").alias("t")).first()
        total = int(row["t"] or 0)
        index.extras["_total_tokens"] = total
    if total <= 0:
        return []
    ctf_rows = (
        index.tf.where(F.col("term").isin(uniq))
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("ctf"))
        .collect()
    )
    ctf = {r["term"]: int(r["ctf"]) for r in ctf_rows}
    return [(t, counts[t], ctf[t] / total) for t in uniq if t in ctf]


def contribution_col_lmd(mu: float = 2000.0) -> F.Column:
    """LM Dirichlet contribution (Lucene LMDirichletSimilarity.score):
    qtf * max(0, ln(1 + tf/(mu*p)) + ln(mu/(dl + mu))) where p is the
    collection probability riding the qdf ``idf`` slot (the
    score_matched seam carries whatever per-term weight the similarity
    needs). The per-term clamp at 0 is Lucene's — a long document's
    negative length norm never subtracts from other terms' evidence."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    p = F.col("idf")  # collection probability (see query_term_cprobs)
    mu_ = F.lit(float(mu))
    return F.col("qtf") * F.greatest(
        F.lit(0.0),
        F.log(F.lit(1.0) + tf / (mu_ * p)) + F.log(mu_ / (dl + mu_)),
    )


def contribution_col_lmjm(lam: float = 0.1) -> F.Column:
    """LM Jelinek-Mercer contribution (Lucene
    LMJelinekMercerSimilarity.score): qtf * ln(1 + ((1-lam)*tf/dl) /
    (lam*p)). Always > 0 for a matched term (the log argument exceeds
    1), so no clamp exists in Lucene either."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    p = F.col("idf")
    c1 = F.lit(1.0 - float(lam))
    return F.col("qtf") * F.log(
        F.lit(1.0) + ((c1 * tf) / dl) / (F.lit(float(lam)) * p)
    )


def _lm_topk(
    index: Index,
    query: str,
    contrib: F.Column,
    k: int,
    filters: Optional[Dict[str, str]],
) -> DataFrame:
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = query_term_cprobs(index, query)
    scored = score_matched(index, qweights, contrib) if qweights else None
    return finalize_topk(index, scored, k, filters)


def lmd_topk(
    index: Index,
    query: str,
    k: int = 10,
    mu: float = 2000.0,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """LM Dirichlet top-k -> (rank, doc_id, url, score). The Lucene
    similarity module on the house chain: term-pruned scan, broadcast
    query join (collection probabilities in the weight slot), canonical
    term-sorted fold, 1%-of-max threshold, degenerate backfill, doc_id
    tie-break. Note LM scoring has no idf: a query whose terms are all
    corpus-common (degenerate under BM25's epsilon floor) is HEALTHY
    here — the smoothed LM still separates documents by tf/dl."""
    if not float(mu) > 0:
        raise ValueError(f"mu must be > 0: {mu!r}")
    return _lm_topk(index, query, contribution_col_lmd(mu), k, filters)


def lmjm_topk(
    index: Index,
    query: str,
    k: int = 10,
    lam: float = 0.1,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """LM Jelinek-Mercer top-k -> (rank, doc_id, url, score); lam is
    the collection-LM mixing weight (Lucene's short-query default
    0.1)."""
    if not (0.0 < float(lam) < 1.0):
        raise ValueError(f"lam must be in (0, 1): {lam!r}")
    return _lm_topk(index, query, contribution_col_lmjm(lam), k, filters)


# --------------------------------------------------------------------------
# DFR / information-based similarities (Terrier InL2, Lucene IBSimilarity)
# --------------------------------------------------------------------------

# ln(2) as a Python literal embedded in BOTH engines: log2(x) is
# spelled ln(x) / LN2 everywhere (the evalrank DCG convention — the
# builtin log2 lane is unproven for parity; ln is).
LN2 = 0.6931471805599453


def query_term_dfs(index: Index, query: str) -> List[tuple]:
    """[(term, qtf, df)] — document frequencies riding the weight slot
    of the score_matched seam (the query_term_cprobs shape: a
    term-pruned lookup against the terms table, |q| rows collected,
    never a vocab scan). df is an exact integer carried as double."""
    toks = tokenize(query)
    if not toks:
        return []
    counts = Counter(toks)
    uniq = sorted(counts)
    rows = (
        index.terms.where(F.col("term").isin(uniq)).select("term", "df").collect()
    )
    dfs = {r["term"]: float(r["df"]) for r in rows}
    return [(t, counts[t], dfs[t]) for t in uniq if t in dfs]


def _tfn_h2() -> F.Column:
    """DFR Normalization H2 (c=1): tfn = tf * log2(1 + avgdl / dl) —
    the density-based length normalization shared by InL2 and IB."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    return tf * (F.log(F.lit(1.0) + F.col("_avgdl") / dl) / F.lit(LN2))


def contribution_col_dfr_inl2(n_docs: int) -> F.Column:
    """DFR InL2 contribution (Amati & van Rijsbergen 2002; Terrier's
    InL2 weighting model): qtf * (tfn / (tfn + 1)) * log2((N + 1) /
    (df + 0.5)) — basic model I(n) (inverse document frequency with
    the 0.5 Laplace shift), after-effect L (the tfn/(tfn+1) risk
    factor), normalization H2. df rides the weight slot as an exact
    integer-valued double, N+1 is an exact literal, so every operand
    is reproduced bit-for-bit by the SQL mirror."""
    dfv = F.col("idf")  # document frequency (query_term_dfs)
    tfn = _tfn_h2()
    info = F.log(F.lit(float(n_docs + 1)) / (dfv + F.lit(0.5))) / F.lit(LN2)
    return F.col("qtf") * ((tfn / (tfn + F.lit(1.0))) * info)


def contribution_col_ib_ll(n_docs: int) -> F.Column:
    """Information-based LL-DF-H2 contribution (Clinchant & Gaussier
    SIGIR 2010; Lucene IBSimilarity with DistributionLL, LambdaDF,
    NormalizationH2): qtf * ln(1 + tfn / lambda) with lambda =
    (df + 1) / (N + 1) — the log-logistic survival -ln(lambda /
    (lambda + tfn)) rewritten in its always-positive form."""
    dfv = F.col("idf")
    tfn = _tfn_h2()
    lam = (dfv + F.lit(1.0)) / F.lit(float(n_docs + 1))
    return F.col("qtf") * F.log(F.lit(1.0) + tfn / lam)


def _df_topk(
    index: Index,
    query: str,
    contrib: F.Column,
    k: int,
    filters: Optional[Dict[str, str]],
) -> DataFrame:
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = query_term_dfs(index, query)
    scored = score_matched(index, qweights, contrib) if qweights else None
    return finalize_topk(index, scored, k, filters)


def dfr_topk(
    index: Index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """DFR InL2 top-k -> (rank, doc_id, url, score): the Terrier
    default divergence-from-randomness model on the house chain
    (term-pruned scan, broadcast query join with df in the weight
    slot, canonical term-sorted fold, 1%-of-max threshold, degenerate
    backfill, doc_id tie-break). Like the LM family it has no epsilon
    floor: the I(n) information content log2((N+1)/(df+0.5)) is
    strictly positive for every indexed term, so an all-common-term
    query stays healthy."""
    return _df_topk(index, query, contribution_col_dfr_inl2(index.n_docs), k, filters)


def ib_topk(
    index: Index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Information-based LL-DF-H2 top-k -> (rank, doc_id, url, score);
    always-positive contributions like dfr_topk."""
    return _df_topk(index, query, contribution_col_ib_ll(index.n_docs), k, filters)


# --------------------------------------------------------------------------
# sparse_vector query (ES 8.15 — learned-sparse / ELSER-style retrieval)
# --------------------------------------------------------------------------


def contribution_col_sparse() -> F.Column:
    """Sparse-dot contribution: query_weight * ln(1 + tf) — the query's
    token weight (riding the weight slot) times the sublinear doc-side
    saturation. Deliberately NO length normalization and NO idf: the
    sparse_vector contract is a dot product between a model-weighted
    query vector and a model-weighted document vector; ln(1+tf) is the
    deterministic stand-in for the doc-side model weights (a real
    ELSER/SPLADE expansion table of (doc_id, term, weight) rows drops
    into the same join seam)."""
    tf = F.col("tf").cast("double")
    return F.col("qtf") * (F.col("idf") * F.log(F.lit(1.0) + tf))


def sparse_vector_topk(
    index: Index,
    query_vector: Dict[str, float],
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """(rank, doc_id, url, score) — the ES ``sparse_vector`` query with
    an explicit token->weight map (the API shape a learned sparse
    encoder produces): score(d) = sum_t w_q(t) * ln(1 + tf(t, d)),
    folded in canonical term order on the score_matched seam with the
    query weight in the weight slot and qtf pinned at 1. Tokens are
    analyzer-normalized before the probe; non-positive weights are
    rejected (ES requires positive token weights). The house
    threshold / degenerate-backfill / doc_id tie-break chain is
    shared, so sparse retrieval composes with the same serving
    conventions as BM25.

    Scale: identical to bm25_topk — term-pruned scan, broadcast
    |q|-row weight relation, one combinable fold per doc."""
    if not query_vector:
        return index.spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    norm: Dict[str, float] = {}
    for raw, w in query_vector.items():
        if not float(w) > 0:
            raise ValueError(f"token weights must be > 0: {raw!r}={w!r}")
        for t in tokenize(str(raw)):
            norm[t] = norm.get(t, 0.0) + float(w)
    if not norm:
        return index.spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = [(t, 1.0, norm[t]) for t in sorted(norm)]
    scored = score_matched(index, qweights, contribution_col_sparse())
    return finalize_topk(index, scored, k, filters)


def sparse_vector_sql(query_vector: Dict[str, float], k: int = 10) -> str:
    """DuckDB mirror of sparse_vector_topk: identical token
    normalization, identical ln(1+tf) contribution, the shared
    threshold chain."""
    from ..functions.rounding import round6_sql, sql_double
    from ..functions.sql_oracle import _docs_cte

    norm: Dict[str, float] = {}
    for raw, w in (query_vector or {}).items():
        if not float(w) > 0:
            raise ValueError(f"token weights must be > 0: {raw!r}={w!r}")
        for t in tokenize(str(raw)):
            norm[t] = norm.get(t, 0.0) + float(w)
    if not norm:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    qvals = ", ".join(
        f"('{t}', {sql_double(norm[t])})" for t in sorted(norm)
    )
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, w) AS (VALUES {qvals}), "
        "contrib AS (SELECT tf.doc_id, tf.term, "
        "  1.0 * (qt.w * ln(1.0 + tf.tf)) AS c "
        "  FROM tf JOIN qt USING (term)), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS (SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )


# --------------------------------------------------------------------------
# classic TF-IDF + boolean similarities (completing the Lucene set)
# --------------------------------------------------------------------------


def contribution_col_classic() -> F.Column:
    """Lucene ClassicSimilarity (the pre-BM25 practical scoring
    function, TFIDFSimilarity): qtf * idf^2 * sqrt(tf) / sqrt(dl) —
    sublinear tf, squared idf (query norm x doc idf in Lucene's
    factoring), and the 1/sqrt(dl) length norm. The engine's
    epsilon-floored idf rides the weight slot, so Classic and Okapi
    agree on every term's idf; sqrt is the proven lane."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    idf = F.col("idf")
    return F.col("qtf") * ((idf * idf) * F.sqrt(tf) / F.sqrt(dl))


def contribution_col_boolean() -> F.Column:
    """Lucene BooleanSimilarity: every matched term contributes its
    query boost (qtf here) and nothing else — ranking by matched
    query mass, the filter-context scoring model."""
    return F.col("qtf") * F.lit(1.0)


def classic_topk(
    index: Index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Classic TF-IDF top-k -> (rank, doc_id, url, score) on the
    house chain (term-pruned scan, broadcast weights, canonical fold,
    threshold/degenerate/tie-break)."""
    return _lm_topk_with_weights(index, query, contribution_col_classic(), k, filters)


def boolean_sim_topk(
    index: Index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """BooleanSimilarity top-k -> (rank, doc_id, url, score): docs
    rank by total matched query mass (qtf sum), ties on doc_id — the
    constant-score model surfaced as a similarity."""
    return _lm_topk_with_weights(
        index, query, contribution_col_boolean(), k, filters
    )


def _lm_topk_with_weights(
    index: Index,
    query: str,
    contrib: F.Column,
    k: int,
    filters: Optional[Dict[str, str]],
) -> DataFrame:
    """Shared tail for similarities that use the standard idf weights
    (query_term_weights) rather than cprobs/dfs."""
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights, contrib) if qweights else None
    return finalize_topk(index, scored, k, filters)


def classic_sql(query: str, k: int = 10) -> str:
    """DuckDB mirror of classic_topk: the shared idf chain with the
    identical qtf * ((idf*idf) * sqrt(tf) / sqrt(dl)) contribution."""
    from ..functions.sql_oracle import bm25_contrib_chain_sql

    contrib = (
        "qt.qtf * ((idf.idf * idf.idf) * sqrt(CAST(tf.tf AS DOUBLE)) "
        "/ sqrt(CAST(dl.doc_len AS DOUBLE)))"
    )
    return bm25_contrib_chain_sql(query, contrib, k)


def boolean_sim_sql(query: str, k: int = 10) -> str:
    from ..functions.sql_oracle import bm25_contrib_chain_sql

    return bm25_contrib_chain_sql(query, "qt.qtf * 1.0", k)
