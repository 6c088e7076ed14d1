"""Second query-surface wave — five more classic Lucene/Elasticsearch
query types plus the ``_analyze`` introspection API, each Spark-first
with a colocated DuckDB mirror:

* ``bm25_regexp_topk`` — the ES ``regexp`` query: a whole-term regular
  expression expands against the term dictionary (capped, df desc) and
  scores as an OR bag, riding the shared multi-term-expansion chain
  the wildcard/fuzzy queries already use.
* ``constant_score_topk`` — the ES ``constant_score`` query: filter
  context, every matching doc scores exactly ``boost``.
* ``bm25_span_first_topk`` — Lucene ``SpanFirstQuery``: the term must
  occur within the first ``end`` positions of the document; matches
  rank by the standard BM25 chain (doc_filter composition, exactly
  how the quoted-phrase predicate composes).
* ``analyze_doc`` / ``analyze_text`` — the ES ``_analyze`` API: the
  analyzer's token stream with positions, for a stored doc or raw
  text. Pins cross-engine tokenizer agreement on ORDER, which the tf
  relation (bags) cannot.
* ``sampler_terms`` — the ES ``sampler`` / ``diversified_sampler``
  aggs: a terms agg computed over only the best ``shard_size`` docs of
  the kept set, optionally deduplicated per ``dedup_field`` first.
* ``bm25_rescore_topk`` — the ES native ``rescore``: the top
  ``window_size`` BM25 hits re-rank by original + rescore_weight *
  phrase-occurrence count; below-window docs keep their ranking.

Reference parity: the reference engine is bag-of-words only
(``codesearch/storage/bm25_index.py:117-170``) — these are the
remaining standard query surfaces a Lucene-class engine ships, added
Spark-first like the phrase/NEAR/wildcard/fuzzy wave before them.

Cross-engine parity notes (the gate conventions): the regexp subset is
restricted to syntax Java regex and RE2 interpret identically (alnum
literals, ``.``, classes, alternation, grouping, greedy quantifiers —
no escapes, no flags, no backreferences); floats embed via
``sql_double``; ordering always binds RAW scores with rounding only at
the output projection; the rescore blend spells the identical operand
sequence ``score + rw * CAST(n AS DOUBLE)`` on both engines.

Scale notes: the regexp expansion is a capped dictionary scan
collecting <= max_expansions rows (a full-vocab regexp match is the
scan Lucene also pays without a prefix; the cap bounds what moves);
constant_score is one term-pruned distinct + TakeOrdered; span_first
derives positions for ONE term via the positional relation path
(term-pruned posexplode — or the persisted compressed positional index
when present, same seam as phrase); the sampler windows are bounded by
shard_size; rescore moves only window_size rows past the kept chain.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6, round6_sql, sql_double
from ..oracle.tokenizer import tokenize
from .scorer import Index, finalize_topk, query_term_weights, score_matched

# --------------------------------------------------------------------------
# regexp query
# --------------------------------------------------------------------------

# the Java-regex/RE2 common subset: lowercase-alnum literals, '.',
# character classes (alnum + '-' ranges), alternation, non-capturing
# grouping via plain parens, greedy * + ? quantifiers. No escapes, no
# braces, no anchors (ES regexp is whole-term anchored implicitly).
_SAFE_REGEXP_RE = re.compile(r"^[a-z0-9.*+?|()\[\]\-]{1,64}$")


def parse_safe_regexp(pattern: str) -> str:
    """Validate a whole-term regexp against the engine-portable subset
    (raises ValueError). Returns the pattern unchanged."""
    if not _SAFE_REGEXP_RE.match(pattern or ""):
        raise ValueError(f"unsupported regexp (safe subset is [a-z0-9.*+?|()[]-], max 64 chars): {pattern!r}")
    try:
        re.compile(pattern)
    except re.error as e:
        raise ValueError(f"invalid regexp {pattern!r}: {e}") from e
    return pattern


def expand_regexp(
    index: Index, pattern: str, max_expansions: int = 16
) -> List[Tuple[str, float]]:
    """[(term, idf)] — the top-``max_expansions`` dictionary terms fully
    matching ``pattern``, ranked (df desc, term asc): the deterministic
    capped multi-term expansion, same contract as the wildcard prefix
    expansion. A <= M-row collect; the dictionary scan itself is the
    price every regexp query pays in Lucene too."""
    pat = parse_safe_regexp(pattern)
    rows = (
        index.terms.where(F.col("term").rlike(f"^(?:{pat})$"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(int(max_expansions))
        .select("term", "idf")
        .collect()
    )
    return [(r["term"], float(r["idf"])) for r in rows]


def bm25_regexp_topk(
    index: Index,
    pattern: str,
    k: int = 10,
    filters=None,
    max_expansions: int = 16,
) -> DataFrame:
    """Regexp-expanded BM25 top-k -> (rank, doc_id, url, score). An
    expansion matching nothing behaves like an unknown token (the
    engine's degenerate zero-backfill convention, same as wildcard)."""
    from .wildcard import expanded_or_topk

    expansion = expand_regexp(index, pattern, max_expansions)
    return expanded_or_topk(index, [], [expansion], k, filters)


def bm25_regexp_sql(pattern: str, k: int = 10, max_expansions: int = 16) -> str:
    """DuckDB mirror: the identical (df desc, term asc) capped
    expansion via regexp_full_match (RE2 whole-string semantics =
    the Spark side's ^(?:pat)$ rlike anchor on this subset)."""
    from .wildcard import expanded_bm25_sql

    pat = parse_safe_regexp(pattern)
    part = (
        "SELECT term, 1.0 AS qtf FROM (SELECT term FROM idf "
        f"WHERE regexp_full_match(term, '(?:{pat})') "
        f"ORDER BY df DESC, term ASC LIMIT {int(max_expansions)})"
    )
    return expanded_bm25_sql([part], k)


# --------------------------------------------------------------------------
# constant_score query
# --------------------------------------------------------------------------


def constant_score_topk(
    index: Index, query: str, boost: float = 1.5, k: int = 10
) -> DataFrame:
    """(rank, doc_id, score) — the ES ``constant_score`` query: filter
    context (a doc matches when it contains ANY query term), every
    match scores exactly ``boost``, ties rank in doc_id order (the
    engine-wide tie-break). No relative threshold and no zero-backfill:
    in filter context a non-matching doc is simply absent — scoring
    semantics deliberately differ from the BM25 chain (that IS the
    point of constant_score).

    Plan: one term-pruned tf scan -> distinct doc_id -> TakeOrdered(k);
    nothing corpus-scale moves."""
    spark = index.spark
    toks = sorted(set(tokenize(query)))
    if not toks:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    w = Window.orderBy(F.asc("doc_id"))
    return (
        index.tf.where(F.col("term").isin(toks))
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", F.lit(float(boost)).alias("score"))
    )


def constant_score_sql(query: str, boost: float = 1.5, k: int = 10) -> str:
    from ..functions.sql_oracle import _docs_cte

    toks = sorted(set(tokenize(query)))
    if not toks:
        return (
            "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
        )
    lst = ", ".join(f"'{t}'" for t in toks)
    return (
        f"WITH {_docs_cte()} "
        "SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS INT) AS rank, "
        f"doc_id, {sql_double(float(boost))} AS score "
        f"FROM (SELECT DISTINCT doc_id FROM tf WHERE term IN ({lst})) "
        f"ORDER BY doc_id ASC LIMIT {int(k)}"
    )


# --------------------------------------------------------------------------
# span_first query
# --------------------------------------------------------------------------


def span_first_docs(index: Index, term: str, end: int) -> DataFrame:
    """doc_ids whose FIRST occurrence of ``term`` lies within the first
    ``end`` token positions (1-based, inclusive) — Lucene
    ``SpanFirstQuery``. One term-pruned position derivation: the doc's
    token array is probed with array_position (first match only), no
    posexplode and no shuffle — a corpus-parallel scan bounded by the
    docs relation, the same cost as any tokens-column predicate."""
    toks = tokenize(term)
    if len(toks) != 1:
        raise ValueError(f"span_first takes exactly one indexable term: {term!r}")
    if int(end) < 1:
        raise ValueError(f"end must be >= 1: {end!r}")
    return (
        index.docs.select(
            "doc_id", F.array_position("tokens", toks[0]).alias("_p")
        )
        .where(F.col("_p").between(1, int(end)))
        .select("doc_id")
    )


def bm25_span_first_topk(
    index: Index, term: str, end: int = 3, k: int = 10, filters=None
) -> DataFrame:
    """(rank, doc_id, url, score): BM25 ranking of the term restricted
    to docs where it appears within the first ``end`` positions — the
    doc_filter composition contract (post-threshold, exactly how the
    quoted-phrase predicate composes with the scoring chain)."""
    occ = span_first_docs(index, term, end)
    qweights = query_term_weights(index, term)
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, doc_filter=occ)


def bm25_span_first_sql(term: str, end: int = 3, k: int = 10) -> str:
    """Mirror: shared kept chain + the list_position first-occurrence
    predicate applied post-threshold (kept semi-join)."""
    from ..functions.sql_oracle import kept_cte_sql

    toks = tokenize(term)
    if len(toks) != 1:
        raise ValueError(f"span_first takes exactly one indexable term: {term!r}")
    chain = kept_cte_sql(toks[0])
    if chain is None:  # unreachable given the one-term guard; typed for safety
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    return (
        f"{chain}, "
        "sf AS (SELECT doc_id FROM docs "
        f"WHERE coalesce(list_position(toks, '{toks[0]}'), 0) "
        f"BETWEEN 1 AND {int(end)}) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        "FROM kept JOIN sf USING (doc_id) "
        f"ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )


# --------------------------------------------------------------------------
# _analyze API
# --------------------------------------------------------------------------


def analyze_doc(index: Index, doc_id: int) -> DataFrame:
    """(pos int 1-based, token string) — the ES ``_analyze`` API over a
    STORED document: the analyzer's ordered token stream. Pins the
    tokenizers' cross-engine agreement on order (tf pins only the
    bags). A missing doc returns zero rows. Plan: doc_id pushdown on
    the docs relation + one posexplode of a single row."""
    d = int(doc_id)
    return (
        index.docs.where(F.col("doc_id") == F.lit(d))
        .select(F.posexplode("tokens").alias("pos0", "token"))
        .select((F.col("pos0") + 1).cast("int").alias("pos"), "token")
        .orderBy("pos")
    )


def analyze_doc_sql(doc_id: int) -> str:
    from ..functions.sql_oracle import toks_cte

    return (
        f"WITH {toks_cte()} "
        "SELECT CAST(unnest(generate_series(1, len(toks))) AS INT) AS pos, "
        f"unnest(toks) AS token FROM docs WHERE doc_id = {int(doc_id)} "
        "ORDER BY pos"
    )


def analyze_text(spark: SparkSession, text: str) -> DataFrame:
    """(pos, token) for RAW text — the `_analyze` body form. Runs the
    same Spark-side chain over a 1-row DataFrame (no driver-side
    tokenize: the gate contract is that the engine's own tokenizer
    lane produces the stream)."""
    from ..functions.udfs import tokenize_udf

    one = spark.createDataFrame([(text or "",)], "text string")
    return (
        one.select(tokenize_udf(F.col("text")).alias("tokens"))
        .select(F.posexplode("tokens").alias("pos0", "token"))
        .select((F.col("pos0") + 1).cast("int").alias("pos"), "token")
        .orderBy("pos")
    )


# --------------------------------------------------------------------------
# sampler / diversified_sampler aggregation
# --------------------------------------------------------------------------


def sampler_terms(
    index: Index,
    query: str,
    key: str = "source",
    shard_size: int = 50,
    k: int = 10,
    dedup_field: Optional[str] = None,
    max_docs_per_value: int = 1,
) -> DataFrame:
    """(``key``, n_docs) — the ES ``sampler`` agg (and, with
    ``dedup_field``, ``diversified_sampler``): a terms agg over only
    the best ``shard_size`` docs of the BM25 kept set (score desc,
    doc_id asc — a deterministic total order, so the sample is exact
    on both engines), optionally keeping at most ``max_docs_per_value``
    docs per ``dedup_field`` value BEFORE sampling. Buckets order
    (n_docs desc, value asc), top-k.

    Scale: the dedup stage is the grouped-top-n window (rank pruned in
    the exchange); the sample is a TakeOrdered(shard_size); the agg
    then touches shard_size rows."""
    from .aggs import _check_name
    from .explore import _kept_with_cols

    spark = index.spark
    _check_name(key, "column name")
    if dedup_field is not None:
        _check_name(dedup_field, "column name")
    if int(shard_size) < 1 or int(k) < 1:
        raise ValueError("shard_size and k must be >= 1")
    if not tokenize(query):
        kt = index.docs.schema[key].dataType.simpleString()
        return spark.createDataFrame([], f"{key} {kt}, n_docs long")
    cols = [key] if dedup_field in (None, key) else [key, dedup_field]
    kept = _kept_with_cols(index, query, cols)
    if dedup_field is not None:
        wd = Window.partitionBy(dedup_field).orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        kept = (
            kept.withColumn("_dv", F.row_number().over(wd))
            .where(F.col("_dv") <= int(max_docs_per_value))
            .drop("_dv")
        )
    samp = kept.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(shard_size))
    return (
        samp.groupBy(key)
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc(key))
        .limit(int(k))
    )


def sampler_terms_sql(
    query: str,
    key: str = "source",
    shard_size: int = 50,
    k: int = 10,
    dedup_field: Optional[str] = None,
    max_docs_per_value: int = 1,
) -> str:
    from ..functions.sql_oracle import kept_cte_sql
    from .aggs import _check_name

    _check_name(key, "column name")
    if dedup_field is not None:
        _check_name(dedup_field, "column name")
    chain = kept_cte_sql(
        query, [key] if dedup_field in (None, key) else [key, dedup_field]
    )
    if chain is None:
        return f"SELECT '' AS {key}, 1::BIGINT AS n_docs WHERE false"
    src = "kept"
    dv = ""
    if dedup_field is not None:
        dv = (
            ", dv AS (SELECT *, row_number() OVER "
            f"(PARTITION BY {dedup_field} ORDER BY score DESC, doc_id ASC) AS _dv "
            "FROM kept)"
        )
        src = f"(SELECT * FROM dv WHERE _dv <= {int(max_docs_per_value)})"
    return (
        f"{chain}{dv}, "
        f"samp AS (SELECT * FROM {src} ORDER BY score DESC, doc_id ASC "
        f"LIMIT {int(shard_size)}) "
        f"SELECT {key}, CAST(count(*) AS BIGINT) AS n_docs FROM samp "
        f"GROUP BY {key} ORDER BY n_docs DESC, {key} ASC LIMIT {int(k)}"
    )


# --------------------------------------------------------------------------
# rescore
# --------------------------------------------------------------------------


def bm25_rescore_topk(
    index: Index,
    query: str,
    phrase: str,
    window_size: int = 20,
    rescore_weight: float = 2.0,
    k: int = 10,
) -> DataFrame:
    """(rank, doc_id, base, n_occur, score) — the ES native ``rescore``
    with a phrase rescorer: the top ``window_size`` BM25 hits re-rank
    by final = base + rescore_weight * n_occur(phrase); docs outside
    the window keep their original ranking below it. With query_weight
    fixed at the ES default 1.0 and rescore_weight >= 0, every
    window doc's final >= its base >= any below-window base, so for
    k <= window_size the global top-k IS the rescored window's top-k —
    enforced, which is what keeps the operator one bounded window
    instead of a corpus re-sort.

    Scale: the kept chain's TakeOrdered(window_size) bounds what moves;
    the phrase occurrences derive from the window's term-pruned
    positional path only (the persisted compressed positional index
    slots in exactly as it does for quoted queries)."""
    from .explore import _kept_with_cols
    from .phrase import phrase_occurrences

    spark = index.spark
    if int(k) > int(window_size):
        raise ValueError(f"k ({k}) must be <= window_size ({window_size})")
    if float(rescore_weight) < 0:
        raise ValueError(f"rescore_weight must be >= 0: {rescore_weight!r}")
    out = "rank int, doc_id long, base double, n_occur long, score double"
    if not tokenize(query):
        return spark.createDataFrame([], out)
    kept = _kept_with_cols(index, query, [])
    win = kept.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(window_size))
    occ = phrase_occurrences(index.docs, phrase)
    n = F.coalesce(F.col("n_occur"), F.lit(0)).cast("long")
    final = F.col("score") + F.lit(float(rescore_weight)) * n.cast("double")
    blended = win.join(occ, "doc_id", "left").select(
        "doc_id", F.col("score").alias("base"), n.alias("n_occur"),
        final.alias("final"),
    )
    w = Window.orderBy(F.desc("final"), F.asc("doc_id"))
    return (
        blended.orderBy(F.desc("final"), F.asc("doc_id"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank", "doc_id", round6("base").alias("base"), "n_occur",
            round6("final").alias("score"),
        )
    )


def bm25_rescore_sql(
    query: str,
    phrase: str,
    window_size: int = 20,
    rescore_weight: float = 2.0,
    k: int = 10,
) -> str:
    from ..functions.sql_oracle import kept_cte_sql
    from .phrase import _phrase_occ_cte

    if int(k) > int(window_size):
        raise ValueError(f"k ({k}) must be <= window_size ({window_size})")
    chain = kept_cte_sql(query)
    if chain is None:
        return (
            "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS base, "
            "1::BIGINT AS n_occur, 0.0 AS score WHERE false"
        )
    pocc = _phrase_occ_cte(phrase).replace("occ AS", "pocc AS", 1)
    rw = sql_double(float(rescore_weight))
    return (
        f"{chain}, {pocc}, "
        "win AS (SELECT doc_id, score FROM kept "
        f"ORDER BY score DESC, doc_id ASC LIMIT {int(window_size)}), "
        "blended AS (SELECT w.doc_id, w.score AS base, "
        "CAST(coalesce(p.n_occur, 0) AS BIGINT) AS n_occur, "
        f"w.score + {rw} * CAST(coalesce(p.n_occur, 0) AS DOUBLE) AS final "
        "FROM win w LEFT JOIN (SELECT doc_id, n_occur FROM pocc "
        "WHERE n_occur > 0) p USING (doc_id)) "
        "SELECT CAST(row_number() OVER (ORDER BY final DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('base')} AS base, n_occur, "
        f"{round6_sql('final')} AS score "
        f"FROM blended ORDER BY final DESC, doc_id ASC LIMIT {int(k)}"
    )


# --------------------------------------------------------------------------
# match_phrase_prefix query
# --------------------------------------------------------------------------


def match_phrase_prefix_topk(
    index: Index,
    query: str,
    k: int = 10,
    max_expansions: int = 8,
    filters=None,
) -> DataFrame:
    """(rank, doc_id, url, score) — the ES ``match_phrase_prefix``
    query: the query's LAST token is a prefix; a doc matches when it
    contains the exact phrase [base..., e] for ANY of the prefix's
    top-``max_expansions`` dictionary expansions (df desc, term asc —
    the same capped deterministic expansion the wildcard query uses).
    Scoring follows the house phrase-composition contract
    (bm25_phrase_topk): the bag of base tokens (with multiplicity) plus
    each expansion at qtf 1 scores the standard chain, and the
    phrase-prefix predicate composes post-threshold as a doc_filter.
    No expansion => matches nothing (ES semantics).

    Scale: the expansion is the capped dictionary probe; each
    expansion's phrase check is a term-pruned position derivation over
    [base..., e] only (<= max_expansions such passes, union-ed and
    distinct-ed — the persisted compressed positional index slots in
    per expansion exactly as it does for quoted queries)."""
    from functools import reduce

    from .phrase import phrase_occurrences
    from .wildcard import expand_prefix, expanded_or_topk

    spark = index.spark
    toks = tokenize(query)
    if not toks:
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    base, prefix = toks[:-1], toks[-1]
    expansion = expand_prefix(index, prefix, max_expansions)
    if not expansion:
        doc_filter = spark.createDataFrame([], "doc_id long")
    elif not base:
        doc_filter = (
            index.tf.where(F.col("term").isin([t for t, _ in expansion]))
            .select("doc_id")
            .distinct()
        )
    else:
        occs = [
            phrase_occurrences(index.docs, " ".join([*base, t])).select("doc_id")
            for t, _ in expansion
        ]
        doc_filter = reduce(lambda a, b: a.unionByName(b), occs).distinct()
    return expanded_or_topk(
        index, base, [expansion], k, filters, doc_filter=doc_filter
    )


def match_phrase_prefix_sql(
    query: str, k: int = 10, max_expansions: int = 8
) -> str:
    """DuckDB mirror: the identical capped expansion + the phrase
    predicate with the last slot bound per expansion term (one
    docs x expansions theta probe over the token-slice test the
    quoted-phrase oracle already uses), semi-joined post-threshold."""
    from .wildcard import expanded_bm25_sql, plain_qtf_parts

    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    base, prefix = toks[:-1], toks[-1]
    m = int(max_expansions)
    pfx = (
        "pfx AS (SELECT term FROM idf "
        f"WHERE starts_with(term, '{prefix}') "
        f"ORDER BY df DESC, term ASC LIMIT {m})"
    )
    parts = plain_qtf_parts(base) + [
        "SELECT term, 1.0 AS qtf FROM (SELECT term FROM idf "
        f"WHERE starts_with(term, '{prefix}') "
        f"ORDER BY df DESC, term ASC LIMIT {m})"
    ]
    b = len(base)
    if b == 0:
        dfil = (
            f"{pfx}, dfil AS (SELECT DISTINCT tf.doc_id "
            "FROM tf JOIN pfx USING (term))"
        )
    else:
        base_lit = "[" + ", ".join(f"'{t}'" for t in base) + "]"
        dfil = (
            f"{pfx}, dfil AS (SELECT DISTINCT d.doc_id FROM docs d JOIN pfx p "
            f"ON len(list_filter(generate_series(1, len(d.toks) - {b}), "
            f"i -> d.toks[i:i+{b - 1}] = {base_lit} "
            f"AND d.toks[i+{b}] = p.term)) > 0)"
        )
    return expanded_bm25_sql(parts, k, doc_filter_cte=dfil)


# --------------------------------------------------------------------------
# span_not query
# --------------------------------------------------------------------------


def span_not_docs(
    index: Index, include: str, exclude: str, pre: int = 0, post: int = 0
) -> DataFrame:
    """doc_ids with at least one occurrence of ``include`` that is NOT
    within ``pre`` positions after / ``post`` positions before any
    occurrence of ``exclude`` — Lucene ``SpanNotQuery`` (with its
    pre/post window parameters): "rows not near corrupted", the
    negative-context match the NEAR operator cannot express.

    A surviving include position p satisfies, for EVERY exclude
    position e: NOT (e - pre <= p <= e + post). A doc without the
    exclude term trivially matches (all include spans survive); a doc
    without the include term never matches.

    Scale shape: the scan is restricted to the INCLUDE term's postings
    first (term-pruned semi-join — the candidate set is the posting
    list, never the corpus), then both position lists derive from the
    tokens column with JVM higher-order functions (transform + filter
    + exists): zero Python, zero posexplode shuffle, cost bounded by
    candidate doc length exactly like any tokens-column predicate."""
    ti, te = tokenize(include), tokenize(exclude)
    if len(ti) != 1 or len(te) != 1:
        raise ValueError(
            f"span_not takes exactly one indexable term per side: "
            f"include={include!r} exclude={exclude!r}"
        )
    if int(pre) < 0 or int(post) < 0:
        raise ValueError(f"pre/post must be >= 0: {pre!r}/{post!r}")
    inc, exc = ti[0], te[0]
    cand = index.docs.join(
        index.tf.where(F.col("term") == inc).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    def _positions(term: str):
        return F.filter(
            F.transform(
                F.col("tokens"),
                lambda t, i: F.when(t == F.lit(term), i + 1),
            ),
            lambda x: x.isNotNull(),
        )

    pinc, pexc = _positions(inc), _positions(exc)
    survives = F.exists(
        pinc,
        lambda p: ~F.exists(
            pexc,
            lambda e: (p >= e - F.lit(int(pre))) & (p <= e + F.lit(int(post))),
        ),
    )
    return cand.where(survives).select("doc_id")


def bm25_span_not_topk(
    index: Index,
    include: str,
    exclude: str,
    pre: int = 0,
    post: int = 0,
    k: int = 10,
    filters=None,
) -> DataFrame:
    """(rank, doc_id, url, score): BM25 ranking of the include term
    restricted to span_not-surviving docs — the doc_filter composition
    contract (post-threshold, exactly like span_first / the quoted
    phrase)."""
    occ = span_not_docs(index, include, exclude, pre=pre, post=post)
    qweights = query_term_weights(index, include)
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, doc_filter=occ)


def bm25_span_not_sql(
    include: str, exclude: str, pre: int = 0, post: int = 0, k: int = 10
) -> str:
    """Mirror: shared kept chain + the identical survive predicate over
    1-based list positions (both engines compare positions only as
    DIFFERENCES, so the index base cancels)."""
    from ..functions.sql_oracle import kept_cte_sql

    ti, te = tokenize(include), tokenize(exclude)
    if len(ti) != 1 or len(te) != 1:
        raise ValueError(
            f"span_not takes exactly one indexable term per side: "
            f"include={include!r} exclude={exclude!r}"
        )
    if int(pre) < 0 or int(post) < 0:
        raise ValueError(f"pre/post must be >= 0: {pre!r}/{post!r}")
    inc, exc = ti[0], te[0]
    chain = kept_cte_sql(inc)
    if chain is None:  # unreachable given the one-term guard; typed for safety
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    pinc = f"list_filter(generate_series(1, len(toks)), i -> toks[i] = '{inc}')"
    pexc = f"list_filter(generate_series(1, len(toks)), i -> toks[i] = '{exc}')"
    survive = (
        f"len(list_filter({pinc}, p -> len(list_filter({pexc}, "
        f"e -> p >= e - {int(pre)} AND p <= e + {int(post)})) = 0)) > 0"
    )
    return (
        f"{chain}, "
        f"sn AS (SELECT doc_id FROM docs WHERE {survive}) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        "FROM kept JOIN sn USING (doc_id) "
        f"ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )


# --------------------------------------------------------------------------
# terms_enum API (the ES _terms_enum: dictionary prefix enumeration —
# the autocomplete primitive — with keyset search_after pagination)
# --------------------------------------------------------------------------

_TERMS_ENUM_PREFIX_RE = re.compile(r"[a-z0-9]+")


def _terms_enum_check(prefix: str, size: int, search_after) -> str:
    p = str(prefix).lower()
    if not p or not _TERMS_ENUM_PREFIX_RE.fullmatch(p):
        raise ValueError(
            f"terms_enum prefix must be non-empty [a-z0-9]+ after "
            f"lowercasing: {prefix!r}"
        )
    if int(size) < 1:
        raise ValueError(f"size must be >= 1: {size!r}")
    if search_after is not None and not isinstance(search_after, str):
        raise ValueError(f"search_after must be a term string: {search_after!r}")
    return p


def terms_enum(
    index: Index, prefix: str, size: int = 10, search_after=None
) -> DataFrame:
    """(term) — the dictionary terms with ``prefix`` in term order,
    capped at ``size``; ``search_after`` resumes AFTER a term (keyset
    pagination — page N costs page 1, the search_after/composite
    precedent). The scan is prefix-pruned on the persisted layout
    (term_pfx partitioning), the cap is a TakeOrderedAndProject —
    never a full-vocab sort."""
    p = _terms_enum_check(prefix, size, search_after)
    t = index.terms.where(F.col("term").startswith(p))
    if search_after is not None:
        t = t.where(F.col("term") > str(search_after))
    return t.orderBy("term").limit(int(size)).select("term")


def terms_enum_sql(
    toks_cte: str, prefix: str, size: int = 10, search_after=None
) -> str:
    """Mirror: the text-derived dictionary, the identical prefix cut
    (alnum-validated, so the LIKE pattern needs no escaping), keyset
    predicate, term order, cap."""
    p = _terms_enum_check(prefix, size, search_after)
    after = (
        f"AND term > '{search_after}' " if search_after is not None else ""
    )
    return (
        f"WITH {toks_cte}, "
        "terms AS (SELECT DISTINCT unnest(toks) AS term FROM docs) "
        f"SELECT term FROM terms WHERE term LIKE '{p}%' {after}"
        f"ORDER BY term LIMIT {int(size)}"
    )


# --------------------------------------------------------------------------
# pinned query (the ES `pinned` query: curated promotions — the given
# ids rank first IN THE ORDER PROVIDED, organic matches fill the rest)
# --------------------------------------------------------------------------


def bm25_pinned_topk(
    index: Index, query: str, pinned_ids, k: int = 10
) -> DataFrame:
    """(rank, doc_id, pinned, score) — ``pinned_ids`` that exist in the
    index occupy ranks 1..p in their PROVIDED order (the ES promotion
    contract; a pinned id absent from the index is skipped, one absent
    from the kept set still pins with score 0.0), then the organic BM25
    ranking fills ranks p+1..k excluding the pinned docs. ``score`` is
    each doc's kept-set BM25 score — informative for pinned rows, the
    ranking key for organic ones.

    Scale shape: the pin relation is a request-sized literal; exclusion
    is one anti-join on the thresholded candidates; both cuts are
    TakeOrdered. Empty ``pinned_ids`` is exactly ``bm25_topk`` modulo
    the extra column (identity-tested)."""
    from .explore import _kept_with_cols

    spark = index.spark
    ids = [int(i) for i in pinned_ids]
    if len(set(ids)) != len(ids):
        raise ValueError(f"pinned_ids must be unique: {pinned_ids!r}")
    out_schema = "rank int, doc_id long, pinned boolean, score double"
    if not tokenize(query):
        return spark.createDataFrame([], out_schema)
    kept = _kept_with_cols(index, query, [])
    if ids:
        pdf = spark.createDataFrame(
            [(int(d), i) for i, d in enumerate(ids)],
            "doc_id long, pin_pos int",
        )
        pins = (
            pdf.join(index.docs.select("doc_id"), "doc_id", "left_semi")
            .join(kept.select("doc_id", "score"), "doc_id", "left")
            .select(
                "doc_id", "pin_pos",
                F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
            )
        )
        wp = Window.orderBy("pin_pos")
        pins = (
            pins.orderBy("pin_pos")
            .limit(int(k))
            .withColumn("rank", F.row_number().over(wp))
            .select("rank", "doc_id", F.lit(True).alias("pinned"), "score")
        )
        np_ = pins.count()
        organic_base = kept.join(pdf.select("doc_id"), "doc_id", "left_anti")
    else:
        np_ = 0
        pins = spark.createDataFrame([], out_schema)
        organic_base = kept
    slots = int(k) - np_
    wo = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    organic = (
        organic_base.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(max(slots, 0))
        .withColumn("rank", F.row_number().over(wo) + F.lit(np_))
        .select("rank", "doc_id", F.lit(False).alias("pinned"), "score")
    )
    out = pins.unionByName(organic) if np_ else organic
    return out.select(
        "rank", "doc_id", "pinned", round6("score").alias("score")
    ).orderBy("rank")


def bm25_pinned_sql(query: str, pinned_ids, k: int = 10) -> str:
    """Mirror: shared kept chain; the pin relation is a VALUES list
    carrying the provided order; organic = kept anti pins, rank offset
    by the surviving pin count."""
    from ..functions.sql_oracle import kept_cte_sql

    ids = [int(i) for i in pinned_ids]
    if len(set(ids)) != len(ids):
        raise ValueError(f"pinned_ids must be unique: {pinned_ids!r}")
    chain = kept_cte_sql(query)
    if chain is None:
        return (
            "SELECT 1 AS rank, 1::BIGINT AS doc_id, true AS pinned, "
            "0.0 AS score WHERE false"
        )
    if not ids:
        return (
            f"{chain} "
            "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
            f"doc_id, false AS pinned, {round6_sql('score')} AS score "
            f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
        )
    pvals = ", ".join(
        f"({int(d)}::BIGINT, {i})" for i, d in enumerate(ids)
    )
    return (
        f"{chain}, "
        f"preq(doc_id, pin_pos) AS (VALUES {pvals}), "
        "pins AS (SELECT p.doc_id, p.pin_pos, coalesce(kk.score, 0.0) AS score, "
        "CAST(row_number() OVER (ORDER BY p.pin_pos) AS INT) AS rank "
        "FROM preq p JOIN docs d ON d.doc_id = p.doc_id "
        "LEFT JOIN kept kk ON kk.doc_id = p.doc_id), "
        "np AS (SELECT count(*) AS n FROM pins), "
        "organic AS (SELECT doc_id, score, "
        "CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rn "
        "FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM preq)) "
        f"SELECT rank, doc_id, true AS pinned, {round6_sql('score')} AS score "
        f"FROM pins WHERE rank <= {int(k)} "
        "UNION ALL "
        "SELECT CAST(rn + (SELECT n FROM np) AS INT) AS rank, doc_id, "
        f"false AS pinned, {round6_sql('score')} AS score FROM organic "
        f"WHERE rn <= {int(k)} - (SELECT n FROM np) "
        "ORDER BY rank"
    )


# --------------------------------------------------------------------------
# match_bool_prefix query
# --------------------------------------------------------------------------


def match_bool_prefix_topk(
    index: Index,
    query: str,
    k: int = 10,
    max_expansions: int = 8,
    filters=None,
) -> DataFrame:
    """(rank, doc_id, url, score) — the ES ``match_bool_prefix``
    query: every token is an independent bool-should term clause and
    the LAST token is a prefix (its capped (df desc, term asc)
    dictionary expansions join as qtf-1 should clauses). Unlike
    ``match_phrase_prefix`` there is NO adjacency/position constraint
    — a doc matching the base tokens anywhere, or only an expansion,
    still scores (the search-as-you-type relaxed variant; the test
    suite pins the distinction). Composition: expand_prefix +
    expanded_or_topk — the shared wildcard/fuzzy scoring tail, so the
    plan is the standard term-pruned chain with a <= max_expansions
    dictionary probe."""
    from .wildcard import expand_prefix, expanded_or_topk

    spark = index.spark
    toks = tokenize(query)
    if not toks:
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    plain, last = toks[:-1], toks[-1]
    exp = expand_prefix(index, last, max_expansions)
    if not plain and not exp:
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    return expanded_or_topk(index, plain, [exp] if exp else [], k=k,
                            filters=filters)


def match_bool_prefix_sql(
    query: str, k: int = 10, max_expansions: int = 8
) -> str:
    """Mirror of match_bool_prefix_topk over the shared
    expanded_bm25_sql chain (starts_with, never LIKE)."""
    from .wildcard import expanded_bm25_sql, plain_qtf_parts

    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    plain, last = toks[:-1], toks[-1]
    parts = plain_qtf_parts(plain)
    esc = last.replace("'", "''")
    parts.append(
        "SELECT term, 1.0 AS qtf FROM (SELECT term FROM idf "
        f"WHERE starts_with(term, '{esc}') "
        f"ORDER BY df DESC, term ASC LIMIT {int(max_expansions)})"
    )
    return expanded_bm25_sql(parts, k)


# --------------------------------------------------------------------------
# span_within query
# --------------------------------------------------------------------------


def span_within_docs(
    index: Index, little: str, big_first: str, big_last: str,
    width: int = 6,
) -> DataFrame:
    """doc_ids where an occurrence of ``little`` lies INSIDE an
    ordered (``big_first`` ... ``big_last``) envelope of span width <=
    ``width`` — Lucene ``SpanWithinQuery`` with a span_near big
    ("table inside a dup...row window"): ∃ positions x of big_first,
    y of big_last, p of little with x < y <= x + width and
    x <= p <= y. Completes the span family beside span_first (position
    prefix) and span_not (negative context).

    Scale shape: candidates are the semi-join of the three terms'
    postings (term-pruned — the narrowest list drives), then the
    triple-exists predicate runs over the tokens column with JVM
    higher-order functions; positions compare only as differences so
    the 1-based convention cancels cross-engine."""
    tl, tb1, tb2 = tokenize(little), tokenize(big_first), tokenize(big_last)
    if len(tl) != 1 or len(tb1) != 1 or len(tb2) != 1:
        raise ValueError(
            "span_within takes exactly one indexable term per slot: "
            f"little={little!r} big={big_first!r}..{big_last!r}"
        )
    if int(width) < 1:
        raise ValueError(f"width must be >= 1: {width!r}")
    lt, b1, b2 = tl[0], tb1[0], tb2[0]
    cand = index.docs
    for t in (lt, b1, b2):
        cand = cand.join(
            index.tf.where(F.col("term") == t).select("doc_id"),
            "doc_id",
            "left_semi",
        )

    def _positions(term: str):
        return F.filter(
            F.transform(
                F.col("tokens"),
                lambda tok, i: F.when(tok == F.lit(term), i + 1),
            ),
            lambda x: x.isNotNull(),
        )

    pl, p1, p2 = _positions(lt), _positions(b1), _positions(b2)
    w = F.lit(int(width))
    matches = F.exists(
        p1,
        lambda x: F.exists(
            p2,
            lambda y: (y > x)
            & (y <= x + w)
            & F.exists(pl, lambda p: (p >= x) & (p <= y)),
        ),
    )
    return cand.where(matches).select("doc_id")


def bm25_span_within_topk(
    index: Index, little: str, big_first: str, big_last: str,
    width: int = 6, k: int = 10, filters=None,
) -> DataFrame:
    """(rank, doc_id, url, score): BM25 of the three-term bag
    restricted to span_within-surviving docs (the doc_filter
    composition contract, post-threshold like span_first/span_not)."""
    occ = span_within_docs(index, little, big_first, big_last, width)
    qweights = query_term_weights(
        index, f"{little} {big_first} {big_last}"
    )
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, doc_filter=occ)


def bm25_span_within_sql(
    little: str, big_first: str, big_last: str, width: int = 6,
    k: int = 10,
) -> str:
    """Mirror: shared kept chain + the identical triple-exists over
    1-based list positions, doc_filter semi-join post-threshold."""
    from ..functions.sql_oracle import kept_cte_sql

    tl, tb1, tb2 = tokenize(little), tokenize(big_first), tokenize(big_last)
    if len(tl) != 1 or len(tb1) != 1 or len(tb2) != 1:
        raise ValueError(
            "span_within takes exactly one indexable term per slot: "
            f"little={little!r} big={big_first!r}..{big_last!r}"
        )
    if int(width) < 1:
        raise ValueError(f"width must be >= 1: {width!r}")
    lt, b1, b2 = tl[0], tb1[0], tb2[0]
    chain = kept_cte_sql(f"{lt} {b1} {b2}")
    if chain is None:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"

    def pos(term: str) -> str:
        esc = term.replace("'", "''")
        return (
            "list_filter(list_transform(toks, (t, i) -> "
            f"CASE WHEN t = '{esc}' THEN i END), x -> x IS NOT NULL)"
        )

    pred = (
        f"len(list_filter({pos(b1)}, x -> "
        f"len(list_filter({pos(b2)}, y -> y > x AND y <= x + {int(width)} "
        f"AND len(list_filter({pos(lt)}, p -> p >= x AND p <= y)) > 0"
        ")) > 0)) > 0"
    )
    return (
        f"{chain}, "
        f"dfil AS (SELECT doc_id FROM docs WHERE {pred}) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        "doc_id, (floor((score) * 1000000.0 + 0.5) / 1000000.0) AS score "
        f"FROM kept JOIN dfil USING (doc_id) "
        f"ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )
