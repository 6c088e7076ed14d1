"""Wildcard (trailing-star prefix) queries: ``par*`` expands against
the term dictionary and scores as an OR bag of the expanded terms.

The reference engine has no wildcard surface (bag-of-words only,
``codesearch/storage/bm25_index.py:117-170``); this is the third
classic full-text query type (after phrase and NEAR), added
Spark-first on top of the existing scorer stages.

Semantics (deterministic, engine-portable — Lucene-flavored):

* a clause ``prefix*`` expands to the top-``max_expansions``
  dictionary terms with that prefix, ranked (df desc, term asc) — the
  deterministic analog of Lucene's capped multi-term expansion;
* each expanded term scores with qtf = 1; plain clauses keep their
  multiplicity; a term reached both ways accumulates (clauses sum);
* an expansion that matches nothing behaves like an unknown plain
  token — the engine's degenerate zero-backfill convention, not a
  hard empty (engine-consistent with bm25_topk on unknown terms);
* ranking then follows the standard chain: A3 scoring, F4 relative
  threshold, T1 stable top-k.

Scale shape: the expansion is a prefix-pruned dictionary lookup
collecting <= max_expansions rows to the driver (the persisted term
dictionary is partitioned by leading character — the same pruned scan
term_suggest uses; never a full-vocab collect), after which the plan
is exactly the plain scorer's: term-pruned postings scan, broadcast
query side, one per-doc aggregation.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.tokenizer import tokenize

DEFAULT_MAX_EXPANSIONS = 16

_WILD_RE = re.compile(r"^[A-Za-z0-9]+\*$")


def parse_wildcard_query(query: str) -> Tuple[List[str], List[str]]:
    """query -> (plain_tokens, prefixes). A clause is a wildcard when
    it is an alnum run with a trailing ``*``; the prefix is lowercased
    (dictionary terms are lowercase) and may be a single character —
    the tokenizer's len >= 2 rule constrains TERMS, not prefixes.
    Anything else tokenizes as plain text (a bare ``*`` clause
    contributes nothing)."""
    plain: List[str] = []
    prefixes: List[str] = []
    for clause in query.split():
        if _WILD_RE.match(clause):
            prefixes.append(clause[:-1].lower())
        else:
            plain.extend(tokenize(clause))
    return plain, prefixes


def is_wildcard_query(query: str) -> bool:
    return bool(parse_wildcard_query(query)[1])


def expand_prefix(
    index, prefix: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> List[tuple]:
    """[(term, idf)] — the top-``max_expansions`` dictionary terms with
    ``prefix``, ranked (df desc, term asc). A <= M-row collect over a
    prefix-pruned dictionary scan (leading-char partition pruning on
    the persisted layout), never a full-vocab pull."""
    rows = (
        index.terms.where(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(int(max_expansions))
        .select("term", "idf")
        .collect()
    )
    return [(r["term"], float(r["idf"])) for r in rows]


def expanded_or_topk(
    index,
    plain: List[str],
    expansions: List[List[tuple]],
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
    doc_filter=None,
) -> DataFrame:
    """Shared multi-term-expansion scoring tail (wildcard + fuzzy +
    regexp + phrase-prefix): ``plain`` tokens keep their multiplicity;
    each expansion list of (term, idf) adds qtf = 1 per term; a term
    reached by several clauses accumulates. Then the standard A3/F4/T1
    chain. ``doc_filter`` (a doc_id DataFrame) composes post-threshold
    exactly as in finalize_topk — the phrase-prefix predicate uses it."""
    from .scorer import finalize_topk, query_term_weights, score_matched

    qtf: Counter = Counter(plain)
    idf_of: Dict[str, float] = {}
    for t, q, i in query_term_weights(index, " ".join(plain)) if plain else []:
        idf_of[t] = i
    for exp in expansions:
        for t, i in exp:
            qtf[t] += 1
            idf_of[t] = i
    qweights = [
        (t, float(qtf[t]), idf_of[t]) for t in sorted(qtf) if t in idf_of
    ]
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, doc_filter=doc_filter)


def bm25_wildcard_topk(
    index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """Wildcard-expanded BM25 top-k -> (rank, doc_id, url, score)."""
    spark = index.spark
    plain, prefixes = parse_wildcard_query(query)
    if not plain and not prefixes:
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    expansions = [expand_prefix(index, p, max_expansions) for p in prefixes]
    return expanded_or_topk(index, plain, expansions, k, filters)


# --- DuckDB oracle builder (colocated) ---


def bm25_wildcard_sql(
    query: str, k: int = 10, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> str:
    """Mirror of bm25_wildcard_topk: the expansion is the same
    (df desc, term asc) capped dictionary scan (starts_with, never
    LIKE, so metacharacter prefixes cannot diverge)."""
    plain, prefixes = parse_wildcard_query(query)
    if not plain and not prefixes:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    parts = plain_qtf_parts(plain)
    for p in prefixes:
        parts.append(
            "SELECT term, 1.0 AS qtf FROM (SELECT term FROM idf "
            f"WHERE starts_with(term, '{p}') "
            f"ORDER BY df DESC, term ASC LIMIT {int(max_expansions)})"
        )
    return expanded_bm25_sql(parts, k)


def plain_qtf_parts(plain: List[str]) -> List[str]:
    if not plain:
        return []
    vals = ", ".join(
        f"('{t}', {float(q)})" for t, q in sorted(Counter(plain).items())
    )
    return [f"SELECT * FROM (VALUES {vals}) v(term, qtf)"]


def expanded_bm25_sql(
    parts: List[str], k: int = 10, doc_filter_cte: Optional[str] = None
) -> str:
    """Shared oracle chain for expansion queries: ``parts`` are SQL
    subqueries each yielding (term, qtf) rows (evaluated against the
    _docs_cte relations); weights sum per term, then the standard
    threshold/degenerate/top-k chain. ``doc_filter_cte``, when given,
    must define a relation ``dfil(doc_id)``; the final select
    semi-joins it POST-threshold — the mirror of finalize_topk's
    doc_filter stage."""
    from ..functions.sql_oracle import K1, B, _docs_cte, round6_sql

    union = " UNION ALL ".join(parts)
    dfil = f", {doc_filter_cte} " if doc_filter_cte else " "
    fj = "JOIN dfil USING (doc_id) " if doc_filter_cte else ""
    return (
        f"WITH {_docs_cte()}, "
        f"qraw AS ({union}), "
        "qt AS (SELECT term, CAST(sum(qtf) AS DOUBLE) AS qtf FROM qraw GROUP BY term), "
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
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx)))"
        f"{dfil}"
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept {fj}ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )
