"""Percolator — reverse search (the Elasticsearch percolate analog):
documents are matched against a REGISTERED QUERY SET instead of queries
against an index. The webtext-pipeline use is alert routing: "which
saved searches / topic monitors does this new page trigger?" evaluated
per crawl batch, not per user query.

Semantics: a doc matches a stored query iff it contains ALL of the
query's distinct tokens (Lucene MUST conjunction — the same all-of test
the boolean ``+`` operator uses, operators/boolquery). Queries whose
token set is empty match nothing.

Scale shape: the stored-query relation is tiny and broadcasts; docs
explode their DISTINCT tokens once, the join is term-keyed against the
broadcast side (so only rows whose token appears in SOME stored query
survive — an effective pushed filter), and one (doc, query) groupBy
counts distinct matched terms against the query's arity. Per batch
this is one shuffle bounded by matches, never all-pairs.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.tokenizer import tokenize


def _query_terms(queries: Dict[int, str]) -> List[Tuple[int, str, int]]:
    rows = []
    for qid, q in sorted(queries.items()):
        terms = sorted(set(tokenize(q)))
        for t in terms:
            rows.append((int(qid), t, len(terms)))
    return rows


def percolate(docs: DataFrame, queries: Dict[int, str]) -> DataFrame:
    """docs(doc_id, tokens) x stored queries -> (doc_id, query_id),
    ordered — every (doc, query) pair where the doc contains all the
    query's distinct tokens."""
    spark = docs.sparkSession
    rows = _query_terms(queries)
    if not rows:
        return spark.createDataFrame([], "doc_id long, query_id int")
    qdf = spark.createDataFrame(rows, "query_id int, term string, n_terms int")
    doc_terms = docs.select(
        "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
    )
    return (
        doc_terms.join(F.broadcast(qdf), "term")
        .groupBy("doc_id", "query_id", "n_terms")
        .agg(F.count("*").alias("n_hit"))
        .where(F.col("n_hit") == F.col("n_terms"))
        .select("doc_id", "query_id")
        .orderBy("doc_id", "query_id")
    )


def percolate_sql(toks_cte: str, queries: Dict[int, str]) -> str:
    rows = _query_terms(queries)
    if not rows:
        return "SELECT 1::BIGINT AS doc_id, 1 AS query_id WHERE false"
    qvals = ", ".join(f"({qid}, '{t}', {n})" for qid, t, n in rows)
    return (
        f"WITH {toks_cte}, "
        f"qt(query_id, term, n_terms) AS (VALUES {qvals}), "
        "dterms AS (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM docs) "
        "SELECT doc_id, query_id FROM dterms JOIN qt USING (term) "
        "GROUP BY doc_id, query_id, n_terms HAVING count(*) = n_terms "
        "ORDER BY doc_id, query_id"
    )


# ---------------------------------------------------------------------------
# phrase percolation (stored queries with quoted phrases)
# ---------------------------------------------------------------------------

import re as _re

_PHRASE_RE = _re.compile(r'"([^"]*)"')


def _parse_percolate_query(q: str) -> Tuple[List[str], List[List[str]]]:
    """-> (plain_tokens, [phrase_token_lists]) — quoted spans become
    adjacency-verified phrases; the rest are MUST terms."""
    phrases = []
    for m in _PHRASE_RE.findall(q):
        toks = tokenize(m)
        if toks:
            phrases.append(toks)
    rest = _PHRASE_RE.sub(" ", q)
    return sorted(set(tokenize(rest))), phrases


def percolate_phrase(docs: DataFrame, queries: Dict[int, str]) -> DataFrame:
    """docs(doc_id, tokens) x stored queries with optional quoted
    phrases -> (doc_id, query_id): the ES percolator over phrase
    queries — a doc matches iff it contains every plain token AND
    every quoted phrase as ADJACENT tokens (match_phrase semantics).

    Two stages, the percolator discipline preserved: stage 1 is the
    existing all-terms conjunction over plain + phrase tokens (a
    NECESSARY condition — the term-keyed broadcast join remains the
    only corpus-scale work); stage 2 verifies each phrase-carrying
    query's candidates with a per-phrase adjacency predicate over the
    tokens column (element_at, 1-based on both engines) — candidates
    only, bounded by stage 1."""
    spark = docs.sparkSession
    parsed = {int(qid): _parse_percolate_query(q) for qid, q in queries.items()}
    flat = {
        qid: " ".join(plain + [t for ph in phrases for t in ph])
        for qid, (plain, phrases) in parsed.items()
    }
    cand = percolate(docs, flat)
    no_phrase = [qid for qid, (_, ph) in parsed.items() if not ph]
    out = cand.where(F.col("query_id").isin(no_phrase)) if no_phrase else None
    with_tokens = None
    for qid, (_, phrases) in sorted(parsed.items()):
        if not phrases:
            continue
        if with_tokens is None:
            with_tokens = cand.join(docs.select("doc_id", "tokens"), "doc_id")
        rows = with_tokens.where(F.col("query_id") == qid)
        for ph in phrases:
            m = len(ph)
            conds = " AND ".join(
                f"element_at(tokens, CAST(i + {j} AS INT)) = '{t}'"
                for j, t in enumerate(ph)
            )
            pred = (
                f"size(tokens) >= {m} AND "
                f"exists(sequence(1, size(tokens) - {m} + 1), i -> {conds})"
            )
            rows = rows.where(F.expr(pred))
        rows = rows.select("doc_id", "query_id")
        out = rows if out is None else out.unionByName(rows)
    if out is None:
        return spark.createDataFrame([], "doc_id long, query_id int")
    return out.orderBy("doc_id", "query_id")


def percolate_phrase_sql(toks_cte: str, queries: Dict[int, str]) -> str:
    """DuckDB mirror of percolate_phrase: the percolate chain for the
    flattened token sets + per-query phrase predicates unioned."""
    parsed = {int(qid): _parse_percolate_query(q) for qid, q in queries.items()}
    flat = {
        qid: " ".join(plain + [t for ph in phrases for t in ph])
        for qid, (plain, phrases) in parsed.items()
    }
    base = percolate_sql(toks_cte, flat)
    selects = []
    for qid, (_, phrases) in sorted(parsed.items()):
        if not phrases:
            selects.append(
                f"SELECT doc_id, query_id FROM cand WHERE query_id = {qid}"
            )
            continue
        preds = []
        for ph in phrases:
            m = len(ph)
            conds = " AND ".join(
                f"toks[CAST(i + {j} AS INT)] = '{t}'" for j, t in enumerate(ph)
            )
            preds.append(
                f"len(toks) >= {m} AND len(list_filter("
                f"generate_series(1, len(toks) - {m} + 1), i -> {conds})) > 0"
            )
        allp = " AND ".join(preds)
        selects.append(
            f"SELECT c.doc_id, c.query_id FROM cand c "
            f"JOIN docs ON docs.doc_id = c.doc_id "
            f"WHERE c.query_id = {qid} AND {allp}"
        )
    return (
        f"WITH {toks_cte}, cand0 AS ({_strip_with(base)}), "
        "cand AS (SELECT * FROM cand0) "
        + " UNION ALL ".join(selects)
        + " ORDER BY doc_id, query_id"
    )


def _strip_with(sql: str) -> str:
    """Rewrap a full percolate_sql statement as a subquery (it begins
    WITH its own CTE chain — legal as a parenthesized subquery source
    in DuckDB)."""
    return f"SELECT * FROM ({sql})"
