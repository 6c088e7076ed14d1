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
