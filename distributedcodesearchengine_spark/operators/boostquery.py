"""Query-time term boosts — Lucene's clause-boost syntax ``term^2.5``:
a boosted clause multiplies its terms' score contributions by the boost
factor (the bag-of-words reference has no boost surface,
``codesearch/storage/bm25_index.py:117-170``).

Semantics (deterministic, engine-portable):

* a clause ``body^w`` (alnum body, positive decimal ``w``) tokenizes
  through the standard tokenizer and contributes weight ``w`` per
  occurrence for each of its tokens (a camelCase body expands to
  several boosted tokens — the clause is boosted, exactly Lucene);
* plain clauses contribute weight 1 per occurrence; a term reached by
  several clauses accumulates (clause weights sum);
* the BM25 chain is unchanged: the engine's qtf is already a double
  multiplier (J5), so a boosted query IS the plain query with scaled
  qtf — threshold, degenerate backfill and tie-break all compose
  identically, and ``term^1`` is bit-identical to ``term`` (tested).

Scale shape: pure query-rewrite — the scoring plan is exactly the
plain scorer's (term-pruned scan, broadcast query side, one per-doc
agg); nothing new moves.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Optional

from pyspark.sql import DataFrame

from ..oracle.tokenizer import tokenize

_BOOST_RE = re.compile(r"^(?P<body>[A-Za-z0-9]+)\^(?P<w>\d+(?:\.\d+)?)$")


def parse_boosted_query(query: str) -> Counter:
    """query -> {term: weight} with clause boosts applied (weight
    accumulates across clauses; plain clauses weigh 1 per occurrence)."""
    qtf: Counter = Counter()
    for clause in query.split():
        m = _BOOST_RE.match(clause)
        if m:
            w = float(m.group("w"))
            for t in tokenize(m.group("body")):
                qtf[t] += w
        else:
            for t in tokenize(clause):
                qtf[t] += 1.0
    return qtf


def is_boosted_query(query: str) -> bool:
    """True when any clause carries a boost that yields tokens."""
    for clause in query.split():
        m = _BOOST_RE.match(clause)
        if m and tokenize(m.group("body")):
            return True
    return False


def bm25_boosted_topk(
    index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Boost-weighted BM25 top-k -> (rank, doc_id, url, score)."""
    from pyspark.sql import functions as F

    from .scorer import finalize_topk, score_matched

    spark = index.spark
    qtf = parse_boosted_query(query)
    if not qtf:
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    uniq = sorted(qtf)
    idf_rows = (
        index.terms.where(F.col("term").isin(uniq)).select("term", "idf").collect()
    )
    idf = {r["term"]: float(r["idf"]) for r in idf_rows}
    qweights = [(t, float(qtf[t]), idf[t]) for t in uniq if t in idf]
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters)


def bm25_boosted_sql(query: str, k: int = 10) -> str:
    """DuckDB mirror: the boosted (term, qtf) rows feed the shared
    expanded scoring chain (operators/wildcard.expanded_bm25_sql), like
    the synonym expansion does."""
    from .wildcard import expanded_bm25_sql

    qtf = parse_boosted_query(query)
    if not qtf:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    qvals = ", ".join(f"('{t}', {float(w)})" for t, w in sorted(qtf.items()))
    part = f"SELECT term, qtf FROM (VALUES {qvals}) AS q(term, qtf)"
    return expanded_bm25_sql([part], k=k)


# ---------------------------------------------------------------------------
# excluded ids (the ES 8.16 rule-retriever 'exclude' action)
# ---------------------------------------------------------------------------


def bm25_topk_exclude(
    index, query: str, exclude_ids, k: int = 10
) -> DataFrame:
    """(rank, doc_id, score) — the rule retriever's ``exclude``
    action, the curated inverse of ``pinned``: the standard BM25
    ranking with the listed ids REMOVED post-threshold (a view of the
    unfiltered ranking — the excluded docs still anchor the 1%-of-max
    cut, exactly like a metadata filter; ES's pinned+excluded rule
    pair shares this contract). The id list is a query-side literal
    predicate — no join exists; ranks renumber over the survivors."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..functions.rounding import round6
    from ..oracle.tokenizer import tokenize
    from .explore import _kept_with_cols

    spark = index.spark
    ids = sorted({int(d) for d in exclude_ids})
    if not tokenize(query):
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    kept = _kept_with_cols(index, query, [])
    surv = kept.where(~F.col("doc_id").isin(ids)) if ids else kept
    top = surv.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(k))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", round6("score").alias("score")
    )


def bm25_topk_exclude_sql(query: str, exclude_ids, k: int = 10) -> str:
    """Mirror: shared kept chain + NOT IN + the standard cut."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql
    from ..oracle.tokenizer import tokenize

    if not tokenize(query):
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    ids = sorted({int(d) for d in exclude_ids})
    chain = kept_cte_sql(query)
    pred = f"WHERE doc_id NOT IN ({', '.join(map(str, ids))}) " if ids else ""
    return (
        f"{chain} "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept {pred}ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )
