"""Query-time synonym expansion — the analyzer-level synonym filter of
Lucene/Elasticsearch (public semantics: synonyms inject at the same
position as the source token, so they score with the source token's
QUERY multiplicity, unlike the qtf=1 dictionary expansions of the
wildcard/fuzzy operators).

Given a synonym table {token: [synonyms...]}, each query token t with
multiplicity m contributes qtf m for itself AND qtf m for every synonym
(normalized through the house tokenizer); a synonym colliding with
another query token accumulates. Unknown terms drop at the idf lookup
(J5 inner-join semantics). Scoring then runs the engine's standard
A3/F4/T1 chain — one term-pruned broadcast join, no new shuffle shape.

The synonym table is a driver-side constant (in production a small
broadcast artifact curated from the PMI collocation table or an
external thesaurus), so the DuckDB oracle receives the SAME expanded
(term, qtf) rows and the whole operator reduces to the proven expanded
scoring chain.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional

from pyspark.sql import DataFrame

from ..oracle.tokenizer import tokenize


def expand_query(query: str, synonyms: Dict[str, List[str]]) -> Counter:
    """Query string -> expanded {term: qtf} under the synonym table."""
    qtf: Counter = Counter(tokenize(query))
    for t, m in list(qtf.items()):
        for s in synonyms.get(t, []):
            for st in tokenize(s):
                if st != t:
                    qtf[st] += m
    return qtf


def bm25_synonyms_topk(
    index,
    query: str,
    synonyms: Dict[str, List[str]],
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """BM25 top-k under query-time synonym expansion ->
    (rank, doc_id, url, score)."""
    from pyspark.sql import functions as F

    from .scorer import finalize_topk, score_matched

    spark = index.spark
    qtf = expand_query(query, synonyms)
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


def bm25_synonyms_sql(
    query: str, synonyms: Dict[str, List[str]], k: int = 10
) -> str:
    """DuckDB mirror: the same driver-side expansion feeds the shared
    expanded scoring chain (operators/wildcard.expanded_bm25_sql)."""
    from .wildcard import expanded_bm25_sql

    qtf = expand_query(query, synonyms)
    if not qtf:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    qvals = ", ".join(f"('{t}', {float(m)})" for t, m in sorted(qtf.items()))
    part = f"SELECT term, qtf FROM (VALUES {qvals}) AS q(term, qtf)"
    return expanded_bm25_sql([part], k=k)


# ---------------------------------------------------------------------------
# multi-word synonym sources (the synonym_graph query-side capability)
# ---------------------------------------------------------------------------


def expand_query_graph(
    query: str, synonyms: Dict[str, List[str]]
) -> Counter:
    """Query string -> expanded {term: qtf} where synonym-table KEYS
    may be multi-word phrases ("world wide": ["www"]) — the ES
    synonym_graph query-side capability the single-token table cannot
    express: a phrase key fires only when its tokens appear ADJACENT
    in the query, detected by a leftmost non-overlapping scan over the
    tokenized query (the BPE merge-apply convention). Matched-phrase
    occurrences inject every synonym at the occurrence multiplicity;
    single-word keys behave exactly as expand_query. Multi-word
    EXPANSIONS score as bags (the ES 'synonym' filter's sausage
    semantics — documented; the phrase-verified variant is the
    span/phrase doc_filter composition)."""
    toks = tokenize(query)
    qtf: Counter = Counter(toks)
    # leftmost non-overlapping phrase-key scan, longest key first at
    # equal start (deterministic)
    phrase_keys = sorted(
        (tuple(tokenize(kk)) for kk in synonyms if len(tokenize(kk)) >= 2),
        key=lambda p: (-len(p), p),
    )
    key_of = {tuple(tokenize(kk)): kk for kk in synonyms}
    i = 0
    while i < len(toks):
        hit = None
        for p in phrase_keys:
            if tuple(toks[i : i + len(p)]) == p:
                hit = p
                break
        if hit is None:
            i += 1
            continue
        for s in synonyms[key_of[hit]]:
            for st in tokenize(s):
                qtf[st] += 1
        i += len(hit)
    # single-word keys, the expand_query rule (over the ORIGINAL
    # multiplicities, not the injected ones)
    base = Counter(toks)
    for t, m in base.items():
        for s in synonyms.get(t, []):
            for st in tokenize(s):
                if st != t:
                    qtf[st] += m
    return qtf


def bm25_synonyms_graph_topk(
    index,
    query: str,
    synonyms: Dict[str, List[str]],
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """BM25 top-k under graph synonym expansion (multi-word sources)
    -> (rank, doc_id, url, score); the scoring chain is unchanged —
    only the expansion differs."""
    from pyspark.sql import functions as F

    from .scorer import finalize_topk, score_matched

    spark = index.spark
    qtf = expand_query_graph(query, synonyms)
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


def bm25_synonyms_graph_sql(
    query: str, synonyms: Dict[str, List[str]], k: int = 10
) -> str:
    """DuckDB mirror: the identical driver-side graph expansion feeds
    the shared expanded chain."""
    from .wildcard import expanded_bm25_sql

    qtf = expand_query_graph(query, synonyms)
    if not qtf:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    qvals = ", ".join(f"('{t}', {float(m)})" for t, m in sorted(qtf.items()))
    part = f"SELECT term, qtf FROM (VALUES {qvals}) AS q(term, qtf)"
    return expanded_bm25_sql([part], k=k)
