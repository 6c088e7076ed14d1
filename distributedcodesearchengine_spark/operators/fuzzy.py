"""Fuzzy queries: ``term~`` / ``term~1`` / ``term~2`` (Lucene edit-
distance expansion), completing the classic query-type set alongside
phrase, NEAR, prefix and boolean (all absent from the bag-of-words
reference, ``codesearch/storage/bm25_index.py:117-170``).

Semantics (deterministic, engine-portable):

* ``clause~d`` expands to the top-``max_expansions`` dictionary terms
  within Levenshtein distance d of the (lowercased) clause, ranked
  (dist asc, df desc, term asc) — the exact match, when present, ranks
  first at dist 0;
* expanded terms score qtf = 1 as an OR bag (shared tail with the
  wildcard operator — clause weights sum);
* an empty expansion follows the engine's unknown-token zero-backfill
  convention, like wildcard.

Scale shape: for d = 1 candidates come from SymSpell deletion keys —
an equality probe against the (deletion-key, term) relation (the same
precomputable sorted artifact operators/snippets.spell_suggest_symspell
uses), verified with exact levenshtein; never a dictionary-wide edit-
distance scan. d = 2 falls back to the levenshtein dictionary scan
(the documented baseline — at 10^9-term vocabularies precompute
2-deletion keys the same way). The expansion collects <= M rows; the
scoring plan is then exactly the plain scorer's.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from pyspark.sql import functions as F
from pyspark.sql import DataFrame

from ..oracle.tokenizer import tokenize
from .wildcard import (
    DEFAULT_MAX_EXPANSIONS,
    expanded_bm25_sql,
    expanded_or_topk,
    plain_qtf_parts,
)

_FUZZY_RE = re.compile(r"^(?P<body>[A-Za-z0-9]+)~(?P<d>[12]?)$")


def parse_fuzzy_query(query: str) -> Tuple[List[str], List[Tuple[str, int]]]:
    """query -> (plain_tokens, [(word, max_dist)]). ``word~`` defaults
    to distance 1; the word must normalize to one dictionary-shaped
    token or the clause tokenizes as plain text."""
    plain: List[str] = []
    fuzz: List[Tuple[str, int]] = []
    for clause in query.split():
        m = _FUZZY_RE.match(clause)
        if m:
            toks = tokenize(m.group("body"))
            if len(toks) == 1:
                fuzz.append((toks[0], int(m.group("d") or 1)))
                continue
        plain.extend(tokenize(clause))
    return plain, fuzz


def is_fuzzy_query(query: str) -> bool:
    return bool(parse_fuzzy_query(query)[1])


def expand_fuzzy(
    index, word: str, max_dist: int = 1,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> List[tuple]:
    """[(term, idf)] — dictionary terms within ``max_dist`` of
    ``word``, ranked (dist asc, df desc, term asc), capped.

    d=1: SymSpell deletion-key candidate probe + exact levenshtein
    verify (candidate set, not the dictionary). d=2: levenshtein scan
    baseline."""
    if max_dist <= 1:
        keyed = index.terms.select(
            "term", "df", "idf",
            F.explode(
                F.array_union(
                    F.array(F.col("term")),
                    F.expr(
                        "transform(sequence(1, length(term)), "
                        "i -> concat(substring(term, 1, i - 1), substring(term, i + 1)))"
                    ),
                )
            ).alias("key"),
        )
        qkeys = [word] + [word[:i] + word[i + 1:] for i in range(len(word))]
        cand = keyed.where(F.col("key").isin(qkeys)).select(
            "term", "df", "idf"
        ).distinct()
    else:
        cand = index.terms.select("term", "df", "idf")
    d = F.levenshtein(F.col("term"), F.lit(word))
    rows = (
        cand.withColumn("dist", d)
        .where(F.col("dist") <= int(max_dist))
        .orderBy("dist", F.desc("df"), F.asc("term"))
        .limit(int(max_expansions))
        .select("term", "idf")
        .collect()
    )
    return [(r["term"], float(r["idf"])) for r in rows]


def bm25_fuzzy_topk(
    index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """Fuzzy-expanded BM25 top-k -> (rank, doc_id, url, score)."""
    spark = index.spark
    plain, fuzz = parse_fuzzy_query(query)
    if not plain and not fuzz:
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    expansions = [
        expand_fuzzy(index, wd, dist, max_expansions) for wd, dist in fuzz
    ]
    return expanded_or_topk(index, plain, expansions, k, filters)


def bm25_fuzzy_sql(
    query: str, k: int = 10, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> str:
    """Mirror of bm25_fuzzy_topk: the expansion subquery ranks by the
    same (levenshtein asc, df desc, term asc) cut. The oracle uses the
    direct levenshtein form for BOTH distances — the Spark d=1
    deletion-key candidate set is exactly the distance<=1 term set
    (SymSpell completeness), so the cut is identical."""
    plain, fuzz = parse_fuzzy_query(query)
    if not plain and not fuzz:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    parts = plain_qtf_parts(plain)
    for wd, dist in fuzz:
        esc = wd.replace("'", "''")
        parts.append(
            "SELECT term, 1.0 AS qtf FROM (SELECT term FROM idf "
            f"WHERE levenshtein(term, '{esc}') <= {int(dist)} "
            f"ORDER BY levenshtein(term, '{esc}') ASC, df DESC, term ASC "
            f"LIMIT {int(max_expansions)})"
        )
    return expanded_bm25_sql(parts, k)
