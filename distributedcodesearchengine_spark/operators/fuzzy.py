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

Scale shape: candidates come from the PRECOMPUTED SymSpell deletion-
key relation (``deletion_key_relation`` — key-prefix-partitioned,
built once per index: a build stage beside the term dictionary for
persisted indexes, a cached lazy relation otherwise), point-probed by
the query word's own deletion keys and verified with exact
levenshtein — never a per-query dictionary-wide explode or edit-
distance scan. d = 2 probes the same relation's two-deletion keys
(SymSpell completeness: lev(a,b) <= d implies a shared key after <= d
deletions on each side). The expansion collects <= M rows; the
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


FUZZY_KEY_DEPTH = 2

# one-deletion keys of a term, as a SQL array expression (tokenizer
# terms are always length >= 2, so the sequences below never descend)
_D1_EXPR = (
    "transform(sequence(1, length(term)), "
    "i -> concat(substring(term, 1, i - 1), substring(term, i + 1)))"
)
# two-deletion keys: delete positions i < j
_D2_EXPR = (
    "flatten(transform(sequence(1, length(term) - 1), "
    "i -> transform(sequence(i + 1, length(term)), "
    "j -> concat(substring(term, 1, i - 1), "
    "substring(term, i + 1, j - i - 1), substring(term, j + 1)))))"
)


def deletion_key_relation(terms: DataFrame, depth: int = FUZZY_KEY_DEPTH) -> DataFrame:
    """terms(term, df, idf) -> (key, key_pfx, term, df, idf): the
    SymSpell deletion-key dictionary, one row per distinct deletion key
    per term (depth 1: the term + every single deletion; depth 2 adds
    every two-deletion). ``key_pfx`` (leading char; '' for the empty
    key) is the partition column when persisted, so a query probe
    prunes to a handful of partition directories.

    This is a BUILD-TIME artifact (~(1 + L + L(L-1)/2) slim rows per
    term at depth 2): computed once beside the term dictionary, never
    per query — the per-query cost is a point probe with |deletions(q)|
    keys."""
    keys = F.array_union(F.array(F.col("term")), F.expr(_D1_EXPR))
    if depth >= 2:
        keys = F.array_union(keys, F.expr(_D2_EXPR))
    return terms.select(
        "term", "df", "idf", F.explode(F.array_distinct(keys)).alias("key")
    ).withColumn(
        # '~' sentinel for the empty key (2-char terms fully deleted at
        # depth 2): an empty partition value would round-trip as the
        # Hive default partition (null) and break the probe
        "key_pfx",
        F.when(F.length("key") == 0, F.lit("~")).otherwise(
            F.substring("key", 1, 1)
        ),
    )


def _deletions_py(word: str, depth: int) -> List[str]:
    """All distinct strings reachable from ``word`` by <= depth
    character deletions (including word itself) — the query-side probe
    keys, computed driver-side (a query word is a few chars)."""
    out = {word}
    frontier = {word}
    for _ in range(depth):
        frontier = {
            w[:i] + w[i + 1:] for w in frontier for i in range(len(w))
        }
        out |= frontier
    return sorted(out)


def get_fuzzy_keys(index, depth: int = FUZZY_KEY_DEPTH) -> DataFrame:
    """The index's deletion-key relation: the persisted ``fuzzy_keys``
    build stage when present (load_index attaches it), else built
    lazily ONCE from the term dictionary and cached on the handle —
    either way, queries only ever point-probe it."""
    cached = index.extras.get("fuzzy_keys")
    if cached is None:
        cached = deletion_key_relation(index.terms, depth=depth).persist()
        index.extras["fuzzy_keys"] = cached
    return cached


def expand_fuzzy(
    index, word: str, max_dist: int = 1,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> List[tuple]:
    """[(term, idf)] — dictionary terms within ``max_dist`` of
    ``word``, ranked (dist asc, df desc, term asc), capped.

    SymSpell deletion-key point probe (both distances) + exact
    levenshtein verify on the candidate set — the dictionary itself is
    never scanned or exploded at query time."""
    if int(max_dist) > FUZZY_KEY_DEPTH:
        # the deletion-key relation is complete only to its build depth;
        # probing it for a larger distance would return an arbitrary
        # partial candidate set — refuse rather than silently under-match
        # (the query surface caps at ~2 via _FUZZY_RE already)
        raise ValueError(
            f"max_dist {max_dist} exceeds the deletion-key depth "
            f"{FUZZY_KEY_DEPTH}; fuzzy matching supports distances <= "
            f"{FUZZY_KEY_DEPTH}"
        )
    keyed = get_fuzzy_keys(index)
    qkeys = _deletions_py(word, min(int(max_dist), FUZZY_KEY_DEPTH))
    pfxs = sorted({k[:1] if k else "~" for k in qkeys})
    cand = (
        keyed
        # key_pfx first: prunes partitions of the persisted relation
        .where(F.col("key_pfx").isin(pfxs) & F.col("key").isin(qkeys))
        .select("term", "df", "idf")
        .distinct()
    )
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
