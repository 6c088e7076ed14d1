"""Boolean query operators: ``+required`` / ``-excluded`` clauses.

The reference engine is a pure bag-of-words ranker — every query term
is optional and only contributes score (``codesearch/storage/
bm25_index.py:117-170``); there is no MUST / MUST_NOT surface anywhere.
This module adds the other classic full-text query type (Lucene's
``+term`` / ``-term`` occur flags) as a from-scratch Spark-native
extension, composed from the existing scorer stages.

Semantics (deterministic, engine-portable):

* a ``+clause`` tokenizes through the standard tokenizer and the doc
  must contain ALL of the clause's tokens (a camelCase clause expands
  to several required tokens);
* a ``-clause`` excludes docs containing ANY of its tokens;
* plain clauses score as usual; required tokens are ALSO scored
  (Lucene's MUST scores too — only MUST_NOT is score-free);
* the boolean constraints define the MATCH SET, so the relative
  threshold (F4's 1% of max) is computed over the CONSTRAINED scored
  set — unlike the quoted-phrase predicate, which the engine applies
  post-threshold at the F5 metadata-filter stage to preserve the
  reference's unquoted ranking. A boolean query is a different query,
  not a filtered view of its positive part;
* a required token absent from the vocabulary matches nothing -> empty
  result (never a silent drop of the constraint);
* a pure-exclusion query (no positive tokens) falls into the
  degenerate all-zero regime over the constrained universe: the k
  lowest-doc_id surviving docs at score 0, mirroring the reference's
  keep-everything branch.

Scale shape: each constraint is derived from the CONSTRAINT TERMS'
postings only — a term-pruned (pushdown-eligible) scan, one hash agg
for the all-of count, then doc_id semi/anti joins against the scored
candidates. The corpus is never scanned corpus-wide for a boolean
query; candidate volume is bounded by the posting lists of the query's
terms, exactly like scoring itself. At 10^12 docs the dominant cost is
the same broadcast-join + per-doc agg the plain scorer pays.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.tokenizer import tokenize


def parse_boolean_query(query: str) -> Tuple[List[str], List[str], List[str]]:
    """query -> (positive_tokens, required_tokens, excluded_tokens).

    Clauses split on whitespace; ``+``/``-`` prefixes mark occur flags,
    everything else is optional. Tokens come from the standard
    tokenizer, so flags compose with camelCase/punctuation exactly like
    plain search text. positive = plain + required (both score).
    """
    plain: List[str] = []
    required: List[str] = []
    excluded: List[str] = []
    for clause in query.split():
        if clause.startswith("+") and len(clause) > 1:
            required.extend(tokenize(clause[1:]))
        elif clause.startswith("-") and len(clause) > 1:
            excluded.extend(tokenize(clause[1:]))
        else:
            plain.extend(tokenize(clause))
    return plain + required, required, excluded


def is_boolean_query(query: str) -> bool:
    """True when any clause carries an occur flag that yields tokens."""
    for clause in query.split():
        if clause[:1] in "+-" and len(clause) > 1 and tokenize(clause[1:]):
            return True
    return False


def required_doc_set(index, required: List[str]) -> Optional[DataFrame]:
    """(doc_id) of docs containing ALL required tokens.

    One term-pruned postings scan + one count agg: tf is unique per
    (term, doc_id), so a doc holding ``n_uniq`` rows over the required
    subset holds every required term. An out-of-vocabulary required
    term can reach count == n_uniq for no doc -> empty set, the correct
    nothing-matches semantics.
    """
    uniq = sorted(set(required))
    if not uniq:
        return None
    return (
        index.tf.where(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_nreq"))
        .where(F.col("_nreq") == len(uniq))
        .select("doc_id")
    )


def excluded_doc_set(index, excluded: List[str]) -> Optional[DataFrame]:
    """(doc_id) of docs containing ANY excluded token (anti-join side;
    duplicates are harmless to left_anti, so no distinct)."""
    uniq = sorted(set(excluded))
    if not uniq:
        return None
    return index.tf.where(F.col("term").isin(uniq)).select("doc_id")


def msm_doc_set(index, terms: List[str], msm: int) -> Optional[DataFrame]:
    """(doc_id) of docs containing at least ``msm`` DISTINCT terms of
    ``terms`` — the minimum_should_match match set. Same one-scan shape
    as required_doc_set (tf is unique per (term, doc_id), so count(*)
    over the term subset counts distinct present terms); msm beyond the
    distinct-term count matches nothing, msm <= 1 is no constraint
    (returns None so the caller skips the join entirely)."""
    uniq = sorted(set(terms))
    if not uniq or int(msm) <= 1:
        return None
    return (
        index.tf.where(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_nm"))
        .where(F.col("_nm") >= int(msm))
        .select("doc_id")
    )


def bm25_topk_msm(
    index,
    query: str,
    k: int = 10,
    msm: int = 1,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """BM25 top-k under ``minimum_should_match`` (the Lucene/ES knob:
    a doc matches only if it contains at least ``msm`` of the query's
    distinct terms) -> (rank, doc_id, url, score).

    Like the boolean occur flags — and unlike the post-threshold
    phrase/metadata filters — msm defines the MATCH SET itself, so it
    lands at the candidate_semi (pre-threshold) stage: the 1%-of-max
    threshold and the degenerate backfill universe are both taken over
    the constrained set (a doc with 1 of 3 terms is not a match at
    msm=2, so it must not anchor the threshold either). msm=1 is
    exactly bm25_topk (every scored doc has >= 1 term — tested
    identical); msm > the distinct-term count matches nothing. An OOV
    query term can never be present in a doc, so it counts toward the
    requirement but never toward a doc's tally — ES's clause-counting
    semantics."""
    from ..oracle.tokenizer import tokenize as _tok
    from .scorer import finalize_topk, query_term_weights, score_matched

    spark = index.spark
    toks = _tok(query)
    if not toks:
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    semi = msm_doc_set(index, toks, msm)
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, candidate_semi=semi)


def terms_set_required_col(doc_id_col):
    """Per-doc required-match count for ``bm25_topk_terms_set`` — the
    ES ``minimum_should_match_field`` value. The corpus carries no such
    column, so both engines derive it deterministically from doc_id
    (the geo/PII augmentation precedent): required = doc_id % 3 + 1,
    all-integer, in {1, 2, 3} so every regime (loose, mid, strict) is
    populated. On a real corpus with a materialized required_matches
    column this expression is replaced by the column reference — the
    plan shape is unchanged."""
    return F.pmod(doc_id_col, F.lit(3)) + F.lit(1)


def terms_set_doc_set(index, terms: List[str]) -> Optional[DataFrame]:
    """(doc_id) of docs whose distinct-present count of ``terms``
    reaches the doc's OWN required count — the ES ``terms_set`` match
    set. Same one-scan groupBy shape as msm_doc_set; the per-doc
    requirement is an expression over the group key, so no extra join
    exists. A doc containing none of the terms never appears in the
    scan and never matches — ES semantics (required >= 1 always)."""
    uniq = sorted(set(terms))
    if not uniq:
        return None
    return (
        index.tf.where(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_nm"))
        .where(F.col("_nm") >= terms_set_required_col(F.col("doc_id")))
        .select("doc_id")
    )


def bm25_topk_terms_set(
    index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """BM25 top-k under the ES ``terms_set`` query: a doc matches only
    if it contains at least its PER-DOC required number of the query's
    distinct terms (minimum_should_match_field semantics — here the
    deterministic doc_id % 3 + 1 derivation, see
    ``terms_set_required_col``) -> (rank, doc_id, url, score).

    Like msm and the boolean occur flags, the per-doc requirement
    defines the MATCH SET itself, so it lands pre-threshold: the
    1%-of-max threshold and the degenerate backfill universe are both
    taken over the constrained set. With every requirement >= 1, a doc
    containing no query term is never a match — so unlike msm=1 there
    is no unconstrained regime. OOV query terms count toward the
    requirement but never toward a doc's tally (clause counting)."""
    from ..oracle.tokenizer import tokenize as _tok
    from .scorer import finalize_topk, query_term_weights, score_matched

    spark = index.spark
    toks = _tok(query)
    if not toks:
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    semi = terms_set_doc_set(index, toks)
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, candidate_semi=semi)


def bm25_boolean_topk(
    index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """BM25 top-k under ``+``/``-`` occur flags ->
    (rank, doc_id, url, score)."""
    from .scorer import finalize_topk, query_term_weights, score_matched

    spark = index.spark
    positive, required, excluded = parse_boolean_query(query)
    if not positive and not excluded:
        # nothing to match or constrain (empty-query guard, F7)
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    semi = required_doc_set(index, required)
    anti = excluded_doc_set(index, excluded)
    # tokenize() is idempotent on its own output, so re-joining the
    # token list reuses the pruned idf lookup unchanged
    qweights = query_term_weights(index, " ".join(positive)) if positive else []
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(
        index, scored, k, filters, candidate_semi=semi, candidate_anti=anti
    )
