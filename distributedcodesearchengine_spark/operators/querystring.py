"""The Lucene/ES ``query_string`` mini-language — ONE query surface
that composes every house query primitive, compiled onto the engine's
existing normal forms (never a new scoring path):

``+term -term "quoted phrase" pre* word~1 term^2.5 lang:en``

Clause grammar (deterministic, engine-portable; a strict subset of
Lucene's QueryParser / ES ``simple_query_string``):

* bare clause — tokenizes through the standard analyzer and scores
  as the usual OR bag (multiplicity = qtf), exactly ``bm25_topk``;
* ``clause^boost`` — the clause's tokens score with qtf multiplied
  by ``boost`` (the Lucene ``^`` operator; composes with ``+`` and
  quotes);
* ``+clause`` — MUST: the doc must contain ALL of the clause's
  tokens; the tokens ALSO score (Lucene MUST scores, only MUST_NOT
  is score-free). PRE-threshold, identical to ``bm25_boolean_topk``;
* ``-clause`` — MUST_NOT: excludes docs containing ANY of the
  clause's tokens; never scores. PRE-threshold;
* ``"quoted phrase"`` — the phrase's tokens score bag-of-words and
  the exact-adjacency predicate applies POST-threshold, identical to
  ``bm25_phrase_topk`` (so a quoted clause ranks like its unquoted
  form minus non-phrase docs). ``+"phrase"`` is accepted and
  equivalent (the predicate is already a requirement); ``-"phrase"``
  is rejected (ValueError — the engine has no post-threshold anti
  stage, and silently demoting it to term exclusion would change
  semantics);
* ``pre*`` — prefix clause: expands against the term dictionary
  exactly like ``bm25_wildcard_topk`` (capped, (df desc, term asc),
  qtf 1 per expanded term). Occur flags on expansion clauses are
  rejected — an expansion is an OR bag, `must contain some
  expansion` is a different query (use the plain form);
* ``word~`` / ``word~1`` / ``word~2`` — fuzzy clause: SymSpell
  deletion-key expansion exactly like ``bm25_fuzzy_topk`` (``~``
  defaults to distance 1, the house fuzzy contract). Same
  no-occur-flag rule as prefixes;
* ``lang:x`` / ``site:x`` / ``source:x`` — metadata equality filter,
  applied at the F5 post-threshold stage exactly like the ``filters``
  argument. Any other ``a:b`` clause is NOT a field query — it
  tokenizes as plain text (web text is full of URLs and paths; an
  unknown-field error would make them unsearchable).

Unbalanced quotes are not an error: a lone ``"`` sticks to its
whitespace-delimited clause and the analyzer strips it.

Semantics are therefore EXACTLY the composition of the existing
operators: the relative threshold (F4) runs over the MUST/MUST_NOT-
constrained match set (boolean contract), the phrase predicate and
metadata filters apply post-threshold (phrase contract), expansions
accumulate into the same qtf bag (wildcard/fuzzy contract), and the
degenerate all-non-positive regime zero-backfills the constrained
universe. Identity tests pin each reduction: a plain query_string ==
bm25_topk, occur-flags-only == bm25_boolean_topk, one-prefix-only ==
bm25_wildcard_topk, one-quoted-clause-only == bm25_phrase_topk.

Reference parity: the reference engine is a pure bag-of-words ranker
(``codesearch/storage/bm25_index.py:117-170``) with no query language;
this is the classic front-door a Lucene-class engine ships, added
Spark-first from the house primitives.

Scale shape: parsing is driver-side over a <1 KB string; every
compiled stage is the term-pruned / capped / doc_id-set shape its
donor operator already proved at the 10^12-doc plan audit — the
corpus is never scanned corpus-wide for any clause type.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame

from ..oracle.tokenizer import tokenize
from .boolquery import excluded_doc_set, required_doc_set
from .fuzzy import expand_fuzzy
from .wildcard import DEFAULT_MAX_EXPANSIONS, expand_prefix

FILTER_FIELDS = ("lang", "site", "source")

# one clause: optional occur flag, then a quoted body or a bare body,
# then an optional ^boost (quoted form; the bare form carries its
# boost inside the \S+ and is split below)
_CLAUSE_RE = re.compile(
    r'(?P<sign>[+\-]?)(?:"(?P<quoted>[^"]*)"(?:\^(?P<qboost>\d+(?:\.\d+)?))?'
    r"|(?P<bare>\S+))"
)
_BOOST_RE = re.compile(r"^(?P<body>.+?)\^(?P<boost>\d+(?:\.\d+)?)$")
_PREFIX_RE = re.compile(r"^[A-Za-z0-9]+\*$")
_FUZZY_RE = re.compile(r"^(?P<body>[A-Za-z0-9]+)~(?P<d>[12]?)$")
_FIELD_RE = re.compile(r"^(?P<f>[a-z]+):(?P<v>\S+)$")


@dataclass
class QueryStringPlan:
    """The compiled normal form both engines consume."""

    weighted: Dict[str, float] = field(default_factory=dict)  # term -> qtf
    prefixes: List[str] = field(default_factory=list)
    fuzzies: List[Tuple[str, int]] = field(default_factory=list)
    phrases: List[str] = field(default_factory=list)  # raw phrase text
    required: List[str] = field(default_factory=list)
    excluded: List[str] = field(default_factory=list)
    filters: Dict[str, str] = field(default_factory=dict)

    def is_empty(self) -> bool:
        """Nothing to match, constrain, or exclude (F7 guard). A
        filters-only query has no match clause and returns empty,
        matching the bm25_topk empty-query contract."""
        return not (
            self.weighted
            or self.prefixes
            or self.fuzzies
            or self.phrases
            or self.excluded
        )


def parse_query_string(query: str) -> QueryStringPlan:
    """query -> QueryStringPlan. Raises ValueError for the documented
    unsupported combinations (occur flag on an expansion/filter
    clause, ``-`` on a quoted phrase) — the F8 validation contract."""
    plan = QueryStringPlan()
    for m in _CLAUSE_RE.finditer(query or ""):
        sign = m.group("sign")
        if m.group("quoted") is not None:
            body = m.group("quoted")
            boost = float(m.group("qboost") or 1.0)
            toks = tokenize(body)
            if not toks:
                continue
            if sign == "-":
                raise ValueError(
                    'negated quoted phrases (-"...") are unsupported: '
                    "exclusion is a pre-threshold stage and the phrase "
                    "predicate is post-threshold"
                )
            if len(toks) >= 2:
                plan.phrases.append(body)
            for t in toks:
                plan.weighted[t] = plan.weighted.get(t, 0.0) + boost
            # '+' on a single-token quote is the boolean flag on that
            # term; on a multi-token phrase it adds nothing (the phrase
            # predicate is already a requirement) and MUST NOT add a
            # pre-threshold constraint, or +"a b" would rank differently
            # from "a b" (the documented equivalence)
            if sign == "+" and len(toks) == 1:
                plan.required.extend(toks)
            continue
        clause = m.group("bare")
        boost = 1.0
        bm = _BOOST_RE.match(clause)
        if bm is not None:
            try:
                boost = float(bm.group("boost"))
                clause = bm.group("body")
            except ValueError:  # pragma: no cover - regex guarantees float
                pass
        fm = _FIELD_RE.match(clause)
        if fm is not None and fm.group("f") in FILTER_FIELDS:
            if sign:
                raise ValueError(
                    f"occur flags on field filters ({sign}{clause}) are "
                    "unsupported: filters are post-threshold, flags are "
                    "pre-threshold"
                )
            plan.filters[fm.group("f")] = fm.group("v")
            continue
        if _PREFIX_RE.match(clause):
            if sign:
                raise ValueError(
                    f"occur flags on expansion clauses ({sign}{clause}) "
                    "are unsupported: an expansion is an OR bag"
                )
            plan.prefixes.append(clause[:-1].lower())
            continue
        zm = _FUZZY_RE.match(clause)
        if zm is not None:
            toks = tokenize(zm.group("body"))
            if len(toks) == 1:
                if sign:
                    raise ValueError(
                        f"occur flags on expansion clauses ({sign}{clause}) "
                        "are unsupported: an expansion is an OR bag"
                    )
                plan.fuzzies.append((toks[0], int(zm.group("d") or 1)))
                continue
            # multi-token body: falls through to plain text (the house
            # fuzzy contract — a fuzzy word is ONE dictionary-shaped token)
        toks = tokenize(clause)
        if not toks:
            continue
        if sign == "-":
            plan.excluded.extend(toks)
            continue
        for t in toks:
            plan.weighted[t] = plan.weighted.get(t, 0.0) + boost
        if sign == "+":
            plan.required.extend(toks)
    return plan


def _phrase_doc_set(index, phrase: str) -> DataFrame:
    """(doc_id) of docs containing the exact phrase — the persisted
    compressed positional index when present, else the join matcher
    (identical sets; same seam as bm25_phrase_topk)."""
    if "positional" in index.extras:
        from .positional import phrase_occurrences_indexed

        return phrase_occurrences_indexed(
            index.extras["positional"],
            phrase,
            shard_width=index.extras.get("phrase_shard_width", 65536),
            n_buckets=index.n_buckets,
        ).select("doc_id")
    from .phrase import phrase_occurrences

    return phrase_occurrences(index.docs, phrase).select("doc_id")


def bm25_query_string_topk(
    index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """query_string BM25 top-k -> (rank, doc_id, url, score).

    ``filters`` (the API-level equality filters) merge with the
    query's own ``field:value`` clauses; an explicit argument wins on
    conflict (the API caller outranks the query text)."""
    from .scorer import finalize_topk, query_term_weights, score_matched

    spark = index.spark
    plan = parse_query_string(query)
    if plan.is_empty():
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    merged = {**plan.filters, **(filters or {})}

    qtf: Dict[str, float] = dict(plan.weighted)
    for p in plan.prefixes:
        for t, _i in expand_prefix(index, p, max_expansions):
            qtf[t] = qtf.get(t, 0.0) + 1.0
    for wd, dist in plan.fuzzies:
        for t, _i in expand_fuzzy(index, wd, dist, max_expansions):
            qtf[t] = qtf.get(t, 0.0) + 1.0
    qweights: List[tuple] = []
    if qtf:
        # idf lookup via the standard pruned dictionary probe; qtf is
        # overridden with the compiled weights (tokenize is idempotent
        # on dictionary-shaped terms, so the join-text round-trip is
        # exact)
        idf_of = {
            t: i
            for t, _q, i in query_term_weights(index, " ".join(sorted(qtf)))
        }
        qweights = [
            (t, float(q), idf_of[t])
            for t, q in sorted(qtf.items())
            if t in idf_of
        ]
    scored = score_matched(index, qweights) if qweights else None

    semi = required_doc_set(index, plan.required)
    anti = excluded_doc_set(index, plan.excluded)
    dfil: Optional[DataFrame] = None
    for ph in plan.phrases:
        occ = _phrase_doc_set(index, ph)
        dfil = occ if dfil is None else dfil.join(occ, "doc_id", "left_semi")
    return finalize_topk(
        index,
        scored,
        k,
        merged,
        doc_filter=dfil,
        candidate_semi=semi,
        candidate_anti=anti,
    )


# --- DuckDB oracle builder (colocated) --------------------------------------


def bm25_query_string_sql(
    query: str, k: int = 10, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> str:
    """Mirror of bm25_query_string_topk over the raw ``documents``
    table: the ONE chain that composes the boolean universe
    (pre-threshold), the weighted/expanded qt bag, and the phrase +
    metadata predicates (post-threshold). Each piece is spelled
    exactly like its donor oracle (bm25_boolean_sql / expanded_bm25_sql
    / bm25_topk_sql) so the composition cannot drift from the parts.

    The SQL mirror supports the lang/source field filters (the doclen
    relation's columns); a ``site:`` clause has no oracle lane and is
    rejected here (the engine supports it — gate keys simply don't use
    it)."""
    from collections import Counter as _C

    from ..functions.sql_oracle import B, K1, _docs_cte, round6_sql
    from ..operators.phrase import _phrase_occ_cte

    plan = parse_query_string(query)
    if plan.is_empty():
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    if "site" in plan.filters:
        raise ValueError("site: has no oracle lane (doclen carries lang/source)")

    parts: List[str] = []
    if plan.weighted:
        vals = ", ".join(
            f"('{t}', {float(q)})" for t, q in sorted(plan.weighted.items())
        )
        parts.append(f"SELECT * FROM (VALUES {vals}) v(term, qtf)")
    for p in plan.prefixes:
        parts.append(
            "SELECT term, 1.0 AS qtf FROM (SELECT term FROM idf "
            f"WHERE starts_with(term, '{p}') "
            f"ORDER BY df DESC, term ASC LIMIT {int(max_expansions)})"
        )
    for wd, dist in plan.fuzzies:
        esc = wd.replace("'", "''")
        parts.append(
            "SELECT term, 1.0 AS qtf FROM (SELECT term FROM idf "
            f"WHERE levenshtein(term, '{esc}') <= {int(dist)} "
            f"ORDER BY levenshtein(term, '{esc}') ASC, df DESC, term ASC "
            f"LIMIT {int(max_expansions)})"
        )

    cons: List[str] = []
    req_u = sorted(set(plan.required))
    exc_u = sorted(set(plan.excluded))
    if req_u:
        lst = ", ".join(f"'{t}'" for t in req_u)
        cons.append(
            "doc_id IN (SELECT doc_id FROM tf WHERE term IN (" + lst + ") "
            f"GROUP BY doc_id HAVING count(*) = {len(req_u)})"
        )
    if exc_u:
        lst = ", ".join(f"'{t}'" for t in exc_u)
        cons.append(
            "doc_id NOT IN (SELECT doc_id FROM tf WHERE term IN (" + lst + "))"
        )
    csql = " WHERE " + " AND ".join(cons) if cons else ""

    poccs = ""
    post: List[str] = []
    for i, ph in enumerate(plan.phrases):
        name = f"pocc{i}"
        poccs += _phrase_occ_cte(ph).replace("occ AS", f"{name} AS", 1) + ", "
        post.append(f"doc_id IN (SELECT doc_id FROM {name} WHERE n_occur > 0)")
    for f in ("lang", "source"):
        if f in plan.filters:
            post.append(f"{f} = '{plan.filters[f]}'")
    psql = " WHERE " + " AND ".join(post) if post else ""

    if parts:
        union = " UNION ALL ".join(parts)
        scored0 = (
            f"qraw AS ({union}), "
            "qt AS (SELECT term, CAST(sum(qtf) AS DOUBLE) AS qtf "
            "FROM qraw GROUP BY term), "
            "contrib AS ("
            "  SELECT tf.doc_id, tf.term, "
            f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
            f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
            "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
            "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
            "scored0 AS (SELECT doc_id, sum(c ORDER BY term) AS score "
            "FROM contrib GROUP BY doc_id), "
        )
    else:
        # pure-exclusion / expansion-less-and-OOV: nothing scores
        scored0 = "scored0 AS (SELECT doc_id, 0.0 AS score FROM doclen WHERE false), "
    return (
        f"WITH {_docs_cte()}, {poccs}"
        + scored0
        + f"universe AS (SELECT * FROM doclen{csql}), "
        "scored AS (SELECT s.* FROM scored0 s "
        "WHERE s.doc_id IN (SELECT doc_id FROM universe)), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT u.doc_id, u.lang, u.source, coalesce(s.score, 0.0) AS score "
        "  FROM universe u LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM (SELECT * FROM kept{psql}) "
        f"ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )
