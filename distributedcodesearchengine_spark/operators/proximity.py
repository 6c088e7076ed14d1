"""Proximity (NEAR) queries: all terms within a ``w``-token window.

The reference is bag-of-words (``codesearch/storage/bm25_index.py:
117-170``) — like the phrase operator (operators/phrase.py), proximity
is the remaining classic positional query type, added Spark-first.
Query syntax follows Lucene: ``"terms"~w`` (unordered), plus the
ordered variant ``"terms"~ow`` — the engine spelling of the Surround
query language's ``W`` (ordered-within) vs ``N`` (unordered-within)
operator pair / Lucene SpanNearQuery ``inOrder=true``.

Semantics (deterministic, engine-portable):

* a doc matches iff SOME width-``w`` token window contains at least one
  occurrence of EVERY distinct query term (order-free — the ordered
  w=n case is the phrase operator's job);
* ``n_win`` counts the matching window start positions (overlaps
  included) — a well-defined occurrence statistic mirroring the phrase
  operator's ``n_occur``;
* the BM25-ranked form applies the proximity predicate at the F5 stage
  (post-threshold doc_filter), exactly like the quoted-phrase query —
  a NEAR query ranks like its bag-of-words form, minus non-near docs.

Two physical paths, identical doc sets (tested):

* ``proximity_windows`` — one column-pruned pass over docs.tokens with
  a JVM higher-order expression (filter over window starts x
  array_contains over slices): zero shuffle, zero Python. The
  query-time fallback when no positional index is persisted.
* ``proximity_occurrences_indexed`` — the serving path over the
  compressed positional index (operators/positional.py layout): only
  the query terms' rows are read (term_bucket partition pruning +
  term predicate), per-shard numpy verify via vectorized searchsorted
  over the packed ``doc << 21 | pos`` keys — for each anchor
  occurrence, every term must have a key in [anchor, anchor + w - 1]
  within the same doc. No corpus scan, no cartesian; candidate volume
  is bounded by the query terms' posting lists.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.tokenizer import tokenize

_NEAR_RE = re.compile(r'^\s*"(?P<body>[^"]*)"\s*~\s*(?P<w>\d+)\s*$')
_ONEAR_RE = re.compile(r'^\s*"(?P<body>[^"]*)"\s*~\s*o\s*(?P<w>\d+)\s*$')


def parse_near_query(query: str) -> Optional[Tuple[str, int]]:
    """``'"a b"~3'`` -> ("a b", 3); None when not NEAR syntax."""
    m = _NEAR_RE.match(query)
    if not m:
        return None
    return m.group("body"), max(1, int(m.group("w")))


def parse_ordered_near_query(query: str) -> Optional[Tuple[str, int]]:
    """``'"a b"~o3'`` -> ("a b", 3); None when not ordered-NEAR syntax.
    The ``o`` marks order (Surround ``3w(a,b)``); the plain ``~w`` form
    stays the unordered operator, so the two parsers never overlap."""
    m = _ONEAR_RE.match(query)
    if not m:
        return None
    return m.group("body"), max(1, int(m.group("w")))


def proximity_windows(docs: DataFrame, query: str, w: int) -> DataFrame:
    """docs(doc_id, tokens) -> (doc_id, n_win), matched docs only.

    n_win = |{ i in [1, len] : every distinct query term occurs in
    tokens[i : i+w-1] }| via filter/slice/array_contains — evaluated
    entirely in the JVM over a (doc_id, tokens) column-pruned scan.
    """
    uniq = sorted(set(tokenize(query)))
    spark = docs.sparkSession
    if not uniq:
        return spark.createDataFrame([], "doc_id long, n_win long")
    w = max(1, int(w))

    def _all_in_slice(i):
        win = F.slice(F.col("tokens"), i, w)
        cond = None
        for t in uniq:
            c = F.array_contains(win, t)
            cond = c if cond is None else cond & c
        return cond

    # floor the stop at 1: Spark's sequence(1, 0) DESCENDS to [1, 0]
    # for an empty-token doc and slice(start=0) throws; with stop=1 the
    # empty doc evaluates one empty slice -> no match (DuckDB's
    # generate_series(1, 0) is simply empty — same n_win = 0)
    n_win = F.size(
        F.filter(
            F.sequence(F.lit(1), F.greatest(F.size("tokens"), F.lit(1))),
            _all_in_slice,
        )
    ).cast("long")
    return (
        docs.select("doc_id", n_win.alias("n_win"))
        .where(F.col("n_win") > 0)
    )


def ordered_windows(docs: DataFrame, query: str, w: int) -> DataFrame:
    """docs(doc_id, tokens) -> (doc_id, n_win), ordered-NEAR matches.

    n_win = |{ i : tokens[i : i+w-1] contains the query TOKEN SEQUENCE
    (duplicates significant) as a subsequence }| — i.e. there exist
    strictly increasing positions p1 < ... < pn inside the window with
    tokens[p_j] = t_j. The per-window test is a greedy left-to-right
    scan (state = #terms matched so far) folded with ``aggregate`` —
    greedy matching finds a subsequence iff one exists, so the fold is
    an exact existence test, evaluated entirely in the JVM over a
    column-pruned scan (zero shuffle, zero Python).
    """
    toks = tokenize(query)
    spark = docs.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long, n_win long")
    w = max(1, int(w))
    n = len(toks)
    seq = F.array(*[F.lit(t) for t in toks])

    def _ordered_in_slice(i):
        win = F.slice(F.col("tokens"), i, w)
        matched = F.aggregate(
            win,
            F.lit(0),
            lambda acc, x: F.when(
                (acc < F.lit(n)) & (x == F.get(seq, acc)), acc + 1
            ).otherwise(acc),
        )
        return matched == F.lit(n)

    # same stop-floor note as proximity_windows: sequence(1, 0) DESCENDS
    n_win = F.size(
        F.filter(
            F.sequence(F.lit(1), F.greatest(F.size("tokens"), F.lit(1))),
            _ordered_in_slice,
        )
    ).cast("long")
    return (
        docs.select("doc_id", n_win.alias("n_win"))
        .where(F.col("n_win") > 0)
    )


def ordered_occurrences_indexed(
    positional: DataFrame,
    query: str,
    w: int,
    shard_width: int = 65536,
    n_buckets: int = 64,
) -> DataFrame:
    """compressed positional index -> (doc_id) docs matching the
    ORDERED NEAR predicate; doc-set-identical to ``ordered_windows``
    (tested).

    Greedy-chain formulation: anchor on each occurrence p1 of the first
    token, then for each subsequent token take the MINIMAL same-doc
    position > previous (one ``searchsorted`` per token over the packed
    ``doc << 21 | pos`` keys, all anchors vectorized); minimal-next
    choices minimize the chain's end, so an anchor matches iff the
    greedy end sits within [p1, p1 + w - 1] — an exact existence test.
    Only the query terms' index rows are read (term_bucket pruning).
    """
    from .positional import _POS_BITS, _decode_row, term_bucket

    toks = tokenize(query)
    spark = positional.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long")
    w = max(1, int(w))
    sw = int(shard_width)
    uniq = sorted(set(toks))
    buckets = sorted({term_bucket(t, n_buckets) for t in uniq})
    rows = (
        positional.where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(uniq))
        .select("term", "range_id", "n_docs", "doc_deltas", "counts", "positions")
    )
    toks_b = list(toks)

    def match_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(pdf["range_id"].iloc[0])
        by_term = {}
        for _, row in pdf.iterrows():
            by_term[row["term"]] = _decode_row(row)[1]
        if any(t not in by_term for t in toks_b):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
        anchors = by_term[toks_b[0]]
        doc_of = anchors >> _POS_BITS
        ok = np.ones(len(anchors), dtype=bool)
        prev = anchors
        for t in toks_b[1:]:
            keys = by_term[t]  # sorted doc-major, pos asc -> ascending
            j = np.searchsorted(keys, prev + 1)
            hit = j < len(keys)
            jj = np.minimum(j, len(keys) - 1)
            nxt = keys[jj]
            # minimal key > prev must still be in the anchor's doc
            hit &= (nxt >> _POS_BITS) == doc_of
            ok &= hit
            prev = np.where(hit, nxt, prev)
        # same doc throughout, so the packed-key difference IS the
        # position span of the greedy chain
        ok &= (prev - anchors) <= (w - 1)
        docs = np.unique(doc_of[ok])
        return pd.DataFrame({"doc_id": docs + rid * sw})

    return rows.groupBy("range_id").applyInPandas(match_shard, schema="doc_id long")


def ordered_match_indexed(
    docs: DataFrame, query: str, w: int, shard_width: int = 65536
) -> DataFrame:
    """Gate shape: build the compressed positional index from docs,
    then ordered-NEAR-match through it -> (doc_id)."""
    from .positional import build_positional_index

    positional = build_positional_index(docs, shard_width=shard_width)
    return ordered_occurrences_indexed(
        positional, query, w, shard_width=shard_width
    ).orderBy("doc_id")


def proximity_occurrences_indexed(
    positional: DataFrame,
    query: str,
    w: int,
    shard_width: int = 65536,
    n_buckets: int = 64,
) -> DataFrame:
    """compressed positional index -> (doc_id) docs matching the NEAR
    predicate; doc-set-identical to ``proximity_windows`` (tested).

    Anchor formulation: a qualifying window exists iff some occurrence
    key ``p`` (of any term) has, for every term, a key in
    [p, p + w - 1] of the same doc — the window starting at the
    selection's minimum is a witness. Verified per shard with one
    ``searchsorted`` per (anchor-set, term) pair, all vectorized.
    """
    from .positional import _POS_BITS, _decode_row, term_bucket

    toks = sorted(set(tokenize(query)))
    spark = positional.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long")
    w = max(1, int(w))
    sw = int(shard_width)
    buckets = sorted({term_bucket(t, n_buckets) for t in toks})
    rows = (
        positional.where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(toks))
        .select("term", "range_id", "n_docs", "doc_deltas", "counts", "positions")
    )

    def match_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(pdf["range_id"].iloc[0])
        by_term = {}
        for _, row in pdf.iterrows():
            by_term[row["term"]] = _decode_row(row)[1]
        if any(t not in by_term for t in toks):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
        anchors = np.unique(np.concatenate([by_term[t] for t in toks]))
        ok = np.ones(len(anchors), dtype=bool)
        doc_of = anchors >> _POS_BITS
        for t in toks:
            keys = by_term[t]  # sorted: decode emits doc-major, pos asc
            j = np.searchsorted(keys, anchors)
            hit = j < len(keys)
            jj = np.minimum(j, len(keys) - 1)
            # nearest key at/after the anchor must sit inside the
            # window AND in the anchor's doc (packed keys order
            # doc-major, so same-doc is a prefix check)
            hit &= (keys[jj] <= anchors + (w - 1)) & ((keys[jj] >> _POS_BITS) == doc_of)
            ok &= hit
        docs = np.unique(doc_of[ok])
        return pd.DataFrame({"doc_id": docs + rid * sw})

    return rows.groupBy("range_id").applyInPandas(match_shard, schema="doc_id long")


def proximity_match_indexed(
    docs: DataFrame, query: str, w: int, shard_width: int = 65536
) -> DataFrame:
    """Gate shape: build the compressed positional index from docs,
    then NEAR-match through it -> (doc_id). Exercises the indexed
    serving path against the tokens-scan oracle."""
    from .positional import build_positional_index

    positional = build_positional_index(docs, shard_width=shard_width)
    return proximity_occurrences_indexed(
        positional, query, w, shard_width=shard_width
    ).orderBy("doc_id")


def bm25_ordered_near_topk(
    index, query: str, w: int, k: int = 10, filters=None
) -> DataFrame:
    """Ordered-NEAR-constrained BM25 top-k -> (rank, doc_id, url,
    score). Same composition contract as ``bm25_proximity_topk``
    (threshold on the unfiltered max, predicate + metadata filters at
    the F5 stage); the predicate additionally requires query order."""
    from .scorer import finalize_topk, query_term_weights, score_matched

    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    if "positional" in index.extras:
        occ = ordered_occurrences_indexed(
            index.extras["positional"],
            query,
            w,
            shard_width=index.extras.get("phrase_shard_width", 65536),
            n_buckets=index.n_buckets,
        )
    else:
        occ = ordered_windows(index.docs, query, w).select("doc_id")
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, doc_filter=occ)


# --- DuckDB oracle builders (colocated, list-lambda formulation) ---


def _ordered_occ_cte(query: str, w: int) -> str:
    """``pocc(doc_id, n_win)`` for the ORDERED predicate. Chain-join
    formulation (DuckDB list lambdas carry no counter state, so the
    greedy fold isn't expressible there): enumerate strictly-increasing
    position chains p1 < ... < pn matching the token sequence with
    span <= w - 1 — each step bounded to the w-window so the join never
    degenerates — then n_win = |union over chains of the window-start
    intervals [max(1, pn - w + 1), p1]|, exactly the window starts whose
    slice contains the subsequence."""
    toks = tokenize(query)
    w = max(1, int(w))
    n = len(toks)
    joins = []
    for j in range(2, n + 1):
        joins.append(
            f"JOIN p a{j} ON a{j}.doc_id = a1.doc_id "
            f"AND a{j}.pos > a{j - 1}.pos AND a{j}.pos <= a1.pos + {w - 1} "
            f"AND a{j}.tok = '{toks[j - 1]}'"
        )
    chain = (
        f"SELECT a1.doc_id, a1.pos AS p1, a{n}.pos AS pn FROM p a1 "
        + " ".join(joins)
        + f" WHERE a1.tok = '{toks[0]}'"
    )
    return (
        "p AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, "
        "unnest(toks) AS tok FROM docs), "
        f"chains AS ({chain}), "
        "wins AS (SELECT DISTINCT doc_id, i FROM (SELECT doc_id, "
        f"unnest(generate_series(greatest(1, pn - {w - 1}), p1)) AS i "
        "FROM chains)), "
        "pocc AS (SELECT doc_id, count(*)::BIGINT AS n_win FROM wins GROUP BY doc_id)"
    )


def ordered_match_sql(toks_cte: str, query: str, w: int) -> str:
    return (
        f"WITH {toks_cte}, {_ordered_occ_cte(query, w)} "
        "SELECT doc_id, n_win FROM pocc WHERE n_win > 0 ORDER BY doc_id"
    )


def ordered_docs_sql(toks_cte: str, query: str, w: int) -> str:
    return (
        f"WITH {toks_cte}, {_ordered_occ_cte(query, w)} "
        "SELECT doc_id FROM pocc WHERE n_win > 0 ORDER BY doc_id"
    )


def _near_occ_cte(query: str, w: int) -> str:
    uniq = sorted(set(tokenize(query)))
    w = max(1, int(w))
    conds = " AND ".join(
        f"list_contains(toks[i:i+{w - 1}], '{t}')" for t in uniq
    )
    return (
        "pocc AS (SELECT doc_id, len(list_filter("
        f"generate_series(1, len(toks)), i -> {conds})) AS n_win FROM docs)"
    )


def proximity_match_sql(toks_cte: str, query: str, w: int) -> str:
    return (
        f"WITH {toks_cte}, {_near_occ_cte(query, w)} "
        "SELECT doc_id, n_win FROM pocc WHERE n_win > 0 ORDER BY doc_id"
    )


def proximity_docs_sql(toks_cte: str, query: str, w: int) -> str:
    return (
        f"WITH {toks_cte}, {_near_occ_cte(query, w)} "
        "SELECT doc_id FROM pocc WHERE n_win > 0 ORDER BY doc_id"
    )


def bm25_proximity_topk(
    index, query: str, w: int, k: int = 10, filters=None
) -> DataFrame:
    """NEAR-constrained BM25 top-k -> (rank, doc_id, url, score).

    Composition contract mirrors the quoted-phrase query: bag-of-words
    scoring over the query terms (A3), relative threshold on the
    UNfiltered max (F4), proximity predicate with the metadata filters
    at F5 (post-threshold doc-set semi-join). Uses the persisted
    positional index when the handle carries one, else the tokens-scan
    fallback — a physical choice, identical doc sets.
    """
    from .scorer import finalize_topk, query_term_weights, score_matched

    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    if "positional" in index.extras:
        occ = proximity_occurrences_indexed(
            index.extras["positional"],
            query,
            w,
            shard_width=index.extras.get("phrase_shard_width", 65536),
            n_buckets=index.n_buckets,
        )
    else:
        occ = proximity_windows(index.docs, query, w).select("doc_id")
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    return finalize_topk(index, scored, k, filters, doc_filter=occ)
