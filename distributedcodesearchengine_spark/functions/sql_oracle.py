"""DuckDB ANSI-SQL builders mirroring the engine's semantics.

Used by ``__spark_entry__.oracle_sql()``: for each registered Spark
query, these emit the equivalent SQL the driver runs on the same parquet
tables (views pre-registered: region nation customer supplier part
orders lineitem events documents embeddings).

The expressions are written to match the Spark plans' arithmetic
operand-for-operand (same parenthesization), so double results agree to
well under the 1e-6 rounding applied on both sides.
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..oracle.tokenizer import tokenize
from .rounding import round6_sql, sql_double

K1, B, EPSILON = 1.5, 0.75, 0.25

# DuckDB transcription of the reference tokenizer
# (codesearch/storage/bm25_index.py:42-72): camel splits before lower,
# then tokens = maximal [a-z0-9] runs of length >= 2 (equivalence
# property-tested in tests/test_tokenizer.py).
TOKENIZE_SQL = (
    "list_filter(regexp_extract_all(lower(regexp_replace(regexp_replace("
    "{col}, '([a-z])([A-Z])', '\\1 \\2', 'g'), "
    "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')), '[a-z0-9]+'), "
    "t -> length(t) >= 2)"
)


def tokenize_col(col: str = "text") -> str:
    return TOKENIZE_SQL.format(col=col)


def toks_cte(table: str = "documents") -> str:
    """Minimal tokenization CTE for the pipeline operators."""
    return (
        f"docs AS (SELECT doc_id, {tokenize_col('text')} AS toks FROM {table})"
    )


def _docs_cte(table: str = "documents") -> str:
    return (
        f"docs AS (SELECT doc_id, lang, source, {tokenize_col('text')} AS toks "
        f"FROM {table}), "
        "doclen AS (SELECT doc_id, lang, source, len(toks) AS doc_len FROM docs), "
        "stats AS (SELECT count(*) AS n_docs, sum(doc_len) * 1.0 / count(*) AS avgdl FROM doclen), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM "
        "(SELECT doc_id, unnest(toks) AS term FROM docs) GROUP BY doc_id, term), "
        "dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "idf0 AS (SELECT term, df, ln((SELECT n_docs FROM stats) - df + 0.5) - ln(df + 0.5) AS idf_raw FROM dfreq), "
        # canonical two-level md5-bucket fold, not avg(): mirrors the
        # engine's deterministic epsilon-floor fold (stats.py
        # idf_detail_from_df) — per-bucket term-ordered sums, then a
        # bucket-ordered sum over the <=4096 bucket sums
        f"epsv AS (SELECT {EPSILON} * (sum(s ORDER BY b) / sum(n)) AS eps FROM "
        "(SELECT substr(md5(term), 1, 3) AS b, "
        "sum(idf_raw ORDER BY term) AS s, count(*) AS n "
        "FROM idf0 GROUP BY 1)), "
        "idf AS (SELECT term, df, CASE WHEN idf_raw < 0 THEN (SELECT eps FROM epsv) "
        "ELSE idf_raw END AS idf FROM idf0)"
    )


def kept_cte_sql(query: str, cols: Sequence[str] = (),
                 with_score: bool = True) -> Optional[str]:
    """The aggregation family's shared kept-set CTE chain (the DuckDB
    mirror of ``operators/explore._kept_with_cols``): ``_docs_cte`` +
    the query-term BM25 scoring chain + the threshold/degenerate
    ``kept`` relation carrying doc_id, the requested doclen-relation
    columns, and (by default) the coalesced score. Returns None for an
    empty-tokenizing query — the caller emits its own typed zero-row
    select (F7). Every kept-set aggregation mirror composes on this ONE
    chain, so the 1%-of-max threshold and the degenerate coalesce are
    spelled in exactly one place."""
    from collections import Counter

    toks = tokenize(query)
    if not toks:
        return None
    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    items = ["d.doc_id"] + [f"d.{c}" for c in cols]
    if with_score:
        items.append("coalesce(s.score, 0.0) AS score")
    sel = ", ".join(items)
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        f"  SELECT {sel} "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx)))"
    )


def doc_token_stats_sql() -> str:
    """Per-doc token counts — tokenizer parity check."""
    return (
        f"WITH {_docs_cte()} "
        "SELECT doc_id, doc_len AS n_tokens FROM doclen ORDER BY doc_id"
    )


def corpus_stats_sql() -> str:
    return (
        f"WITH {_docs_cte()} "
        "SELECT (SELECT n_docs FROM stats) AS n_docs, "
        f"{round6_sql('(SELECT avgdl FROM stats)')} AS avgdl, "
        "(SELECT count(*) FROM dfreq) AS vocab_size, "
        "(SELECT count(*) FROM idf0 WHERE idf_raw < 0) AS n_floored"
    )


def term_df_topk_sql(k: int = 50) -> str:
    return (
        f"WITH {_docs_cte()} "
        f"SELECT term, df, {round6_sql('idf')} AS idf FROM idf "
        f"ORDER BY df DESC, term ASC LIMIT {k}"
    )


def idf_sample_sql(terms: Sequence[str]) -> str:
    lst = ", ".join(f"'{t}'" for t in terms)
    return (
        f"WITH {_docs_cte()} "
        f"SELECT term, df, {round6_sql('idf')} AS idf FROM idf WHERE term IN ({lst}) "
        "ORDER BY term"
    )


def bm25_topk_sql(
    query: str,
    k: int = 10,
    lang: Optional[str] = None,
    source: Optional[str] = None,
    phrase: Optional[str] = None,
    near: Optional[tuple] = None,
    ordered_near: Optional[tuple] = None,
    doc_len_range: Optional[tuple] = None,
) -> str:
    """Full BM25 top-k with the reference's threshold-before-filter,
    degenerate all-zero handling, and doc-order tie-break.

    ``phrase`` adds the quoted-query predicate: restrict to docs
    containing the exact token phrase, applied WITH the metadata
    filters (post-threshold) — mirror of operators/phrase.bm25_phrase_topk.

    ``near`` = (terms, w) adds the proximity predicate the same way
    (post-threshold doc set) — mirror of
    operators/proximity.bm25_proximity_topk.
    """
    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    from collections import Counter

    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    where = []
    if lang:
        where.append(f"lang = '{lang}'")
    if source:
        where.append(f"source = '{source}'")
    if doc_len_range is not None:
        lo, hi = doc_len_range
        conds = []
        if lo is not None:
            conds.append(f"doc_len >= {int(lo)}")
        if hi is not None:
            conds.append(f"doc_len <= {int(hi)}")
        # mirror of the Spark doc_filter left_semi (scorer.bm25_topk_range)
        where.append(
            "doc_id IN (SELECT doc_id FROM doclen WHERE "
            + " AND ".join(conds) + ")"
        )
    pocc = ""
    if phrase is not None:
        from ..operators.phrase import _phrase_occ_cte

        pocc = _phrase_occ_cte(phrase).replace("occ AS", "pocc AS", 1) + ", "
        where.append("doc_id IN (SELECT doc_id FROM pocc WHERE n_occur > 0)")
    if near is not None:
        from ..operators.proximity import _near_occ_cte

        pocc = _near_occ_cte(near[0], near[1]) + ", "
        where.append("doc_id IN (SELECT doc_id FROM pocc WHERE n_win > 0)")
    if ordered_near is not None:
        from ..operators.proximity import _ordered_occ_cte

        pocc = _ordered_occ_cte(ordered_near[0], ordered_near[1]) + ", "
        where.append("doc_id IN (SELECT doc_id FROM pocc WHERE n_win > 0)")
    fsql = (" WHERE " + " AND ".join(where)) if where else ""
    return (
        f"WITH {_docs_cte()}, {pocc}"
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, d.lang, d.source, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))"
        # matched-only fast path: when max>0, unmatched (NULL-score) rows
        # can never pass the 1% threshold, mirroring the Spark branch
        "), "
        f"filtered AS (SELECT * FROM kept{fsql}) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM filtered ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def bm25_topk_after_sql(query: str, k: int = 10) -> str:
    """Oracle for keyset pagination (scorer.bm25_topk_after): page 2 of
    the ranking as the RANK WINDOW rows k+1..2k with page-relative
    ranks — the Spark side reaches the same rows through the
    (score, doc_id) cursor cut, so this pins keyset == offset-window
    row-for-row, including ties at the page boundary."""
    inner = bm25_topk_sql(query, k=2 * int(k))
    return (
        f"SELECT CAST(rank - {int(k)} AS INT) AS rank, doc_id, score "
        f"FROM ({inner}) WHERE rank > {int(k)} ORDER BY rank"
    )


def bm25_count_sql(
    query: str, lang: Optional[str] = None, source: Optional[str] = None
) -> str:
    """Total-hits count (operators/scorer.bm25_count): the bm25_topk_sql
    kept/filtered chain aggregated to (n_hits, max_score)."""
    toks = tokenize(query)
    if not toks:
        return "SELECT 0::BIGINT AS n_hits, 0.0 AS max_score"
    from collections import Counter

    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    where = []
    if lang:
        where.append(f"lang = '{lang}'")
    if source:
        where.append(f"source = '{source}'")
    fsql = (" WHERE " + " AND ".join(where)) if where else ""
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, d.lang, d.source, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))), "
        f"filtered AS (SELECT * FROM kept{fsql}) "
        "SELECT CAST(count(*) AS BIGINT) AS n_hits, "
        f"{round6_sql('coalesce(max(score), 0.0)')} AS max_score FROM filtered"
    )


def explain_topk_sql(query: str, k: int = 10) -> str:
    """Per-term score breakdown of the top-k (operators/scorer
    .explain_topk): the bm25_topk_sql CTE chain with the contribution
    factors carried through and the ranked top-k joined back onto the
    matched rows (inner — backfill docs have nothing to explain)."""
    toks = tokenize(query)
    if not toks:
        return (
            "SELECT 1 AS rank, 1::BIGINT AS doc_id, '' AS term, 0.0 AS qtf, "
            "1::BIGINT AS tf, 1::BIGINT AS doc_len, 0.0 AS idf, "
            "0.0 AS contrib, 0.0 AS score WHERE false"
        )
    from collections import Counter

    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, qt.qtf, tf.tf, dl.doc_len, idf.idf, "
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
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))), "
        "top AS (SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"  doc_id, score FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}) "
        "SELECT top.rank, c.doc_id, c.term, c.qtf, CAST(c.tf AS BIGINT) AS tf, "
        f"CAST(c.doc_len AS BIGINT) AS doc_len, {round6_sql('c.idf')} AS idf, "
        f"{round6_sql('c.c')} AS contrib, {round6_sql('top.score')} AS score "
        "FROM contrib c JOIN top ON top.doc_id = c.doc_id "
        "ORDER BY top.rank, c.term"
    )


def bm25_msm_sql(query: str, k: int = 10, msm: int = 1) -> str:
    """minimum_should_match BM25 (mirror of boolquery.bm25_topk_msm):
    the match-set constraint is PRE-threshold like the boolean occur
    flags — universe = docs with >= msm distinct query terms, the
    1%-of-max threshold and the degenerate backfill both taken over
    it."""
    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    from collections import Counter

    counts = Counter(toks)
    uniq = sorted(counts)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    csql = ""
    if int(msm) > 1:
        lst = ", ".join(f"'{t}'" for t in uniq)
        csql = (
            " WHERE doc_id IN (SELECT doc_id FROM tf WHERE term IN (" + lst + ") "
            f"GROUP BY doc_id HAVING count(*) >= {int(msm)})"
        )
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored0 AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        f"universe AS (SELECT * FROM doclen{csql}), "
        "scored AS (SELECT s.* FROM scored0 s WHERE s.doc_id IN (SELECT doc_id FROM universe)), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT u.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM universe u LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def bm25plus_sql(query: str, k: int = 10, delta: float = 1.0) -> str:
    """BM25+ top-k (mirror of scorer.bm25plus_topk): the house chain
    with ``+ delta`` inside the idf product — identical operand
    sequence to contribution_col_plus."""
    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    from collections import Counter

    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))) "
        f"      + {float(delta)})) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def bm25_terms_set_sql(query: str, k: int = 10) -> str:
    """terms_set BM25 (mirror of boolquery.bm25_topk_terms_set): the
    per-doc requirement doc_id % 3 + 1 (terms_set_required_col's exact
    integer derivation) constrains the match set PRE-threshold; the
    1%-of-max threshold and the degenerate backfill both run over the
    constrained universe. A doc containing no query term never enters
    the HAVING scan, so the universe is always requirement-satisfying
    docs only (ES semantics)."""
    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    from collections import Counter

    counts = Counter(toks)
    uniq = sorted(counts)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    lst = ", ".join(f"'{t}'" for t in uniq)
    csql = (
        " WHERE doc_id IN (SELECT doc_id FROM tf WHERE term IN (" + lst + ") "
        "GROUP BY doc_id HAVING count(*) >= doc_id % 3 + 1)"
    )
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored0 AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        f"universe AS (SELECT * FROM doclen{csql}), "
        "scored AS (SELECT s.* FROM scored0 s WHERE s.doc_id IN (SELECT doc_id FROM universe)), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT u.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM universe u LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def bm25_boolean_sql(query: str, k: int = 10) -> str:
    """Boolean-occur-flag BM25 (mirror of operators/boolquery).

    Constraints are PRE-threshold: ``scored`` is the constrained match
    set (required all-of semi, excluded any-of anti) and the 1%-of-max
    threshold is taken over it; the degenerate backfill universe is the
    constrained doclen. Required tokens also score (positive includes
    them), matching Lucene MUST semantics.
    """
    from collections import Counter

    from ..operators.boolquery import parse_boolean_query

    positive, required, excluded = parse_boolean_query(query)
    if not positive and not excluded:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    req_u = sorted(set(required))
    exc_u = sorted(set(excluded))
    cons = []
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
    if positive:
        counts = Counter(positive)
        qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
        scored0 = (
            f"qt(term, qtf) AS (VALUES {qvals}), "
            "contrib AS ("
            "  SELECT tf.doc_id, tf.term, "
            f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
            f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
            "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
            "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
            "scored0 AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        )
    else:
        # pure-exclusion query: nothing scores, mx is NULL
        scored0 = "scored0 AS (SELECT doc_id, 0.0 AS score FROM doclen WHERE false), "
    return (
        f"WITH {_docs_cte()}, "
        + scored0
        + f"universe AS (SELECT * FROM doclen{csql}), "
        "scored AS (SELECT s.* FROM scored0 s WHERE s.doc_id IN (SELECT doc_id FROM universe)), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT u.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM universe u LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def removal_rebuild_sql(source: str = "src7") -> str:
    """Stats after delete-by-predicate (remove_by_repo analog)."""
    cte = _docs_cte(f"(SELECT * FROM documents WHERE source <> '{source}')")
    return (
        f"WITH {cte} "
        "SELECT (SELECT n_docs FROM stats) AS n_docs, "
        f"{round6_sql('(SELECT avgdl FROM stats)')} AS avgdl, "
        "(SELECT count(*) FROM dfreq) AS vocab_size, "
        "(SELECT CAST(sum(df) AS BIGINT) FROM dfreq) AS total_df"
    )


def lang_histogram_sql() -> str:
    """A4 language histogram (repo_indexer.py:355-358 analog)."""
    return "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang"


def highlights_sql(k: int = 50) -> str:
    """P11/P12 highlight + truncation projections (engine.py:112-124,
    vector_store.py:183, api/server.py:159)."""
    return (
        "SELECT doc_id, substr(text, 1, 200) AS highlight, "
        "substr(text, 1, 80) AS snippet FROM documents "
        f"ORDER BY doc_id LIMIT {k}"
    )


def _fmt_vec(qvec: Sequence[float]) -> str:
    return "[" + ", ".join(sql_double(x) for x in qvec) + "]"


def cosine_topk_sql(qvec: Sequence[float], k: int = 10) -> str:
    """T3 brute-force cosine top-k over the embeddings table."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    v = _fmt_vec(qvec)
    return (
        "WITH scored AS (SELECT vec_id, "
        f"list_dot_product(embedding::DOUBLE[], {v}) / "
        f"(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * {sql_double(qnorm)}) AS score "
        "FROM embeddings) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank, "
        f"vec_id, {round6_sql('score')} AS score FROM scored ORDER BY score DESC, vec_id ASC LIMIT {k}"
    )


def cosine_topk_filtered_sql(
    qvec: Sequence[float],
    k: int = 10,
    label: Optional[int] = None,
    lang: Optional[str] = None,
) -> str:
    """Mirror of functions/embed.cosine_topk_filtered: exact cosine
    top-k over the filtered candidate set — ``label`` filters the
    embeddings table's own column, ``lang`` admits only vec_ids whose
    documents row matches (the id_filter semi-join lane)."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    v = _fmt_vec(qvec)
    conds = []
    if label is not None:
        conds.append(f"label = {int(label)}")
    if lang is not None:
        conds.append(
            f"vec_id IN (SELECT doc_id FROM documents WHERE lang = '{lang}')"
        )
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    return (
        "WITH scored AS (SELECT vec_id, "
        f"list_dot_product(embedding::DOUBLE[], {v}) / "
        f"(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * {sql_double(qnorm)}) AS score "
        f"FROM embeddings{where}) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank, "
        f"vec_id, {round6_sql('score')} AS score FROM scored ORDER BY score DESC, vec_id ASC LIMIT {k}"
    )


# boost rule table for the driver-gate RRF query: (source-contains,
# lang-contains, factor), first match wins — the web analog of the
# reference's api.py/sessions.py path boosts (engine.py:338-367)
DRIVER_BOOST_RULES = [("src7", None, 1.5), ("src1", None, 1.3), (None, "de", 0.7)]


def _boost_case_sql() -> str:
    whens = []
    for src_pat, lang_pat, factor in DRIVER_BOOST_RULES:
        conds = []
        if src_pat is not None:
            conds.append(f"contains(lower(d.source), '{src_pat}')")
        if lang_pat is not None:
            conds.append(f"contains(lower(d.lang), '{lang_pat}')")
        whens.append(f"WHEN {' AND '.join(conds)} THEN {sql_double(factor)}")
    return "CASE " + " ".join(whens) + " ELSE 1.0 END"


def rrf_hybrid_sql(
    query: str,
    qvec: Sequence[float],
    k: int = 10,
    boosted: bool = False,
) -> str:
    """J1+J2(+J3)+T2/T4/T5: full-outer RRF of the semantic cosine list
    (embeddings, vec_id as the join key) and the BM25 list (documents),
    with adaptive weight, optional boost, insertion-order tie-break and
    max-normalization — mirroring operators/rrf.py operand-for-operand."""
    import math
    from collections import Counter

    toks = tokenize(query)
    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    v = _fmt_vec(qvec)
    overfetch = 2 * k
    http = any(t in query.lower() for t in ("http", "request", "api"))
    boost_join = (
        "LEFT JOIN (SELECT doc_id, " + _boost_case_sql() + " AS boost FROM documents d) bo "
        "ON bo.doc_id = j.doc_id "
        if (boosted and http)
        else ""
    )
    boost_expr = "coalesce(bo.boost, 1.0)" if (boosted and http) else "1.0"
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS (SELECT tf.doc_id, tf.term, "
        f"  qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"    (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "bscored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "bmx AS (SELECT max(score) AS m FROM bscored), "
        "bkept AS (SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN bscored s USING (doc_id) "
        "  WHERE ((SELECT m FROM bmx) IS NULL OR (SELECT m FROM bmx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM bmx))), "
        "bmtop AS (SELECT doc_id, score, "
        "  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) - 1 AS rank0 "
        f"  FROM bkept ORDER BY score DESC, doc_id ASC LIMIT {overfetch}), "
        "sscored AS (SELECT vec_id AS doc_id, "
        f"  list_dot_product(embedding::DOUBLE[], {v}) / "
        f"  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * {sql_double(qnorm)}) AS score "
        "  FROM embeddings), "
        "semtop AS (SELECT doc_id, score, "
        "  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) - 1 AS rank0 "
        f"  FROM sscored ORDER BY score DESC, doc_id ASC LIMIT {overfetch}), "
        "semstats AS (SELECT count(*) AS n, max(score) - min(score) AS rng FROM semtop), "
        "wv AS (SELECT CASE WHEN (SELECT n FROM semstats) > 0 "
        "  AND (SELECT rng FROM semstats) < 0.05 THEN 0.3 ELSE 0.7 END AS sw), "
        "j AS (SELECT coalesce(s.doc_id, b.doc_id) AS doc_id, "
        "  s.rank0 AS srank, b.rank0 AS brank, s.score AS sscore, b.score AS bscore "
        "  FROM semtop s FULL OUTER JOIN bmtop b ON s.doc_id = b.doc_id), "
        "merged AS (SELECT j.doc_id, "
        "  (coalesce((SELECT sw FROM wv) * (1.0 / (60 + j.srank + 1)), 0.0) + "
        "   coalesce((1 - (SELECT sw FROM wv)) * (1.0 / (60 + j.brank + 1)), 0.0)) "
        f"   * {boost_expr} AS score, "
        "  coalesce(j.sscore, 0.0) AS semantic_score, coalesce(j.bscore, 0.0) AS bm25_score, "
        "  coalesce(CAST(j.srank AS BIGINT), (SELECT count(*) FROM semtop) + j.brank) AS tie "
        f"  FROM j {boost_join}), "
        f"top AS (SELECT * FROM merged ORDER BY score DESC, tie ASC LIMIT {k}), "
        "mx AS (SELECT max(score) AS m FROM top) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, tie ASC) AS INT) AS rank, doc_id, "
        f"{round6_sql('CASE WHEN (SELECT m FROM mx) > 0 THEN score / (SELECT m FROM mx) ELSE score END')} AS score, "
        f"{round6_sql('semantic_score')} AS semantic_score, {round6_sql('bm25_score')} AS bm25_score "
        "FROM top ORDER BY rank"
    )


def bm25_facets_sql(query: str) -> str:
    """Facet counts over the BM25 kept set (operators/explore.bm25_facets):
    the shared kept chain (kept_cte_sql) aggregated by (lang, source)
    instead of ranked."""
    chain = kept_cte_sql(query, ["lang", "source"])
    if chain is None:
        return (
            "SELECT '' AS lang, '' AS source, 1::BIGINT AS n_docs, "
            "0.0 AS max_score WHERE false"
        )
    return (
        f"{chain} "
        "SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs, "
        f"{round6_sql('max(score)')} AS max_score "
        "FROM kept GROUP BY lang, source ORDER BY lang, source"
    )

def more_like_this_sql(seed_doc_id: int, m: int = 5, k: int = 10) -> str:
    """MLT (operators/explore.more_like_this): the seed doc's top-m
    tf-idf terms (tf * ln(N/df), ties tfidf desc / term asc) as a
    qtf=1 query through the standard BM25 chain, seed excluded from
    both the matched set and the degenerate zero backfill."""
    seed = int(seed_doc_id)
    return (
        f"WITH {_docs_cte()}, "
        "kw AS (SELECT tf.term, "
        "  CAST(tf.tf AS DOUBLE) * ln(CAST((SELECT n_docs FROM stats) AS DOUBLE) / dfreq.df) AS tfidf "
        f"  FROM tf JOIN dfreq USING (term) WHERE tf.doc_id = {seed} "
        f"  ORDER BY tfidf DESC, term ASC LIMIT {int(m)}), "
        "qt AS (SELECT term, 1.0 AS qtf FROM kw), "
        "contrib AS ("
        "  SELECT tf.doc_id, tf.term, "
        f"    qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"      (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        f"  JOIN doclen dl ON dl.doc_id = tf.doc_id WHERE tf.doc_id <> {seed}), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        f"  WHERE d.doc_id <> {seed} "
        "    AND ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )


def _lm_sql(query: str, contrib_expr: str, k: int) -> str:
    """Shared LM-similarity mirror chain (scorer._lm_topk): collection
    probabilities cp.p = CAST(ctf AS DOUBLE) / CAST(total AS DOUBLE)
    (two exact integers — the division is bit-identical to the
    engine's driver-side ctf / total), then the house threshold /
    degenerate-backfill / tie-break chain of bm25plus_sql with only the
    contribution expression swapped."""
    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    from collections import Counter

    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "tot AS (SELECT CAST(sum(doc_len) AS BIGINT) AS t FROM doclen), "
        "cp AS (SELECT term, CAST(sum(tf) AS DOUBLE) / "
        "CAST((SELECT t FROM tot) AS DOUBLE) AS p FROM tf GROUP BY term), "
        "contrib AS ("
        f"  SELECT tf.doc_id, tf.term, {contrib_expr} AS c "
        "  FROM tf JOIN qt USING (term) JOIN cp USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )


def lmd_sql(query: str, k: int = 10, mu: float = 2000.0) -> str:
    """LM Dirichlet top-k (mirror of scorer.lmd_topk): identical
    operand sequence to contribution_col_lmd, including the per-term
    Lucene clamp at 0."""
    m = repr(float(mu))
    contrib = (
        f"qt.qtf * greatest(0.0, ln(1 + tf.tf / ({m} * cp.p)) "
        f"+ ln({m} / (dl.doc_len + {m})))"
    )
    return _lm_sql(query, contrib, k)


def lmjm_sql(query: str, k: int = 10, lam: float = 0.1) -> str:
    """LM Jelinek-Mercer top-k (mirror of scorer.lmjm_topk)."""
    c1 = repr(1.0 - float(lam))
    lm = repr(float(lam))
    contrib = f"qt.qtf * ln(1 + (({c1} * tf.tf) / dl.doc_len) / ({lm} * cp.p))"
    return _lm_sql(query, contrib, k)


def _dfw_sql(query: str, contrib_expr: str, k: int) -> str:
    """Shared DFR/IB mirror chain (scorer._df_topk): document
    frequencies ride the weight slot (base.dfv — CAST of the exact
    integer df, bit-identical to the engine's float(df)), tfn is the
    H2 normalization spelled with the shared LN2 literal (log2 ==
    ln/LN2, the evalrank convention), then the house threshold /
    degenerate-backfill / tie-break chain with only the contribution
    expression swapped. ``contrib_expr`` sees base.qtf / base.dfv /
    base.tfn."""
    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    from collections import Counter

    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    ln2 = "0.6931471805599453e0"
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "base AS ("
        "  SELECT tf.doc_id, tf.term, qt.qtf, "
        "    CAST(dfreq.df AS DOUBLE) AS dfv, "
        f"    tf.tf * (ln(1.0 + (SELECT avgdl FROM stats) / dl.doc_len) / {ln2}) AS tfn "
        "  FROM tf JOIN qt USING (term) JOIN dfreq USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        f"contrib AS (SELECT doc_id, term, {contrib_expr} AS c FROM base), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )


def dfr_sql(query: str, k: int = 10) -> str:
    """DFR InL2 top-k (mirror of scorer.dfr_topk): identical operand
    sequence to contribution_col_dfr_inl2 — N+1 is the same exact
    integer-valued double on both engines ((SELECT n_docs FROM stats)
    + 1 cast vs the Spark literal), df + 0.5 uses the e0 double
    literal (the sql_double DECIMAL hazard)."""
    ln2 = "0.6931471805599453e0"
    contrib = (
        "base.qtf * ((base.tfn / (base.tfn + 1.0)) * "
        "(ln(CAST((SELECT n_docs FROM stats) + 1 AS DOUBLE) / (base.dfv + 0.5e0)) "
        f"/ {ln2}))"
    )
    return _dfw_sql(query, contrib, k)


def ib_sql(query: str, k: int = 10) -> str:
    """IB LL-DF-H2 top-k (mirror of scorer.ib_topk): lambda =
    (df + 1) / (N + 1) with both operands exact."""
    contrib = (
        "base.qtf * ln(1.0 + base.tfn / "
        "((base.dfv + 1.0) / CAST((SELECT n_docs FROM stats) + 1 AS DOUBLE)))"
    )
    return _dfw_sql(query, contrib, k)


def linear_hybrid_sql(
    query: str,
    qvec: Sequence[float],
    k: int = 10,
    w_sem: float = 0.5,
    w_lex: float = 0.5,
) -> str:
    """The ES linear retriever (mirror of operators/rrf
    .linear_hybrid_topk over the rrf_hybrid_sql list constructions):
    both overfetch lists minmax-normalize their RAW scores, constant
    lists normalize to 1.0, fused = w_sem*sem + w_lex*lex over the
    full-outer union with missing sides at 0."""
    import math
    from collections import Counter

    toks = tokenize(query)
    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    v = _fmt_vec(qvec)
    overfetch = 2 * k
    ws = sql_double(float(w_sem))
    wl = sql_double(float(w_lex))
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS (SELECT tf.doc_id, tf.term, "
        f"  qt.qtf * (idf.idf * (tf.tf * {K1 + 1.0} / "
        f"    (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / (SELECT avgdl FROM stats))))) AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "bscored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "bmx AS (SELECT max(score) AS m FROM bscored), "
        "bkept AS (SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN bscored s USING (doc_id) "
        "  WHERE ((SELECT m FROM bmx) IS NULL OR (SELECT m FROM bmx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM bmx))), "
        "bmtop AS (SELECT doc_id, score FROM bkept "
        f"  ORDER BY score DESC, doc_id ASC LIMIT {overfetch}), "
        "sscored AS (SELECT vec_id AS doc_id, "
        f"  list_dot_product(embedding::DOUBLE[], {v}) / "
        f"  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * {sql_double(qnorm)}) AS score "
        "  FROM embeddings), "
        "semtop AS (SELECT doc_id, score FROM sscored "
        f"  ORDER BY score DESC, doc_id ASC LIMIT {overfetch}), "
        "bmm AS (SELECT min(score) AS mn, max(score) AS mx FROM bmtop), "
        "smm AS (SELECT min(score) AS mn, max(score) AS mx FROM semtop), "
        "bn AS (SELECT doc_id, CASE WHEN (SELECT mx FROM bmm) > (SELECT mn FROM bmm) "
        "  THEN (score - (SELECT mn FROM bmm)) / ((SELECT mx FROM bmm) - (SELECT mn FROM bmm)) "
        "  ELSE 1.0 END AS lex_norm FROM bmtop), "
        "sn AS (SELECT doc_id, CASE WHEN (SELECT mx FROM smm) > (SELECT mn FROM smm) "
        "  THEN (score - (SELECT mn FROM smm)) / ((SELECT mx FROM smm) - (SELECT mn FROM smm)) "
        "  ELSE 1.0 END AS sem_norm FROM semtop), "
        "j AS (SELECT coalesce(sn.doc_id, bn.doc_id) AS doc_id, "
        "  coalesce(sn.sem_norm, 0.0) AS ns, coalesce(bn.lex_norm, 0.0) AS nl "
        "  FROM sn FULL OUTER JOIN bn ON sn.doc_id = bn.doc_id), "
        f"f AS (SELECT doc_id, {ws} * ns + {wl} * nl AS fused, ns, nl FROM j) "
        "SELECT CAST(row_number() OVER (ORDER BY fused DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('fused')} AS score, {round6_sql('ns')} AS sem_norm, "
        f"{round6_sql('nl')} AS lex_norm "
        f"FROM f ORDER BY fused DESC, doc_id ASC LIMIT {int(k)}"
    )


def bm25_contrib_chain_sql(query: str, contrib_expr: str, k: int = 10) -> str:
    """Shared mirror chain for similarities over the standard idf
    weights (``contrib_expr`` sees qt.qtf / idf.idf / tf.tf /
    dl.doc_len): the _docs_cte relations + the house threshold /
    degenerate-backfill / tie-break tail with only the contribution
    expression swapped — the SQL twin of scorer._lm_topk_with_weights."""
    toks = tokenize(query)
    if not toks:
        return "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS score WHERE false"
    from collections import Counter

    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
    return (
        f"WITH {_docs_cte()}, "
        f"qt(term, qtf) AS (VALUES {qvals}), "
        "contrib AS ("
        f"  SELECT tf.doc_id, tf.term, {contrib_expr} AS c "
        "  FROM tf JOIN qt USING (term) JOIN idf USING (term) "
        "  JOIN doclen dl ON dl.doc_id = tf.doc_id), "
        "scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id), "
        "mx AS (SELECT max(score) AS m FROM scored), "
        "kept AS ("
        "  SELECT d.doc_id, coalesce(s.score, 0.0) AS score "
        "  FROM doclen d LEFT JOIN scored s USING (doc_id) "
        "  WHERE ((SELECT m FROM mx) IS NULL OR (SELECT m FROM mx) <= 0 "
        "         OR coalesce(s.score, 0.0) >= 0.01 * (SELECT m FROM mx))) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('score')} AS score "
        f"FROM kept ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"
    )
