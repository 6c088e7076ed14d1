"""Query-aware snippets + term-prefix suggestions (serving-surface
operators).

The reference's highlight is query-blind (``docstring[:200]``,
``engine.py:112-124`` — P11); a production result page wants the
snippet centered on the match. ``query_snippets`` windows each top-k
document's text around the first occurrence of the highest-priority
query term present (priority = idf desc, so the rarest term wins), with
a query-blind prefix fallback for degenerate zero-match docs.

``term_suggest`` is the autocomplete primitive: top-k terms by document
frequency under a prefix. It scans only the terms relation — at design
scale the term dictionary is stored sorted (parquet min/max stats per
row group), so a prefix predicate prunes to a contiguous byte range,
never a full-vocab scan.

Both are deterministic column expressions with DuckDB SQL mirrors for
the driver gate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6, round6_sql


def term_suggest(terms: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """terms(term, df[, idf]) -> top-k (term, df) under the prefix,
    ordered df desc then term asc (deterministic ties).

    When the dictionary carries the persisted-index ``term_pfx``
    partition column (build/checkpoint.py terms stage), the probe adds
    the leading-character equality so the scan partition-prunes to one
    directory; the startswith predicate is pushed to parquet either
    way and prunes row groups of the term-sorted files."""
    if prefix and "term_pfx" in terms.columns:
        terms = terms.where(F.col("term_pfx") == prefix[:1])
    return (
        terms.where(F.col("term").startswith(prefix))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(int(k))
    )


def term_suggest_sql(docs_cte: str, prefix: str, k: int = 10) -> str:
    """Oracle over the standard docs/tf/dfreq CTE chain. Uses
    ``starts_with`` (literal prefix match, like Spark's startswith) so a
    prefix containing LIKE metacharacters ('%', '_') cannot diverge."""
    esc = prefix.replace("'", "''")
    return (
        f"WITH {docs_cte}, "
        "tf2 AS (SELECT doc_id, unnest(toks) AS term FROM docs), "
        "dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf2 GROUP BY term) "
        f"SELECT term, CAST(df AS BIGINT) AS df FROM dfreq "
        f"WHERE starts_with(term, '{esc}') ORDER BY df DESC, term ASC LIMIT {int(k)}"
    )


def snippet_col(terms_ordered: Sequence[str], before: int = 30, width: int = 120):
    """Column expr: window ``text`` around the first occurrence of the
    first present term (terms in priority order); prefix fallback."""
    pos = F.lit(None).cast("int")
    # build the coalesce chain in REVERSE so earlier terms win
    for t in reversed(list(terms_ordered)):
        p = F.instr(F.col("text"), t)
        pos = F.when(p > 0, p).otherwise(pos)
    start = F.greatest(F.lit(1), pos - F.lit(int(before)))
    return F.when(
        pos.isNotNull(), F.col("text").substr(start, F.lit(int(width)))
    ).otherwise(F.col("text").substr(F.lit(1), F.lit(int(width))))


def query_snippets(
    results: DataFrame,
    documents: DataFrame,
    terms_ordered: Sequence[str],
    before: int = 30,
    width: int = 120,
) -> DataFrame:
    """results(rank, doc_id, ...) x documents(doc_id, text) ->
    (rank, doc_id, snippet). The k-row result side is broadcast against
    the corpus-sized documents side (never the reverse)."""
    return (
        documents.select("doc_id", "text")
        .join(F.broadcast(results.select("rank", "doc_id")), "doc_id")
        .select(
            "rank",
            "doc_id",
            snippet_col(terms_ordered, before, width).alias("snippet"),
        )
        .orderBy("rank")
    )


def snippet_sql_expr(
    terms_ordered: Sequence[str], before: int = 30, width: int = 120
) -> str:
    chain = "NULL"
    for t in reversed(list(terms_ordered)):
        esc = t.replace("'", "''")
        chain = (
            f"CASE WHEN strpos(text, '{esc}') > 0 "
            f"THEN strpos(text, '{esc}') ELSE {chain} END"
        )
    return (
        f"CASE WHEN ({chain}) IS NOT NULL "
        f"THEN substring(text, greatest(1, ({chain}) - {int(before)}), {int(width)}) "
        f"ELSE substring(text, 1, {int(width)}) END"
    )


def query_snippets_sql(
    bm25_sql: str,
    terms_ordered: Sequence[str],
    before: int = 30,
    width: int = 120,
) -> str:
    """Wrap a bm25_topk_sql statement: join documents, emit snippets."""
    return (
        f"SELECT res.rank, res.doc_id, {snippet_sql_expr(terms_ordered, before, width)}"
        f" AS snippet FROM ({bm25_sql}) res "
        "JOIN documents USING (doc_id) ORDER BY res.rank"
    )


def highlight_expr(col, terms: Sequence[str], tag: str = "em"):
    """Wrap every occurrence of a query term (case-insensitive, token
    boundaries) in ``<tag>..</tag>`` — the ES highlighter's marked
    fragment. Tokens are ``[a-z0-9]+`` by construction so the
    alternation needs no escaping; ``(?i)`` and ``\\b`` behave
    identically for this ASCII class under Java regex and RE2 (the
    cross-engine envelope the other regexp lanes rely on)."""
    alt = "|".join(sorted(set(terms)))
    return F.regexp_replace(
        col, f"(?i)\\b({alt})\\b", f"<{tag}>$1</{tag}>"
    )


def highlight_sql_expr(expr: str, terms: Sequence[str], tag: str = "em") -> str:
    alt = "|".join(sorted(set(terms)))
    return (
        f"regexp_replace({expr}, '(?i)\\b({alt})\\b', "
        f"'<{tag}>\\1</{tag}>', 'g')"
    )


def highlighted_snippets(
    results: DataFrame,
    documents: DataFrame,
    terms_ordered: Sequence[str],
    before: int = 30,
    width: int = 120,
) -> DataFrame:
    """query_snippets with match markers: (rank, doc_id, fragment) —
    the snippet window with every query-term hit wrapped in <em>."""
    return (
        documents.select("doc_id", "text")
        .join(F.broadcast(results.select("rank", "doc_id")), "doc_id")
        .select(
            "rank",
            "doc_id",
            highlight_expr(
                snippet_col(terms_ordered, before, width), terms_ordered
            ).alias("fragment"),
        )
        .orderBy("rank")
    )


def highlighted_snippets_sql(
    bm25_sql: str,
    terms_ordered: Sequence[str],
    before: int = 30,
    width: int = 120,
) -> str:
    frag = highlight_sql_expr(
        f"({snippet_sql_expr(terms_ordered, before, width)})", terms_ordered
    )
    return (
        f"SELECT res.rank, res.doc_id, {frag} AS fragment "
        f"FROM ({bm25_sql}) res JOIN documents USING (doc_id) ORDER BY res.rank"
    )


def spell_suggest(
    terms: DataFrame, word: str, k: int = 10, max_dist: int = 1
) -> DataFrame:
    """"Did you mean" -> top-k (term, df, dist) within edit distance
    ``max_dist`` of ``word``, ordered dist asc, df desc, term asc.

    Baseline formulation: one JVM ``levenshtein`` scan over the term
    dictionary — exact, Catalyst-codegen, and the correctness oracle for
    the SymSpell path below. At 10^9-term vocabularies prefer
    ``spell_suggest_symspell``, which touches only the deletion-key
    candidates instead of scanning the dictionary."""
    d = F.levenshtein(F.col("term"), F.lit(word))
    return (
        terms.select("term", F.col("df").cast("long").alias("df"), d.alias("dist"))
        .where(F.col("dist") <= int(max_dist))
        .orderBy("dist", F.desc("df"), F.asc("term"))
        .limit(int(k))
    )


def spell_suggest_sql(docs_cte: str, word: str, k: int = 10, max_dist: int = 1) -> str:
    esc = word.replace("'", "''")
    return (
        f"WITH {docs_cte}, "
        "tf2 AS (SELECT doc_id, unnest(toks) AS term FROM docs), "
        "dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf2 GROUP BY term) "
        f"SELECT term, CAST(df AS BIGINT) AS df, "
        f"CAST(levenshtein(term, '{esc}') AS INT) AS dist FROM dfreq "
        f"WHERE levenshtein(term, '{esc}') <= {int(max_dist)} "
        f"ORDER BY dist ASC, df DESC, term ASC LIMIT {int(k)}"
    )


def _deletion_keys(word: str) -> list:
    return [word] + [word[:i] + word[i + 1 :] for i in range(len(word))]


def spell_suggest_symspell(terms: DataFrame, word: str, k: int = 10) -> DataFrame:
    """SymSpell-style scale path for edit distance 1: every
    distance-1 (substitution / insertion / deletion) pair shares at
    least one key in {x} ∪ {1-deletions of x} for both sides, so
    candidates come from an equality match on deletion keys — at
    serving scale the exploded (key, term) relation is precomputed and
    stored sorted by key, making the probe a prunable range scan, not a
    dictionary-wide edit-distance evaluation. Candidates are verified
    with the exact levenshtein, so output == spell_suggest (tested)."""
    qkeys = _deletion_keys(word)
    keyed = terms.select(
        "term",
        F.col("df").cast("long").alias("df"),
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
    cand = keyed.where(F.col("key").isin(qkeys)).select("term", "df").distinct()
    d = F.levenshtein(F.col("term"), F.lit(word))
    return (
        cand.select("term", "df", d.alias("dist"))
        .where(F.col("dist") <= 1)
        .orderBy("dist", F.desc("df"), F.asc("term"))
        .limit(int(k))
    )


def did_you_mean(index, query: str, max_dist: int = 1) -> DataFrame:
    """Whole-query spell correction (the ES phrase-suggester shape):
    (pos, original, suggestion, df, dist, corrected) — one row per
    query token, where ``suggestion`` is the best dictionary candidate
    within ``max_dist`` by (dist asc, df desc, term asc). An in-
    dictionary token is its own best candidate (dist 0, corrected 0);
    a token with no candidate keeps itself with df 0 / dist -1. A
    corrected query string is just the suggestions joined in pos order.

    Scale shape: one SymSpell deletion-key point probe per query token
    (the fuzzy serving-path precedent, operators/fuzzy.expand_fuzzy —
    a query has O(10) tokens and each probe touches only the keys'
    partitions of the persisted relation, never the dictionary)."""
    from ..oracle.tokenizer import tokenize
    from .fuzzy import FUZZY_KEY_DEPTH, _deletions_py, get_fuzzy_keys

    spark = index.spark
    out_schema = (
        "pos int, original string, suggestion string, df long, "
        "dist int, corrected int"
    )
    if int(max_dist) > FUZZY_KEY_DEPTH:
        raise ValueError(
            f"max_dist {max_dist} exceeds the deletion-key depth "
            f"{FUZZY_KEY_DEPTH}"
        )
    toks = tokenize(query)
    if not toks:
        return spark.createDataFrame([], out_schema)
    keyed = get_fuzzy_keys(index)
    rows = []
    memo = {}  # per distinct token: repeated terms probe once
    for pos, tok in enumerate(toks):
        if tok in memo:
            rows.append((pos, *memo[tok]))
            continue
        qkeys = _deletions_py(tok, int(max_dist))
        pfxs = sorted({k[:1] if k else "~" for k in qkeys})
        cand = (
            keyed.where(F.col("key_pfx").isin(pfxs) & F.col("key").isin(qkeys))
            .select("term", "df")
            .distinct()
        )
        best = (
            cand.withColumn("dist", F.levenshtein(F.col("term"), F.lit(tok)))
            .where(F.col("dist") <= int(max_dist))
            .orderBy("dist", F.desc("df"), F.asc("term"))
            .limit(1)
            .collect()
        )
        if best:
            b = best[0]
            entry = (tok, b["term"], int(b["df"]), int(b["dist"]),
                     1 if int(b["dist"]) > 0 else 0)
        else:
            entry = (tok, tok, 0, -1, 0)
        memo[tok] = entry
        rows.append((pos, *entry))
    return spark.createDataFrame(rows, out_schema)


def did_you_mean_sql(docs_cte: str, query: str, max_dist: int = 1) -> str:
    """DuckDB mirror of did_you_mean: per-token best dictionary
    candidate by (dist asc, df desc, term asc) over the full-dictionary
    levenshtein scan — the brute-force oracle the SymSpell probe must
    equal (completeness to the key depth)."""
    from ..oracle.tokenizer import tokenize

    toks = tokenize(query)
    if not toks:
        return (
            "SELECT 1::INT AS pos, '' AS original, '' AS suggestion, "
            "1::BIGINT AS df, 1::INT AS dist, 1::INT AS corrected WHERE false"
        )
    qvals = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(toks)
    )
    return (
        f"WITH {docs_cte}, "
        "tf2 AS (SELECT doc_id, unnest(toks) AS term FROM docs), "
        "dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf2 GROUP BY term), "
        f"qt(pos, original) AS (VALUES {qvals}), "
        "cand AS (SELECT qt.pos, d.term, CAST(d.df AS BIGINT) AS df, "
        "  CAST(levenshtein(d.term, qt.original) AS INT) AS dist "
        f"  FROM qt CROSS JOIN dfreq d WHERE levenshtein(d.term, qt.original) <= {int(max_dist)}), "
        "best AS (SELECT *, row_number() OVER (PARTITION BY pos "
        "  ORDER BY dist ASC, df DESC, term ASC) AS rn FROM cand) "
        "SELECT CAST(qt.pos AS INT) AS pos, qt.original, "
        "coalesce(b.term, qt.original) AS suggestion, "
        "coalesce(b.df, 0)::BIGINT AS df, coalesce(b.dist, -1)::INT AS dist, "
        "(CASE WHEN b.dist > 0 THEN 1 ELSE 0 END)::INT AS corrected "
        "FROM qt LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (pos) "
        "ORDER BY pos"
    )


# ---------------------------------------------------------------------------
# completion suggester (search-as-you-type)
# ---------------------------------------------------------------------------


def completion_suggest(
    docs: DataFrame, text: str, k: int = 10, lang: str | None = None
) -> DataFrame:
    """(rank, suggestion, cnt) — the ES completion-suggester surface as
    corpus-derived search-as-you-type: the input's LAST token is a
    prefix being typed, the token before it (if any) is the context
    word, and suggestions are the corpus continuations ranked by
    occurrence count (cnt desc, suggestion asc):

    - two+ tokens -> bigram completion: corpus bigrams starting with
      ``context + ' ' + prefix`` (the corpus_ngrams gram spelling);
    - one token -> unigram completion: dictionary terms under the
      prefix ranked by collection term frequency (ctf — distinct from
      term_suggest's df ranking: an autocomplete box wants the most
      TYPED continuation, not the most spread one);
    - prefixes shorter than the tokenizer's 2-char minimum are not
      completable (they never become tokens) -> empty.

    Scale: the gram/token explode carries the startswith predicate
    BEFORE the count agg (pushed to the scan on a persisted n-gram
    artifact — corpus_ngrams is exactly that table), the count is
    map-side combinable, and the cut is TakeOrdered. At serving scale
    the bigram relation is the persisted corpus_ngrams output keyed by
    first word, so a suggest probe reads one key range."""
    from ..oracle.tokenizer import tokenize

    spark = docs.sparkSession
    out = "rank int, suggestion string, cnt long"
    toks = tokenize(text)
    if not toks:
        return spark.createDataFrame([], out)
    if lang is not None:
        # the ES completion-suggester ``contexts`` feature: the
        # continuation statistics come from the category slice only
        # (a category-keyed partition prune on a persisted layout)
        docs = docs.where(F.col("lang") == lang)
    if len(toks) >= 2:
        q = f"{toks[-2]} {toks[-1]}"
        gram = "tokens[i] || ' ' || tokens[i + 1]"
        cand = docs.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(tokens) >= 2 THEN "
                    f"transform(sequence(0, size(tokens) - 2), i -> {gram}) "
                    "ELSE array() END"
                )
            ).alias("suggestion")
        ).where(F.col("suggestion").startswith(q))
    else:
        q = toks[0]
        cand = docs.select(F.explode("tokens").alias("suggestion")).where(
            F.col("suggestion").startswith(q)
        )
    from pyspark.sql.window import Window

    agg = cand.groupBy("suggestion").agg(F.count("*").cast("long").alias("cnt"))
    top = agg.orderBy(F.desc("cnt"), F.asc("suggestion")).limit(int(k))
    w = Window.orderBy(F.desc("cnt"), F.asc("suggestion"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "suggestion", "cnt"
    )


def completion_suggest_sql(
    table_toks_cte: str, text: str, k: int = 10, lang: str | None = None
) -> str:
    """DuckDB mirror of completion_suggest (starts_with, never LIKE);
    ``lang`` joins the documents table for the context slice."""
    from ..oracle.tokenizer import tokenize

    toks = tokenize(text)
    if not toks:
        return (
            "SELECT 1 AS rank, '' AS suggestion, 1::BIGINT AS cnt WHERE false"
        )
    src = "docs"
    if lang is not None:
        el = lang.replace("'", "''")
        src = (
            "(SELECT docs.* FROM docs JOIN documents d ON d.doc_id = docs.doc_id "
            f"WHERE d.lang = '{el}')"
        )
    if len(toks) >= 2:
        q = f"{toks[-2]} {toks[-1]}".replace("'", "''")
        cand = (
            "SELECT toks[i] || ' ' || toks[i + 1] AS suggestion "
            f"FROM {src} AS dd, unnest(generate_series(1, len(toks) - 1)) AS _t(i)"
        )
    else:
        q = toks[0].replace("'", "''")
        cand = f"SELECT unnest(toks) AS suggestion FROM {src} AS dd"
    return (
        f"WITH {table_toks_cte}, "
        f"c AS ({cand}), "
        f"f AS (SELECT suggestion FROM c WHERE starts_with(suggestion, '{q}')), "
        "a AS (SELECT suggestion, CAST(count(*) AS BIGINT) AS cnt "
        "FROM f GROUP BY suggestion) "
        "SELECT CAST(row_number() OVER (ORDER BY cnt DESC, suggestion ASC) AS INT) "
        f"AS rank, suggestion, cnt FROM a ORDER BY cnt DESC, suggestion ASC "
        f"LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# phrase suggester (noisy-channel: candidates x bigram-LM context ranking)
# ---------------------------------------------------------------------------

PHRASE_SUGGEST_MAX_TOKENS = 5


def phrase_suggest(
    index, query: str, k: int = 5, max_cands: int = 2, max_dist: int = 1
) -> DataFrame:
    """(rank, suggestion, score, n_changed) — the ES phrase suggester:
    whole-phrase correction ranked IN CONTEXT, which is exactly what
    did_you_mean's per-token best-df pick cannot do (a high-df wrong
    word loses to a lower-df word that fits its neighbours). Noisy-
    channel shape:

    - per token, candidates = the token itself + its top
      ``max_cands`` dictionary terms within ``max_dist`` (dist asc,
      df desc, term asc — the spell_suggest order), probed via the
      persisted SymSpell deletion-key relation (the did_you_mean
      serving path; the oracle's brute levenshtein scan equals it by
      key-depth completeness);
    - every combination (bounded: <= (max_cands+1)^len, len capped at
      PHRASE_SUGGEST_MAX_TOKENS) scores under a Laplace-smoothed
      bigram LM: ln((c(w0)+1)/(T+V)) + sum_i ln((c(w_{i-1} w_i)+1) /
      (c(w_{i-1})+V)) — all counts exact integers from term-pruned
      lookups (candidate unigrams; candidate-pair bigrams), T = total
      tokens, V = vocabulary size;
    - scoring runs ENGINE-side over the tiny combo relation (F.log,
      the proven evalrank ln lane; fixed position-order sum), top-k
      by (score desc, suggestion asc).

    Scale: the corpus-touching work is one deletion-key point probe
    per distinct token plus two isin-pruned count lookups (<= tens of
    terms/grams); the combo relation never exceeds a few hundred rows.
    """
    from ..oracle.tokenizer import tokenize
    from .fuzzy import _deletions_py, get_fuzzy_keys

    spark = index.spark
    out = "rank int, suggestion string, score double, n_changed int"
    if int(k) < 1 or int(max_cands) < 0 or int(max_dist) < 1:
        raise ValueError(
            f"bad params: k={k} max_cands={max_cands} max_dist={max_dist}"
        )
    toks = tokenize(query)
    if not toks:
        return spark.createDataFrame([], out)
    if len(toks) > PHRASE_SUGGEST_MAX_TOKENS:
        raise ValueError(
            f"query has {len(toks)} tokens; phrase_suggest caps at "
            f"{PHRASE_SUGGEST_MAX_TOKENS}"
        )
    keyed = get_fuzzy_keys(index)
    memo = {}
    for tok in toks:
        if tok in memo:
            continue
        qkeys = _deletions_py(tok, int(max_dist))
        pfxs = sorted({kk[:1] if kk else "~" for kk in qkeys})
        cand = (
            keyed.where(F.col("key_pfx").isin(pfxs) & F.col("key").isin(qkeys))
            .select("term", "df")
            .distinct()
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(tok)))
            .where(
                (F.col("dist") <= int(max_dist)) & (F.col("term") != tok)
            )
            .orderBy("dist", F.desc("df"), F.asc("term"))
            .limit(int(max_cands))
            .collect()
        )
        memo[tok] = [tok] + [r["term"] for r in cand]
    cands = [memo[t] for t in toks]

    # exact integer corpus stats, term/gram-pruned
    total = index.extras.get("_total_tokens")
    if total is None:
        total = int(index.docs.agg(F.sum("doc_len").alias("t")).first()["t"] or 0)
        index.extras["_total_tokens"] = total
    vocab = index.extras.get("_vocab_size")
    if vocab is None:
        vocab = int(index.terms.count())
        index.extras["_vocab_size"] = vocab
    uniq_terms = sorted({w for cs in cands for w in cs})
    uni = {
        r["term"]: int(r["c"])
        for r in index.tf.where(F.col("term").isin(uniq_terms))
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("c"))
        .collect()
    }
    pair_strs = sorted(
        {
            f"{a} {b}"
            for i in range(1, len(toks))
            for a in cands[i - 1]
            for b in cands[i]
        }
    )
    gram = "tokens[i] || ' ' || tokens[i + 1]"
    big = {}
    if pair_strs:
        big = {
            r["gram"]: int(r["c"])
            for r in index.docs.select(
                F.explode(
                    F.expr(
                        "CASE WHEN size(tokens) >= 2 THEN "
                        f"transform(sequence(0, size(tokens) - 2), i -> {gram}) "
                        "ELSE array() END"
                    )
                ).alias("gram")
            )
            .where(F.col("gram").isin(pair_strs))
            .groupBy("gram")
            .agg(F.count("*").cast("long").alias("c"))
            .collect()
        }

    # bounded combo relation, scored engine-side with the proven ln lane
    from itertools import product

    combos = []
    for ws in product(*cands):
        n_changed = sum(1 for w, t in zip(ws, toks) if w != t)
        row = list(ws) + [
            int(uni.get(ws[0], 0)),
        ]
        for i in range(1, len(ws)):
            row.append(int(big.get(f"{ws[i - 1]} {ws[i]}", 0)))
            row.append(int(uni.get(ws[i - 1], 0)))
        combos.append(tuple(row + [n_changed]))
    n = len(toks)
    fields = [f"w{i} string" for i in range(n)] + ["u0 long"]
    for i in range(1, n):
        fields += [f"b{i} long", f"up{i} long"]
    fields += ["n_changed int"]
    cdf = spark.createDataFrame(combos, ", ".join(fields))
    tv = float(total + vocab)
    score = F.log((F.col("u0").cast("double") + F.lit(1.0)) / F.lit(tv))
    for i in range(1, n):
        score = score + F.log(
            (F.col(f"b{i}").cast("double") + F.lit(1.0))
            / (F.col(f"up{i}").cast("double") + F.lit(float(vocab)))
        )
    sugg = F.concat_ws(" ", *[F.col(f"w{i}") for i in range(n)])
    scored = cdf.select(
        sugg.alias("suggestion"), score.alias("s"), "n_changed"
    )
    top = scored.orderBy(F.desc("s"), F.asc("suggestion")).limit(int(k))
    w = Window.orderBy(F.desc("s"), F.asc("suggestion"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "suggestion", round6("s").alias("score"), "n_changed"
    )


def phrase_suggest_sql(
    docs_cte: str, query: str, k: int = 5, max_cands: int = 2,
    max_dist: int = 1,
) -> str:
    """DuckDB mirror of phrase_suggest: per-position candidate CTEs
    (brute levenshtein == the SymSpell probe by completeness), a cross
    join of the bounded candidate sets, and the identical fixed-order
    Laplace bigram-LM score."""
    from ..oracle.tokenizer import tokenize

    toks = tokenize(query)
    if not toks:
        return (
            "SELECT 1::INT AS rank, '' AS suggestion, 0.0 AS score, "
            "1::INT AS n_changed WHERE false"
        )
    if len(toks) > PHRASE_SUGGEST_MAX_TOKENS:
        raise ValueError("query too long for phrase_suggest")
    n = len(toks)
    parts = [
        docs_cte,
        "tf2 AS (SELECT doc_id, unnest(toks) AS term FROM docs)",
        "dfreq AS (SELECT term, count(DISTINCT doc_id) AS df, "
        "CAST(count(*) AS BIGINT) AS ctf FROM tf2 GROUP BY term)",
        "vt AS (SELECT CAST(count(*) AS BIGINT) AS v, "
        "(SELECT CAST(count(*) AS BIGINT) FROM tf2) AS t FROM dfreq)",
        "big AS (SELECT toks[i] || ' ' || toks[i + 1] AS gram, "
        "CAST(count(*) AS BIGINT) AS c FROM docs, "
        "unnest(generate_series(1, len(toks) - 1)) AS _t(i) GROUP BY 1)",
    ]
    for i, t in enumerate(toks):
        esc = t.replace("'", "''")
        parts.append(
            f"cand{i} AS (SELECT term FROM ("
            "SELECT term, row_number() OVER (ORDER BY "
            f"levenshtein(term, '{esc}') ASC, df DESC, term ASC) AS rn "
            f"FROM dfreq WHERE levenshtein(term, '{esc}') <= {int(max_dist)} "
            f"AND term <> '{esc}') WHERE rn <= {int(max_cands)} "
            f"UNION ALL SELECT '{esc}')"
        )
    cross = " CROSS JOIN ".join(
        f"(SELECT term AS w{i} FROM cand{i}) c{i}" for i in range(n)
    )
    joins = [f"LEFT JOIN dfreq u0 ON u0.term = w0"]
    for i in range(1, n):
        joins.append(
            f"LEFT JOIN big b{i} ON b{i}.gram = w{i - 1} || ' ' || w{i}"
        )
        joins.append(f"LEFT JOIN dfreq up{i} ON up{i}.term = w{i - 1}")
    score = (
        "ln((CAST(coalesce(u0.ctf, 0) AS DOUBLE) + 1.0) / "
        "CAST((SELECT t FROM vt) + (SELECT v FROM vt) AS DOUBLE))"
    )
    for i in range(1, n):
        score += (
            f" + ln((CAST(coalesce(b{i}.c, 0) AS DOUBLE) + 1.0) / "
            f"(CAST(coalesce(up{i}.ctf, 0) AS DOUBLE) + "
            "CAST((SELECT v FROM vt) AS DOUBLE)))"
        )
    sugg = " || ' ' || ".join(f"w{i}" for i in range(n))
    changed = " + ".join(
        f"CASE WHEN w{i} <> '{toks[i]}' THEN 1 ELSE 0 END" for i in range(n)
    )
    return (
        "WITH " + ", ".join(parts) + ", "
        f"combos AS (SELECT * FROM {cross}), "
        f"scored AS (SELECT {sugg} AS suggestion, {score} AS s, "
        f"CAST({changed} AS INT) AS n_changed, "
        + ", ".join(f"w{i}" for i in range(n))
        + " FROM combos "
        + " ".join(joins)
        + ") "
        "SELECT CAST(row_number() OVER (ORDER BY s DESC, suggestion ASC) AS INT) "
        f"AS rank, suggestion, {round6_sql('s')} AS score, n_changed "
        f"FROM scored ORDER BY s DESC, suggestion ASC LIMIT {int(k)}"
    )
