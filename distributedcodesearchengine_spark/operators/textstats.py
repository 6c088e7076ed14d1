"""Text-analysis operators for a training-data pipeline: language-ID
(stopword-ratio heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting.

Each operator has a Spark implementation over a ``docs`` DataFrame
(doc_id, text and/or tokens) and a colocated DuckDB SQL builder that
mirrors it operand-for-operand — the pair is registered in
``__spark_entry__`` for the driver's side-by-side gate.

Everything is JVM column expressions (higher-order array functions,
regexp) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql

STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des"],
}

BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"
# explicit whitespace class everywhere instead of \s: Java includes
# vertical tab \x0B in \s, RE2 (DuckDB) does not — \s-based lanes
# silently diverge on any corpus containing \x0B
WS_CLASS = r"[ \t\n\x0B\f\r]"


def _stop_ratio_expr(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CASE WHEN size(tokens) > 0 THEN "
        f"CAST(size(filter(tokens, t -> t IN ({lst}))) AS DOUBLE) / size(tokens) "
        f"ELSE 0.0 END"
    )


def _stop_ratio_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CASE WHEN len(toks) > 0 THEN "
        f"CAST(len(list_filter(toks, t -> t IN ({lst}))) AS DOUBLE) / len(toks) "
        f"ELSE 0.0 END"
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, en_ratio, de_ratio, fr_ratio, pred_lang) — n-gram-free
    stopword-ratio language ID; argmax with tie order en > de > fr."""
    d = docs
    for lang in ("en", "de", "fr"):
        d = d.withColumn(f"{lang}_ratio", F.expr(_stop_ratio_expr(lang)))
    return d.select(
        "doc_id",
        round6("en_ratio").alias("en_ratio"),
        round6("de_ratio").alias("de_ratio"),
        round6("fr_ratio").alias("fr_ratio"),
        F.expr(
            "CASE WHEN en_ratio >= de_ratio AND en_ratio >= fr_ratio THEN 'en' "
            "WHEN de_ratio >= fr_ratio THEN 'de' ELSE 'fr' END"
        ).alias("pred_lang"),
    ).orderBy("doc_id")


def lang_id_sql(table_toks_cte: str) -> str:
    return (
        f"WITH {table_toks_cte}, r AS (SELECT doc_id, "
        f"{_stop_ratio_sql('en')} AS en_ratio, "
        f"{_stop_ratio_sql('de')} AS de_ratio, "
        f"{_stop_ratio_sql('fr')} AS fr_ratio FROM docs) "
        f"SELECT doc_id, {round6_sql('en_ratio')} AS en_ratio, {round6_sql('de_ratio')} AS de_ratio, "
        f"{round6_sql('fr_ratio')} AS fr_ratio, "
        "CASE WHEN en_ratio >= de_ratio AND en_ratio >= fr_ratio THEN 'en' "
        "WHEN de_ratio >= fr_ratio THEN 'de' ELSE 'fr' END AS pred_lang "
        "FROM r ORDER BY doc_id"
    )


def quality_score(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stop_ratio, mean_tok_len, quality)
    — length/punctuation/stopword quality heuristic. ``keep`` appends
    passthrough columns (and skips the presentation sort) so rollups
    like ``domain_quality`` stay single-scan instead of re-joining the
    corpus for their grouping key."""
    d = docs.withColumn("n_chars", F.length("text")).withColumn(
        "n_tokens", F.size("tokens")
    )
    d = d.withColumn(
        "punct_ratio",
        F.expr(
            "CAST(size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)) AS DOUBLE) "
            "/ greatest(n_chars, 1)"
        ),
    )
    d = d.withColumn("stop_ratio", F.expr(_stop_ratio_expr("en")))
    d = d.withColumn(
        "mean_tok_len",
        F.expr(
            "CASE WHEN n_tokens > 0 THEN "
            "CAST(aggregate(transform(tokens, t -> length(t)), 0, (a, x) -> a + x) AS DOUBLE)"
            " / n_tokens ELSE 0.0 END"
        ),
    )
    d = d.withColumn(
        "quality",
        F.expr(
            "0.25 * least(1.0, n_tokens / 100.0) + 0.25 * (1.0 - punct_ratio) "
            "+ 0.25 * least(1.0, stop_ratio * 4.0) "
            "+ 0.25 * least(1.0, mean_tok_len / 8.0)"
        ),
    )
    out = d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        round6("punct_ratio").alias("punct_ratio"),
        round6("stop_ratio").alias("stop_ratio"),
        round6("mean_tok_len").alias("mean_tok_len"),
        round6("quality").alias("quality"),
        *keep,
    )
    return out if keep else out.orderBy("doc_id")


def quality_score_sql(table_toks_cte: str) -> str:
    return (
        f"WITH {table_toks_cte}, q AS (SELECT d.doc_id, "
        "length(t.text) AS n_chars, len(toks) AS n_tokens, "
        "CAST(len(regexp_extract_all(t.text, '[^A-Za-z0-9 ]')) AS DOUBLE) "
        "/ greatest(length(t.text), 1) AS punct_ratio, "
        f"{_stop_ratio_sql('en')} AS stop_ratio, "
        "CASE WHEN len(toks) > 0 THEN "
        "CAST(list_aggregate(list_transform(toks, t2 -> length(t2)), 'sum') AS DOUBLE)"
        " / len(toks) ELSE 0.0 END AS mean_tok_len "
        "FROM docs d JOIN documents t ON t.doc_id = d.doc_id) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        f"{round6_sql('punct_ratio')} AS punct_ratio, {round6_sql('stop_ratio')} AS stop_ratio, "
        f"{round6_sql('mean_tok_len')} AS mean_tok_len, "
        f"{round6_sql('0.25 * least(1.0, n_tokens / 100.0) + 0.25 * (1.0 - punct_ratio) + 0.25 * least(1.0, stop_ratio * 4.0) + 0.25 * least(1.0, mean_tok_len / 8.0)')} AS quality "
        "FROM q ORDER BY doc_id"
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens) — whitespace split count + a
    BPE-ish regex token count (letters / digits / single punctuation)."""
    # the whitespace class goes through the Column API, NOT F.expr: the
    # SQL parser turns the unknown escape \x0B into the LITERAL chars
    # x/0/B (observed: 'approximations' split at its x), while
    # F.split hands the pattern straight to the Java regex engine
    # where \x0B is the vertical-tab hex escape — the DuckDB mirror's
    # RE2 semantics
    ws_arr = F.filter(
        F.split(F.col("text"), WS_CLASS + "+"), lambda x: x != F.lit("")
    )
    return documents.select(
        "doc_id",
        F.size(ws_arr).cast("bigint").alias("ws_tokens"),
        # F.lit pattern avoids SQL-parser backslash mangling of \s
        F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0)))
        .cast("bigint")
        .alias("bpe_tokens"),
    ).orderBy("doc_id")


def token_counts_sql() -> str:
    return (
        "SELECT doc_id, "
        r"CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x != '')) AS BIGINT) AS ws_tokens, "
        f"CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS BIGINT) AS bpe_tokens "
        "FROM documents ORDER BY doc_id"
    )


def text_complexity(documents: DataFrame) -> DataFrame:
    """(doc_id, n_sentences, n_clauses, n_specials, complexity) — the
    web-text analog of the reference's per-function cyclomatic
    complexity metadata (P7, codesearch/parser/python_parser.py /
    javascript_parser.py complexity fields): complexity = 1 + n_sentences + n_clauses
    (sentence ends and clause separators are the counted branch points;
    n_specials — code-ish special runs — is reported as its own signal
    but NOT folded into the formula), stored as per-doc metadata
    alongside the index."""
    sent = "CAST(size(regexp_extract_all(text, '[.!?]', 0)) AS BIGINT)"
    clause = "CAST(size(regexp_extract_all(text, '[,;:]', 0)) AS BIGINT)"
    spec = "CAST(size(regexp_extract_all(text, '[_/()\\\\[\\\\]{}-]', 0)) AS BIGINT)"
    return documents.select(
        "doc_id",
        F.expr(sent).alias("n_sentences"),
        F.expr(clause).alias("n_clauses"),
        F.expr(spec).alias("n_specials"),
        F.expr(f"1 + {sent} + {clause}").alias("complexity"),
    ).orderBy("doc_id")


def text_complexity_sql() -> str:
    sent = r"CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT)"
    clause = r"CAST(len(regexp_extract_all(text, '[,;:]')) AS BIGINT)"
    spec = r"CAST(len(regexp_extract_all(text, '[_/()\[\]{}-]')) AS BIGINT)"
    return (
        f"SELECT doc_id, {sent} AS n_sentences, {clause} AS n_clauses, "
        f"{spec} AS n_specials, 1 + {sent} + {clause} AS complexity "
        "FROM documents ORDER BY doc_id"
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — md5 of whitespace-normalized lowercase
    text (the content-defined dedup key)."""
    return documents.select(
        "doc_id",
        F.md5(
            F.encode(
                F.trim(
                    F.regexp_replace(
                        F.lower(F.col("text")), WS_CLASS + "+", " "
                    )
                ),
                "utf-8",
            )
        ).alias("fingerprint"),
    ).orderBy("doc_id")


def doc_fingerprint_sql() -> str:
    return (
        "SELECT doc_id, "
        r"md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fingerprint "
        "FROM documents ORDER BY doc_id"
    )


def _gram_counts(docs: DataFrame, n: int) -> DataFrame:
    """-> (doc_id, n_grams, top_frac, dup_frac) for token n-grams.

    Scale shape: gram explode -> groupBy(doc_id, gram) -> groupBy(doc_id)
    — the tf build's shuffle pattern (map-side partial aggs, groups
    bounded by doc length). Mode-of-array has no JVM HOF form, so the
    explode/agg pipeline IS the idiomatic distributed formulation;
    at 100 TB the gram strings would be dictionary-encoded/hashed before
    the shuffle (same trick as the postings build) — kept as plain
    strings here for oracle bit-equality.
    """
    gram = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(n))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(tokens) >= {n} THEN "
                f"transform(sequence(0, size(tokens) - {n}), i -> {gram}) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    gc = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return gc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_grams"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_frac"),
        (F.lit(1.0) - F.count("*").cast("double") / F.sum("c")).alias("dup_frac"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, top_token_frac, top_2gram_frac, dup_2gram_frac,
    top_3gram_frac) — Gopher-style repetition quality signals (Rae et
    al. 2021 §A1.1: fraction of the document occupied by the most
    frequent n-gram / by duplicated n-grams). High values flag
    boilerplate and spam for the training-data filter stage.

    Docs too short for an n-gram get 0.0 fractions (no signal).
    """
    # FOUR consumers reference the docs subtree (three gram explodes +
    # the doc_id spine): cut the lineage once so the upstream tokenize
    # pass runs once, not four times per invocation
    docs = docs.select("doc_id", "tokens").localCheckpoint(eager=False)
    g1 = _gram_counts(docs, 1).select(
        "doc_id",
        F.col("n_grams").alias("n_tokens"),
        F.col("top_frac").alias("top_token_frac"),
    )
    g2 = _gram_counts(docs, 2).select(
        "doc_id",
        F.col("top_frac").alias("top_2gram_frac"),
        F.col("dup_frac").alias("dup_2gram_frac"),
    )
    g3 = _gram_counts(docs, 3).select(
        "doc_id", F.col("top_frac").alias("top_3gram_frac")
    )
    out = (
        docs.select("doc_id")
        .join(g1, "doc_id", "left")
        .join(g2, "doc_id", "left")
        .join(g3, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
        round6(F.coalesce("top_token_frac", F.lit(0.0))).alias("top_token_frac"),
        round6(F.coalesce("top_2gram_frac", F.lit(0.0))).alias("top_2gram_frac"),
        round6(F.coalesce("dup_2gram_frac", F.lit(0.0))).alias("dup_2gram_frac"),
        round6(F.coalesce("top_3gram_frac", F.lit(0.0))).alias("top_3gram_frac"),
    ).orderBy("doc_id")


def _gram_counts_sql(n: int, alias: str) -> str:
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"{alias}g AS (SELECT doc_id, {gram} AS gram FROM docs, "
        f"unnest(generate_series(1, len(toks) - {n - 1})) AS _t(i)), "
        f"{alias}c AS (SELECT doc_id, gram, count(*) AS c FROM {alias}g "
        "GROUP BY doc_id, gram), "
        f"{alias} AS (SELECT doc_id, sum(c) AS n_grams, "
        "max(c)::DOUBLE / sum(c) AS top_frac, "
        f"1.0 - count(*)::DOUBLE / sum(c) AS dup_frac FROM {alias}c GROUP BY doc_id)"
    )


def repetition_stats_sql(table_toks_cte: str) -> str:
    return (
        f"WITH {table_toks_cte}, "
        f"{_gram_counts_sql(1, 'r1')}, {_gram_counts_sql(2, 'r2')}, "
        f"{_gram_counts_sql(3, 'r3')} "
        "SELECT d.doc_id, "
        "CAST(coalesce(r1.n_grams, 0) AS BIGINT) AS n_tokens, "
        f"{round6_sql('coalesce(r1.top_frac, 0.0)')} AS top_token_frac, "
        f"{round6_sql('coalesce(r2.top_frac, 0.0)')} AS top_2gram_frac, "
        f"{round6_sql('coalesce(r2.dup_frac, 0.0)')} AS dup_2gram_frac, "
        f"{round6_sql('coalesce(r3.top_frac, 0.0)')} AS top_3gram_frac "
        "FROM docs d LEFT JOIN r1 USING (doc_id) LEFT JOIN r2 USING (doc_id) "
        "LEFT JOIN r3 USING (doc_id) ORDER BY d.doc_id"
    )


def doc_keywords(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document keyword extraction: top-k terms by tf-idf
    (tf * ln(N/df)) -> (doc_id, rank, term, tfidf) — the doc-tagging /
    metadata primitive of a training-data pipeline (mixture weighting,
    retrieval filters). One explode, two hash aggregations (per-doc tf;
    corpus df), then a window PARTITIONED BY doc_id (parallel across
    docs — never a global sort). Ties: tfidf desc, term asc.
    """
    from pyspark.sql.window import Window

    # one scan feeds both aggregations — cut the lineage so the
    # tokenize/explode subtree runs once, not per consumer
    tf2 = docs.select(
        "doc_id", F.explode("tokens").alias("term")
    ).localCheckpoint(eager=False)
    tfc = tf2.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # NO broadcast hint: dfc is vocabulary-sized (the repo rule — a
    # corpus vocabulary is too big to broadcast at the design point;
    # the term-keyed shuffle join is the scale shape). n_docs folds in
    # as a 1-row broadcast instead of a separate eager count() action.
    # ALL docs, like the oracle's count(*) — empty-token docs count in N
    nd = docs.agg(F.count("*").cast("double").alias("_n"))
    dfc = tf2.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tfc.join(dfc, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log(F.col("_n") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("doc_id", "rank", "term", round6("tfidf").alias("tfidf"))
        .orderBy("doc_id", "rank")
    )


def doc_keywords_sql(table_toks_cte: str, k: int = 5) -> str:
    return (
        f"WITH {table_toks_cte}, "
        "tf2 AS (SELECT doc_id, unnest(toks) AS term FROM docs), "
        "tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf2 GROUP BY 1, 2), "
        "dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf2 GROUP BY 1), "
        "nd AS (SELECT count(*) AS n FROM docs), "
        "scored AS (SELECT t.doc_id, t.term, "
        "  CAST(t.tf AS DOUBLE) * ln(CAST(nd.n AS DOUBLE) / dfc.df) AS tfidf "
        "  FROM tfc t JOIN dfc USING (term) CROSS JOIN nd), "
        "rk AS (SELECT doc_id, term, tfidf, row_number() OVER "
        "  (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank FROM scored) "
        f"SELECT doc_id, CAST(rank AS INT) AS rank, term, "
        f"{round6_sql('tfidf')} AS tfidf FROM rk WHERE rank <= {int(k)} "
        "ORDER BY doc_id, rank"
    )


# ---------------------------------------------------------------------------
# per-domain quality rollup (blocklist derivation)

DOMAIN_LOW_QUALITY = 0.55
DOMAIN_FLAG_FRAC = 0.5


def domain_quality(
    docs: DataFrame,
    low_quality: float = DOMAIN_LOW_QUALITY,
    flag_frac: float = DOMAIN_FLAG_FRAC,
    key: str = "source",
) -> DataFrame:
    """(source, n_docs, n_low, low_frac, flagged) — the FineWeb/C4-style
    domain blocklist derivation: per-doc quality scores rolled up by
    domain; a domain whose low-quality share exceeds ``flag_frac``
    becomes a blocklist candidate. ``docs`` carries
    (doc_id, text, tokens, ``key``).

    Determinism note: the rollup aggregates only INTEGER counts (the
    per-doc threshold test runs on the 6-dp-rounded quality, which the
    gate proves bit-identical across engines) — never a float mean,
    whose partial-aggregation order would differ between engines.
    ONE scan (the grouping key rides through ``quality_score(keep=)``
    instead of a second corpus pass + self-join), one groupBy; the
    quality expressions fuse into the scan.
    """
    j = quality_score(docs, keep=(key,)).select("doc_id", "quality", key)
    g = j.groupBy(key).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("quality") < F.lit(float(low_quality))).cast("int"))
        .cast("long")
        .alias("n_low"),
    )
    return g.select(
        key,
        "n_docs",
        "n_low",
        round6(F.col("n_low") * F.lit(1.0) / F.col("n_docs")).alias("low_frac"),
        (F.col("n_low") * F.lit(1.0) / F.col("n_docs") > F.lit(float(flag_frac)))
        .alias("flagged"),
    ).orderBy(key)


def domain_quality_sql(
    table_toks_cte: str,
    low_quality: float = DOMAIN_LOW_QUALITY,
    flag_frac: float = DOMAIN_FLAG_FRAC,
    table: str = "documents",
) -> str:
    base = quality_score_sql(table_toks_cte)
    nlow = (
        f"sum(CASE WHEN b.quality < CAST({low_quality} AS DOUBLE) "
        "THEN 1 ELSE 0 END)"
    )
    return (
        f"WITH base AS ({base}) "
        "SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST({nlow} AS BIGINT) AS n_low, "
        f"{round6_sql(f'{nlow} * 1.0 / count(*)')} AS low_frac, "
        f"{nlow} * 1.0 / count(*) > CAST({flag_frac} AS DOUBLE) AS flagged "
        f"FROM base b JOIN {table} d USING (doc_id) "
        "GROUP BY d.source ORDER BY d.source"
    )


# ---------------------------------------------------------------------------
# unigram-LM perplexity (CCNet-style quality signal)


def unigram_logppl(docs: DataFrame) -> DataFrame:
    """(doc_id, doc_len, nll_per_tok, ppl) — the CCNet/Wikipedia-LM
    quality signal of web-corpus curation: each document scored by the
    mean negative log-likelihood of its tokens under the corpus's own
    unigram LM (P(t) = ctf(t)/total, MLE — every doc token exists in
    the corpus by construction, so no smoothing term to diverge on).
    Low nll flags stereotypical/templated text, high nll flags
    rare-token soup — the two tails a perplexity filter trims.

    Scale: one explode, two hash aggs (per-doc tf; corpus ctf as a
    map-side-combinable sum OVER the per-doc tf, never a second pass
    on the exploded rows), a term-keyed join of relations already
    partitioned by term, and the canonical term-sorted fold
    (aggregate(array_sort(collect_list))) for engine-deterministic
    doubles — the same discipline as the BM25 scorer. The 1-row total
    enters as a broadcast cross join, not a driver collect.
    """
    tf2 = docs.select("doc_id", F.explode("tokens").alias("term"))
    dtf = tf2.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    # dtf feeds the plan twice (ctf rollup + the scoring join): lazily
    # localCheckpoint the slim (doc_id, term, tf) relation so the
    # tokenize+explode+agg upstream runs once, not per reference —
    # materializing it costs ~the tf relation the index build persists
    # anyway, strictly cheaper than re-tokenizing the corpus
    dtf = dtf.localCheckpoint(eager=False)
    ctf = dtf.groupBy("term").agg(F.sum("tf").cast("long").alias("ctf"))
    tot = ctf.agg(F.sum("ctf").cast("double").alias("_total"))
    contrib = (
        dtf.join(ctf, "term")
        .crossJoin(F.broadcast(tot))
        .withColumn("c", F.col("tf") * F.log(F.col("_total") / F.col("ctf")))
    )
    agg = contrib.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("doc_len"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("s"),
    )
    nll = F.coalesce(F.col("s") / F.col("doc_len"), F.lit(0.0))
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("doc_len"), F.lit(0)).cast("long").alias("doc_len"),
            round6(nll).alias("nll_per_tok"),
            round6(F.exp(nll)).alias("ppl"),
        )
        .orderBy("doc_id")
    )


def unigram_logppl_sql(table_toks_cte: str) -> str:
    nll = "coalesce(a.s / a.doc_len, 0.0)"
    return (
        f"WITH {table_toks_cte}, "
        "tf2 AS (SELECT doc_id, unnest(toks) AS term FROM docs), "
        "dtf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
        "  FROM tf2 GROUP BY 1, 2), "
        "ctf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM dtf GROUP BY 1), "
        "tot AS (SELECT CAST(sum(ctf) AS DOUBLE) AS total FROM ctf), "
        "contrib AS (SELECT doc_id, term, tf, "
        "  tf * ln((SELECT total FROM tot) / ctf) AS c FROM dtf JOIN ctf USING (term)), "
        "agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len, "
        "  sum(c ORDER BY term) AS s FROM contrib GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(coalesce(a.doc_len, 0) AS BIGINT) AS doc_len, "
        f"{round6_sql(nll)} AS nll_per_tok, "
        f"{round6_sql(f'exp({nll})')} AS ppl "
        "FROM docs d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"
    )


# ---------------------------------------------------------------------------
# corpus-level n-gram frequency table (the Google-ngrams-style LM artifact)


def corpus_ngrams(docs: DataFrame, n: int = 2, k: int = 50) -> DataFrame:
    """(n, gram, cnt, df) — the top-k corpus-wide token n-grams by
    occurrence count with document frequency: the shared LM artifact
    behind contamination checks, boilerplate lists, and n-gram LM
    scoring. Tiebreak: cnt desc, gram asc (deterministic).

    Scale shape: per-row gram generation in a JVM transform (no
    Python), one explode, one corpus groupBy(gram) whose occurrence
    count is map-side combinable (hot grams collapse before the
    shuffle; the countDistinct(doc_id) lane is the expand-shuffle that
    actually moves rows), then a distributed TakeOrdered for the top-k
    — never a global sort or single-partition window.
    """
    gram = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(n))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(tokens) >= {n} THEN "
                f"transform(sequence(0, size(tokens) - {n}), i -> {gram}) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    agg = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("cnt"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    return (
        agg.select(F.lit(int(n)).cast("int").alias("n"), "gram", "cnt", "df")
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(int(k))
    )


def collocations_pmi(
    docs: DataFrame, min_count: int = 5, k: int = 50
) -> DataFrame:
    """(t1, t2, cnt, pmi) — top-k bigram collocations by pointwise
    mutual information: pmi = ln( p(t1 t2) / (p(t1) p(t2)) ) with
    p(t1 t2) = cnt/total_bigrams and p(t) = c(t)/total_tokens (the
    classic Church & Hanks 1990 association measure — public corpus
    linguistics; feeds phrase dictionaries, tokenizer-merge candidates
    and stopword-pair lists in a training-data pipeline). ``min_count``
    drops rare pairs whose PMI is dominated by noise.

    Scale shape: unigram and bigram counts are two map-side-combinable
    groupBys over a JVM transform (no Python); the PMI join is bigram
    relation x the vocab-sized unigram relation on each side — term-
    keyed shuffle joins, never a broadcast of the corpus; totals are
    1-row aggs broadcast back via crossJoin; top-k is a distributed
    TakeOrdered on the raw (bit-deterministic) PMI double.
    """
    uni = (
        docs.select(F.explode("tokens").alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    big = (
        docs.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(tokens) >= 2 THEN "
                    "transform(sequence(0, size(tokens) - 2), "
                    "i -> struct(tokens[i] AS t1, tokens[i + 1] AS t2)) "
                    "ELSE array() END"
                )
            ).alias("p")
        )
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = uni.agg(F.sum("c").cast("long").alias("t_uni"))
    totb = big.agg(F.sum("cnt").cast("long").alias("t_big"))
    j = (
        big.where(F.col("cnt") >= min_count)
        .join(uni.select(F.col("t").alias("t1"), F.col("c").alias("c1")), "t1")
        .join(uni.select(F.col("t").alias("t2"), F.col("c").alias("c2")), "t2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(totb))
    )
    pmi = F.log(
        (F.col("cnt").cast("double") / F.col("t_big"))
        / (
            (F.col("c1").cast("double") / F.col("t_uni"))
            * (F.col("c2").cast("double") / F.col("t_uni"))
        )
    )
    return (
        j.withColumn("_pmi", pmi)
        .orderBy(F.desc("_pmi"), F.asc("t1"), F.asc("t2"))
        .limit(int(k))
        .select("t1", "t2", "cnt", round6(F.col("_pmi")).alias("pmi"))
    )


def collocations_pmi_sql(
    table_toks_cte: str, min_count: int = 5, k: int = 50
) -> str:
    return (
        f"WITH {table_toks_cte}, "
        "uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM "
        "(SELECT unnest(toks) AS t FROM docs) GROUP BY t), "
        "g AS (SELECT toks[i] AS t1, toks[i + 1] AS t2 FROM docs, "
        "unnest(generate_series(1, len(toks) - 1)) AS _t(i)), "
        "big AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY t1, t2), "
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS t_uni FROM uni), "
        "totb AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_big FROM big), "
        "j AS (SELECT b.t1, b.t2, b.cnt, "
        "ln((b.cnt * 1.0 / (SELECT t_big FROM totb)) / "
        "((u1.c * 1.0 / (SELECT t_uni FROM tot)) * (u2.c * 1.0 / (SELECT t_uni FROM tot)))) AS pmi "
        "FROM big b JOIN uni u1 ON u1.t = b.t1 JOIN uni u2 ON u2.t = b.t2 "
        f"WHERE b.cnt >= {int(min_count)}) "
        # ORDER BY the RAW pmi (a bare 'pmi' would bind to the rounded
        # SELECT alias in DuckDB, while Spark orders by raw _pmi — a
        # 6-dp round-collision at the LIMIT boundary would then cut a
        # different row set across engines)
        f"SELECT t1, t2, cnt, {round6_sql('pmi')} AS pmi FROM j "
        f"ORDER BY j.pmi DESC, t1 ASC, t2 ASC LIMIT {int(k)}"
    )


def corpus_ngrams_sql(table_toks_cte: str, n: int = 2, k: int = 50) -> str:
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"WITH {table_toks_cte}, "
        f"g AS (SELECT doc_id, {gram} AS gram FROM docs, "
        f"unnest(generate_series(1, len(toks) - {n - 1})) AS _t(i)), "
        "a AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM g GROUP BY gram) "
        f"SELECT CAST({int(n)} AS INT) AS n, gram, cnt, df FROM a "
        f"ORDER BY cnt DESC, gram ASC LIMIT {int(k)}"
    )


def ngram_diversity(docs: DataFrame, max_n: int = 3) -> DataFrame:
    """(n, total, distinct, diversity) — distinct-n corpus diversity
    (Li et al. 2016's distinct-n, the standard repetitiveness /
    mode-collapse metric a training-data pipeline tracks per source and
    per snapshot): for each n in 1..max_n, the number of n-gram
    occurrences, the number of DISTINCT n-grams, and their ratio. A
    boilerplate-heavy crawl shows low distinct-2/3; a healthy diverse
    corpus is near its vocabulary ceiling.

    Scale shape: per-n, one JVM gram transform + explode and one
    map-side-combinable count + approx-free distinct via groupBy —
    counts are integers, the single ratio division happens on the
    per-n 1-row result with the identical operand sequence on both
    engines."""
    if int(max_n) < 1:
        raise ValueError(f"max_n must be >= 1: {max_n!r}")
    outs = []
    for n in range(1, int(max_n) + 1):
        gram = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(n))
        grams = docs.select(
            F.explode(
                F.expr(
                    f"CASE WHEN size(tokens) >= {n} THEN "
                    f"transform(sequence(0, size(tokens) - {n}), i -> {gram}) "
                    "ELSE array() END"
                )
            ).alias("gram")
        )
        per = grams.groupBy("gram").agg(
            F.count("*").cast("long").alias("c")
        )
        outs.append(
            per.agg(
                F.lit(int(n)).cast("int").alias("n"),
                F.sum("c").cast("long").alias("total"),
                F.count("*").cast("long").alias("distinct"),
            ).select(
                "n",
                F.coalesce("total", F.lit(0)).cast("long").alias("total"),
                "distinct",
                round6(
                    F.when(
                        F.coalesce("total", F.lit(0)) > 0,
                        F.col("distinct") * F.lit(1.0) / F.col("total"),
                    ).otherwise(0.0)
                ).alias("diversity"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("n")


def ngram_diversity_sql(table_toks_cte: str, max_n: int = 3) -> str:
    parts = []
    for n in range(1, int(max_n) + 1):
        gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
        parts.append(
            f"SELECT CAST({n} AS INT) AS n, "
            "CAST(coalesce(sum(c), 0) AS BIGINT) AS total, "
            "CAST(count(*) AS BIGINT) AS \"distinct\", "
            + round6_sql(
                "CASE WHEN coalesce(sum(c), 0) > 0 "
                "THEN count(*) * 1.0 / sum(c) ELSE 0.0 END"
            )
            + " AS diversity FROM ("
            f"SELECT gram, CAST(count(*) AS BIGINT) AS c FROM "
            f"(SELECT {gram} AS gram FROM docs, "
            f"unnest(generate_series(1, len(toks) - {n - 1})) AS _t(i)) "
            "GROUP BY gram)"
        )
    return (
        f"WITH {table_toks_cte} SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY n"
    )


def zipf_fit(docs: DataFrame, top_n: int = 100) -> DataFrame:
    """(n_terms, slope, intercept) — least-squares fit of
    ln(freq) ~ slope * ln(rank) + intercept over the top ``top_n``
    corpus terms (Zipf 1949: natural text sits near slope -1; word
    soup and boilerplate-heavy crawls drift off it — a one-row corpus
    health diagnostic beside ngram_diversity).

    Determinism: ranks are the (freq desc, term asc) total order; the
    four regression sums each fold in rank order on both engines
    (sum(... ORDER BY rank) == the array_sort fold) and the
    slope/intercept arithmetic is one identical operand sequence on
    the 1-row result. ln is the house exp/ln precedent. The window
    ranks a ``top_n``-row relation (post-TakeOrdered), never the
    vocabulary."""
    from pyspark.sql.window import Window

    if int(top_n) < 2:
        raise ValueError(f"top_n must be >= 2: {top_n!r}")
    per = (
        docs.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    top = per.orderBy(F.desc("c"), F.asc("term")).limit(int(top_n))
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    xy = top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )

    def _fold(col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", F.col(col).alias("v")))),
            F.lit(0.0),
            lambda acc, s: acc + s["v"],
        )

    agg = xy.select(
        "rank", "x", "y", (F.col("x") * F.col("y")).alias("xy"),
        (F.col("x") * F.col("x")).alias("xx"),
    ).agg(
        F.count("*").cast("double").alias("n"),
        _fold("x").alias("sx"),
        _fold("y").alias("sy"),
        _fold("xy").alias("sxy"),
        _fold("xx").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.col("n").cast("long").alias("n_terms"),
        round6(slope).alias("slope"),
        round6((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias(
            "intercept"
        ),
    )


def zipf_fit_sql(table_toks_cte: str, top_n: int = 100) -> str:
    slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
    return (
        f"WITH {table_toks_cte}, "
        "per AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM "
        "(SELECT unnest(toks) AS term FROM docs) GROUP BY term), "
        "top AS (SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) "
        f"AS rank FROM per ORDER BY c DESC, term ASC LIMIT {int(top_n)}), "
        "xy AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS x, "
        "ln(CAST(c AS DOUBLE)) AS y FROM top), "
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        "sum(x ORDER BY rank) AS sx, sum(y ORDER BY rank) AS sy, "
        "sum(x * y ORDER BY rank) AS sxy, "
        "sum(x * x ORDER BY rank) AS sxx FROM xy) "
        "SELECT CAST(n AS BIGINT) AS n_terms, "
        + round6_sql(slope)
        + " AS slope, "
        + round6_sql(f"(sy - ({slope}) * sx) / n")
        + " AS intercept FROM s"
    )


def _snapshot_counts(docs: DataFrame, name: str) -> DataFrame:
    return (
        docs.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias(name))
    )


def term_drift(
    docs_old: DataFrame, docs_new: DataFrame, k: int = 50
) -> DataFrame:
    """(term, c_old, c_new, dlp) — the top-k vocabulary movers between
    two corpus snapshots: dlp = ln p_new(t) - ln p_old(t) over
    Laplace-smoothed unigram LMs on the UNION vocabulary (a term absent
    from one side still ranks — new spam tokens and vanished
    boilerplate are exactly the signal). The crawl-monitoring view an
    ingestion pipeline alerts on. Ordered by (|dlp| desc, term asc),
    TakeOrdered k-cut.

    Scale: two map-side-combinable count aggs, one term-keyed outer
    join, totals as a 1-row broadcast — no vocabulary collect, no
    global sort."""
    co = _snapshot_counts(docs_old, "c_old")
    cn = _snapshot_counts(docs_new, "c_new")
    u = co.join(cn, "term", "outer").na.fill({"c_old": 0, "c_new": 0})
    tot = u.agg(
        F.sum("c_old").cast("double").alias("_to"),
        F.sum("c_new").cast("double").alias("_tn"),
        F.count("*").cast("double").alias("_v"),
    )
    j = u.crossJoin(F.broadcast(tot))
    dlp = F.log(
        (F.col("c_new") + F.lit(1.0)) / (F.col("_tn") + F.col("_v"))
    ) - F.log((F.col("c_old") + F.lit(1.0)) / (F.col("_to") + F.col("_v")))
    return (
        j.select("term", "c_old", "c_new", dlp.alias("_d"))
        .orderBy(F.desc(F.abs(F.col("_d"))), F.asc("term"))
        .limit(int(k))
        .select("term", "c_old", "c_new", round6("_d").alias("dlp"))
    )


def snapshot_kl(docs_old: DataFrame, docs_new: DataFrame) -> DataFrame:
    """(v_union, kl) — KL(p_new || p_old) between the two snapshots'
    Laplace-smoothed unigram LMs: the one-number drift alarm beside
    term_drift's per-term view. The union-vocabulary sum folds with
    the house canonical two-level md5-bucket fold (per-bucket
    term-ordered, then bucket-ordered over <=4096 sums — the idf-fold
    shape, so a 10^9-term vocabulary never funnels into one task)."""
    co = _snapshot_counts(docs_old, "c_old")
    cn = _snapshot_counts(docs_new, "c_new")
    u = co.join(cn, "term", "outer").na.fill({"c_old": 0, "c_new": 0})
    tot = u.agg(
        F.sum("c_old").cast("double").alias("_to"),
        F.sum("c_new").cast("double").alias("_tn"),
        F.count("*").cast("double").alias("_v"),
    )
    j = u.crossJoin(F.broadcast(tot))
    pn = (F.col("c_new") + F.lit(1.0)) / (F.col("_tn") + F.col("_v"))
    po = (F.col("c_old") + F.lit(1.0)) / (F.col("_to") + F.col("_v"))
    contrib = j.select(
        "term", (pn * (F.log(pn) - F.log(po))).alias("c")
    )
    bsums = contrib.groupBy(
        F.substring(F.md5("term"), 1, 3).alias("_b")
    ).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("_s"),
        F.count("*").cast("long").alias("_n"),
    )
    return bsums.agg(
        F.sum("_n").cast("long").alias("v_union"),
        round6(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_b", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            )
        ).alias("kl"),
    )


def _drift_ctes(old_cte: str, new_cte: str) -> str:
    """Shared CTE chain: old/new docs CTEs (docs_old/docs_new with a
    toks column) -> u(term, c_old, c_new) + tot."""
    return (
        f"{old_cte}, {new_cte}, "
        "co AS (SELECT term, CAST(count(*) AS BIGINT) AS c_old FROM "
        "(SELECT unnest(toks) AS term FROM docs_old) GROUP BY term), "
        "cn AS (SELECT term, CAST(count(*) AS BIGINT) AS c_new FROM "
        "(SELECT unnest(toks) AS term FROM docs_new) GROUP BY term), "
        "u AS (SELECT coalesce(co.term, cn.term) AS term, "
        "coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new "
        "FROM co FULL OUTER JOIN cn ON co.term = cn.term), "
        "tot AS (SELECT CAST(sum(c_old) AS DOUBLE) AS t_o, "
        "CAST(sum(c_new) AS DOUBLE) AS t_n, "
        "CAST(count(*) AS DOUBLE) AS v FROM u)"
    )


def term_drift_sql(old_cte: str, new_cte: str, k: int = 50) -> str:
    dlp = (
        "ln((c_new + 1.0) / ((SELECT t_n FROM tot) + (SELECT v FROM tot))) - "
        "ln((c_old + 1.0) / ((SELECT t_o FROM tot) + (SELECT v FROM tot)))"
    )
    return (
        f"WITH {_drift_ctes(old_cte, new_cte)}, "
        f"d AS (SELECT term, c_old, c_new, {dlp} AS dlp FROM u) "
        f"SELECT term, c_old, c_new, {round6_sql('dlp')} AS dlp FROM d "
        f"ORDER BY abs(dlp) DESC, term ASC LIMIT {int(k)}"
    )


def snapshot_kl_sql(old_cte: str, new_cte: str) -> str:
    pn = "((c_new + 1.0) / ((SELECT t_n FROM tot) + (SELECT v FROM tot)))"
    po = "((c_old + 1.0) / ((SELECT t_o FROM tot) + (SELECT v FROM tot)))"
    return (
        f"WITH {_drift_ctes(old_cte, new_cte)}, "
        f"contrib AS (SELECT term, {pn} * (ln({pn}) - ln({po})) AS c FROM u), "
        "bs AS (SELECT substr(md5(term), 1, 3) AS b, "
        "sum(c ORDER BY term) AS s, CAST(count(*) AS BIGINT) AS n "
        "FROM contrib GROUP BY 1) "
        "SELECT CAST(sum(n) AS BIGINT) AS v_union, "
        f"{round6_sql('sum(s ORDER BY b)')} AS kl FROM bs"
    )


# --------------------------------------------------------------------------
# string_stats aggregation (ES string_stats: count / min / max / avg
# length + Shannon character entropy)
# --------------------------------------------------------------------------

_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def string_stats(docs: DataFrame) -> DataFrame:
    """(n_docs, min_len, max_len, avg_len, alpha_chars, entropy) — the
    ES ``string_stats`` aggregation over the text field: document
    count, min/max/avg raw character length, and the Shannon entropy
    (bits) of the character distribution, restricted to the analyzer
    alphabet [a-z0-9] after lowercasing (ES computes entropy over raw
    bytes; the fixed 36-char alphabet keeps the surface enumerable and
    the whole plan explode-free).

    Scale: per-char counts are length(lt) - length(replace(lt, c, ''))
    — 36 integer expressions per row inside whole-stage codegen, ZERO
    explode (a per-character unnest would be a 10^15-row relation at
    web scale) and zero shuffle beyond the final 1-row partial-agg
    reduce. Parity: every aggregate is an exact integer; the entropy
    folds the 36 (cnt/tot)*log2(cnt/tot) terms in fixed alphabet order
    as one chained sum spelled identically on both engines, zero-count
    chars contributing an exact 0.0 via CASE (never 0 * log2(0) =
    NaN)."""
    lt = F.lower(F.col("text"))
    per = docs.select(
        F.length("text").cast("long").alias("L"),
        *[
            (F.length(lt) - F.length(F.replace(lt, F.lit(c))))
            .cast("long")
            .alias(f"c_{c}")
            for c in _ALPHABET
        ],
    )
    agg = per.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("L").alias("min_len"),
        F.max("L").alias("max_len"),
        F.sum("L").cast("long").alias("sum_len"),
        *[F.sum(f"c_{c}").cast("long").alias(f"n_{c}") for c in _ALPHABET],
    )
    tot = None
    for c in _ALPHABET:
        col = F.col(f"n_{c}")
        tot = col if tot is None else tot + col
    agg = agg.withColumn("tot", tot.cast("long"))
    ent = None
    t = F.col("tot").cast("double")
    for c in _ALPHABET:
        cnt = F.col(f"n_{c}").cast("double")
        term = F.when(
            F.col(f"n_{c}") == 0, F.lit(0.0)
        ).otherwise((cnt / t) * F.log2(cnt / t))
        ent = term if ent is None else ent + term
    entropy = F.when(F.col("tot") == 0, F.lit(0.0)).otherwise(-ent)
    return agg.select(
        "n_docs",
        "min_len",
        "max_len",
        round6(
            F.col("sum_len").cast("double") * F.lit(1.0) / F.col("n_docs")
        ).alias("avg_len"),
        F.col("tot").alias("alpha_chars"),
        round6(entropy).alias("entropy"),
    )


def string_stats_sql(table: str = "documents") -> str:
    """DuckDB mirror of string_stats: identical per-char length-diff
    counts, identical fixed-order chained entropy sum, identical CASE
    guards."""
    per_cols = ", ".join(
        f"CAST(sum(length(lower(text)) - length(replace(lower(text), '{c}', ''))) AS BIGINT) AS n_{c}"
        for c in _ALPHABET
    )
    tot = " + ".join(f"n_{c}" for c in _ALPHABET)
    ent_terms = " + ".join(
        f"CASE WHEN n_{c} = 0 THEN 0.0 ELSE "
        f"(CAST(n_{c} AS DOUBLE) / CAST(tot AS DOUBLE)) * "
        f"log2(CAST(n_{c} AS DOUBLE) / CAST(tot AS DOUBLE)) END"
        for c in _ALPHABET
    )
    return (
        "WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "min(length(text)) AS min_len, max(length(text)) AS max_len, "
        f"CAST(sum(length(text)) AS BIGINT) AS sum_len, {per_cols} "
        f"FROM {table}), "
        f"wt AS (SELECT *, CAST({tot} AS BIGINT) AS tot FROM base) "
        "SELECT n_docs, CAST(min_len AS BIGINT) AS min_len, "
        "CAST(max_len AS BIGINT) AS max_len, "
        f"{round6_sql('CAST(sum_len AS DOUBLE) * 1.0 / n_docs')} AS avg_len, "
        "tot AS alpha_chars, "
        f"{round6_sql(f'CASE WHEN tot = 0 THEN 0.0 ELSE -({ent_terms}) END')} AS entropy "
        "FROM wt"
    )


# --------------------------------------------------------------------------
# median_absolute_deviation aggregation (ES MAD agg, exact)
# --------------------------------------------------------------------------


def doclen_mad(docs: DataFrame) -> DataFrame:
    """(n_docs, median_len, mad) — the ES ``median_absolute_deviation``
    agg over document token counts: MAD = median(|len - median(len)|),
    the robust dispersion stat a curation pipeline reads next to the
    boxplot (outlier-resistant where stddev is not). ES approximates
    with TDigest; this is EXACT via type-1 (lower) medians — rank
    ceil(n/2) = (n+1) DIV 2 of the sorted values, the bm25_boxplot
    convention — so every output is an integer present in the data and
    the cross-engine surface is float-free.

    Scale: each median runs over the GROUPED value distribution (one
    map-side-combinable count per distinct length, a cumulative window
    over the value space — bounded by the column's cardinality, not the
    corpus) plus a 1-row broadcast; the deviation pass re-reads the
    lengths relation with the 1-row median broadcast. No corpus-wide
    sort anywhere."""
    from pyspark.sql.window import Window

    def _median(vals: DataFrame) -> DataFrame:
        grouped = vals.groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        cum = grouped.withColumn("cum", F.sum("cnt").over(w))
        n1 = cum.agg(F.sum("cnt").cast("long").alias("n"))
        return (
            cum.crossJoin(F.broadcast(n1))
            .agg(
                F.min(
                    F.when(
                        F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("v")
                    )
                ).cast("long").alias("m"),
                F.max("n").cast("long").alias("n"),
            )
        )

    vals = docs.select(F.size("tokens").cast("long").alias("v"))
    med = _median(vals)
    dev = vals.crossJoin(
        F.broadcast(med.select(F.col("m").alias("_med")))
    ).select(F.abs(F.col("v") - F.col("_med")).cast("long").alias("v"))
    mad = _median(dev).select(F.col("m").alias("mad"))
    return med.select(
        F.col("n").alias("n_docs"), F.col("m").alias("median_len")
    ).crossJoin(F.broadcast(mad))


def doclen_mad_sql(table_toks_cte: str) -> str:
    """DuckDB mirror of doclen_mad: identical grouped cumulative
    distributions and the identical (n + 1) // 2 integer rank."""
    return (
        f"WITH {table_toks_cte}, "
        "vals AS (SELECT CAST(len(toks) AS BIGINT) AS v FROM docs), "
        "g1 AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM vals GROUP BY v), "
        "c1 AS (SELECT v, sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g1), "
        "n1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g1), "
        "m1 AS (SELECT CAST(min(CASE WHEN cum >= ((SELECT n FROM n1) + 1) // 2 THEN v END) AS BIGINT) AS m FROM c1), "
        "dev AS (SELECT CAST(abs(v - (SELECT m FROM m1)) AS BIGINT) AS v FROM vals), "
        "g2 AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM dev GROUP BY v), "
        "c2 AS (SELECT v, sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g2), "
        "m2 AS (SELECT CAST(min(CASE WHEN cum >= ((SELECT n FROM n1) + 1) // 2 THEN v END) AS BIGINT) AS m FROM c2) "
        "SELECT (SELECT n FROM n1) AS n_docs, (SELECT m FROM m1) AS median_len, "
        "(SELECT m FROM m2) AS mad"
    )


# ---------------------------------------------------------------------------
# readability (Flesch reading ease / Flesch-Kincaid grade)
# ---------------------------------------------------------------------------


def readability(documents: DataFrame) -> DataFrame:
    """(lang, n_docs, n_words, n_sentences, n_syllables, flesch,
    fk_grade) — per-language Flesch reading ease (Flesch 1948) and
    Flesch-Kincaid grade level (Kincaid et al. 1975), the classic
    readability gates a curation pipeline reads beside quality_score
    (e.g. "keep 30 <= flesch <= 70" for training-text filtering).

    Deterministic counting (the text_complexity lane): words =
    nonempty whitespace splits, sentences = [.!?]+ terminal groups
    (floored at 1 per doc — headlines count as one sentence),
    syllables = [aeiouy]+ vowel groups of the lowercased text (the
    standard cheap approximation; a hyphenation dictionary slots in
    per-word without changing the rollup). All three are exact
    per-doc integers summed map-side-combinably per lang; the two
    formula divisions run ONCE per lang row on the exact integer
    sums with an identical operand sequence on both engines (an
    all-empty lang reports 0.0/0.0 instead of dividing by zero).

    Scale: one scan, three regexp counts per row inside codegen, one
    tiny groupBy(lang) — the same shape at 10^12 docs."""
    # word split via the Column API — the token_counts \x0B SQL-parser
    # hazard (F.expr would match literal x/0/B)
    words = F.size(
        F.filter(F.split(F.col("text"), WS_CLASS + "+"), lambda x: x != F.lit(""))
    ).cast("bigint")
    sents = "greatest(CAST(1 AS BIGINT), CAST(size(regexp_extract_all(text, '[.!?]+', 0)) AS BIGINT))"
    syll = "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT)"
    per = documents.select(
        "lang",
        words.alias("w"),
        F.expr(sents).alias("s"),
        F.expr(syll).alias("y"),
    )
    agg = per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("n_words"),
        F.sum("s").cast("long").alias("n_sentences"),
        F.sum("y").cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    zero = F.col("n_words") == 0
    return agg.select(
        "lang", "n_docs", "n_words", "n_sentences", "n_syllables",
        round6(F.when(zero, F.lit(0.0)).otherwise(flesch)).alias("flesch"),
        round6(F.when(zero, F.lit(0.0)).otherwise(fk)).alias("fk_grade"),
    ).orderBy("lang")


def readability_sql() -> str:
    """DuckDB mirror of readability: identical counting regexes,
    identical formula operand sequences on the exact integer sums."""
    words = (
        r"CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), "
        r"x -> x != '')) AS BIGINT)"
    )
    sents = (
        "greatest(CAST(1 AS BIGINT), "
        "CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))"
    )
    syll = "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)"
    wps = "CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)"
    spw = "CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)"
    flesch = f"206.835e0 - 1.015e0 * ({wps}) - 84.6e0 * ({spw})"
    fk = f"0.39e0 * ({wps}) + 11.8e0 * ({spw}) - 15.59e0"
    return (
        f"WITH per AS (SELECT lang, {words} AS w, {sents} AS s, {syll} AS y "
        "FROM documents), "
        "agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(w) AS BIGINT) AS n_words, "
        "CAST(sum(s) AS BIGINT) AS n_sentences, "
        "CAST(sum(y) AS BIGINT) AS n_syllables FROM per GROUP BY lang) "
        "SELECT lang, n_docs, n_words, n_sentences, n_syllables, "
        f"{round6_sql(f'CASE WHEN n_words = 0 THEN 0.0 ELSE {flesch} END')} AS flesch, "
        f"{round6_sql(f'CASE WHEN n_words = 0 THEN 0.0 ELSE {fk} END')} AS fk_grade "
        "FROM agg ORDER BY lang"
    )


# ---------------------------------------------------------------------------
# tokenizer fertility (chars/token, bytes/token per language)
# ---------------------------------------------------------------------------


def tokenizer_fertility(documents: DataFrame) -> DataFrame:
    """(lang, n_docs, n_chars, n_bytes, n_tokens, chars_per_token,
    bytes_per_token) — tokenizer-efficiency stats per language, the
    metric an LLM pipeline tracks when choosing/retraining a tokenizer
    (fertility: how many tokens a language pays per unit of text;
    high-fertility languages are underserved by the vocab). Tokens are
    the BPE-ish regex lane (token_counts' bpe_tokens); chars/bytes are
    exact integer sums (length vs octet_length — they diverge on
    multi-byte text, which is the point of reporting both). The two
    divisions run once per lang row; an all-empty lang reports 0.0.

    Scale: one scan, per-row integer expressions in codegen, one tiny
    groupBy(lang)."""
    per = documents.select(
        "lang",
        F.length("text").cast("long").alias("ch"),
        F.octet_length("text").cast("long").alias("by"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0)))
        .cast("long")
        .alias("tk"),
    )
    agg = per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ch").cast("long").alias("n_chars"),
        F.sum("by").cast("long").alias("n_bytes"),
        F.sum("tk").cast("long").alias("n_tokens"),
    )
    zero = F.col("n_tokens") == 0
    cpt = F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")
    bpt = F.col("n_bytes").cast("double") / F.col("n_tokens").cast("double")
    return agg.select(
        "lang", "n_docs", "n_chars", "n_bytes", "n_tokens",
        round6(F.when(zero, F.lit(0.0)).otherwise(cpt)).alias("chars_per_token"),
        round6(F.when(zero, F.lit(0.0)).otherwise(bpt)).alias("bytes_per_token"),
    ).orderBy("lang")


def tokenizer_fertility_sql() -> str:
    """DuckDB mirror of tokenizer_fertility (octet_length == strlen on
    DuckDB's UTF-8 storage; length() is character count on both)."""
    return (
        "WITH per AS (SELECT lang, CAST(length(text) AS BIGINT) AS ch, "
        "CAST(octet_length(text::BLOB) AS BIGINT) AS by, "
        f"CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS BIGINT) AS tk "
        "FROM documents), "
        "agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(ch) AS BIGINT) AS n_chars, CAST(sum(by) AS BIGINT) AS n_bytes, "
        "CAST(sum(tk) AS BIGINT) AS n_tokens FROM per GROUP BY lang) "
        "SELECT lang, n_docs, n_chars, n_bytes, n_tokens, "
        + "(floor((CASE WHEN n_tokens = 0 THEN 0.0 ELSE "
        "CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) END) * 1000000.0 + 0.5) "
        "/ 1000000.0) AS chars_per_token, "
        "(floor((CASE WHEN n_tokens = 0 THEN 0.0 ELSE "
        "CAST(n_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE) END) * 1000000.0 + 0.5) "
        "/ 1000000.0) AS bytes_per_token "
        "FROM agg ORDER BY lang"
    )


# ---------------------------------------------------------------------------
# terms-agg partitioning (ES include.partition / num_partitions)
# ---------------------------------------------------------------------------


def terms_partition(
    docs: DataFrame, partition: int = 0, num_partitions: int = 8,
    k: int = 20,
) -> DataFrame:
    """(term, df) — the ES high-cardinality terms-agg paging feature
    (``include.partition`` / ``num_partitions``): the top-k terms by
    document frequency RESTRICTED to the terms whose hash lands in
    partition ``partition`` of ``num_partitions`` — the way a client
    walks a 10^8-term dictionary without any single response (or any
    single agg) holding it. The partition hash is the house md5-slice
    integer (first 8 hex chars -> uniform [0, 2^32) -> % P), identical
    on both engines by construction; ordering is (df desc, term asc).

    Scale: the partition predicate applies BEFORE the top-k cut (on a
    persisted term dictionary it prunes the scan); the agg itself is
    the map-side-combinable df count + TakeOrdered."""
    if not (0 <= int(partition) < int(num_partitions)):
        raise ValueError(
            f"need 0 <= partition < num_partitions: {partition}/{num_partitions}"
        )
    tf2 = docs.select("doc_id", F.explode("tokens").alias("term"))
    dfreq = tf2.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    h = F.conv(
        F.substring(F.md5(F.encode(F.col("term"), "utf-8")), 1, 8), 16, 10
    ).cast("long") % int(num_partitions)
    return (
        dfreq.where(h == int(partition))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(int(k))
    )


def terms_partition_sql(
    table_toks_cte: str, partition: int = 0, num_partitions: int = 8,
    k: int = 20,
) -> str:
    if not (0 <= int(partition) < int(num_partitions)):
        raise ValueError(
            f"need 0 <= partition < num_partitions: {partition}/{num_partitions}"
        )
    return (
        f"WITH {table_toks_cte}, "
        "tf2 AS (SELECT doc_id, unnest(toks) AS term FROM docs), "
        "dfreq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
        "FROM tf2 GROUP BY term) "
        "SELECT term, df FROM dfreq "
        f"WHERE ('0x' || substr(md5(term), 1, 8))::BIGINT % {int(num_partitions)} "
        f"= {int(partition)} "
        f"ORDER BY df DESC, term ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# categorize_text aggregation (ES log-pattern categorization)
# ---------------------------------------------------------------------------


def categorize_text(
    docs: DataFrame, head_tokens: int = 4, k: int = 20
) -> DataFrame:
    """(category, n_docs, min_doc_id) — the ES ``categorize_text``
    aggregation reduced to its deterministic skeleton: messages group
    by their TEMPLATE — lowercase, every digit run collapsed to '#'
    (the variable part of log lines: ids, sizes, timestamps), then
    the first ``head_tokens`` whitespace tokens as the category key
    (ES's own tokenizer-prefix heuristic; its ML layer then merges
    similar categories — a shard-order-dependent step no relational
    engine reproduces, so the skeleton is the pinned contract).
    Top-k by (n_docs desc, category asc); min_doc_id pins membership.

    Scale: per-row string expression + ONE map-side-combinable
    groupBy + TakeOrdered — the geo_grid shape over a string key."""
    if int(head_tokens) < 1 or int(k) < 1:
        raise ValueError(
            f"need head_tokens >= 1 and k >= 1: {head_tokens!r}, {k!r}"
        )
    tmpl = F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "#")
    key = F.array_join(
        F.slice(
            F.filter(F.split(tmpl, " "), lambda x: x != F.lit("")),
            1,
            int(head_tokens),
        ),
        " ",
    )
    return (
        docs.select(key.alias("category"), "doc_id")
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .orderBy(F.desc("n_docs"), F.asc("category"))
        .limit(int(k))
    )


def categorize_text_sql(head_tokens: int = 4, k: int = 20) -> str:
    if int(head_tokens) < 1 or int(k) < 1:
        raise ValueError(
            f"need head_tokens >= 1 and k >= 1: {head_tokens!r}, {k!r}"
        )
    return (
        "WITH c AS (SELECT doc_id, array_to_string(list_filter("
        "string_split(regexp_replace(lower(text), '[0-9]+', '#', 'g'), ' '), "
        f"x -> x != '')[1:{int(head_tokens)}], ' ') AS category "
        "FROM documents) "
        "SELECT category, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS min_doc_id "
        "FROM c GROUP BY category "
        f"ORDER BY n_docs DESC, category ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# frequent_item_sets aggregation (ES 8.4 market-basket, pair itemsets)
# ---------------------------------------------------------------------------


def frequent_pairs(
    docs: DataFrame, min_support: int = 3, max_items: int = 200,
    k: int = 20,
) -> DataFrame:
    """(t1, t2, support) — the ES ``frequent_item_sets`` aggregation
    at itemset size 2: term pairs CO-OCCURRING in documents (the
    basket = a doc's distinct tokens), support = number of docs
    containing both, top-k by (support desc, t1 asc, t2 asc). Distinct
    from collocations_pmi, which counts ADJACENT bigrams.

    The scale story is the Apriori property made physical: a pair can
    only reach ``min_support`` if BOTH items do, so the pair explode
    runs over each doc's FREQUENT tokens only — the top ``max_items``
    terms by df (df desc, term asc; a broadcast set) — bounding the
    per-doc blowup at C(max_items, 2) instead of C(doc_len, 2), and
    in practice far below it. One combinable pair count after."""
    if int(min_support) < 1 or int(max_items) < 2 or int(k) < 1:
        raise ValueError(
            f"bad params: min_support={min_support} max_items={max_items} k={k}"
        )
    tf2 = docs.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
    dfreq = tf2.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    freq = (
        dfreq.where(F.col("df") >= int(min_support))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(int(max_items))
        .select("term")
    )
    items = tf2.join(F.broadcast(freq), "term")
    baskets = items.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("term")).alias("its")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(its, (x, i) -> "
                "transform(slice(its, i + 2, size(its)), y -> struct(x AS t1, y AS t2))))"
            )
        ).alias("p")
    ).select(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
    agg = pairs.groupBy("t1", "t2").agg(
        F.count("*").cast("long").alias("support")
    )
    return (
        agg.where(F.col("support") >= int(min_support))
        .orderBy(F.desc("support"), F.asc("t1"), F.asc("t2"))
        .limit(int(k))
    )


def frequent_pairs_sql(
    table_toks_cte: str, min_support: int = 3, max_items: int = 200,
    k: int = 20,
) -> str:
    if int(min_support) < 1 or int(max_items) < 2 or int(k) < 1:
        raise ValueError(
            f"bad params: min_support={min_support} max_items={max_items} k={k}"
        )
    return (
        f"WITH {table_toks_cte}, "
        "tf2 AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM docs), "
        "dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY term), "
        f"freq AS (SELECT term FROM dfreq WHERE df >= {int(min_support)} "
        f"ORDER BY df DESC, term ASC LIMIT {int(max_items)}), "
        "items AS (SELECT doc_id, term FROM tf2 JOIN freq USING (term)), "
        "baskets AS (SELECT doc_id, list_sort(list(DISTINCT term)) AS its "
        "FROM items GROUP BY doc_id), "
        "pairs AS (SELECT p.t1, p.t2 FROM baskets, "
        "unnest(flatten(list_transform(its, (x, i) -> "
        "list_transform(its[i + 1:], y -> {'t1': x, 't2': y})))) AS _u(p)), "
        "agg AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS support "
        "FROM pairs GROUP BY t1, t2) "
        f"SELECT t1, t2, support FROM agg WHERE support >= {int(min_support)} "
        f"ORDER BY support DESC, t1 ASC, t2 ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# language-ID confusion rollup (classifier quality eval)
# ---------------------------------------------------------------------------


def lang_id_confusion(docs: DataFrame) -> DataFrame:
    """(lang, pred, n) — the confusion matrix of the stopword-ratio
    language identifier against the corpus's labeled ``lang`` column,
    the offline quality check a pipeline runs before trusting lang_id
    to route documents (the retrieval_eval/ann_recall eval discipline
    applied to the classifier family). The prediction is lang_id's
    exact argmax chain (raw ratios, en > de > fr tie order); one
    map-side-combinable groupBy over the per-row prediction; cells
    ordered (lang, pred). ``docs`` carries (lang, tokens)."""
    d = docs
    for lang in ("en", "de", "fr"):
        d = d.withColumn(f"{lang}_ratio", F.expr(_stop_ratio_expr(lang)))
    pred = F.expr(
        "CASE WHEN en_ratio >= de_ratio AND en_ratio >= fr_ratio THEN 'en' "
        "WHEN de_ratio >= fr_ratio THEN 'de' ELSE 'fr' END"
    )
    return (
        d.select("lang", pred.alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("lang", "pred")
    )


def lang_id_confusion_sql(table_toks_cte: str) -> str:
    return (
        f"WITH {table_toks_cte}, r AS (SELECT doc_id, "
        f"{_stop_ratio_sql('en')} AS en_ratio, "
        f"{_stop_ratio_sql('de')} AS de_ratio, "
        f"{_stop_ratio_sql('fr')} AS fr_ratio FROM docs), "
        "p AS (SELECT doc_id, "
        "CASE WHEN en_ratio >= de_ratio AND en_ratio >= fr_ratio THEN 'en' "
        "WHEN de_ratio >= fr_ratio THEN 'de' ELSE 'fr' END AS pred FROM r) "
        "SELECT d.lang, p.pred, CAST(count(*) AS BIGINT) AS n "
        "FROM p JOIN documents d ON d.doc_id = p.doc_id "
        "GROUP BY d.lang, p.pred ORDER BY d.lang, p.pred"
    )


# ---------------------------------------------------------------------------
# sequence-length histogram (power-of-two buckets — packing planning)
# ---------------------------------------------------------------------------


def seq_len_histogram(docs: DataFrame) -> DataFrame:
    """(bucket_lo, bucket_hi, n_docs, total_tokens) — the document
    token-length distribution in power-of-two buckets [2^b, 2^{b+1}),
    the input a sequence-packing planner reads to pick max_seq_len and
    predict padding waste (pack_sequences' sibling diagnostic).
    Zero-token docs land in a dedicated [0, 1) bucket.

    The bucket exponent is INTEGER log2 via binary-string length
    (length(conv(n, 10, 2)) - 1 == floor(log2 n) exactly) — never the
    float log2, whose 1-ulp boundary behavior could flip a doc at
    n = 2^k across engines. One map-side-combinable groupBy."""
    n = F.size("tokens").cast("long")
    expo = F.when(
        n <= 0, F.lit(-1)
    ).otherwise(F.length(F.conv(n.cast("string"), 10, 2)) - F.lit(1))
    d = docs.select(n.alias("n"), expo.cast("int").alias("b"))
    agg = d.groupBy("b").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
    )
    lo = F.when(F.col("b") < 0, F.lit(0)).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), b)")
    )
    hi = F.when(F.col("b") < 0, F.lit(1)).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), b + 1)")
    )
    return agg.select(
        lo.cast("long").alias("bucket_lo"),
        hi.cast("long").alias("bucket_hi"),
        "n_docs",
        "total_tokens",
    ).orderBy("bucket_lo")


def seq_len_histogram_sql(table_toks_cte: str) -> str:
    return (
        f"WITH {table_toks_cte}, "
        "d AS (SELECT CAST(len(toks) AS BIGINT) AS n, "
        "CASE WHEN len(toks) <= 0 THEN -1 "
        "ELSE CAST(length(bin(CAST(len(toks) AS BIGINT))) - 1 AS INT) END AS b "
        "FROM docs), "
        "agg AS (SELECT b, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n) AS BIGINT) AS total_tokens FROM d GROUP BY b) "
        "SELECT CAST(CASE WHEN b < 0 THEN 0 ELSE (1 << b) END AS BIGINT) AS bucket_lo, "
        "CAST(CASE WHEN b < 0 THEN 1 ELSE (1 << (b + 1)) END AS BIGINT) AS bucket_hi, "
        "n_docs, total_tokens FROM agg ORDER BY bucket_lo"
    )


# ---------------------------------------------------------------------------
# source diversity (Shannon index over source shares)
# ---------------------------------------------------------------------------


def source_diversity(documents: DataFrame) -> DataFrame:
    """1 row (n_sources, n_docs, entropy_nats, effective_sources) —
    the corpus-composition diversity index a training-data pipeline
    tracks per snapshot (a crawl collapsing onto few domains/sources
    is the failure this alarms on): Shannon H = -sum p_s ln p_s over
    source shares, and exp(H) — the "effective source count" (equals
    n_sources iff perfectly balanced; the mixture-planning number).

    Parity: counts are exact integers; the entropy folds its
    (cnt/tot)*ln(cnt/tot) terms in SOURCE order (the string_stats
    fixed-order discipline extended to dynamic categories — Spark
    folds the source-sorted collected array, DuckDB sums ORDER BY
    source), a category-cardinality-bounded fold, never corpus-sized;
    exp/ln are the proven lanes."""
    g = documents.groupBy("source").agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = g.agg(
        F.count("*").cast("long").alias("ns"),
        F.sum("cnt").cast("long").alias("t"),
    ).first()
    ns, t = int(tot["ns"] or 0), int(tot["t"] or 0)
    spark = documents.sparkSession
    if t == 0:
        return spark.createDataFrame(
            [(0, 0, 0.0, 0.0)],
            "n_sources long, n_docs long, entropy_nats double, "
            "effective_sources double",
        )
    term = (F.col("cnt").cast("double") / F.lit(float(t))) * F.log(
        F.col("cnt").cast("double") / F.lit(float(t))
    )
    row = g.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", term.alias("e")))),
            F.lit(0.0),
            lambda acc, x: acc + x["e"],
        ).alias("s")
    ).first()
    h = -float(row["s"])
    import math

    return spark.createDataFrame(
        [(ns, t, h, math.exp(h))],
        "n_sources long, n_docs long, entropy_nats double, "
        "effective_sources double",
    ).select(
        "n_sources", "n_docs",
        round6("entropy_nats").alias("entropy_nats"),
        round6("effective_sources").alias("effective_sources"),
    )


def source_diversity_sql() -> str:
    return (
        "WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt "
        "FROM documents GROUP BY source), "
        "t AS (SELECT CAST(count(*) AS BIGINT) AS ns, "
        "CAST(sum(cnt) AS BIGINT) AS tot FROM g), "
        "e AS (SELECT -sum((CAST(cnt AS DOUBLE) / CAST((SELECT tot FROM t) AS DOUBLE)) "
        "* ln(CAST(cnt AS DOUBLE) / CAST((SELECT tot FROM t) AS DOUBLE)) "
        "ORDER BY source) AS h FROM g) "
        "SELECT (SELECT ns FROM t) AS n_sources, (SELECT tot FROM t) AS n_docs, "
        + "(floor((h) * 1000000.0 + 0.5) / 1000000.0) AS entropy_nats, "
        "(floor((exp(h)) * 1000000.0 + 0.5) / 1000000.0) AS effective_sources "
        "FROM e"
    )
