"""Significant-terms aggregation — the Elasticsearch ``significant_terms``
analog: which terms are OVER-represented in a query's result set
relative to the corpus background? The webtext use is result-set
analytics ("what characterizes the pages this query matches"), query
expansion candidates, and topic drift monitoring over crawl batches.

The reference engine has no aggregation surface at all (bag-of-words
top-k only, ``codesearch/storage/bm25_index.py:117-170``); this extends
the facets operator family (operators/explore.bm25_facets) from
metadata keys to the term space.

Semantics (deterministic, engine-portable):

* the FOREGROUND is the engine's own BM25 kept set — the thresholded
  matched docs of the healthy regime, exactly finalize_topk's F4 stage
  (score >= 1% of the unfiltered max). The degenerate all-non-positive
  regime yields the empty result: its foreground is the whole corpus,
  so every term's foreground frequency EQUALS its background frequency
  and no term is over-represented (the significance filter below keeps
  nothing — the general SQL and the engine shortcut agree);
* for each term of any foreground doc: ``fg_count`` = foreground docs
  containing it, ``bg_count`` = its document frequency (the term
  dictionary's df), and the score is Elasticsearch's public JLH
  heuristic  (fgp - bgp) * (fgp / bgp)  with fgp = fg_count/|fg|,
  bgp = bg_count/N — rewarding both absolute and relative lift;
* only terms with ``fg_count >= min_fg`` (noise floor) AND fgp > bgp
  (actually over-represented) qualify; top-k by (raw score desc,
  term asc).

Scale shape: the foreground doc set is candidate-bounded (docs matching
>= 1 query term, the same bound scoring itself pays); ``fg_count`` is
one semi-join of tf against it plus one map-side-combinable groupBy —
never a corpus re-scan. The background df comes from the existing term
dictionary via a term-keyed shuffle join of the (small) foreground term
counts — no vocabulary broadcast (house rule), AQE picks the strategy.
|fg| folds in as a 1-row broadcast, keeping the whole tail one lazy
plan after the single max-score action every scorer path already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.tokenizer import tokenize

DEFAULT_MIN_FG = 2

_EMPTY_SCHEMA = "term string, fg_count long, bg_count long, score double"


def significant_terms(
    index, query: str, k: int = 20, min_fg: int = DEFAULT_MIN_FG
) -> DataFrame:
    """-> (term, fg_count, bg_count, score): top-k JLH-significant terms
    of the query's BM25 kept set vs the corpus background."""
    from ..functions.rounding import round6
    from .scorer import _cache_scored, query_term_weights, score_matched

    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame([], _EMPTY_SCHEMA)  # F7 guard
    qweights = query_term_weights(index, query)
    scored = score_matched(index, qweights) if qweights else None
    if scored is None:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    scored = _cache_scored(index, scored)
    row = scored.agg(F.max("score").alias("m")).first()
    mx = row["m"]
    if mx is None or mx <= 0:
        # degenerate regime: foreground == corpus, so fgp == bgp
        # bit-for-bit for every term and the > filter keeps nothing —
        # shortcut what the general formulation (and the DuckDB oracle)
        # evaluates to, without the corpus-wide pass
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    kept = scored.where(F.col("score") >= F.lit(0.01 * mx)).select("doc_id")
    fg = (
        index.tf.join(kept, "doc_id", "leftsemi")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("fg_count"))
    )
    n_fg = kept.agg(F.count("*").cast("long").alias("n_fg"))
    n = float(index.n_docs)
    j = fg.join(
        index.terms.select("term", F.col("df").cast("long").alias("bg_count")),
        "term",
    ).crossJoin(F.broadcast(n_fg))
    # operand order mirrors significant_terms_sql exactly:
    # fgp = fg_count * 1.0 / n_fg ; bgp = bg_count * 1.0 / N
    fgp = F.col("fg_count") * F.lit(1.0) / F.col("n_fg")
    bgp = F.col("bg_count") * F.lit(1.0) / F.lit(n)
    raw = (fgp - bgp) * (fgp / bgp)
    return (
        j.withColumn("_raw", raw)
        .where((F.col("fg_count") >= int(min_fg)) & (fgp > bgp))
        # order/limit on the RAW double, never the rounded alias (a 6-dp
        # round collision at the limit boundary would cut a different
        # row set than the oracle's raw-ordered cut)
        .orderBy(F.desc("_raw"), F.asc("term"))
        .limit(int(k))
        .select("term", "fg_count", "bg_count", round6("_raw").alias("score"))
    )


def significant_terms_sql(
    query: str, k: int = 20, min_fg: int = DEFAULT_MIN_FG
) -> str:
    """DuckDB mirror over the documents table: the bm25 scored/mx chain,
    the same kept threshold, the same JLH arithmetic operand-for-operand
    (the degenerate regime falls out of the general SQL: kept is empty
    when max <= 0, so the result is empty like the engine's shortcut)."""
    from collections import Counter

    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import B, K1, _docs_cte

    toks = tokenize(query)
    if not toks:
        return (
            "SELECT '' AS term, 0::BIGINT AS fg_count, 0::BIGINT AS bg_count, "
            "0.0 AS score WHERE false"
        )
    counts = Counter(toks)
    qvals = ", ".join(f"('{t}', {float(q)})" for t, q in sorted(counts.items()))
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
        "kept AS (SELECT doc_id FROM scored "
        "  WHERE (SELECT m FROM mx) > 0 AND score >= 0.01 * (SELECT m FROM mx)), "
        "fg AS (SELECT term, CAST(count(*) AS BIGINT) AS fg_count FROM tf "
        "  WHERE doc_id IN (SELECT doc_id FROM kept) GROUP BY term), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_fg FROM kept), "
        "sig AS (SELECT term, fg_count, CAST(df AS BIGINT) AS bg_count, "
        "  fg_count * 1.0 / (SELECT n_fg FROM tot) AS fgp, "
        "  df * 1.0 / (SELECT n_docs FROM stats) AS bgp "
        "  FROM fg JOIN dfreq USING (term)), "
        "r AS (SELECT term, fg_count, bg_count, (fgp - bgp) * (fgp / bgp) AS raw "
        f"  FROM sig WHERE fg_count >= {int(min_fg)} AND fgp > bgp) "
        f"SELECT term, fg_count, bg_count, {round6_sql('raw')} AS score "
        f"FROM r ORDER BY raw DESC, term ASC LIMIT {int(k)}"
    )
