"""Per-document term vectors — the Elasticsearch ``_termvectors`` API
analog (and Lucene's TermVectors reader): for one document, every
indexed term with its in-document frequency and corpus document
frequency. The debugging / MLT-introspection surface a search engine
ships next to ``explain``.

Reference parity: the reference exposes per-result term-level detail
only through its scoring explain (`codesearch/engine/bm25_index.py`);
term_vectors generalizes that to the full indexed vector of ANY stored
document, which is what the ES API provides.

Scale notes: the Spark path is a doc_id equality filter on the tf
relation (predicate pushdown into the parquet scan — tf is the slim
(term, doc_id, tf) relation, never the corpus text) joined to the term
dictionary for df — a |terms-in-doc|-row join, term-keyed, no
vocabulary broadcast and no corpus scan. The DuckDB mirror recomputes
both relations from the raw documents table (the oracle convention:
the oracle never trusts the index it is checking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scorer import Index


def term_vectors(index: Index, doc_id: int) -> DataFrame:
    """(term, tf, df) for one document, term asc — the ES
    ``_termvectors`` response body (term statistics enabled). A doc_id
    with no indexed terms (or absent) returns zero rows, matching the
    ES 'found: false / empty term_vectors' shape."""
    d = int(doc_id)
    return (
        index.tf.where(F.col("doc_id") == F.lit(d))
        .select("term", F.col("tf").cast("long").alias("tf"))
        .join(
            index.terms.select("term", F.col("df").cast("long").alias("df")),
            "term",
        )
        .orderBy("term")
    )


def term_vectors_sql(doc_id: int) -> str:
    """DuckDB mirror of term_vectors: tf and dfreq recomputed from the
    raw documents table via the shared docs CTE chain."""
    from ..functions.sql_oracle import _docs_cte

    d = int(doc_id)
    return (
        f"WITH {_docs_cte()} "
        "SELECT tf.term, CAST(tf.tf AS BIGINT) AS tf, "
        "CAST(d.df AS BIGINT) AS df "
        f"FROM tf JOIN dfreq d USING (term) WHERE tf.doc_id = {d} "
        "ORDER BY term"
    )


def mget(index, doc_ids) -> DataFrame:
    """(doc_id, url, site, lang, doc_len) for the requested ids, id
    order — the ES ``_mget`` API (multi-document fetch by id), over the
    columns EVERY index carries (optional meta_cols vary per build).
    Absent ids simply yield no row (the ES found:false entries). Plan:
    one IN-pruned docs scan — a docvalues point-multiprobe, |ids|
    bounded."""
    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return index.spark.createDataFrame(
            [], "doc_id long, url string, site string, lang string, "
                "doc_len long"
        )
    return (
        index.docs.where(F.col("doc_id").isin(ids))
        .select(
            "doc_id", "url", "site", "lang",
            F.col("doc_len").cast("long").alias("doc_len"),
        )
        .orderBy("doc_id")
    )


def mget_sql(doc_ids) -> str:
    """DuckDB mirror: the gate corpus's url key is the deterministic
    zero-padded doc_id (sources/tables.documents_as_pages), so the
    oracle reconstructs it with lpad — pinning that the engine's url
    assignment preserved the table's own ids — and derives site with
    the engine's own host regexp (stats.build_docs)."""
    from ..functions.sql_oracle import _docs_cte

    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return (
            "SELECT 1::BIGINT AS doc_id, '' AS url, '' AS site, "
            "'' AS lang, 1::BIGINT AS doc_len WHERE false"
        )
    lst = ", ".join(str(d) for d in ids)
    return (
        f"WITH {_docs_cte()}, m AS ("
        "SELECT doc_id, "
        "'doc://corpus/' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS url, "
        "lang, CAST(doc_len AS BIGINT) AS doc_len "
        f"FROM doclen WHERE doc_id IN ({lst})) "
        "SELECT doc_id, url, "
        "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)', 1) AS site, "
        "lang, doc_len FROM m ORDER BY doc_id"
    )


def mterm_vectors(index: Index, doc_ids) -> DataFrame:
    """(doc_id, term, tf, df) — the ES ``_mtermvectors`` API: term
    vectors for MANY documents in one call (doc_id asc, term asc).
    Absent ids yield no rows (the per-entry found:false shape). Plan:
    ONE IN-pruned tf scan + the term-keyed df join — |ids|-bounded,
    never |ids| separate scans (the reason the batch API exists)."""
    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return index.spark.createDataFrame(
            [], "doc_id long, term string, tf long, df long"
        )
    return (
        index.tf.where(F.col("doc_id").isin(ids))
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"))
        .join(
            index.terms.select("term", F.col("df").cast("long").alias("df")),
            "term",
        )
        .orderBy("doc_id", "term")
    )


def mterm_vectors_sql(doc_ids) -> str:
    """DuckDB mirror of mterm_vectors over the shared docs CTE."""
    from ..functions.sql_oracle import _docs_cte

    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return (
            "SELECT 1::BIGINT AS doc_id, '' AS term, 1::BIGINT AS tf, "
            "1::BIGINT AS df WHERE false"
        )
    lst = ", ".join(str(i) for i in ids)
    return (
        f"WITH {_docs_cte()} "
        "SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf, "
        "CAST(d.df AS BIGINT) AS df "
        f"FROM tf JOIN dfreq d USING (term) WHERE tf.doc_id IN ({lst}) "
        "ORDER BY tf.doc_id, tf.term"
    )
