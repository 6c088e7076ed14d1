"""URL canonicalization + URL-identity dedup — the first thing a web
crawler's curation layer runs (public practice: the canonicalization
steps are the ones CommonCrawl/URL-frontier dedup literature lists —
fragment stripping, tracking-parameter removal, case-insensitive
scheme/host, default ports, www alias).

``canonical_url_col`` is a pure JVM expression chain (regexp_replace /
regexp_extract / lower / concat — zero Python, embarrassingly
parallel), mirrored operand-for-operand in the DuckDB builder; the
regex constructs used (anchors, char classes, alternation) behave
identically under Java regex and RE2, the same compatibility envelope
the textstats/pii lanes already rely on.

Steps, in order (each is a visible lane in the gate's augmented urls):
1. strip the fragment (``#...``)
2. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``) in
   three seam-exact passes: (a) every ``&``-led occurrence, (b) a
   ``?``-led occurrence followed by a kept param (the ``?`` survives,
   promoting that param), (c) a lone ``?``-led occurrence at the end —
   so ``?utm_a=1&b=2&utm_c=3`` and ``?b=2`` canonicalize EQUAL, with
   no stray separators (the naive single-pattern form leaves a
   mid-string ``?`` seam and misses merges; regression-tested)
3. lowercase scheme and host, leave path/query case alone
4. drop a ``www.`` host prefix and the protocol default ports
   (``:80`` http, ``:443`` https)
5. drop a single trailing ``/`` from a bare-host url

``url_dedup_summary`` groups by the canonical form keeping the min
doc_id representative — one map-side-combinable groupBy, the same
shape as the content-hash exact dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TP = "(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)"


def canonical_url_col(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"#.*$", "")  # 1 fragment
    c = F.regexp_replace(c, rf"&{_TP}=[^&#]*", "")  # 2a &-led tracking
    c = F.regexp_replace(c, rf"\?{_TP}=[^&#]*&", "?")  # 2b ?-led, promote next
    c = F.regexp_replace(c, rf"\?{_TP}=[^&#]*$", "")  # 2c lone ?-led
    c = F.regexp_replace(c, r"[?&]$", "")  # dangling separator
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    host = F.regexp_replace(host, r"^www\.", "")  # 4 www alias
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        host
    )
    host = F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(
        host
    )
    out = F.when(scheme != "", F.concat(scheme, F.lit("://"), host, rest)).otherwise(c)
    return F.regexp_replace(out, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$", r"$1")


def canonical_url_sql(expr: str) -> str:
    """DuckDB mirror of ``canonical_url_col`` (same lanes, same order)."""
    c = f"regexp_replace({expr}, '#.*$', '', 'g')"
    c = f"regexp_replace({c}, '&{_TP}=[^&#]*', '', 'g')"
    c = f"regexp_replace({c}, '\\?{_TP}=[^&#]*&', '?', 'g')"
    c = f"regexp_replace({c}, '\\?{_TP}=[^&#]*$', '', 'g')"
    c = f"regexp_replace({c}, '[?&]$', '', 'g')"
    scheme = f"lower(regexp_extract({c}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host0 = f"lower(regexp_extract({c}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    rest = f"regexp_replace({c}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+', '', 'g')"
    host1 = f"regexp_replace({host0}, '^www\\.', '', 'g')"
    host2 = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host1}, ':80$', '', 'g') "
        f"ELSE {host1} END"
    )
    host3 = (
        f"CASE WHEN {scheme} = 'https' THEN regexp_replace({host2}, ':443$', '', 'g') "
        f"ELSE {host2} END"
    )
    out = (
        f"CASE WHEN {scheme} <> '' THEN {scheme} || '://' || {host3} || {rest} "
        f"ELSE {c} END"
    )
    return (
        f"regexp_replace({out}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$', '\\1', 'g')"
    )


def messy_url_col(doc_id_col: str = "doc_id") -> Column:
    """Deterministic messy-URL synthesis for the gate (the documents
    table has no url column): 5 consecutive doc_ids alias the same
    target page through different mess lanes — plain / www+tracking /
    default-port+fragment / uppercase scheme+host / kept-param+tracking
    (the last canonicalizes to a DIFFERENT url, so group sizes are 4
    and 1, both asserted). Byte-identical to ``messy_url_sql_expr``."""
    d = F.col(doc_id_col)
    k = (d / 5).cast("long") % 37
    n = (d / 5).cast("long")
    ks, ns = k.cast("string"), n.cast("string")
    v = d % 5
    return (
        F.when(v == 0, F.concat(F.lit("https://site"), ks, F.lit(".example/p/"), ns))
        .when(
            v == 1,
            F.concat(
                F.lit("https://www.site"), ks, F.lit(".example/p/"), ns,
                F.lit("?utm_source=x&utm_medium=y"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://site"), ks, F.lit(".example:443/p/"), ns,
                F.lit("#frag"),
            ),
        )
        .when(
            v == 3,
            F.concat(F.lit("HTTPS://SITE"), ks, F.lit(".EXAMPLE/p/"), ns),
        )
        .otherwise(
            F.concat(
                F.lit("https://site"), ks, F.lit(".example/p/"), ns,
                F.lit("?a=1&utm_c=2"),
            )
        )
    )


def messy_url_sql_expr(doc_id_col: str = "doc_id") -> str:
    ks = f"((({doc_id_col} // 5) % 37)::VARCHAR)"
    ns = f"(({doc_id_col} // 5)::VARCHAR)"
    return (
        f"CASE {doc_id_col} % 5 "
        f"WHEN 0 THEN 'https://site' || {ks} || '.example/p/' || {ns} "
        f"WHEN 1 THEN 'https://www.site' || {ks} || '.example/p/' || {ns} "
        "|| '?utm_source=x&utm_medium=y' "
        f"WHEN 2 THEN 'https://site' || {ks} || '.example:443/p/' || {ns} || '#frag' "
        f"WHEN 3 THEN 'HTTPS://SITE' || {ks} || '.EXAMPLE/p/' || {ns} "
        f"ELSE 'https://site' || {ks} || '.example/p/' || {ns} || '?a=1&utm_c=2' END"
    )


def url_dedup_gate_sql(table: str = "documents") -> str:
    return (
        f"WITH u AS (SELECT doc_id, {messy_url_sql_expr()} AS url FROM {table}) "
        f"SELECT {canonical_url_sql('url')} AS canonical_url, "
        "CAST(count(*) AS BIGINT) AS n_variants, min(doc_id) AS keep_doc_id "
        "FROM u GROUP BY 1 ORDER BY canonical_url"
    )


def url_dedup_summary(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_variants, keep_doc_id) for canonical groups —
    min-doc_id representative. One map-side-combinable groupBy over a
    per-row expression."""
    return (
        pages.select(
            canonical_url_col(url_col).alias("canonical_url"), "doc_id"
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("canonical_url")
    )
