"""URL canonicalization lanes (operators/urltools)."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators.urltools import (
    canonical_url_col,
    url_dedup_summary,
)

CASES = [
    # fragment
    ("https://a.example/p#sec", "https://a.example/p"),
    # &-led tracking, adjacent run
    ("https://a.example/p?x=1&utm_a=1&utm_b=2", "https://a.example/p?x=1"),
    # ?-led tracking promotes the next kept param (the naive seam bug)
    ("https://a.example/p?utm_a=1&b=2&utm_c=3&d=4", "https://a.example/p?b=2&d=4"),
    # lone ?-led tracking
    ("https://a.example/p?utm_a=1", "https://a.example/p"),
    ("https://a.example/p?utm_a=1&utm_b=2", "https://a.example/p"),
    # scheme/host case, www, default ports
    ("HTTPS://WWW.A.Example/Path", "https://a.example/Path"),
    ("http://a.example:80/p", "http://a.example/p"),
    ("https://a.example:443/p", "https://a.example/p"),
    ("https://a.example:8443/p", "https://a.example:8443/p"),  # non-default kept
    # bare-host trailing slash
    ("https://a.example/", "https://a.example"),
    ("https://a.example/p/", "https://a.example/p/"),  # path slash kept
    # non-url strings pass through un-mangled
    ("not a url", "not a url"),
    # ref is a tracking param; query case preserved
    ("https://a.example/p?ref=rss&Q=UpPeR", "https://a.example/p?Q=UpPeR"),
]


def test_canonicalization_lanes(spark):
    d = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = {r["i"]: r["c"] for r in d.select("i", canonical_url_col("url").alias("c")).collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, (u, got[i], want)


def test_seam_merge_equivalence(spark):
    """Urls differing only by interleaved tracking params canonicalize
    EQUAL — the merge the naive single-pattern form misses."""
    d = spark.createDataFrame(
        [(1, "https://a.example/p?b=2&utm_c=3&d=4"),
         (2, "https://a.example/p?utm_a=1&b=2&d=4"),
         (3, "https://a.example/p?b=2&d=4")],
        "doc_id long, url string",
    )
    rows = url_dedup_summary(d).collect()
    assert len(rows) == 1
    assert rows[0]["n_variants"] == 3 and rows[0]["keep_doc_id"] == 1


def test_cross_engine_property_urls(spark):
    """Adversarial Spark-vs-DuckDB parity for the canonicalizer: urls
    assembled from hostile fragments (tracking runs, mixed case, ports,
    fragments, metacharacter-ish params) must canonicalize identically
    through the Java-regex and RE2 lanes."""
    import itertools

    import duckdb

    from distributedcodesearchengine_spark.operators.urltools import (
        canonical_url_sql,
    )

    schemes = ["https://", "HTTP://", "ftp://"]
    hosts = ["www.A.Example", "a.example:443", "b.example:80", "c.example:8080"]
    paths = ["", "/", "/P/x", "/p%20q"]
    queries = [
        "", "?utm_a=1", "?utm_a=1&b=2", "?b=2&utm_c=3&d=4", "?ref=rss",
        "?utm_a=1&utm_b=2", "?a=b+c&gclid=xyz", "?x=%3F&utm_y=1",
    ]
    frags = ["", "#f", "#utm_a=1"]
    urls = [
        s + h + p + q + f
        for s, h, p, q, f in itertools.product(schemes, hosts, paths, queries, frags)
    ][:600]
    urls += ["not a url", "", "weird#only", "?lonely=1"]
    d = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    from distributedcodesearchengine_spark.operators.urltools import canonical_url_col

    got = {r["i"]: r["c"] for r in d.select("i", canonical_url_col("url").alias("c")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE u (i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(urls)))
    exp = dict(con.execute(f"SELECT i, {canonical_url_sql('url')} FROM u").fetchall())
    diffs = [(urls[i], got[i], exp[i]) for i in got if got[i] != exp[i]]
    assert not diffs, diffs[:5]
