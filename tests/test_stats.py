"""Corpus statistics operator tests."""

from pyspark.sql import functions as F


def test_site_extraction_accepts_rfc3986_schemes(spark):
    """Scheme matching follows the RFC 3986 grammar (ALPHA then
    ALPHA/DIGIT/+/-/.), case-insensitive: crawled urls with 'HTTP://' or
    'svn+ssh://' must not silently lose their site (empty site makes a
    doc invisible to site filters and pollutes the facet)."""
    from distributedcodesearchengine_spark.operators.stats import build_docs

    pages = spark.createDataFrame(
        [
            ("HTTP://Example.com/x", "alpha beta", "en"),
            ("svn+ssh://host.io/repo", "gamma delta", "en"),
            ("https://plain.org/y", "epsilon zeta", "en"),
        ],
        "url string, text string, lang string",
    ).withColumn("html", F.encode(F.col("text"), "utf-8"))
    got = {r["url"]: r["site"] for r in build_docs(pages).select("url", "site").collect()}
    assert got["HTTP://Example.com/x"] == "Example.com"
    assert got["svn+ssh://host.io/repo"] == "host.io"
    assert got["https://plain.org/y"] == "plain.org"
