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


def test_url_dedup_keeps_min_content_hash_variant(spark):
    """A url recrawled with different html must survive as the
    min-md5(html) variant regardless of input row order or partitioning
    — the same deterministic rule as streaming ingest (_dedup_urls).
    Without the tie the lag-window pick is whatever the shuffle
    delivered first, making the index a nondeterministic function of
    its input layout."""
    import hashlib

    from distributedcodesearchengine_spark.operators.stats import build_docs

    variants = ["first crawl words", "second crawl other words"]
    want = min(
        variants, key=lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
    )
    rows = [
        ("https://dup.example/page", variants[0], "en"),
        ("https://dup.example/page", variants[1], "en"),
        ("https://other.example/x", "unrelated text", "en"),
    ]
    for order in (rows, rows[::-1]):
        pages = spark.createDataFrame(
            order, "url string, text string, lang string"
        ).withColumn("html", F.encode(F.col("text"), "utf-8")).repartition(4)
        docs = build_docs(pages).orderBy("doc_id").collect()
        assert [r["url"] for r in docs] == [
            "https://dup.example/page",
            "https://other.example/x",
        ]
        assert [r["doc_id"] for r in docs] == [0, 1]
        # the survivor's tokens are the min-hash variant's
        assert docs[0]["tokens"] == want.split()
