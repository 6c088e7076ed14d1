"""Extraction goldens (FIXTURES.md §5) + the per-row byte-identity
invariant extract(html) == text on the synthetic pages corpus."""

import numpy as np
import pandas as pd

from distributedcodesearchengine_spark.functions.udfs import _extract_series
from distributedcodesearchengine_spark.oracle.extract import extract_text
from distributedcodesearchengine_spark.sources.corpus import generate_rows_local

GOLDENS = [
    (b"<html><head><title>t</title></head><body><p>hello world</p></body></html>", "hello world"),
    (b"<html><body><p></p></body></html>", ""),
    # invalid utf-8 byte -> U+FFFD via errors='replace' (python_parser.py:38)
    (b"<p>caf\xe9</p>", "caf�"),
    (b"no tags at all", "no tags at all"),
    (b"<div>x</div>", "x"),
    # multiple paragraphs join with newline
    (b"<p>a</p><p>b</p>", "a\nb"),
    # attributes on <p>, nested inline tags stripped
    (b'<p class="x" id=1>a <b>bold</b> c</p>', "a bold c"),
    # script/style content removed (attributes, case-insensitive)
    (b'<ScRiPt type="t">var x = "<p>no</p>";</sCrIpT><p>yes</p>', "yes"),
    (b"<style>p { color: red }</style><p>body</p>", "body"),
    # comments removed, even ones containing fake paragraphs
    (b"<!-- <p>ghost</p> --><p>real</p>", "real"),
    # entities: numeric, named, and &amp;-escaped stays escaped
    (b"<p>a &amp; b &lt;c&gt; &#65;&#x42; &amp;lt;</p>", 'a & b <c> AB &lt;'),
    # fallback path also strips script/style and decodes entities
    (b"<style>s</style><div>x &gt; y</div>", "x > y"),
]


def test_extract_goldens():
    for html, want in GOLDENS:
        assert extract_text(html) == want


def test_extract_adversarial_roundtrip():
    """Property: any '<'/'&'-free payload survives arbitrary wrapping in
    attributes, nesting, comments and script/style noise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payload = st.text(
        alphabet=st.characters(blacklist_characters="<&", blacklist_categories=("Cs",)),
        min_size=0, max_size=80,
    ).filter(lambda s: "\n" not in s)
    attrs = st.sampled_from(["", " class='a b'", ' id="x" data-y=1', " hidden"])
    noise = st.sampled_from([
        "", "<script>var p = '<p>fake</p>';</script>",
        "<style a=b>p{}</style>", "<!-- <p>no</p> -->",
    ])

    @settings(max_examples=200, deadline=None)
    @given(payload=payload, a=attrs, pre=noise, post=noise, inline=attrs)
    def check(payload, a, pre, post, inline):
        html = (
            f"<html><head><title>t</title>{pre}</head>"
            f"<body>{post}<p{a}><span{inline}>{payload}</span></p></body></html>"
        ).encode("utf-8", errors="surrogatepass")
        assert extract_text(html) == payload

    check()


def test_extract_vectorized_matches():
    got = _extract_series(pd.Series([h for h, _ in GOLDENS])).tolist()
    assert got == [w for _, w in GOLDENS]


def test_corpus_invariant_local():
    rows = generate_rows_local(np.arange(500), seed=42)
    for _, r in rows.iterrows():
        assert extract_text(r["html"]) == r["text"]


def test_corpus_invariant_spark(spark):
    """Distributed generation == local generation, and the extract UDF
    reproduces the text column byte-identically per url."""
    from pyspark.sql import functions as F

    from distributedcodesearchengine_spark.functions.udfs import extract_text_udf
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    pages = generate_pages(spark, 400, seed=42, parts=7)
    bad = pages.where(extract_text_udf("html") != F.col("text")).count()
    assert bad == 0

    local = generate_rows_local(np.arange(400), seed=42)
    got = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    want = dict(zip(local["url"], local["text"]))
    assert got == want


def test_fused_udf_equivalence(spark):
    """extract_tokenize_udf == tokenize_udf(extract_text_udf(html))."""
    from pyspark.sql import functions as F

    from distributedcodesearchengine_spark.functions.udfs import (
        extract_text_udf,
        extract_tokenize_udf,
        tokenize_udf,
    )
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    pages = generate_pages(spark, 200, seed=6, parts=3)
    bad = pages.where(
        extract_tokenize_udf("html") != tokenize_udf(extract_text_udf("html"))
    ).count()
    assert bad == 0


def test_corpus_determinism_across_partitioning(spark):
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    a = {r["url"]: (r["text"], r["lang"]) for r in generate_pages(spark, 300, parts=2).collect()}
    b = {r["url"]: (r["text"], r["lang"]) for r in generate_pages(spark, 300, parts=13).collect()}
    assert a == b


def test_corpus_has_empty_and_codeish_docs():
    rows = generate_rows_local(np.arange(2000), seed=42)
    from distributedcodesearchengine_spark.oracle.tokenizer import tokenize

    n_empty = sum(1 for t in rows["text"] if tokenize(t) == [])
    assert 5 <= n_empty <= 60  # ~1%
    assert any("parseJSON" in t for t in rows["text"])
    langs = set(rows["lang"])
    assert langs == {"en", "de", "fr"}
