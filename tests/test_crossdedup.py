"""Cross-corpus incremental dedup tests (operators/crossdedup)."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
from distributedcodesearchengine_spark.operators.crossdedup import (
    cross_dedup_survivors,
    cross_exact_survivors,
    cross_lsh_pairs,
)


def _docs(spark, rows):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    return d.select("doc_id", "text", tokenize_udf("text").alias("tokens"))


BASE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def corpora(spark):
    old = _docs(
        spark,
        [
            (0, BASE),
            (2, "completely different content about spark shuffles and joins"),
            (4, "unrelated third document mentioning vectors and windows"),
        ],
    )
    new = _docs(
        spark,
        [
            (1, BASE),  # exact copy of old 0 -> exact stage drops
            (3, BASE + " extra tail words appended"),  # near-dup of old 0
            (5, "genuinely novel text with no overlap whatsoever here"),
            (7, "completely different content about spark shuffles and joins"),
        ],  # 7 = exact copy of old 2
    )
    return new, old


def test_exact_stage(corpora):
    new, old = corpora
    kept = {r["doc_id"] for r in cross_exact_survivors(new, old).collect()}
    assert kept == {3, 5}


def test_cross_pairs_are_cross_only(corpora):
    new, old = corpora
    pairs = cross_lsh_pairs(new, old, jaccard_min=0.2).collect()
    got = {(r["new_id"], r["old_id"]) for r in pairs}
    # 1 and 3 pair with old 0; never new-new (1,3) or old-old
    assert (1, 0) in got and (3, 0) in got
    assert all(o in {0, 2, 4} and n in {1, 3, 5, 7} for n, o in got)
    j = {p: r["jaccard"] for p, r in zip(got, pairs)}
    for r in pairs:
        if r["new_id"] == 1 and r["old_id"] == 0:
            assert r["jaccard"] == 1.0  # identical shingle sets


def test_survivors(corpora):
    new, old = corpora
    kept = [r["doc_id"] for r in cross_dedup_survivors(new, old).collect()]
    assert kept == [5]  # 1,7 exact-dropped; 3 near-dropped


def test_overlapping_keyspaces(spark):
    """new and old may reuse the same doc_id values (different tables)."""
    old = _docs(spark, [(1, BASE)])
    new = _docs(spark, [(1, "fresh content that matches nothing in the old")])
    kept = [r["doc_id"] for r in cross_dedup_survivors(new, old).collect()]
    assert kept == [1]
