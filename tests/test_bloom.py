"""Bloom filter membership sketch (operators/sketch.py): the
zero-false-negative contract over the whole vocabulary, merge ==
rebuild, and the guards."""

import pytest

from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators.sketch import (
    bloom_build,
    bloom_membership,
    bloom_merge,
)


def _docs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        "doc_id", F.split(F.col("text"), " ").alias("tokens")
    )


def test_bloom_zero_false_negatives(spark):
    docs = _docs(spark, [
        (1, "alpha beta gamma delta"),
        (2, "epsilon zeta eta theta iota"),
        (3, "alpha kappa lambda"),
    ])
    vocab = sorted({
        t for r in docs.select("tokens").collect() for t in r.tokens
    })
    out = {r.probe: r for r in bloom_membership(docs, vocab).collect()}
    assert set(out) == set(vocab)
    for t in vocab:
        assert out[t].in_vocab is True
        assert out[t].in_bloom is True, t  # never a false negative


def test_bloom_absent_probes(spark):
    docs = _docs(spark, [(1, "alpha beta gamma")])
    out = {r.probe: r for r in bloom_membership(
        docs, ["alpha", "zzzzqqqq", "wwwwxxxx"]).collect()}
    assert out["alpha"].in_bloom and out["alpha"].in_vocab
    assert not out["zzzzqqqq"].in_vocab
    assert not out["wwwwxxxx"].in_vocab
    # at m=65536/k=7 over a 3-term vocab a false positive is
    # astronomically unlikely; pin the expected sketch answer
    assert not out["zzzzqqqq"].in_bloom
    assert not out["wwwwxxxx"].in_bloom


def test_bloom_merge_equals_rebuild(spark):
    a = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon")])
    b = _docs(spark, [(3, "zeta beta eta"), (4, "theta iota alpha")])
    both = a.unionAll(b)
    rebuilt = {
        r.word_idx: r.bits for r in bloom_build(both).collect()
    }
    merged = {
        r.word_idx: r.bits
        for r in bloom_merge(bloom_build(a), bloom_build(b)).collect()
    }
    assert merged == rebuilt


def test_bloom_empty_probes_guard(spark):
    docs = _docs(spark, [(1, "alpha")])
    with pytest.raises(ValueError):
        bloom_membership(docs, [])
