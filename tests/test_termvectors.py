"""Semantics tests for per-document term vectors
(operators/termvectors.py — the ES _termvectors analog): stored tf
against a hand-counted vector, corpus df joined from the dictionary,
term ordering, and the missing-document shape."""

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.termvectors import (
    term_vectors,
)


def _index(spark, rows):
    pages = spark.createDataFrame(
        [
            (
                f"https://x.example/{i:04d}",
                f"<html><body><p>{text}</p></body></html>".encode(),
                text,
                "en",
                "s1",
            )
            for i, text in enumerate(rows)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages, meta_cols=("source",))


def test_term_vectors_tf_df_and_order(spark):
    # doc 0: alpha x2, beta x1; alpha also appears in doc 1 -> df 2
    idx = _index(
        spark,
        [
            "alpha alpha beta",
            "alpha gamma delta",
        ],
    )
    rows = term_vectors(idx, 0).collect()
    assert [r.term for r in rows] == sorted(r.term for r in rows)
    vec = {r.term: (r.tf, r.df) for r in rows}
    assert vec == {"alpha": (2, 2), "beta": (1, 1)}


def test_term_vectors_missing_doc_is_empty(spark):
    idx = _index(spark, ["alpha beta"])
    assert term_vectors(idx, 999).count() == 0
