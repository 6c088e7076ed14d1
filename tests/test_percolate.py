"""Percolator (operators/percolate): all-of conjunction, containment,
empty-query and no-match regimes."""

from distributedcodesearchengine_spark.operators.percolate import percolate

DOCS = [
    (1, ["alpha", "beta", "gamma"]),
    (2, ["alpha", "alpha"]),          # duplicates: distinct-term semantics
    (3, ["beta"]),
    (4, []),
]
QUERIES = {10: "alpha beta", 20: "alpha", 30: "alpha alpha", 40: "zzz", 50: "!!"}


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, tokens array<string>")


def test_conjunction_and_containment(spark):
    got = {(r["doc_id"], r["query_id"]) for r in percolate(_docs(spark), QUERIES).collect()}
    assert got == {
        (1, 10),            # has both alpha and beta
        (1, 20), (2, 20),   # single-term query
        (1, 30), (2, 30),   # 'alpha alpha' == distinct {alpha}
    }


def test_empty_query_set(spark):
    assert percolate(_docs(spark), {}).count() == 0
    assert percolate(_docs(spark), {1: "!! ??"}).count() == 0


# --- phrase percolation ------------------------------------------------------


def _pp_docs(spark, texts):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf

    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", tokenize_udf("text").alias("tokens"))


def test_percolate_phrase_adjacency(spark):
    from distributedcodesearchengine_spark.operators.percolate import (
        percolate_phrase,
    )

    texts = [
        "alert dup table row found",     # phrase adjacent + row
        "dup xx table row yy",           # terms present, phrase NOT adjacent
        "row dup table",                 # adjacent, row present
        "dup table only",                # phrase ok but no 'row'
        "nothing here",
    ]
    docs = _pp_docs(spark, texts)
    out = {(r["doc_id"], r["query_id"]) for r in percolate_phrase(
        docs, {1: '"dup table" row', 2: "table row"}).collect()}
    assert (0, 1) in out and (2, 1) in out
    assert (1, 1) not in out    # adjacency required
    assert (3, 1) not in out    # missing plain term
    # query 2 (no phrase) = plain conjunction
    assert {(d, q) for d, q in out if q == 2} == {(0, 2), (1, 2), (2, 2)}


def test_percolate_phrase_multi_and_empty(spark):
    from distributedcodesearchengine_spark.operators.percolate import (
        percolate_phrase,
    )

    texts = ["aa bb cc dd", "aa bb dd cc"]
    docs = _pp_docs(spark, texts)
    # two phrases, both must be adjacent
    out = {(r["doc_id"], r["query_id"]) for r in percolate_phrase(
        docs, {5: '"aa bb" "cc dd"'}).collect()}
    assert out == {(0, 5)}
    assert percolate_phrase(docs, {}).count() == 0
