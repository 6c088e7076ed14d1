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
