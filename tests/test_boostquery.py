"""Query-time clause boosts (operators/boostquery) — parse semantics,
the boost-1 identity with plain BM25, rank movement under a real boost,
and the dispatcher hook."""

from distributedcodesearchengine_spark.operators.boostquery import (
    bm25_boosted_topk,
    is_boosted_query,
    parse_boosted_query,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from tests.test_search_after import _index


def test_parse_boosts_and_accumulation():
    q = parse_boosted_query("alpha^2 beta alpha")
    assert q == {"alpha": 3.0, "beta": 1.0}
    # camelCase body: the CLAUSE is boosted, every expanded token gets w
    q = parse_boosted_query("parseJson^1.5")
    assert q == {"parse": 1.5, "json": 1.5}
    # non-boost carets tokenize as plain text; bare '^2' yields nothing
    assert parse_boosted_query("^2") == {}
    assert is_boosted_query("alpha^2") and not is_boosted_query("alpha beta")
    assert not is_boosted_query("^2 !!")


def test_boost_one_is_plain_bm25(spark):
    idx = _index(spark, [
        "rare signal one", "rare two words here", "signal three",
        "filler a", "filler b",
    ])
    a = bm25_topk(idx, "rare signal", k=5).orderBy("rank").collect()
    b = bm25_boosted_topk(idx, "rare^1 signal", k=5).orderBy("rank").collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == [
        (r["rank"], r["doc_id"], r["score"]) for r in b
    ]


def test_boost_moves_ranks(spark):
    # doc 0 is the 'rare' doc, doc 1 the 'signal' doc; boosting signal
    # hard must put doc 1 first even though plain BM25 may not
    idx = _index(spark, [
        "rare one two three four five six",
        "signal one",
        "filler a", "filler b", "filler c",
    ])
    plain = bm25_topk(idx, "rare signal", k=2).orderBy("rank").collect()
    boosted = bm25_boosted_topk(idx, "rare signal^10", k=2).orderBy("rank").collect()
    assert boosted[0]["doc_id"] == 1
    # scores scale: the signal doc's boosted score is larger than plain
    plain_by = {r["doc_id"]: r["score"] for r in plain}
    assert boosted[0]["score"] > plain_by.get(1, 0.0)


def test_dispatcher_routes_boosted_queries(spark):
    from distributedcodesearchengine_spark.api import SearchEngine

    idx = _index(spark, [
        "rare signal one", "rare two words", "signal three",
        "filler a", "filler b",
    ])
    eng = SearchEngine(idx)
    via_api = eng.search("rare^2 signal", limit=5, normalize=False).collect()
    direct = bm25_boosted_topk(idx, "rare^2 signal", k=5).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in via_api] == [
        (r["rank"], r["doc_id"], r["score"]) for r in direct
    ]
