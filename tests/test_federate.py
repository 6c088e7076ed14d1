"""Index federation: N shard indexes must score exactly like the
monolithic index over the concatenated corpus."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.build.indexer import (
    build_index_inmem,
    federate_indexes,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.sources.corpus import generate_pages

QUERIES = ["JSON parsing", "parseJSON HTTPClient2", "send HTTP request"]


@pytest.fixture(scope="module")
def setup(spark):
    pages = generate_pages(spark, 300, seed=17, parts=3).persist()
    urls = sorted(r["url"] for r in pages.select("url").collect())
    shards = [
        build_index_inmem(spark, pages.filter(F.col("url").isin(urls[i::3])))
        for i in range(3)
    ]
    mono = build_index_inmem(spark, pages)
    fed = federate_indexes(shards)
    return mono, fed, shards


def test_global_stats_merge_exactly(setup):
    mono, fed, shards = setup
    assert fed.n_docs == mono.n_docs
    assert abs(fed.avgdl - mono.avgdl) < 1e-12
    mdf = {r["term"]: r["df"] for r in mono.terms.select("term", "df").collect()}
    fdf = {r["term"]: r["df"] for r in fed.terms.select("term", "df").collect()}
    assert fdf == mdf


def test_doc_id_spaces_disjoint(setup):
    _, fed, shards = setup
    n = fed.docs.count()
    assert n == sum(s.n_docs for s in shards)
    assert fed.docs.select("doc_id").distinct().count() == n


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity_vs_monolithic(setup, query):
    mono, fed, _ = setup
    a = [
        (r["url"], round(r["score"], 9))
        for r in bm25_topk(fed, query, k=10).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in bm25_topk(mono, query, k=10).collect()
    ]
    # ids differ by construction; (url, score) ranking must agree
    assert sorted(a, key=lambda x: (-x[1], x[0])) == sorted(
        b, key=lambda x: (-x[1], x[0])
    )


def test_degenerate_unknown_token(setup):
    """Unknown-token queries take the zero-backfill branch; scores
    agree (all 0.0) but the k surviving docs follow doc_id order,
    which is id-space-dependent — the documented tie-break contract
    (the same divergence a Lucene shard order change produces)."""
    mono, fed, _ = setup
    a = bm25_topk(fed, "zzz", k=10).collect()
    b = bm25_topk(mono, "zzz", k=10).collect()
    assert len(a) == len(b) == 10
    assert all(r["score"] == 0.0 for r in a + b)


def test_filtered_query(setup):
    mono, fed, _ = setup
    a = {r["url"] for r in bm25_topk(fed, "JSON parsing", k=10,
                                     filters={"lang": "en"}).collect()}
    b = {r["url"] for r in bm25_topk(mono, "JSON parsing", k=10,
                                     filters={"lang": "en"}).collect()}
    assert a == b


def test_gate_entry_kboundary_tie_cut_on_original_ids(spark, tmp_path):
    """A k-boundary EXACT-score tie spanning shards: the gate entry's
    top-k cut must keep the smaller ORIGINAL id (the monolithic
    oracle's ordering), not the smaller federated internal id.
    Regression for the sf0.1 divergence (docs 2551 vs 2770 tied at the
    kth score; the internal-id cut kept 2770 because its even parity
    put it in the offset-0 shard). Docs 5 and 8 have identical text
    (exact raw-score tie); 8 is even (shard 0, small internal id), 5 is
    odd (shard 1, huge internal id) — the internal-id cut would keep 8."""
    from distributedcodesearchengine_spark.entry_queries import bm25_federated_q

    rows = []
    for i in range(10):
        if i == 3:
            text = "zeta zeta zeta filler words here"
        elif i in (5, 8):
            text = "zeta common tail words"  # identical -> exact tie
        else:
            text = f"unrelated filler block{i} words"
        rows.append((i, text, "en", "web"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    res = bm25_federated_q(spark, str(tmp_path), "zeta", k=2).collect()
    assert [r["doc_id"] for r in res] == [3, 5]


def test_gate_entry_empty_query_returns_no_rows(spark, tmp_path):
    """An empty-tokenizing query returns an EMPTY frame (the monolithic
    bm25_topk guard and the oracle agree), never a zero backfill."""
    from distributedcodesearchengine_spark.entry_queries import bm25_federated_q

    rows = [(i, f"some words block{i}", "en", "web") for i in range(6)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    res = bm25_federated_q(spark, str(tmp_path), "!! ??", k=5)
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == ["doc_id", "score"]
