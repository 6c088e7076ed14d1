"""Doc-sharded batch scorer == tf batch scorer (rank and score), and
the sharded layout still serves the WAND per-query path."""

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.scorer import (
    bm25_topk,
    bm25_topk_batch,
)
from distributedcodesearchengine_spark.operators.sharded import (
    build_sharded_postings,
    sharded_batch_topk,
)
from distributedcodesearchengine_spark.operators.wand import wand_topk
from distributedcodesearchengine_spark.sources.corpus import generate_pages

QUERIES = {
    1: "JSON parsing",
    2: "parse json",
    3: "json json parser",
    4: "parseJSON HTTPClient2",
    5: "validate email address",
    6: "async database query",
}

WIDTH = 64  # tiny shards -> many rows per term


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    return {k: sorted(v) for k, v in out.items()}


def test_dict_and_join_builds_identical(spark):
    """The dictionary-encoded shard build (no strings in the shuffle)
    must produce bit-identical postings to the broadcast-join path."""
    from pyspark.sql import functions as F

    pages = generate_pages(spark, 300, seed=12, parts=3)
    idx = build_index_inmem(spark, pages)

    def snap(df):
        rows = df.select(
            "term_bucket", "term", "range_id", "df", "idf", "global_max",
            "n_postings", F.to_json("blocks").alias("b"),
        ).collect()
        return sorted(tuple(r) for r in rows)

    a = snap(build_sharded_postings(
        idx.tf, idx.terms, idx.n_docs, idx.avgdl, shard_width=64, block_size=16,
    ))
    b = snap(build_sharded_postings(
        idx.tf, idx.terms, idx.n_docs, idx.avgdl, shard_width=64, block_size=16,
        dict_vocab_max=0,  # force the join path
    ))
    assert a == b and a

    # the fallback fires precisely because the vocab EXCEEDS the
    # broadcast-safe threshold, so it must not carry a broadcast hint:
    # with auto-broadcast off the plan degrades to a shuffle join
    # (SortMergeJoin/ShuffledHashJoin), proving no hint survives
    from distributedcodesearchengine_spark.plans.audit import explain_str

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(build_sharded_postings(
            idx.tf, idx.terms, idx.n_docs, idx.avgdl, shard_width=64,
            block_size=16, dict_vocab_max=0,
        ))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastHashJoin" not in plan, plan[:4000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:4000]


def test_sharded_matches_batch(spark):
    pages = generate_pages(spark, 500, seed=44, parts=4)
    idx = build_index_inmem(spark, pages)
    idx.postings = build_sharded_postings(
        idx.tf, idx.terms, idx.n_docs, idx.avgdl, shard_width=WIDTH, block_size=16
    ).persist()
    a = _by_query(bm25_topk_batch(idx, QUERIES, k=10).collect())
    b = _by_query(sharded_batch_topk(idx, QUERIES, k=10, shard_width=WIDTH).collect())
    assert a == b

    # pruned == unpruned bit-for-bit
    c = _by_query(
        sharded_batch_topk(idx, QUERIES, k=10, shard_width=WIDTH, prune=False).collect()
    )
    assert b == c

    # block-max pruning must actually skip decodes (single query, k=1 —
    # a multi-query union legitimately needs most blocks) while exact
    one = {1: "JSON parsing"}
    stats = {}
    d1 = _by_query(
        sharded_batch_topk(idx, one, k=1, shard_width=WIDTH, decode_stats=stats).collect()
    )
    d2 = _by_query(
        sharded_batch_topk(idx, one, k=1, shard_width=WIDTH, prune=False).collect()
    )
    assert d1 == d2
    assert 0 < stats["decoded_blocks"].value < stats["total_blocks"].value

    # single-query serving path: rank+score identical to the exact
    # scorer, including the degenerate-fallback branch
    from distributedcodesearchengine_spark.operators.sharded import (
        sharded_single_topk,
    )

    for q in ["JSON parsing", "parseJSON HTTPClient2", "zzznotaword"]:
        v1 = [(r["rank"], r["doc_id"], round(r["score"], 9))
              for r in bm25_topk(idx, q, k=10).collect()]
        v3 = [(r["rank"], r["doc_id"], round(r["score"], 9))
              for r in sharded_single_topk(idx, q, k=10, shard_width=WIDTH).collect()]
        assert v1 == v3, q

    # the sharded rows also serve the per-query WAND path
    for q in ["JSON parsing", "parseJSON HTTPClient2"]:
        v1 = [(r["rank"], r["doc_id"], round(r["score"], 9))
              for r in bm25_topk(idx, q, k=10).collect()]
        v2 = [(r["rank"], r["doc_id"], round(r["score"], 9))
              for r in wand_topk(idx, q, k=10).collect()]
        assert v1 == v2, q


def test_zero_idf_batch_query_matches_exact(spark):
    """idf == 0 term (df == N/2): both batch scorers must agree in the
    degenerate all-zero regime — previously the sharded path's
    nonzero-score candidate cut dropped the matched docs the exact
    batch scorer returns."""
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [
            ("https://z.example/0", "banana apple", "en"),
            ("https://z.example/1", "apple cherry", "en"),
            ("https://z.example/2", "banana cherry", "en"),
            ("https://z.example/3", "apple apple", "en"),
        ],
        "url string, text string, lang string",
    ).withColumn("html", F.encode(F.col("text"), "utf-8"))
    idx = build_index_inmem(spark, pages)
    idx.postings = build_sharded_postings(
        idx.tf, idx.terms, idx.n_docs, idx.avgdl, shard_width=WIDTH, block_size=4
    ).persist()
    qs = {0: "banana", 1: "banana apple"}
    a = _by_query(bm25_topk_batch(idx, qs, k=10).collect())
    b = _by_query(sharded_batch_topk(idx, qs, k=10, shard_width=WIDTH).collect())
    assert a == b
    assert len(a[0]) == 2  # the two matched docs surface at score 0.0
