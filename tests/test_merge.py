"""Segment merge/compaction: cold terms collapse to one row, hot terms
stay split under the target, and query results are unchanged."""

from pyspark.sql import functions as F

from distributedcodesearchengine_spark.build.indexer import (
    add_postings,
    build_index_inmem,
)
from distributedcodesearchengine_spark.operators.postings import merge_postings
from distributedcodesearchengine_spark.operators.wand import wand_topk
from distributedcodesearchengine_spark.sources.corpus import HOT_TERM, generate_pages


def test_merge_compacts_and_preserves_results(spark):
    pages = generate_pages(spark, 500, seed=13, parts=4, skew=True)
    idx = build_index_inmem(spark, pages)
    # tiny target -> every term fragmented into many rows
    add_postings(idx, block_size=16, target_row_postings=32)
    frag_rows = idx.postings.count()

    merged = merge_postings(idx.postings, target_row_postings=128).persist()
    merged_rows = merged.count()
    assert merged_rows < frag_rows

    # cold terms: exactly one row
    cold = (
        merged.groupBy("term").count()
        .join(merged.select("term", "n_postings").groupBy("term").agg(
            F.sum("n_postings").alias("total")), "term")
    )
    assert cold.where((F.col("total") <= 128) & (F.col("count") > 1)).count() == 0
    # hot term stays split, rows bounded by target (+ one row of slack)
    hot = merged.where(F.col("term") == HOT_TERM)
    assert hot.count() > 1
    assert hot.agg(F.max("n_postings")).first()[0] <= 128

    # rank identity before/after compaction
    queries = ["JSON parsing", HOT_TERM, f"{HOT_TERM} parseJSON"]
    before = {
        q: [(r["rank"], r["doc_id"], round(r["score"], 9))
            for r in wand_topk(idx, q, k=10).collect()]
        for q in queries
    }
    idx.postings = merged
    after = {
        q: [(r["rank"], r["doc_id"], round(r["score"], 9))
            for r in wand_topk(idx, q, k=10).collect()]
        for q in queries
    }
    assert before == after
