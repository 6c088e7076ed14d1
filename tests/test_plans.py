"""Physical-plan shape invariants (.explain audit, SURVEY §4):

- query-term filters are PUSHED to the tf parquet scan
- the query side is BROADCAST (never a shuffled join of the big side)
- top-k compiles to TakeOrderedAndProject (no global sort)
- WAND postings reads prune term_bucket PARTITIONS
- the docs scan for lang-filtered zero-backfill prunes lang partitions
"""

import pytest

from distributedcodesearchengine_spark.build.checkpoint import (
    build_index_persisted,
    load_index,
)
from distributedcodesearchengine_spark.operators.scorer import (
    bm25_topk,
    query_term_weights,
    score_matched,
)
from distributedcodesearchengine_spark.operators.wand import _query_postings
from distributedcodesearchengine_spark.plans.audit import assert_plan, explain_str
from distributedcodesearchengine_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    pages = generate_pages(spark, 300, seed=2, parts=3)
    build_index_persisted(
        spark, pages, d, block_size=32, target_row_postings=128, n_buckets=8
    )
    return load_index(spark, d)


def test_term_filter_pushdown_and_broadcast(pidx):
    qw = query_term_weights(pidx, "parse json")
    scored = score_matched(pidx, qw)
    plan = assert_plan(scored, must_contain=["BroadcastHashJoin", "PushedFilters"])
    # the In(term, ...) predicate must reach the parquet scan
    assert "In(term" in plan or "in(term" in plan.lower(), plan[:4000]


def test_topk_is_take_ordered(pidx):
    top = bm25_topk(pidx, "parse json", k=10)
    assert_plan(top, must_contain=["TakeOrderedAndProject"])


def test_wand_prunes_term_buckets(pidx):
    prows = _query_postings(pidx, ["parse", "json"])
    plan = explain_str(prows)
    assert "term_bucket" in plan
    # partition filters present on the scan (pruned read, not full scan)
    assert "PartitionFilters: [" in plan and "term_bucket" in plan.split(
        "PartitionFilters"
    )[1][:200], plan[:4000]


def test_docs_lang_partition_pruning(pidx):
    from pyspark.sql import functions as F

    d = pidx.docs.where(F.col("lang") == "de")
    plan = explain_str(d)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
