"""Checkpointed-build resume test (SURVEY §5.4): interrupt the postings
stage mid-way, resume, assert finished work is NOT recomputed and the
final index is identical to an uninterrupted build."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.build.checkpoint import (
    BuildState,
    build_index_persisted,
    jvm_term_bucket,
    load_index,
)
from distributedcodesearchengine_spark.operators.postings import term_bucket
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.operators.wand import wand_topk
from distributedcodesearchengine_spark.sources.corpus import generate_pages

N = 400
KW = dict(block_size=32, target_row_postings=128, n_buckets=8, bucket_groups=4)


def test_jvm_bucket_matches_python(spark):
    terms = ["json", "parse", "megahot", "x1y2", "éé", "a" * 50]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select("term", jvm_term_bucket(F.col("term"), 8).alias("b")).collect()
    }
    for t in terms:
        assert got[t] == term_bucket(t, 8), t


def _postings_snapshot(idx):
    rows = idx.postings.select(
        "term", "range_id", "df", "idf", "global_max", "n_postings",
        F.to_json("blocks").alias("blocks_json"),
    ).collect()
    return sorted((r["term"], r["range_id"], r["df"], round(r["idf"], 12),
                   r["n_postings"], r["blocks_json"]) for r in rows)


def test_interrupt_and_resume(spark, tmp_path):
    pages = generate_pages(spark, N, seed=11, parts=4)
    d_int = str(tmp_path / "idx_interrupted")
    d_ref = str(tmp_path / "idx_reference")

    with pytest.raises(RuntimeError, match="simulated interrupt"):
        build_index_persisted(spark, pages, d_int, fail_after_groups=2, **KW)

    # state after the crash: early stages complete, some buckets done
    st = BuildState(spark, d_int).read()
    before = {
        (r["stage"], r["partition_id"]): r["updated_at"] for r in st.collect()
    }
    done_buckets = [p for (s, p) in before if s == "postings"]
    assert 0 < len(done_buckets) < KW["n_buckets"]
    for s in ("docs", "stats", "tf", "terms"):
        assert (s, -1) in before

    # resume: completes without touching finished work
    idx = build_index_persisted(spark, pages, d_int, **KW)
    st2 = BuildState(spark, idx.path).read()
    after = {
        (r["stage"], r["partition_id"]): r["updated_at"] for r in st2.collect()
    }
    for key, ts in before.items():
        assert after[key] == ts, f"{key} was recomputed"
    assert {p for (s, p) in after if s == "postings"} == set(range(KW["n_buckets"]))

    # identical to an uninterrupted build
    ref = build_index_persisted(spark, pages, d_ref, **KW)
    assert _postings_snapshot(idx) == _postings_snapshot(ref)

    # and queries over the loaded index behave identically
    loaded = load_index(spark, idx.path)
    for q in ["JSON parsing", "table row scan", "parseJSON HTTPClient2"]:
        a = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in bm25_topk(loaded, q, k=10).collect()]
        b = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in wand_topk(loaded, q, k=10).collect()]
        c = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in bm25_topk(ref, q, k=10).collect()]
        assert a == b == c, q


def test_noop_rebuild_skips_everything(spark, tmp_path):
    pages = generate_pages(spark, 150, seed=3, parts=3)
    d = str(tmp_path / "idx")
    build_index_persisted(spark, pages, d, **KW)
    st1 = sorted(
        (r["stage"], r["partition_id"], r["updated_at"])
        for r in BuildState(spark, d).read().collect()
    )
    build_index_persisted(spark, pages, d, **KW)
    st2 = sorted(
        (r["stage"], r["partition_id"], r["updated_at"])
        for r in BuildState(spark, d).read().collect()
    )
    assert st1 == st2
