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


def test_poison_bucket_dead_letter_and_heal(spark, tmp_path):
    """ST3 error lineage: a poison work unit fails its group after
    retries, the OTHER groups complete, a failed row with the exception
    lands in _build_state, and a clean re-run heals to a reference-
    identical index."""
    from distributedcodesearchengine_spark.build.checkpoint import (
        BuildError,
        build_metrics_rollup,
    )

    pages = generate_pages(spark, 200, seed=7, parts=3)
    d = str(tmp_path / "idx_poison")
    d_ref = str(tmp_path / "idx_ref")

    with pytest.raises(BuildError) as ei:
        build_index_persisted(spark, pages, d, poison_buckets={0}, **KW)
    failed = set(ei.value.failed_buckets)
    assert 0 in failed and len(failed) < KW["n_buckets"]

    state = BuildState(spark, d)
    errs = state.errors().collect()
    assert errs and all(r["status"] == "failed" for r in errs)
    assert any("poisoned work unit" in (r["error"] or "") for r in errs)
    done = {p for (s, p) in (
        (r["stage"], r["partition_id"]) for r in state.read().collect()
    ) if s == "postings"} - {r["partition_id"] for r in errs}
    assert done and done.isdisjoint(failed)  # other groups completed

    # the rollup surface exposes the failure
    roll = {(r["stage"], r["status"]): r["n_units"]
            for r in build_metrics_rollup(spark, d).collect()}
    assert roll[("postings", "failed")] == len(failed)

    # re-run without the poison: only failed buckets rebuild, index heals
    idx = build_index_persisted(spark, pages, d, **KW)
    ref = build_index_persisted(spark, pages, d_ref, **KW)
    assert _postings_snapshot(idx) == _postings_snapshot(ref)


def test_priority_orders_bucket_groups(spark, tmp_path):
    """ST1: with bucket priorities, an interrupt after one group leaves
    exactly the highest-priority buckets complete."""
    pages = generate_pages(spark, 150, seed=13, parts=3)
    d = str(tmp_path / "idx_prio")
    prios = {6: 10, 3: 9}  # want buckets 6 and 3 first
    with pytest.raises(RuntimeError, match="simulated interrupt"):
        build_index_persisted(
            spark, pages, d, fail_after_groups=1, priorities=prios, **KW
        )
    done = {
        r["partition_id"]
        for r in BuildState(spark, d).read().where("stage = 'postings'").collect()
    }
    assert {6, 3} <= done and len(done) == 2  # group size = ceil(8/4) = 2


def test_changed_content_same_count_rebuilds(spark, tmp_path):
    """The resume fingerprint includes a content signature: same row
    count but different content must NOT skip stages."""
    d = str(tmp_path / "idx_fp")
    build_index_persisted(spark, generate_pages(spark, 100, seed=1, parts=2), d, **KW)
    idx = build_index_persisted(
        spark, generate_pages(spark, 100, seed=2, parts=2), d, **KW
    )
    # the rebuilt index reflects the NEW pages (seed=2 urls)
    ref = build_index_persisted(
        spark, generate_pages(spark, 100, seed=2, parts=2),
        str(tmp_path / "idx_fp_ref"), **KW
    )
    assert _postings_snapshot(idx) == _postings_snapshot(ref)


def test_overwrite_mode_restored(spark, tmp_path):
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    build_index_persisted(
        spark, generate_pages(spark, 80, seed=4, parts=2),
        str(tmp_path / "idx_mode"), **KW
    )
    after = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    assert after == before


def test_phrase_width_in_fingerprint_and_meta_preserved(spark, tmp_path):
    """The positional stage's LAYOUT width is part of its resume
    fingerprint (resuming with a different width rebuilds), the built
    handle carries the positional extras without a load_index round
    trip, and a later phrase_index=False build over the same dir keeps
    the recorded width so load_index stays layout-correct."""
    import json
    import os

    from distributedcodesearchengine_spark.operators.phrase import bm25_phrase_topk

    pages = generate_pages(spark, 120, seed=9, parts=2)
    d = str(tmp_path / "idx_w")
    idx = build_index_persisted(
        spark, pages, d, phrase_index=True, phrase_shard_width=64, **KW
    )
    # built handle == loaded handle: extras attached, quoted query
    # serves from the persisted index, rank-identical to the token scan
    assert "positional" in idx.extras
    assert idx.extras["phrase_shard_width"] == 64
    served = [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in bm25_phrase_topk(idx, "alalal alalal", k=5).collect()
    ]
    idx_scan = load_index(spark, d)
    idx_scan.extras.pop("positional")
    scanned = [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in bm25_phrase_topk(idx_scan, "alalal alalal", k=5).collect()
    ]
    assert served == scanned
    assert BuildState(spark, d).read().where("stage = 'positional'").count() == 1

    # resume with a DIFFERENT width: stage must rebuild, meta updates
    build_index_persisted(
        spark, pages, d, phrase_index=True, phrase_shard_width=32, **KW
    )
    assert BuildState(spark, d).read().where("stage = 'positional'").count() == 2
    with open(os.path.join(d, "_meta.json")) as f:
        assert json.load(f)["phrase_shard_width"] == 32

    # phrase_index=False over the same dir: positional parquet persists,
    # so the recorded width must survive the _meta.json rewrite
    build_index_persisted(spark, pages, d, phrase_index=False, **KW)
    with open(os.path.join(d, "_meta.json")) as f:
        assert json.load(f)["phrase_shard_width"] == 32
    assert load_index(spark, d).extras["phrase_shard_width"] == 32


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
