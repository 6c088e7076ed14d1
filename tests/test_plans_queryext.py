"""Physical-plan shape invariants for the round-4 query-surface waves
(operators/queryext, termvectors.mget, timeseries pipeline extensions):
no CartesianProduct anywhere, BroadcastNestedLoopJoin only as the 1-row
scalar-fold shape where the operator deliberately folds a scalar, point
probes reach the parquet scans as pushed filters, and every k-cut is a
TakeOrderedAndProject (never a global sort)."""

import pytest

from distributedcodesearchengine_spark.build.checkpoint import (
    build_index_persisted,
    load_index,
)
from distributedcodesearchengine_spark.plans.audit import assert_plan, explain_str
from distributedcodesearchengine_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx_qx"))
    pages = generate_pages(spark, 300, seed=2, parts=3)
    build_index_persisted(
        spark, pages, d, block_size=32, target_row_postings=128, n_buckets=8
    )
    return load_index(spark, d)


def _events(spark, sf_dir):
    from distributedcodesearchengine_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events")


def test_query_wave_plans_no_cartesian(pidx):
    from distributedcodesearchengine_spark.operators.queryext import (
        bm25_regexp_topk,
        bm25_rescore_topk,
        bm25_span_first_topk,
        match_phrase_prefix_topk,
        sampler_terms,
    )

    plans = {
        "regexp": bm25_regexp_topk(pidx, "pars."),
        "span_first": bm25_span_first_topk(pidx, "json", end=5),
        "sampler": sampler_terms(pidx, "parse json", key="site",
                                 shard_size=20),
        "rescore": bm25_rescore_topk(pidx, "parse json", "parse json",
                                     window_size=20),
        "phrase_prefix": match_phrase_prefix_topk(pidx, "parse js"),
    }
    for name, df in plans.items():
        assert_plan(
            df,
            must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"],
        ), name


def test_constant_score_is_take_ordered_with_pushdown(pidx):
    from distributedcodesearchengine_spark.operators.queryext import (
        constant_score_topk,
    )

    out = constant_score_topk(pidx, "parse json")
    plan = assert_plan(
        out,
        must_contain=["TakeOrderedAndProject"],
        must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    assert "In(term" in plan or "in(term" in plan.lower(), plan[:4000]


def test_rescore_kcut_is_take_ordered(pidx):
    from distributedcodesearchengine_spark.operators.queryext import (
        bm25_rescore_topk,
    )

    out = bm25_rescore_topk(pidx, "parse json", "parse json",
                            window_size=20, k=10)
    assert_plan(out, must_contain=["TakeOrderedAndProject"])


def test_analyze_and_mget_point_probes_push_down(pidx):
    from distributedcodesearchengine_spark.operators.queryext import (
        analyze_doc,
    )
    from distributedcodesearchengine_spark.operators.termvectors import mget

    plan = explain_str(analyze_doc(pidx, 3))
    assert "doc_id" in plan and "PushedFilters" in plan, plan[:4000]
    plan = explain_str(mget(pidx, [1, 3, 7]))
    assert "PushedFilters" in plan and (
        "In(doc_id" in plan or "in(doc_id" in plan.lower()
    ), plan[:4000]


def test_events_pipeline_extensions_plan_clean(spark, sf_dir):
    from distributedcodesearchengine_spark.operators.timeseries import (
        auto_date_histogram,
        events_bucket_script,
        events_bucket_stats,
        events_serial_diff,
    )

    ev = _events(spark, sf_dir)
    # event_type equality must reach the parquet scan
    plan = explain_str(events_serial_diff(ev, "click", lag=2))
    assert "PushedFilters" in plan and "event_type" in plan, plan[:4000]
    for name, df in {
        "auto_hist": auto_date_histogram(ev, "click", target_buckets=12),
        "serial_diff": events_serial_diff(ev, "click", lag=2),
        "bucket_script": events_bucket_script(ev, "purchase", min_events=2),
    }.items():
        assert_plan(
            df,
            must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"],
        ), name
    # bucket_stats carries the deliberate 1-row scalar-fold crossJoins
    # (extremal-key fold + final stitch) — BNLJ of a 1-row broadcast
    # side is the allowed shape; a true CartesianProduct is not
    assert_plan(
        events_bucket_stats(ev, "click"),
        must_not_contain=["CartesianProduct"],
    )


def test_query_string_plan_no_cartesian(pidx):
    """The composed query_string plan — must/must_not doc sets, phrase
    predicate, prefix+fuzzy expansions, weighted bag — stays free of
    cartesians and unbounded BNLJs, and the k-cut is TakeOrdered."""
    from distributedcodesearchengine_spark.operators.querystring import (
        bm25_query_string_topk,
    )

    out = bm25_query_string_topk(
        pidx, '+parse "parse json" js* pars~1 -zzqx json^2', k=10
    )
    plan = assert_plan(
        out,
        must_contain=["TakeOrderedAndProject"],
        must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    # the scoring scan is term-pruned (pushdown-eligible), never
    # corpus-wide
    assert "In(term" in plan or "in(term" in plan.lower(), plan[:4000]


def test_session_wave_plans_no_cartesian(pidx, spark, sf_dir):
    """boosting / span_not / filtered-kNN plan shapes: no cartesian,
    no unbounded BNLJ, TakeOrdered k-cuts."""
    from distributedcodesearchengine_spark.functions.embed import (
        cosine_topk_filtered,
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.operators.boosting import (
        bm25_boosting_topk,
    )
    from distributedcodesearchengine_spark.operators.queryext import (
        bm25_span_not_topk,
    )
    from distributedcodesearchengine_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = mock_embed_text("parse json", 64)
    plans = {
        "boosting": bm25_boosting_topk(pidx, "parse json", "xml", 0.5),
        "span_not": bm25_span_not_topk(pidx, "parse", "json", 1, 1),
        "knn_label": cosine_topk_filtered(emb, qvec, 10, label=3),
    }
    for name, df in plans.items():
        plan = assert_plan(
            df,
            must_contain=["TakeOrderedAndProject"],
            must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"],
        )
        assert plan, name
