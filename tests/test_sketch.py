"""Sketch tests (operators/sketch): CMS one-sided bound + mergeability,
KMV branches."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import docs_with_tokens
from distributedcodesearchengine_spark.operators.sketch import (
    cms_build,
    cms_estimates,
    kmv_distinct,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return docs_with_tokens(spark, sf_dir).persist()


def test_cms_one_sided_bound(docs):
    rows = cms_estimates(docs, width=8).collect()
    assert rows
    assert all(r["est"] >= r["ctf"] for r in rows)
    assert any(r["est"] > r["ctf"] for r in rows)  # collisions happen at w=8


def test_cms_wide_is_exact(docs):
    """Width far above vocab -> no collisions -> est == ctf."""
    rows = cms_estimates(docs, width=4096).collect()
    assert all(r["est"] == r["ctf"] for r in rows)


def test_cms_sketches_merge_by_addition(docs):
    """CMS(all) == CMS(half1) + CMS(half2) — the shard-merge property."""
    h1 = docs.where(F.col("doc_id") % 2 == 0)
    h2 = docs.where(F.col("doc_id") % 2 == 1)
    full = {(r["d"], r["bucket"]): r["cnt"] for r in cms_build(docs, width=8).collect()}
    merged = {}
    for part in (h1, h2):
        for r in cms_build(part, width=8).collect():
            merged[(r["d"], r["bucket"])] = merged.get((r["d"], r["bucket"]), 0) + r["cnt"]
    assert merged == full


def test_kmv_branches(docs):
    exact = kmv_distinct(docs, k=10_000).first()  # k > vocab -> exact
    assert exact["est"] == float(exact["n_distinct"])
    est = kmv_distinct(docs, k=16).first()  # estimator branch
    n = est["n_distinct"]
    assert est["est"] != float(n)
    assert 0.3 * n <= est["est"] <= 3 * n  # sane scale for k=16


# --- DDSketch quantiles ----------------------------------------------------

def _vals_df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def test_ddsketch_relative_error_bound(spark):
    import math

    vals = sorted(
        (1.0 + (i * 7919) % 1000 / 3.0) * (1.5 ** ((i * 31) % 13)) for i in range(500)
    )
    d = _vals_df(spark, vals)
    from distributedcodesearchengine_spark.operators.sketch import ddsketch_quantiles

    alpha = 0.02
    rows = ddsketch_quantiles(d, "x", [0.5, 0.9, 0.99], alpha=alpha).collect()
    assert [r["q"] for r in rows] == [0.5, 0.9, 0.99]
    n = len(vals)
    for r in rows:
        exact = vals[int(math.floor(r["q"] * (n - 1)))]
        assert abs(r["est"] - exact) <= alpha * exact * 1.0000001, (r, exact)
        assert r["n"] == n


def test_ddsketch_merge_equals_rebuild(spark):
    from distributedcodesearchengine_spark.operators.sketch import (
        ddsketch_buckets,
        ddsketch_merge,
    )

    vals = [0.01 * i + 0.5 for i in range(1, 400)]
    d = _vals_df(spark, vals)
    h1 = d.where(F.col("x") < 2.0)
    h2 = d.where(F.col("x") >= 2.0)
    full = {r["k"]: r["c"] for r in ddsketch_buckets(d, "x").collect()}
    merged = {
        r["k"]: r["c"]
        for r in ddsketch_merge(
            ddsketch_buckets(h1, "x"), ddsketch_buckets(h2, "x")
        ).collect()
    }
    assert merged == full


def test_ddsketch_excludes_non_positive(spark):
    from distributedcodesearchengine_spark.operators.sketch import (
        ddsketch_buckets,
        ddsketch_quantiles,
    )

    d = _vals_df(spark, [-3.0, 0.0, 1.0, 2.0, 4.0])
    assert ddsketch_buckets(d, "x").agg(F.sum("c")).first()[0] == 3
    rows = ddsketch_quantiles(d, "x", [0.5]).collect()
    assert rows[0]["n"] == 3
