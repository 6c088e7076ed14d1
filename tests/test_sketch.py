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


# --- HyperLogLog -----------------------------------------------------------


def _tok_docs(spark, n, words_per_doc=20):
    # n*words_per_doc distinct tokens overall is NOT the goal — build a
    # corpus with exactly n distinct tokens spread over docs
    rows, toks = [], [f"tok{i:06d}" for i in range(n)]
    per = max(1, n // 50)
    for d in range(0, n, per):
        rows.append((d // per, toks[d:d + per]))
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_hll_linear_counting_accuracy(spark):
    from distributedcodesearchengine_spark.operators.sketch import hll_distinct

    n = 1000
    row = hll_distinct(_tok_docs(spark, n), p=12).first()
    assert row["n_distinct"] == n
    # p=12 in the linear-counting regime: well under 5% error
    assert abs(row["est"] - n) / n < 0.05, row


def test_hll_raw_branch_and_scale(spark):
    from distributedcodesearchengine_spark.operators.sketch import hll_distinct

    n = 400
    row = hll_distinct(_tok_docs(spark, n), p=4).first()
    # 16 registers, 400 keys -> every register hit -> raw harmonic branch
    assert row["n_empty"] == 0
    assert 0.3 * n <= row["est"] <= 3 * n  # rough but sane at m=16


def test_hll_merge_equals_rebuild(spark):
    from distributedcodesearchengine_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    docs = _tok_docs(spark, 300)
    h1 = docs.where(F.col("doc_id") % 2 == 0)
    h2 = docs.where(F.col("doc_id") % 2 == 1)
    merged = hll_merge([hll_registers(h1, p=8), hll_registers(h2, p=8)])
    full = hll_registers(docs, p=8)
    assert {(r["bucket"], r["rho"]) for r in merged.collect()} == {
        (r["bucket"], r["rho"]) for r in full.collect()
    }
    # and the merged estimate equals the rebuilt estimate exactly
    em = hll_estimate(merged, p=8).first()
    ef = hll_estimate(full, p=8).first()
    assert em["est"] == ef["est"] and em["n_empty"] == ef["n_empty"]


def test_hll_rho_hex_lane_matches_bit_definition(spark):
    """The hex-char leading-zero lane must equal the arithmetic
    definition rho = 48 - floor(log2(w)) computed in Python exact-int."""
    import hashlib

    from distributedcodesearchengine_spark.operators.sketch import hll_registers

    toks = [f"w{i}" for i in range(200)]
    docs = spark.createDataFrame([(0, toks)], "doc_id long, tokens array<string>")
    regs = {r["bucket"]: r["rho"] for r in hll_registers(docs, p=8).collect()}
    expect = {}
    for t in toks:
        hx = hashlib.md5(t.encode()).hexdigest()
        bucket = int(hx[:2], 16)
        w = int(hx[2:14], 16)
        rho = 49 if w == 0 else 48 - w.bit_length() + 1
        expect[bucket] = max(expect.get(bucket, 0), rho)
    assert regs == expect


def test_hll_p_validation(spark):
    from distributedcodesearchengine_spark.operators.sketch import hll_distinct

    docs = _tok_docs(spark, 10)
    for bad in (3, 5, 20, 0):
        with pytest.raises(ValueError):
            hll_distinct(docs, p=bad)
