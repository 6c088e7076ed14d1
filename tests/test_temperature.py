"""Temperature-resampling tests (operators/pipeline)."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators.pipeline import (
    temperature_rates,
    temperature_sample,
)
from distributedcodesearchengine_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").persist()


def test_flattening_orders_rates(docs):
    """alpha < 1 upweights low-resource languages: keep rates are
    anti-monotone in language size."""
    rows = temperature_rates(docs, alpha=0.5, target_frac=0.5).collect()
    by_n = sorted(rows, key=lambda r: r["n_l"])
    rates = [r["rate"] for r in by_n]
    assert all(a >= b - 1e-12 for a, b in zip(rates, rates[1:]))
    assert rates[0] > rates[-1]  # strictly flattened somewhere


def test_alpha1_full_budget_is_noop(docs):
    """alpha = 1, target_frac = 1 -> proportional targets at full
    budget -> every rate exactly 1, nothing dropped."""
    rows = temperature_rates(docs, alpha=1.0, target_frac=1.0).collect()
    assert all(abs(r["rate"] - 1.0) < 1e-9 for r in rows)
    s = temperature_sample(docs, alpha=1.0, target_frac=1.0).collect()
    assert all(r["n_kept"] == r["n_total"] for r in s)


def test_budget_respected_in_expectation(docs):
    """Sum of rate * n_l stays at or under the doc budget (rates are
    clipped at 1, which can only LOWER the realized total)."""
    n = docs.count()
    rows = temperature_rates(docs, alpha=0.5, target_frac=0.5).collect()
    expected = sum(r["rate"] * r["n_l"] for r in rows)
    assert expected <= 0.5 * n + 1e-6


def test_sample_counts_consistent_with_rates(docs):
    srows = temperature_sample(docs, alpha=0.5, target_frac=0.5).collect()
    assert any(r["n_kept"] < r["n_total"] for r in srows)  # non-vacuous
    for r in srows:
        # hash buckets are near-uniform; kept fraction tracks the rate
        frac = r["n_kept"] / r["n_total"]
        assert abs(frac - r["rate"]) < 0.15
