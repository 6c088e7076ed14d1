

def test_ngram_diversity_hand_computed(spark):
    from distributedcodesearchengine_spark.operators.textstats import (
        ngram_diversity,
    )

    docs = spark.createDataFrame(
        [
            (0, ["aa", "bb", "aa", "bb"]),  # bigrams: aa bb, bb aa, aa bb
            (1, ["aa", "bb"]),              # bigram: aa bb
            (2, ["cc"]),                    # no bigram
        ],
        "doc_id long, tokens array<string>",
    )
    rows = {r.n: (r.total, r["distinct"], r.diversity)
            for r in ngram_diversity(docs, max_n=2).collect()}
    # unigrams: 7 occurrences of {aa x3, bb x3, cc x1} -> 3 distinct
    assert rows[1] == (7, 3, round(3 / 7, 6))
    # bigrams: 4 occurrences of {aa bb x3, bb aa x1} -> 2 distinct
    assert rows[2] == (4, 2, 0.5)


def test_ngram_diversity_degenerate_and_guard(spark):
    import pytest as _pytest

    from distributedcodesearchengine_spark.operators.textstats import (
        ngram_diversity,
    )

    docs = spark.createDataFrame(
        [(0, ["aa"])], "doc_id long, tokens array<string>"
    )
    rows = {r.n: (r.total, r["distinct"], r.diversity)
            for r in ngram_diversity(docs, max_n=3).collect()}
    assert rows[1] == (1, 1, 1.0)
    assert rows[2] == (0, 0, 0.0)  # no bigrams exist: zeros, not a crash
    assert rows[3] == (0, 0, 0.0)
    with _pytest.raises(ValueError):
        ngram_diversity(docs, max_n=0)


def test_zipf_fit_exact_power_law(spark):
    """A constructed corpus with freq(rank) = C * rank^-1 fits slope
    -1 and intercept ln(C) to numerical precision."""
    import math

    from distributedcodesearchengine_spark.operators.textstats import zipf_fit

    # term t_r appears floor(120 / r) times, r = 1..6 -> near-exact -1
    toks = []
    C = 720
    for r in range(1, 7):
        toks += [f"term{r:02d}"] * (C // r)
    docs = spark.createDataFrame(
        [(0, toks)], "doc_id long, tokens array<string>"
    )
    row = zipf_fit(docs, top_n=6).first()
    assert row["n_terms"] == 6
    # C/r is exactly representable for r in 1..6 except r=5? 720/5=144
    # exact for all -> y = ln(720) - ln(r), a PERFECT line
    assert abs(row["slope"] - (-1.0)) < 1e-6
    assert abs(row["intercept"] - math.log(720.0)) < 1e-6


def test_zipf_fit_guard(spark):
    import pytest as _pytest

    from distributedcodesearchengine_spark.operators.textstats import zipf_fit

    docs = spark.createDataFrame(
        [(0, ["aa", "bb"])], "doc_id long, tokens array<string>"
    )
    with _pytest.raises(ValueError):
        zipf_fit(docs, top_n=1)
