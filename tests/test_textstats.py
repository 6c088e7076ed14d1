

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


def test_term_drift_and_kl_hand_computed(spark):
    import math

    from pyspark.sql import functions as F

    from distributedcodesearchengine_spark.operators.textstats import (
        snapshot_kl,
        term_drift,
    )

    old = spark.createDataFrame(
        [(0, ["aa", "aa", "bb"])], "doc_id long, tokens array<string>"
    )
    new = spark.createDataFrame(
        [(1, ["bb", "cc", "cc", "cc"])], "doc_id long, tokens array<string>"
    )
    # union vocab {aa, bb, cc}, v=3; t_old=3, t_new=4
    def lp_new(c):
        return math.log((c + 1.0) / (4 + 3.0))

    def lp_old(c):
        return math.log((c + 1.0) / (3 + 3.0))

    exp = {
        "aa": (2, 0, lp_new(0) - lp_old(2)),
        "bb": (1, 1, lp_new(1) - lp_old(1)),
        "cc": (0, 3, lp_new(3) - lp_old(0)),
    }
    rows = term_drift(old, new, k=10).collect()
    got = {r.term: (r.c_old, r.c_new, r.dlp) for r in rows}
    for t, (co, cn, d) in exp.items():
        assert got[t][:2] == (co, cn)
        assert got[t][2] == round(d, 6), t
    # ordered by |dlp| desc
    ds = [abs(r.dlp) for r in rows]
    assert ds == sorted(ds, reverse=True)

    kl_row = snapshot_kl(old, new).first()
    assert kl_row.v_union == 3
    exp_kl = 0.0
    for t in exp:
        pn = (exp[t][1] + 1.0) / 7.0
        po = (exp[t][0] + 1.0) / 6.0
        exp_kl += pn * (math.log(pn) - math.log(po))
    assert abs(kl_row.kl - exp_kl) < 1e-6
    # identical snapshots: KL == 0 exactly (pn == po bit-for-bit)
    same = snapshot_kl(old, old.withColumn("doc_id", F.col("doc_id") + 1)).first()
    assert same.kl == 0.0
