"""median_absolute_deviation tests (operators/textstats.doclen_mad —
exact type-1 medians over token counts)."""

from distributedcodesearchengine_spark.operators.textstats import doclen_mad


def _docs(spark, lens):
    rows = [(i, [f"tok{j:03d}" for j in range(n)]) for i, n in enumerate(lens)]
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def _py_med_t1(xs):
    s = sorted(xs)
    return s[(len(s) + 1) // 2 - 1]  # rank ceil(n/2), 1-based


def _py_mad(xs):
    m = _py_med_t1(xs)
    return _py_med_t1([abs(x - m) for x in xs])


def test_hand_computed_odd(spark):
    lens = [1, 5, 2, 8, 4]  # sorted 1 2 4 5 8 -> median 4; devs 3 2 0 1 4 -> 2
    row = doclen_mad(_docs(spark, lens)).first()
    assert (row["n_docs"], row["median_len"], row["mad"]) == (5, 4, 2)
    assert _py_mad(lens) == 2


def test_even_uses_lower_median(spark):
    lens = [2, 4, 6, 10]  # type-1 median = rank 2 -> 4; devs 2 0 2 6 -> 2
    row = doclen_mad(_docs(spark, lens)).first()
    assert (row["median_len"], row["mad"]) == (4, 2)
    assert (_py_med_t1(lens), _py_mad(lens)) == (4, 2)


def test_constant_lengths_zero_mad(spark):
    row = doclen_mad(_docs(spark, [7] * 6)).first()
    assert (row["median_len"], row["mad"]) == (7, 0)


def test_outlier_resistance(spark):
    """One huge outlier moves the mean wildly but MAD barely."""
    base = [10, 11, 12, 13, 14]
    row_a = doclen_mad(_docs(spark, base)).first()
    row_b = doclen_mad(_docs(spark, base + [100000])).first()
    assert row_a["mad"] == 1
    assert row_b["mad"] <= 2
    assert _py_mad(base + [100000]) == row_b["mad"]
