

def test_events_latest_picks_newest_with_tiebreak(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import events_latest

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 0, 5, 0)
    rows = [
        (1, t0, 10, "view", 1.0, "{}"),
        (2, t1, 10, "click", 2.0, "{}"),   # newest for user 10
        (3, t1, 20, "view", 3.0, "{}"),
        (4, t1, 20, "error", 4.0, "{}"),   # same instant: max event_id wins
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.user_id: r for r in events_latest(ev).collect()}
    assert out[10].event_id == 2 and out[10].event_type == "click"
    assert out[20].event_id == 4 and out[20].event_type == "error"
    assert out[10].ts_us == int(t1.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)


# --- pipeline aggregations (cumulative_sum / derivative / moving avg) -------


def test_pipeline_aggs_semantics(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_pipeline_aggs,
    )

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [
        # hour 0: 2 clicks; hour 1: 5; hour 3: 1 (hour 2 is a gap)
        (1, 1, t(0, 5), "click", 1.0),
        (2, 1, t(0, 50), "click", 1.0),
        (3, 2, t(1, 10), "click", 1.0),
        (4, 2, t(1, 20), "click", 1.0),
        (5, 2, t(1, 30), "click", 1.0),
        (6, 1, t(1, 40), "click", 1.0),
        (7, 1, t(1, 50), "click", 1.0),
        (8, 3, t(3, 10), "click", 1.0),
        (9, 3, t(0, 30), "view", 1.0),  # other type: excluded
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = events_pipeline_aggs(events, "click").collect()
    assert [r.n_events for r in out] == [2, 5, 1]
    assert [r.cum_n for r in out] == [2, 7, 8]
    # derivative: first bucket coalesced to 0; gap buckets are skipped
    # (min_doc_count=1 semantics) so the last delta is 1 - 5
    assert [r.delta_n for r in out] == [0, 3, -4]
    assert out[0].mavg3 == 2.0
    assert out[1].mavg3 == 3.5          # (2 + 5) / 2
    assert abs(out[2].mavg3 - 8 / 3) < 1e-6


def test_pipeline_aggs_single_bucket(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_pipeline_aggs,
    )

    events = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1, 0), "click", 1.0)],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = events_pipeline_aggs(events, "click").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_events, r.cum_n, r.delta_n, r.mavg3) == (1, 1, 0, 1.0)


# --- date_range / rate / top_metrics / t_test --------------------------------


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_date_range_always_present_and_overlap(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_date_range,
    )

    t = lambda d: dt.datetime(2024, 1, d, 12, 0, 0)
    ep = lambda d: int(t(d).replace(tzinfo=dt.timezone.utc).timestamp())
    ev = _mk_events(spark, [
        (1, t(1), 1, "click", 1.0, "{}"),
        (2, t(5), 1, "click", 1.0, "{}"),
        (3, t(9), 1, "click", 1.0, "{}"),
        (4, t(9), 1, "view", 1.0, "{}"),  # other type: never counted
    ])
    out = {r["range_key"]: r["n_events"] for r in events_date_range(
        ev, "click",
        [("all", None, None),            # open both ends
         ("w1", ep(1), ep(6)),           # [1st, 6th) -> 2 events
         ("w2", ep(5), ep(10)),          # overlaps w1 (ES allows)
         ("empty", ep(20), ep(25))],     # always present at 0
    ).collect()}
    assert out == {"all": 3, "w1": 2, "w2": 2, "empty": 0}
    # boundary: from is inclusive, to exclusive
    from distributedcodesearchengine_spark.operators.timeseries import (
        events_date_range as edr,
    )
    b = {r["range_key"]: r["n_events"] for r in edr(
        ev, "click", [("at", ep(5), ep(5) + 1), ("before", None, ep(5))]
    ).collect()}
    assert b == {"at": 1, "before": 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        edr(ev, "click", [])
    with _pt.raises(ValueError):
        edr(ev, "click", [("x", None, None), ("x", 1, 2)])
    # keys become column names + SQL literals: identifier-safe only
    from distributedcodesearchengine_spark.operators.timeseries import (
        events_date_range_sql,
    )
    for bad in ("a b", "x'y", "k-1", ""):
        with _pt.raises(ValueError):
            edr(ev, "click", [(bad, None, None)])
        with _pt.raises(ValueError):
            events_date_range_sql("click", [(bad, None, None)])


def test_rate_rescales_hourly_counts(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_rate,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = _mk_events(spark, [
        (i, base + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
        for i in range(6)
    ] + [(99, base + dt.timedelta(hours=2), 1, "click", 1.0, "{}")])
    out = events_rate(ev, "click", "minute").collect()
    assert [r["n_events"] for r in out] == [6, 1]
    assert [r["rate"] for r in out] == [0.1, round(1 * 60 / 3600.0, 6)]
    import pytest as _pt
    with _pt.raises(ValueError):
        events_rate(ev, "click", "fortnight")


def test_top_metrics_carries_sort_winner_row(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_top_metrics,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = _mk_events(spark, [
        (1, base, 7, "click", 5.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 8, "click", 9.0, "{}"),  # winner
        (3, base + dt.timedelta(minutes=2), 9, "click", 9.0, "{}"),  # tie: higher id loses
        (4, base + dt.timedelta(hours=1), 11, "click", 1.0, "{}"),
    ])
    out = events_top_metrics(ev, "click").collect()
    assert len(out) == 2
    assert (out[0]["event_id"], out[0]["user_id"], out[0]["value"]) == (2, 8, 9.0)
    assert out[1]["event_id"] == 4


def test_t_test_welch_matches_scipy_formula(spark):
    """Hand-computed Welch t/df on a tiny two-group frame."""
    import math

    from distributedcodesearchengine_spark.operators.aggs import t_test_docs

    rows = [(i, "x", "en", v) for i, v in enumerate([10, 12, 14, 16])] + [
        (100 + i, "x", "de", v) for i, v in enumerate([20, 22, 30])
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    out = t_test_docs(docs).collect()[0]
    xa, xb = [10, 12, 14, 16], [20, 22, 30]
    ma, mb = sum(xa) / 4, sum(xb) / 3
    s2a = sum((v - ma) ** 2 for v in xa) / 3
    s2b = sum((v - mb) ** 2 for v in xb) / 2
    se2 = s2a / 4 + s2b / 3
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((s2a / 4) ** 2 / 3 + (s2b / 3) ** 2 / 2)
    assert out["n_a"] == 4 and out["n_b"] == 3
    assert abs(out["t_stat"] - t) < 1e-6 and abs(out["df"] - df) < 1e-6
    import pytest as _pt
    small = spark.createDataFrame(
        [(1, "x", "en", 5), (2, "x", "de", 6), (3, "x", "de", 7)],
        "doc_id long, text string, lang string, n_chars long",
    )
    with _pt.raises(ValueError):
        t_test_docs(small)


def test_normalize_pipeline_agg(spark):
    import datetime as dt

    import pytest as _pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_normalize,
    )

    def t(h):
        return dt.datetime(2024, 1, 1, h, 0, 0)

    rows = []
    eid = 0
    for h, n in [(0, 1), (1, 3), (2, 6)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, t(h), 1, "click", 1.0, "{}"))
    rows.append((99, t(0), 1, "view", 1.0, "{}"))  # other type: excluded
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    pct = [r.norm for r in events_normalize(ev, "click").collect()]
    assert pct == [round(1 / 10, 6), round(3 / 10, 6), round(6 / 10, 6)]
    r01 = [r.norm for r in events_normalize(ev, "click", "rescale_0_1").collect()]
    assert r01 == [0.0, 0.4, 1.0]
    # constant series rescales to all-zero, not a division crash
    const = spark.createDataFrame(
        [(1, t(0), 1, "click", 1.0, "{}"), (2, t(1), 1, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    assert [r.norm for r in events_normalize(const, "click", "rescale_0_1").collect()] == [0.0, 0.0]
    with _pytest.raises(ValueError):
        events_normalize(ev, "click", "bogus")


# --- cumulative_cardinality --------------------------------------------------


def test_cumulative_cardinality_hand_computed(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_cumulative_cardinality,
    )

    h = lambda hour, minute=0: dt.datetime(2024, 1, 1, hour, minute)
    # hour 0: users 1, 2 (both new)      -> new 2, cum 2, n 3
    # hour 1: users 2, 3 (3 new)         -> new 1, cum 3, n 2
    # hour 2: users 1, 2, 3 (none new)   -> new 0, cum 3, n 3
    rows = [
        (1, h(0, 1), 1, "view", 1.0, "{}"),
        (2, h(0, 2), 2, "view", 1.0, "{}"),
        (3, h(0, 3), 1, "click", 1.0, "{}"),
        (4, h(1, 1), 2, "view", 1.0, "{}"),
        (5, h(1, 2), 3, "view", 1.0, "{}"),
        (6, h(2, 1), 1, "view", 1.0, "{}"),
        (7, h(2, 2), 2, "view", 1.0, "{}"),
        (8, h(2, 3), 3, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = events_cumulative_cardinality(ev).collect()
    assert [(r.n_events, r.new_users, r.cum_users) for r in out] == [
        (3, 2, 2),
        (2, 1, 3),
        (3, 0, 3),
    ]
    assert out[0].bucket < out[1].bucket < out[2].bucket
    # the final cumulative count equals the exact distinct-user count
    assert out[-1].cum_users == 3


def test_cumulative_cardinality_layout_independent(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_cumulative_cardinality,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1, i % 5, i % 60), i % 7, "view", 1.0, "{}")
        for i in range(40)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    a = events_cumulative_cardinality(
        spark.createDataFrame(rows, schema).repartition(1)
    ).collect()
    b = events_cumulative_cardinality(
        spark.createDataFrame(rows[::-1], schema).repartition(16)
    ).collect()
    assert a == b
    assert a[-1].cum_users == 7


# --- z-score outlier buckets -------------------------------------------------


def test_zscore_outliers_hand_computed(spark):
    import datetime as dt
    import math

    import pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_zscore_outliers,
    )

    # counts per hour: [2, 2, 2, 14] -> mean 5, var ((9+9+9+81)/4)=27
    counts = [2, 2, 2, 14]
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, dt.datetime(2024, 1, 1, h, j), 1, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = events_zscore_outliers(ev, "click", threshold=1.5).collect()
    mean, var = 5.0, 27.0
    std = math.sqrt(var)
    for r, c in zip(out, counts):
        assert r["z"] == pytest.approx((c - mean) / std, abs=1e-6)
    assert [r["outlier"] for r in out] == [0, 0, 0, 1]


def test_zscore_constant_series_no_outliers(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_zscore_outliers,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1, i % 3, i // 3), 1, "click", 1.0, "{}")
        for i in range(9)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = events_zscore_outliers(ev, "click").collect()
    assert all(r["z"] == 0.0 and r["outlier"] == 0 for r in out)


def test_zscore_empty_and_guard(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_zscore_outliers,
    )

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    assert events_zscore_outliers(ev, "click").count() == 0
    with pytest.raises(ValueError):
        events_zscore_outliers(ev, "click", threshold=0.0)


# --- variable_width_histogram ------------------------------------------------


def _vw_events(spark, values, et="click"):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i % 60), 1, et, float(v), "{}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_varwidth_separates_two_clusters(spark):
    from distributedcodesearchengine_spark.operators.timeseries import (
        events_variable_width_histogram,
    )

    # two tight groups far apart -> k=2 lands one bucket on each
    vals = [1.0, 1.1, 1.2, 0.9, 100.0, 100.2, 99.8]
    out = events_variable_width_histogram(
        _vw_events(spark, vals), "click", k=2, iters=4
    ).collect()
    assert len(out) == 2
    a, b = out
    assert a["n_events"] == 4 and b["n_events"] == 3
    assert a["max_val"] <= 1.2 and b["min_val"] >= 99.8
    # centroid keys are the exact weighted means of each group (cents)
    import pytest

    assert a["key"] == pytest.approx((90 + 110 + 120 + 100) / 4 / 100.0, abs=1e-6)
    assert b["key"] == pytest.approx((10000 + 10020 + 9980) / 3 / 100.0, abs=1e-6)


def test_varwidth_python_replication(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_variable_width_histogram,
    )

    vals = [float(x) for x in (3, 7, 9, 15, 21, 22, 40, 41, 42, 80)]
    k, iters = 3, 4
    out = events_variable_width_histogram(
        _vw_events(spark, vals), "click", k=k, iters=iters
    ).collect()

    # pure-Python replication of the documented algorithm (on cents)
    import math

    cs = [int(math.floor(v * 100.0 + 0.5)) for v in vals]
    from collections import Counter

    distc = Counter(cs)
    mn, mx = min(distc), max(distc)
    span = float(mx - mn)
    cents = [float(mn) + (j + 0.5) * (span / k) for j in range(k)]
    for _ in range(iters):
        s = [0] * k
        w = [0] * k
        for c, n in distc.items():
            ds = [abs(float(c) - ct) for ct in cents]
            j = ds.index(min(ds))
            s[j] += c * n
            w[j] += n
        cents = [float(s[j]) / float(w[j]) if w[j] else cents[j]
                 for j in range(k)]
    groups = {}
    for c, n in distc.items():
        ds = [abs(float(c) - ct) for ct in cents]
        j = ds.index(min(ds))
        g = groups.setdefault(j, [0, None, None])
        g[0] += n
        g[1] = c if g[1] is None else min(g[1], c)
        g[2] = c if g[2] is None else max(g[2], c)
    want = sorted(
        (cents[j] / 100.0, g[1] / 100.0, g[2] / 100.0, g[0])
        for j, g in groups.items()
    )
    got = [(r["key"], r["min_val"], r["max_val"], r["n_events"]) for r in out]
    assert len(got) == len(want)
    for g, wnt in zip(got, want):
        assert g[0] == pytest.approx(wnt[0], abs=1e-6)
        assert g[1:] == pytest.approx(wnt[1:], abs=1e-6)


def test_varwidth_guards_and_empty(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_variable_width_histogram,
    )

    ev = _vw_events(spark, [1.0], et="view")
    assert events_variable_width_histogram(ev, "click", k=2).count() == 0
    with pytest.raises(ValueError):
        events_variable_width_histogram(ev, "click", k=1)
    with pytest.raises(ValueError):
        events_variable_width_histogram(ev, "click", iters=0)


# --- simple exponential smoothing --------------------------------------------


def test_ses_matches_python_recurrence(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_ses_forecast,
    )

    counts = [4, 8, 2, 6, 10]
    ev = _vw_events(spark, [])  # schema helper; rebuild with hour spread
    import datetime as dt

    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, dt.datetime(2024, 1, 1, h, j), 1, "click",
                         1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    a = 0.3
    s = float(counts[0])
    for x in counts[1:]:
        s = a * x + (1 - a) * s
    out = events_ses_forecast(ev, "click", alpha=a).collect()[0]
    assert out["n_buckets"] == 5
    assert out["level"] == pytest.approx(s, abs=1e-6)


def test_ses_alpha_one_is_last_value(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_ses_forecast,
    )

    rows = []
    eid = 0
    for h, c in enumerate([3, 9, 5]):
        for j in range(c):
            rows.append((eid, dt.datetime(2024, 1, 1, h, j), 1, "click",
                         1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = events_ses_forecast(ev, "click", alpha=1.0).collect()[0]
    assert out["level"] == 5.0


def test_ses_guard(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_ses_forecast,
    )

    ev = _vw_events(spark, [1.0])
    with pytest.raises(ValueError):
        events_ses_forecast(ev, "click", alpha=0.0)


# --- bucket_sort + percentiles_bucket ----------------------------------------


def _hist_events(spark, counts, et="click"):
    import datetime as dt

    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, dt.datetime(2024, 1, 1, h, j % 60), 1, et,
                         1.0, "{}"))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_bucket_sort_from_size(spark):
    from distributedcodesearchengine_spark.operators.timeseries import (
        events_bucket_sort,
    )

    ev = _hist_events(spark, [3, 9, 5, 9, 1])
    out = events_bucket_sort(ev, "click", frm=1, size=2).collect()
    # order: h1(9), h3(9 tie->later bucket), h2(5), h0(3), h4(1);
    # skip 1, take 2 -> h3(9), h2(5)
    assert [r["n_events"] for r in out] == [9, 5]
    import pytest

    with pytest.raises(ValueError):
        events_bucket_sort(ev, "click", size=0)


def test_percentiles_bucket_type1(spark):
    from distributedcodesearchengine_spark.operators.timeseries import (
        events_percentiles_bucket,
    )

    # counts sorted: [1, 3, 5, 9, 9]; n=5 -> p25 rank 2 -> 3,
    # p50 rank 3 -> 5, p75 rank (18)//4=4 -> 9
    ev = _hist_events(spark, [3, 9, 5, 9, 1])
    out = {r["stat"]: r["value"]
           for r in events_percentiles_bucket(ev, "click").collect()}
    assert out == {"min": 1, "p25": 3, "p50": 5, "p75": 9, "max": 9}


# --- change_point ------------------------------------------------------------


def test_change_point_finds_level_shift(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_change_point,
    )

    # level shift after hour 3: [2,2,2,2] -> [10,10,10]
    counts = [2, 2, 2, 2, 10, 10, 10]
    ev = _hist_events(spark, counts)
    r = events_change_point(ev, "click").collect()[0]
    assert r["n_before"] == 4 and r["n_after"] == 3
    assert r["mean_before"] == pytest.approx(2.0)
    assert r["mean_after"] == pytest.approx(10.0)
    assert r["shift"] == pytest.approx(8.0)
    # the split bucket is hour 4's bucket
    import datetime as dt

    assert r["split_bucket"] == int(
        dt.datetime(2024, 1, 1, 4).replace(tzinfo=dt.timezone.utc).timestamp()
    )


def test_change_point_single_bucket_empty(spark):
    from distributedcodesearchengine_spark.operators.timeseries import (
        events_change_point,
    )

    ev = _hist_events(spark, [5])
    assert events_change_point(ev, "click").count() == 0


# --- moving median -----------------------------------------------------------


def test_moving_median_hand_computed(spark):
    from distributedcodesearchengine_spark.operators.timeseries import (
        events_moving_median,
    )

    counts = [5, 1, 9, 3, 7]
    ev = _hist_events(spark, counts)
    out = [r["moving_median"]
           for r in events_moving_median(ev, "click", window=3).collect()]
    # windows: [5] -> 5; [5,1] -> lower median 1; [5,1,9] -> 5;
    # [1,9,3] -> 3; [9,3,7] -> 7
    assert out == [5, 1, 5, 3, 7]


def test_moving_median_even_window_lower(spark):
    from distributedcodesearchengine_spark.operators.timeseries import (
        events_moving_median,
    )

    counts = [2, 4, 6, 8]
    ev = _hist_events(spark, counts)
    out = [r["moving_median"]
           for r in events_moving_median(ev, "click", window=4).collect()]
    # window [2,4]: lower median 2; [2,4,6]: 4; [2,4,6,8]: lower 4
    assert out == [2, 2, 4, 4]
    import pytest

    with pytest.raises(ValueError):
        events_moving_median(ev, "click", window=0)


# --- hour-of-day profile -----------------------------------------------------


def test_hour_profile_periodic_fold(spark):
    import datetime as dt

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_hour_profile,
    )

    # same hour across two DAYS folds into one cell
    rows = [
        (0, dt.datetime(2024, 1, 1, 9, 0), 1, "click", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 2, 9, 30), 2, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 9, 5), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 14, 0), 1, "click", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {(r["hour_of_day"], r["event_type"]): (r["n_events"], r["n_users"])
           for r in events_hour_profile(ev).collect()}
    assert out == {
        (9, "click"): (2, 2),
        (9, "view"): (1, 1),
        (14, "click"): (1, 1),
    }


# --- heavy hitters -----------------------------------------------------------


def test_heavy_hitters_exact_shares(spark):
    import datetime as dt

    import pytest

    from distributedcodesearchengine_spark.operators.timeseries import (
        events_heavy_hitters,
    )

    rows = []
    eid = 0
    for user, c in [(7, 6), (3, 3), (9, 1)]:
        for j in range(c):
            rows.append((eid, dt.datetime(2024, 1, 1, 0, j), user, "click",
                         1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = events_heavy_hitters(ev, k=10).collect()
    assert [(r["user_id"], r["n_events"]) for r in out] == [(7, 6), (3, 3), (9, 1)]
    assert out[0]["share"] == pytest.approx(0.6, abs=1e-6)
    # min_share trims the tail
    trimmed = events_heavy_hitters(ev, k=10, min_share=0.25).collect()
    assert [r["user_id"] for r in trimmed] == [7, 3]
    with pytest.raises(ValueError):
        events_heavy_hitters(ev, k=0)
