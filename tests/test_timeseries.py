

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
