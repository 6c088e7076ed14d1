

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
