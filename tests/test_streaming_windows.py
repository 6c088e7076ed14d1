"""Watermarked windowed streaming aggregation: windows finalize in
append mode only after the watermark passes, events later than the
watermark are DROPPED, and events late-but-within-watermark are counted
— the bounded-state late-data contract."""

import glob
import os
import shutil
from datetime import datetime

from distributedcodesearchengine_spark.streaming.windows import (
    EVENTS_SCHEMA,
    start_event_rate_stream,
)


def _write_file(spark, specs, tmp_path, input_dir, name):
    """Write one parquet FILE directly into the stream input dir (the
    file source lists files, not subdirectories)."""
    data = [
        (i, datetime(2024, 1, 1, int(hm[:2]), int(hm[3:])), 1, t, float(v), "{}")
        for (i, hm, t, v) in specs
    ]
    staging = str(tmp_path / f"_stage_{name}")
    spark.createDataFrame(data, EVENTS_SCHEMA).coalesce(1).write.parquet(staging)
    part = glob.glob(staging + "/part-*.parquet")[0]
    shutil.copy(part, os.path.join(input_dir, name + ".parquet"))


def test_watermarked_window_rollup(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    def run():
        q = start_event_rate_stream(spark, input_dir, out_dir, ckpt)
        q.awaitTermination(300)

    # run 1: on-time events in windows H10=[10:00,11:00) and H11;
    # watermark after the run = 11:50 - 30m = 11:20
    _write_file(
        spark,
        [(1, "10:05", "a", 1.0), (2, "10:10", "a", 2.0), (3, "11:50", "a", 4.0)],
        tmp_path, input_dir, "f1",
    )
    run()
    # run 2 (watermark 11:20 in force):
    #  - event 4 at 10:30 -> window ends 11:00 <= 11:20 -> DROPPED
    #  - event 5 at 11:30 -> window ends 12:00 >  11:20 -> counted
    #  - event 6 at 14:00 -> advances watermark to 13:30, finalizing H10/H11
    _write_file(
        spark,
        [(4, "10:30", "a", 100.0), (5, "11:30", "a", 8.0), (6, "14:00", "a", 16.0)],
        tmp_path, input_dir, "f2",
    )
    run()
    # run 3: flush the windows finalized by run 2's watermark advance
    # (append emits on the batch AFTER the update)
    _write_file(spark, [(7, "16:00", "a", 32.0)], tmp_path, input_dir, "f3")
    q2 = start_event_rate_stream(spark, input_dir, out_dir, ckpt)
    q2.awaitTermination(300)

    got = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    h10 = int(datetime(2024, 1, 1, 10).timestamp())
    h11 = int(datetime(2024, 1, 1, 11).timestamp())
    # late event 4 dropped; late-but-in-watermark event 5 counted
    assert got[(h10, "a")] == (2, 3.0), got
    assert got[(h11, "a")] == (2, 12.0), got


def test_windowed_sketch_stream_matches_batch_sketch(spark, tmp_path):
    """Each finalized window's streaming sketch rows equal the batch
    ddsketch over that window's ON-TIME events exactly, and summing the
    window sketches reproduces the whole-horizon sketch (mergeability
    on the streaming output)."""
    from datetime import datetime as dt

    from distributedcodesearchengine_spark.operators.sketch import (
        ddsketch_buckets,
    )
    from distributedcodesearchengine_spark.streaming.windows import (
        start_windowed_sketch_stream,
    )

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    def run():
        q = start_windowed_sketch_stream(spark, input_dir, out_dir, ckpt)
        q.awaitTermination(300)

    on_time = [
        (1, "10:05", "a", 1.5), (2, "10:10", "a", 220.0), (3, "10:20", "a", 1.5),
        (4, "11:30", "a", 0.7), (5, "11:40", "a", 3500.0),
    ]
    _write_file(spark, on_time + [(6, "14:00", "a", 1.0)], tmp_path, input_dir, "s1")
    run()
    # second batch only flushes the windows the first batch finalized
    _write_file(spark, [(7, "16:00", "a", 1.0)], tmp_path, input_dir, "s2")
    run()

    got = {}
    for r in spark.read.parquet(out_dir).collect():
        got.setdefault(r["bucket"], {})[r["k"]] = r["c"]
    h10 = int(dt(2024, 1, 1, 10).timestamp())
    h11 = int(dt(2024, 1, 1, 11).timestamp())
    assert set(got) >= {h10, h11}

    def batch(vals):
        d = spark.createDataFrame([(float(v),) for v in vals], "x double")
        return {r["k"]: r["c"] for r in ddsketch_buckets(d, "x").collect()}

    assert got[h10] == batch([1.5, 220.0, 1.5])
    assert got[h11] == batch([0.7, 3500.0])
    # mergeability: window sketches sum to the two-hour sketch
    merged = {}
    for w in (h10, h11):
        for k, c in got[w].items():
            merged[k] = merged.get(k, 0) + c
    assert merged == batch([1.5, 220.0, 1.5, 0.7, 3500.0])
