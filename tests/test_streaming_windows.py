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
