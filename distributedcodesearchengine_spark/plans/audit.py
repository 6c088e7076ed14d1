"""Physical-plan auditing helpers.

The engine's plan-shape invariants (filter pushdown to the parquet
scans, broadcast of the small query side, TakeOrderedAndProject for
top-k, partition pruning on term_bucket / lang) are asserted in
tests/test_plans.py using these helpers — so a regression that silently
turns a broadcast join into a sort-merge join or loses a pushed filter
fails CI, not a production run.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_plan(df: DataFrame, must_contain=(), must_not_contain=()):
    plan = explain_str(df)
    for s in must_contain:
        assert s in plan, f"plan missing {s!r}:\n{plan[:4000]}"
    for s in must_not_contain:
        assert s not in plan, f"plan unexpectedly contains {s!r}:\n{plan[:4000]}"
    return plan
