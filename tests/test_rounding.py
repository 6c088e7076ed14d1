"""Cross-engine parity of the 6-dp display rounding (functions/rounding).

Every gate key's value hash depends on round6 / round6_sql / round6_py
agreeing bit-for-bit: the whole point of the floor formulation is that
``round(x, 6)`` does NOT agree between Spark and DuckDB on boundary
doubles (observed: 0.5196875). These tests pin the three variants to
each other — hypothesis over finite doubles for Python-vs-DuckDB (fast,
no JVM), plus a fixed hostile-boundary set through the Spark Column
variant.
"""

import math
import struct

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedcodesearchengine_spark.functions.rounding import (
    round6,
    round6_py,
    round6_sql,
    sql_double,
)

# exact-boundary doubles: k/2 * 1e-6 neighborhoods, the 0.5196875
# regression value, negatives, huge-but-finite, subnormal-ish
HOSTILE = [
    0.5196875,
    0.519687,
    0.5196865,
    1.0000005,
    2.0000015,
    -0.5196875,
    -1.0000005,
    0.0,
    -0.0,
    1e-7,
    4.9999995,
    123456.1234565,
    0.1 + 0.2,
    1.0 / 3.0,
    9.87654321e5,
]


def _duck_round6(x: float) -> float:
    # sql_double() reconstructs the SAME IEEE value Python holds
    # (pinned by test_sql_double_binds_exact_double below) — the same
    # binding convention every oracle builder in the repo uses
    con = duckdb.connect()
    try:
        return con.execute(
            f"WITH t AS (SELECT {sql_double(x)}::DOUBLE AS v) SELECT {round6_sql('v')} FROM t"
        ).fetchone()[0]
    finally:
        con.close()


@given(
    st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
    )
)
@settings(max_examples=300, deadline=None)
def test_round6_py_matches_duckdb(x):
    got = _duck_round6(x)
    want = round6_py(x)
    assert got == want or (math.isnan(got) and math.isnan(want)), (
        f"x={x!r}: duckdb {got!r} != python {want!r}"
    )


def test_round6_py_matches_duckdb_hostile():
    for x in HOSTILE:
        assert _duck_round6(x) == round6_py(x), repr(x)


# Python repr parses 1 ulp off in DuckDB for this value: the bare
# literal is typed DECIMAL first and the DECIMAL->DOUBLE conversion is
# not correctly rounded once the scaled integer exceeds 2^53. sql_double
# forces the scientific-notation DOUBLE parse, which IS correctly
# rounded. ~1% of the repo's sha-derived hyperplane/centroid components
# hit this regime, and they feed sign comparisons (bucket bits).
_ULP_BAD = 360287970.23653245


def test_bare_repr_literal_is_known_unsafe():
    """Documents WHY sql_double exists: the bare repr literal of
    _ULP_BAD reconstructs a DIFFERENT double in DuckDB. If DuckDB ever
    fixes its DECIMAL->DOUBLE rounding this starts failing — then
    sql_double can be retired to plain repr."""
    con = duckdb.connect()
    try:
        got = con.execute(f"SELECT {_ULP_BAD!r}::DOUBLE").fetchone()[0]
        assert struct.pack("<d", got) != struct.pack("<d", _ULP_BAD)
    finally:
        con.close()


def test_sql_double_binds_exact_double():
    """Every oracle builder embeds floats via sql_double(); DuckDB must
    parse that literal back to the identical IEEE double — including
    the value whose bare repr is 1 ulp off."""
    con = duckdb.connect()
    try:
        for x in HOSTILE + [_ULP_BAD, -_ULP_BAD, 1e308, 5e-324, 2.0**53 + 3.0]:
            got = con.execute(f"SELECT {sql_double(x)}::DOUBLE").fetchone()[0]
            assert struct.pack("<d", got) == struct.pack("<d", x), repr(x)
    finally:
        con.close()


@given(
    st.floats(allow_nan=False, allow_infinity=False)
)
@settings(max_examples=300, deadline=None)
def test_sql_double_binds_exact_double_hypothesis(x):
    con = duckdb.connect()
    try:
        got = con.execute(f"SELECT {sql_double(x)}::DOUBLE").fetchone()[0]
        assert struct.pack("<d", got) == struct.pack("<d", x), repr(x)
    finally:
        con.close()


@pytest.mark.usefixtures("spark")
def test_round6_spark_matches_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, x) for i, x in enumerate(HOSTILE)], "i int, v double")
    rows = df.select("i", round6(F.col("v")).alias("r")).orderBy("i").collect()
    for row, x in zip(rows, HOSTILE):
        want = round6_py(x)
        got = row["r"]
        assert struct.pack("<d", got) == struct.pack("<d", want), repr(x)
