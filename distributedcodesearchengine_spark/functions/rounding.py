"""Engine-identical 6-dp rounding.

``round(x, 6)`` is NOT portable between engines: Spark rounds the
decimal expansion of the double HALF_UP while DuckDB rounds the scaled
double, and the two disagree on boundary values (observed at sf0.01:
quality 0.5196875 -> Spark 0.519688, DuckDB 0.519687). The gate hashes
raw values, so display rounding must be bit-identical.

``floor(x * 1e6 + 0.5) / 1e6`` is pure IEEE-754 double arithmetic —
multiply, add, floor, divide — which every engine evaluates identically,
so the Spark / DuckDB / Python variants below always agree bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1000000.0


def round6(col: Column | str) -> Column:
    """Spark-side 6-dp rounding (portable floor formulation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(_SCALE) + F.lit(0.5)) / F.lit(_SCALE)


def round6_sql(expr: str) -> str:
    """DuckDB-side 6-dp rounding of a SQL expression (same arithmetic)."""
    return f"(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0)"


def round6_py(x: float) -> float:
    """Driver-side 6-dp rounding of a Python float (same arithmetic)."""
    return math.floor(x * _SCALE + 0.5) / _SCALE


def sql_double(x: float) -> str:
    """Embed a Python float in DuckDB SQL so the engine reconstructs the
    IDENTICAL IEEE-754 double.

    A bare decimal literal is typed DECIMAL first and the
    DECIMAL->DOUBLE conversion is off by 1 ulp whenever the scaled
    integer exceeds 2^53 (observed: 360287970.23653245 parses to
    0x...65 vs Python's 0x...64; ~1% of the repo's sha-derived
    hyperplane/centroid components hit this). One wrong ulp flips
    sign/argmax/threshold comparisons — integer outputs like LSH bucket
    bits or DDSketch buckets, which no display rounding hides. A
    scientific-notation literal is typed DOUBLE at parse and goes
    through the correctly-rounded string->double path (verified in
    tests/test_rounding.py over hypothesis-generated doubles), so this
    appends ``e0`` when repr carries no exponent."""
    r = repr(float(x))
    if "e" in r or "E" in r or "inf" in r or "nan" in r:
        return r
    return r + "e0"
