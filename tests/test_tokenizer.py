"""Tokenizer contract tests.

Goldens transcribed from the reference's own cases
(``tests/test_search.py:83-95``) plus adversarial additions from
FIXTURES.md §4, and a property test that the vectorized pandas path in
``functions/udfs.py`` is list-identical to the literal 6-step oracle
transcription (``oracle/tokenizer.py``) — including the findall
equivalence claim.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedcodesearchengine_spark.functions.udfs import _tokenize_series
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize

GOLDENS = [
    # reference tests/test_search.py:85-95 (membership -> exact lists)
    ("parseJSONData", ["parse", "json", "data"]),
    ("parse_json_data", ["parse", "json", "data"]),
    # FIXTURES.md §4
    ("JSONData", ["json", "data"]),
    ("a b ab", ["ab"]),
    ("file-name.ext/path\\x", ["file", "name", "ext", "path"]),
    ("", []),
    ("a ! b ?", []),
    ("HTTPClient2", ["http", "client2"]),
    ("XMLHttpRequest", ["xml", "http", "request"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("MAX_RETRY_COUNT", ["max", "retry", "count"]),
    ("héllo wörld", ["llo", "rld"]),  # non-ascii letters become separators
    ("x1y2 Ab aB", ["x1y2", "ab"]),
    ("  lots   of\tspace\n", ["lots", "of", "space"]),
    ("don'tStop", ["don", "stop"]),
    ("1234 5 a9", ["1234", "a9"]),
]


def test_goldens_oracle():
    for text, want in GOLDENS:
        assert tokenize(text) == want, text


def test_goldens_vectorized():
    got = _tokenize_series(pd.Series([t for t, _ in GOLDENS])).tolist()
    assert got == [w for _, w in GOLDENS]


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=["L", "N", "P", "S", "Z", "M"]
        ),
        max_size=80,
    )
)
def test_vectorized_matches_oracle(text):
    assert _tokenize_series(pd.Series([text])).tolist()[0] == tokenize(text)


def test_udf_on_spark(spark):
    from pyspark.sql import functions as F

    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf

    df = spark.createDataFrame([(t,) for t, _ in GOLDENS], "text string")
    got = [r["toks"] for r in df.select(tokenize_udf("text").alias("toks")).collect()]
    assert got == [w for _, w in GOLDENS]


def test_jvm_expr_matches_on_ascii(spark):
    """The pure-JVM tokenizer expression agrees with the UDF on ASCII
    inputs (its documented domain)."""
    from pyspark.sql import functions as F

    from distributedcodesearchengine_spark.functions.udfs import (
        tokenize_expr,
        tokenize_udf,
    )

    ascii_goldens = [t for t, _ in GOLDENS if t.isascii()]
    df = spark.createDataFrame([(t,) for t in ascii_goldens], "text string")
    rows = df.select(
        tokenize_udf("text").alias("a"), tokenize_expr(F.col("text")).alias("b")
    ).collect()
    for r in rows:
        assert r["a"] == r["b"]
