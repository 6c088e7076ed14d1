

# --- within-document line dedup ----------------------------------------------


def test_lines_within_keeps_first_occurrence(spark):
    import hashlib

    from distributedcodesearchengine_spark.operators.dedup import (
        dedup_lines_within,
    )

    pages = spark.createDataFrame(
        [
            (0, "home\nbody one\nhome\nbody two\nbody one"),
            (1, "unique one\nunique two"),
            (2, "same\nsame\nsame"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines_within(pages).collect()}
    assert (out[0]["n_lines"], out[0]["n_removed"]) == (5, 2)
    want0 = hashlib.md5("home\nbody one\nbody two".encode()).hexdigest()
    assert out[0]["clean_hash"] == want0
    assert out[1]["n_removed"] == 0
    assert (out[2]["n_lines"], out[2]["n_removed"]) == (3, 2)
    assert out[2]["clean_hash"] == hashlib.md5(b"same").hexdigest()


def test_lines_within_order_preserved(spark):
    import hashlib

    from distributedcodesearchengine_spark.operators.dedup import (
        dedup_lines_within,
    )

    # the SECOND occurrence drops, not the first — order matters
    pages = spark.createDataFrame(
        [(0, "b\na\nb\nc\na")], "doc_id long, text string"
    )
    r = dedup_lines_within(pages).collect()[0]
    assert r["clean_hash"] == hashlib.md5(b"b\na\nc").hexdigest()
