

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


def test_dedup_by_source_ledger(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.dedup import (
        dedup_by_source,
    )

    docs = spark.createDataFrame(
        [
            (0, "same page", "mirrorfarm"),
            (1, "same page", "mirrorfarm"),
            (2, "same page", "mirrorfarm"),
            (3, "other page", "mirrorfarm"),
            (4, "unique one", "clean"),
            (5, "unique two", "clean"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in dedup_by_source(docs).collect()}
    mf = out["mirrorfarm"]
    assert (mf["n_docs"], mf["n_distinct"], mf["n_dup_docs"]) == (4, 2, 2)
    assert mf["dup_ratio"] == pytest.approx(0.5, abs=1e-6)
    cl = out["clean"]
    assert (cl["n_dup_docs"], cl["dup_ratio"]) == (0, 0.0)


def test_fingerprint_sorted_clusters_shuffled_boilerplate(spark):
    import hashlib

    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.dedup import (
        dedup_fingerprint_sorted,
    )
    from distributedcodesearchengine_spark.operators.textstats import (
        doc_fingerprint,
    )

    texts = [
        (0, "terms privacy contact about"),
        (1, "about contact privacy terms"),          # shuffled
        (2, "about about contact privacy terms"),    # + repetition
        (3, "totally different content here"),
    ]
    raw = spark.createDataFrame(texts, "doc_id long, text string")
    docs = raw.select("doc_id", tokenize_udf("text").alias("tokens"))
    out = dedup_fingerprint_sorted(docs).collect()
    assert len(out) == 1
    g = out[0]
    assert (g["n_docs"], g["min_doc_id"]) == (3, 0)
    want = hashlib.md5(
        " ".join(sorted({"terms", "privacy", "contact", "about"})).encode()
    ).hexdigest()
    assert g["fp"] == want
    # the order-preserving fingerprint treats all three as DISTINCT
    fps = {r["fingerprint"] for r in doc_fingerprint(raw).collect()}
    assert len(fps) == 4


def test_threshold_curve_monotone_and_exact(spark):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.dedup import (
        dedup_threshold_curve,
        lsh_candidate_pairs,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi")
    texts = [base, base + " extra", base + " other words entirely",
             "different content here today " * 3]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", tokenize_udf("text").alias("tokens"))
    out = {r["threshold"]: r["n_pairs"]
           for r in dedup_threshold_curve(docs, (0.2, 0.5, 0.9)).collect()}
    # monotone non-increasing in the threshold
    vals = [out[t] for t in sorted(out)]
    assert vals == sorted(vals, reverse=True)
    # each row equals the direct pair count at that threshold
    for t in (0.2, 0.5, 0.9):
        want = lsh_candidate_pairs(docs, jaccard_min=t).count()
        assert out[t] == want
    import pytest

    with pytest.raises(ValueError):
        dedup_threshold_curve(docs, (0.0, 0.5))
