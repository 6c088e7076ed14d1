"""cross_fields semantics (operators/fields.cross_fields_topk) —
Spark/DuckDB parity is covered by the cross_fields_topk gate key; these
pin the term-centric combiner algebra against DisMax."""

from distributedcodesearchengine_spark.operators.fields import (
    FieldSpec,
    cross_fields_topk,
    dismax_topk,
)

FIELDS = [FieldSpec("title", 1.0, 0.75), FieldSpec("body", 1.0, 0.75)]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, b) for i, (t, b) in enumerate(rows)],
        "doc_id long, title string, body string",
    )


_FLIP_ROWS = [
    # doc 0: whole query concentrated in one (padded) title
    ("alpha beta pad pad pad", "noise words entirely"),
    # doc 1: query scattered one term per field
    ("alpha plus extra words", "beta plus other words"),
    ("noise one two", "noise three four"),
    ("noise five six", "noise seven eight"),
    ("noise nine ten", "noise eleven twelve"),
]


def test_cross_fields_vs_dismax_rank_flip(spark):
    # the defining divergence of the two combiners on one corpus:
    # best_fields rewards the doc whose single field carries the whole
    # query; cross_fields lets each term pick its field, so the
    # scattered doc's per-term maxima SUM and it overtakes
    d = _docs(spark, _FLIP_ROWS)
    dm = [r.doc_id for r in dismax_topk(d, "alpha beta", FIELDS, k=5, tie=0.0).collect()]
    cf = [r.doc_id for r in cross_fields_topk(d, "alpha beta", FIELDS, k=5).collect()]
    assert dm[0] == 0 and dm[1] == 1
    assert cf[0] == 1 and cf[1] == 0


def test_cross_fields_sandwich_between_dismax_ties(spark):
    # sum of per-term maxima is sandwiched between the max of per-field
    # sums (tie=0) and the full weighted sum (tie=1) — per doc, always
    d = _docs(spark, _FLIP_ROWS)
    q = "alpha beta"
    t0 = {r.doc_id: r.score for r in dismax_topk(d, q, FIELDS, k=5, tie=0.0).collect()}
    t1 = {r.doc_id: r.score for r in dismax_topk(d, q, FIELDS, k=5, tie=1.0).collect()}
    cf = {r.doc_id: r.score for r in cross_fields_topk(d, q, FIELDS, k=5).collect()}
    for doc in set(t0) & set(t1) & set(cf):
        assert t0[doc] - 1e-9 <= cf[doc] <= t1[doc] + 1e-9, doc


def test_cross_fields_equals_dismax_when_concentrated(spark):
    # a doc whose every matched term lives in ONE field scores
    # identically under both combiners (max == only contributor);
    # the scattered doc scores strictly higher under cross_fields
    d = _docs(spark, _FLIP_ROWS)
    q = "alpha beta"
    dm = {r.doc_id: r.score for r in dismax_topk(d, q, FIELDS, k=5, tie=0.0).collect()}
    cf = {r.doc_id: r.score for r in cross_fields_topk(d, q, FIELDS, k=5).collect()}
    assert cf[0] == dm[0]
    assert cf[1] > dm[1]


def test_cross_fields_single_field_is_dismax(spark):
    d = _docs(spark, _FLIP_ROWS)
    one = [FieldSpec("body", 1.0, 0.75)]
    a = [(r.rank, r.doc_id, r.score)
         for r in cross_fields_topk(d, "words noise", one, k=5).collect()]
    b = [(r.rank, r.doc_id, r.score)
         for r in dismax_topk(d, "words noise", one, k=5, tie=0.0).collect()]
    assert a == b


def test_cross_fields_degenerate_and_empty(spark):
    d = _docs(spark, _FLIP_ROWS)
    # unknown token: all-zero regime backfills doc_id-ordered zeros
    got = cross_fields_topk(d, "zzzzunknown", FIELDS, k=3).collect()
    assert [r.doc_id for r in got] == [0, 1, 2]
    assert all(r.score == 0.0 for r in got)
    # empty-tokenizing query: typed empty frame
    out = cross_fields_topk(d, "!! ??", FIELDS, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["rank", "doc_id", "score"]
