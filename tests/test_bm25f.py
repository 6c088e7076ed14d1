"""BM25F multi-field ranking (operators/fields.py).

Pure-Python mirror parity, the document-level df union lane, the
single-field rank-equivalence property, title-weight monotonicity, and
the degenerate branches.
"""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.functions.rounding import round6_py
from distributedcodesearchengine_spark.operators.fields import (
    FieldSpec,
    bm25f_topk,
)
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize

K1, EPSILON = 1.5, 0.25


def _py_bm25f(rows, query, fields, k1=K1):
    """Reference BM25F: rows = [(doc_id, {field: text})]; fields =
    [(name, w, b)]. Returns {doc_id: score} over matched docs."""
    toks = [[tokenize(flds[name]) for name, _, _ in fields] for _, flds in rows]
    n = len(rows)
    nf = len(fields)
    avg = []
    for i in range(nf):
        s = sum(len(t[i]) for t in toks)
        avg.append(s / n if s else 1.0)
    # document-level df: any field
    df = Counter()
    for t in toks:
        for term in set().union(*[set(t[i]) for i in range(nf)]):
            df[term] += 1
    idf_raw = {t: math.log(n - d + 0.5) - math.log(d + 0.5) for t, d in df.items()}
    avg_idf = sum(idf_raw[t] for t in sorted(idf_raw)) / len(idf_raw)
    idf = {t: (EPSILON * avg_idf if v < 0 else v) for t, v in idf_raw.items()}
    q = Counter(tokenize(query))
    scores = {}
    for (doc_id, _), t in zip(rows, toks):
        tfs = [Counter(t[i]) for i in range(nf)]
        sc = 0.0
        for term in sorted(q):
            if term not in idf:
                continue
            tfw = 0.0
            for i, (_, w, b) in enumerate(fields):
                bi = (1.0 - b) + b * len(t[i]) / avg[i]
                tfw += w * (tfs[i][term] / bi)
            if tfw > 0:
                sc += q[term] * (idf[term] * (tfw / (k1 + tfw)))
        if any(term in tfs[i] for term in q for i in range(nf)):
            scores[doc_id] = sc
    return scores


CORPUS = [
    (1, {"title": "spark query engine", "body": "the query engine scans tables and rows"}),
    (2, {"title": "storage layout", "body": "query query query deep in the body text here"}),
    (3, {"title": "unrelated page", "body": "nothing about the subject at all today"}),
    (4, {"title": "query", "body": ""}),  # empty body field
    (5, {"title": "", "body": "title terms absent here but query present query"}),
    (6, {"title": "titleonlyterm special", "body": "plain body words without it"}),
]
FIELDS = [FieldSpec("title", 2.0, 0.75), FieldSpec("body", 1.0, 0.75)]


def _docs_df(spark):
    return spark.createDataFrame(
        [(i, f["title"], f["body"]) for i, f in CORPUS],
        "doc_id long, title string, body string",
    )


def test_python_mirror_parity(spark):
    d = _docs_df(spark)
    for q in ["query engine", "query query", "titleonlyterm", "spark body"]:
        got = {
            r["doc_id"]: round6_py(r["score"])
            for r in bm25f_topk(d, q, FIELDS, k=10).collect()
            if r["score"] > 0
        }
        exp = _py_bm25f(CORPUS, q, [(f.name, f.weight, f.b) for f in FIELDS])
        exp = {i: round6_py(s) for i, s in exp.items() if s > 0}
        # threshold may drop sub-1% docs from got; every kept doc must
        # match the mirror exactly and the top doc must agree
        for i, s in got.items():
            assert exp[i] == s, (q, i, s, exp[i])
        assert max(got, key=got.get) == max(exp, key=exp.get)


def test_df_union_counts_title_only_terms(spark):
    # 'titleonlyterm' never appears in any body: doc-level df must still
    # see it and the query must retrieve doc 6 with a positive score
    d = _docs_df(spark)
    res = bm25f_topk(d, "titleonlyterm", FIELDS, k=3).collect()
    assert res[0]["doc_id"] == 6 and res[0]["score"] > 0


def test_single_field_single_term_rank_is_tf_over_b_order(spark):
    # w_title=0 reduces to one field; for a one-term query with a shared
    # positive idf, BM25F's x/(k1+x) is increasing in x = tf/B exactly
    # like BM25's x*(k1+1)/(x+k1), so the positive-score docs must rank
    # in tf/B-descending order (NOT body-only-df order: the document-
    # level df union still counts title-only hits like doc 4's)
    d = _docs_df(spark)
    body_only = [FieldSpec("title", 0.0, 0.75), FieldSpec("body", 1.0, 0.75)]
    rows = bm25f_topk(d, "query", body_only, k=10).collect()
    res = [r["doc_id"] for r in rows if r["score"] > 0]
    assert res, "effective idf must be positive for the property to bind"
    toks = {i: tokenize(f["body"]) for i, f in CORPUS}
    n = len(CORPUS)
    avg = sum(len(t) for t in toks.values()) / n
    ratio = {
        i: tf / (1 - 0.75 + 0.75 * len(t) / avg)
        for i, t in toks.items()
        if (tf := Counter(t)["query"]) > 0
    }
    exp = [i for i, _ in sorted(ratio.items(), key=lambda kv: (-kv[1], kv[0]))]
    assert res == exp


def test_title_weight_monotonicity(spark):
    # doc 4's only 'query' hit is in its (short) title; raising w_title
    # must not lower its rank and eventually puts it above body-hit docs
    d = _docs_df(spark)

    def rank_of(doc, w):
        flds = [FieldSpec("title", w, 0.75), FieldSpec("body", 1.0, 0.75)]
        rows = bm25f_topk(d, "query", flds, k=10).collect()
        return next(r["rank"] for r in rows if r["doc_id"] == doc)

    r_low, r_hi = rank_of(4, 0.1), rank_of(4, 8.0)
    assert r_hi < r_low


def test_empty_and_unknown_query(spark):
    d = _docs_df(spark)
    assert bm25f_topk(d, "", FIELDS).count() == 0
    res = bm25f_topk(d, "zzzznotaword", FIELDS, k=4).collect()
    # zero backfill in doc_id order
    assert [r["doc_id"] for r in res] == [1, 2, 3, 4]
    assert all(r["score"] == 0.0 for r in res)


def test_gate_entry_differs_from_plain_bm25(spark):
    # non-vacuity of the gate configuration: the 60-char-prefix title at
    # weight 2 must genuinely rerank vs single-field BM25 on the same
    # corpus sample (guards against a field setup whose weighting is inert)
    sf = "/root/testdata/sf0.001"
    d = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(
            "doc_id",
            F.substring("text", 1, 60).alias("title"),
            F.col("text").alias("body"),
        )
    )
    both = bm25f_topk(d, "dup table", FIELDS, k=10).collect()
    body_only = bm25f_topk(
        d, "dup table", [FieldSpec("title", 0.0, 0.75), FieldSpec("body", 1.0, 0.75)], k=10
    ).collect()
    assert [r["doc_id"] for r in both] != [r["doc_id"] for r in body_only]


# --- combined_fields ---------------------------------------------------------


def _py_combined_fields(rows, query_terms, weights, k1=1.5, b=0.75):
    """rows: [(doc_id, [field_tokens...])]; returns doc -> score using
    the engine's epsilon-floored idf over doc-level df."""
    import math

    from distributedcodesearchengine_spark.operators.stats import EPSILON

    n = len(rows)
    df = {}
    for _, flds in rows:
        seen = set()
        for toks in flds:
            seen.update(toks)
        for t in seen:
            df[t] = df.get(t, 0) + 1
    idf_raw = {t: math.log(n - d + 0.5) - math.log(d + 0.5) for t, d in df.items()}
    neg = [t for t, v in idf_raw.items() if v < 0]
    avg = sum(sorted(idf_raw.values())) / len(idf_raw) if idf_raw else 0.0
    # (test corpora here are small enough that the fold-order detail
    # of the two-level bucket fold never changes the sum)
    eps = EPSILON * avg
    idf = {t: (eps if v < 0 else v) for t, v in idf_raw.items()}
    sums = [sum(len(flds[i]) for _, flds in rows) for i in range(len(weights))]
    acc = 0.0
    for w, s in zip(weights, sums):
        acc += w * s
    avgdl = acc / n if acc else 1.0
    out = {}
    for d, flds in rows:
        dl = sum(w * len(toks) for w, toks in zip(weights, flds))
        s = 0.0
        for t in sorted(set(query_terms)):
            if t not in df:
                continue
            tfc = sum(w * toks.count(t) for w, toks in zip(weights, flds))
            if tfc == 0:
                continue
            norm = tfc + k1 * (1 - b + b * dl / avgdl)
            s += query_terms.count(t) * (idf[t] * (tfc * (k1 + 1.0) / norm))
        out[d] = s
    return out


def test_combined_fields_matches_python(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.fields import (
        combined_fields_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "apple pear", "apple banana cherry durian"),
            (1, "grape melon", "banana cherry cherry fig"),
            (2, "apple apple", "unrelated words here today"),
        ],
        "doc_id long, title string, body string",
    )
    got = {r["doc_id"]: r["score"] for r in combined_fields_topk(
        docs, "apple cherry", [("title", 2.0), ("body", 1.0)], k=10
    ).collect()}
    rows = [
        (0, [["apple", "pear"], ["apple", "banana", "cherry", "durian"]]),
        (1, [["grape", "melon"], ["banana", "cherry", "cherry", "fig"]]),
        (2, [["apple", "apple"], ["unrelated", "words", "here", "today"]]),
    ]
    want = _py_combined_fields(rows, ["apple", "cherry"], [2.0, 1.0])
    mx = max(want.values())
    kept = {d: s for d, s in want.items() if s >= 0.01 * mx}
    assert set(got) == set(kept)
    for d, s in kept.items():
        assert got[d] == pytest.approx(s, abs=1e-9)


def test_combined_fields_title_weight_moves_rank(spark):
    """tf merging BEFORE saturation: a title hit at weight 3 counts as
    3 occurrences of the pseudo-field — doc 1 (title hit) must outrank
    doc 0 (single body hit) despite identical raw tf."""
    from distributedcodesearchengine_spark.operators.fields import (
        combined_fields_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "zz yy", "target filler words here"),
            (1, "target yy", "zz filler words here"),
            (2, "other title", "different content entirely today"),
            (3, "more docs", "keeping target's idf positive overall"),
        ],
        "doc_id long, title string, body string",
    )
    got = [r["doc_id"] for r in combined_fields_topk(
        docs, "target", [("title", 3.0), ("body", 1.0)], k=10).collect()]
    assert got[0] == 1


def test_combined_fields_weight_guard(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.fields import (
        combined_fields_topk,
    )

    docs = spark.createDataFrame([(0, "a", "b")], "doc_id long, t string, b string")
    with pytest.raises(ValueError):
        combined_fields_topk(docs, "aa", [("t", 0.5), ("b", 1.0)])
