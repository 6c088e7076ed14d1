"""ES boosting-query and kNN-with-filter tests (operators/boosting,
functions/embed.cosine_topk_filtered): demotion semantics, edges, and
the live HTTP endpoints."""

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.operators.boosting import (
    bm25_boosting_sql,
    bm25_boosting_topk,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk

ROWS = [
    "dup table scan merge",
    "dup dup table row",
    "table row scan api",
    "scan sort slow merge",
    "dup merge batch api",
    "window sort table dup",
]


def _index(spark, rows=ROWS, langs=None):
    langs = langs or ["en", "en", "de", "en", "de", "en"][: len(rows)]
    pages = spark.createDataFrame(
        [
            (
                f"https://x.example/{i:04d}",
                f"<html><body><p>{t}</p></body></html>".encode(),
                t,
                langs[i],
                "s1",
            )
            for i, t in enumerate(rows)
        ],
        "url string, html binary, text string, lang string, source string",
    )
    return build_index_inmem(spark, pages)


@pytest.fixture(scope="module")
def idx(spark):
    return _index(spark)


def test_nb_validation(idx):
    for bad in (-0.1, 1.0, 1.5):
        with pytest.raises(ValueError):
            bm25_boosting_topk(idx, "dup", "scan", negative_boost=bad)
        with pytest.raises(ValueError):
            bm25_boosting_sql("dup", "scan", negative_boost=bad)


def test_no_negative_match_is_identity(idx):
    """A negative query matching nothing leaves the ranking exactly
    bm25_topk's (every mult is 1.0)."""
    base = [(r["doc_id"], round(r["score"], 6))
            for r in bm25_topk(idx, "dup table", k=10).collect()]
    got = bm25_boosting_topk(idx, "dup table", "zzqx", 0.5, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == base
    assert all(r["mult"] == 1.0 for r in got)


def test_demotion_flips_rank(idx):
    """Demoting scan-matching docs must push a scan doc below a
    non-scan doc it outranked in plain BM25."""
    plain = [r["doc_id"] for r in bm25_topk(idx, "dup table", k=10).collect()]
    demoted = bm25_boosting_topk(idx, "dup table", "scan", 0.1, k=10).collect()
    got = [r["doc_id"] for r in demoted]
    assert set(got) == set(plain)  # never changes WHAT matched
    scan_docs = {i for i, t in enumerate(ROWS) if "scan" in t}
    assert got != plain  # the demotion moved something
    assert all(
        (r["mult"] == 0.1) == (r["doc_id"] in scan_docs) for r in demoted
    )


def test_nb_zero_sinks_to_doc_id_ties(idx):
    rows = bm25_boosting_topk(idx, "dup table", "scan", 0.0, k=10).collect()
    zeroed = [r["doc_id"] for r in rows if r["mult"] == 0.0]
    assert zeroed and all(r["score"] == 0.0 for r in rows if r["mult"] == 0.0)
    # zero-score rows rank after positive rows, among themselves by doc_id
    tail = [r["doc_id"] for r in rows if r["score"] == 0.0]
    assert tail == sorted(tail)


def test_degenerate_regime_unchanged(idx):
    """Degenerate (OOV) positive query: every product is 0 * nb = 0,
    rows identical to plain BM25's zero-backfill (doc_id order)."""
    base = [(r["doc_id"], round(r["score"], 6))
            for r in bm25_topk(idx, "zzqx", k=10).collect()]
    got = [(r["doc_id"], r["score"])
           for r in bm25_boosting_topk(idx, "zzqx", "scan", 0.5, k=10).collect()]
    assert got == base and got


def test_healthy_rounding_matches_plain_modulo_round6(idx):
    """A no-op demotion (nb on a non-matching negative) returns plain
    BM25 scores rounded at the output projection."""
    base = [(r["doc_id"], round(r["score"], 6))
            for r in bm25_topk(idx, "table row", k=10).collect()]
    got = [(r["doc_id"], r["score"])
           for r in bm25_boosting_topk(idx, "table row", "zzqx", 0.5, k=10).collect()]
    assert got == base and got


def test_empty_positive_is_empty(idx):
    assert bm25_boosting_topk(idx, "!!", "scan", 0.5).count() == 0


# --- kNN with filter ---------------------------------------------------------


def test_cosine_filtered_is_restricted_topk(spark, sf_dir):
    """The filtered top-k equals brute cosine over the pre-filtered
    table — the true restricted top-k, not a post-filtered global one."""
    from distributedcodesearchengine_spark.functions.embed import (
        cosine_topk,
        cosine_topk_filtered,
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = mock_embed_text("distributed table scan", 64)
    got = cosine_topk_filtered(emb, qvec, 10, label=3).collect()
    want = cosine_topk(emb.where(F.col("label") == 3), qvec, 10).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]
    labels = {
        r["label"]
        for r in emb.join(
            spark.createDataFrame(
                [(r["vec_id"],) for r in got], "vec_id long"
            ),
            "vec_id",
            "left_semi",
        ).collect()
    }
    assert labels == {3}


def test_cosine_filtered_label_pushdown(spark, sf_dir):
    from distributedcodesearchengine_spark.functions.embed import (
        cosine_topk_filtered,
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.plans.audit import explain_str
    from distributedcodesearchengine_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = mock_embed_text("distributed table scan", 64)
    plan = explain_str(cosine_topk_filtered(emb, qvec, 10, label=3))
    assert "PushedFilters" in plan and "label" in plan, plan[:4000]


def test_knn_endpoints(spark):
    from distributedcodesearchengine_spark.api import SearchEngine
    from distributedcodesearchengine_spark.server import serve

    idx = _index(spark)
    engine = SearchEngine(idx)
    server = serve(engine, lambda: {}, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        qs = urllib.parse.urlencode(
            {"positive": "dup table", "negative": "scan",
             "negative_boost": 0.1, "limit": 5}
        )
        with urllib.request.urlopen(f"{base}/boosting?{qs}") as r:
            body = json.loads(r.read())
        assert r.status == 200 and body["results"]
        assert any(x["mult"] == 0.1 for x in body["results"])
        # out-of-range nb is a 400 (F8)
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"{base}/boosting?positive=dup&negative=scan&negative_boost=2"
            )
        assert ei.value.code == 400

        with urllib.request.urlopen(
            f"{base}/knn?" + urllib.parse.urlencode(
                {"q": "dup table scan", "lang": "de", "limit": 3}
            )
        ) as r:
            body = json.loads(r.read())
        assert r.status == 200
        got = {x["doc_id"] for x in body["results"]}
        assert got and got <= {2, 4}  # the de docs
    finally:
        server.shutdown()


def test_knn_quantized_modes(spark):
    """mode=bq / mode=mrl serve through the quantized tiers: rank-
    consistent results, the lang filter restricts the SCAN, and an
    unknown mode is a 400 (F8)."""
    from distributedcodesearchengine_spark.api import SearchEngine
    from distributedcodesearchengine_spark.server import serve

    idx = _index(spark)
    engine = SearchEngine(idx)
    # API level: every mode returns ranked rows; filter restricts
    for mode in ("exact", "bq", "mrl"):
        rows = engine.knn("dup table scan", limit=3, mode=mode).collect()
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert rows
        de = engine.knn("dup table scan", limit=5, lang="de", mode=mode).collect()
        assert {r.doc_id for r in de} <= {2, 4}
    with pytest.raises(ValueError):
        engine.knn("x", mode="bogus")

    server = serve(engine, lambda: {}, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(
            f"{base}/knn?" + urllib.parse.urlencode(
                {"q": "dup table scan", "limit": 3, "mode": "bq"}
            )
        ) as r:
            body = json.loads(r.read())
        assert r.status == 200 and body["mode"] == "bq" and body["results"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/knn?q=x&mode=bogus")
        assert ei.value.code == 400
    finally:
        server.shutdown()


# --- rule-retriever exclude --------------------------------------------------


def test_exclude_removes_ids_ranking_view(spark):
    from distributedcodesearchengine_spark.operators.boostquery import (
        bm25_topk_exclude,
    )
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk
    from tests.test_search_after import _index

    texts = [
        "apple banana apple cherry",
        "banana cherry durian fig",
        "apple fig grape",
        "apple apple apple banana",
    ]
    idx = _index(spark, texts)
    plain = [(r["doc_id"], r["score"])
             for r in bm25_topk(idx, "apple banana", k=10).collect()]
    top_id = plain[0][0]
    ex = {r["doc_id"]: (r["rank"], r["score"]) for r in bm25_topk_exclude(
        idx, "apple banana", [top_id], k=10).collect()}
    assert top_id not in ex
    # survivors keep their ORIGINAL scores (the cut was anchored by the
    # unfiltered max — a view, not a re-query) and renumber from 1
    want = [(d, s) for d, s in plain if d != top_id]
    assert [(d, ex[d][1]) for d, _ in want if d in ex] == [
        (d, s) for d, s in want if d in ex]
    assert sorted(r for r, _ in ex.values()) == list(range(1, len(ex) + 1))
    # empty exclusion == plain ranking
    none = [(r["doc_id"], r["score"]) for r in bm25_topk_exclude(
        idx, "apple banana", [], k=10).collect()]
    assert none == plain
