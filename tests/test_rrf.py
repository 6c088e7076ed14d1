"""RRF hybrid merge tests: DataFrame plan vs the pure-Python oracle
transcription (engine.py:273-392), plus the full hybrid SearchEngine
flow vs an end-to-end oracle pipeline (BM25 oracle + mock embeddings +
RRF oracle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.api import SearchEngine, build_doc_embeddings
from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.functions.embed import mock_embed_text
from distributedcodesearchengine_spark.operators.rrf import boost_col, rrf_merge
from distributedcodesearchengine_spark.oracle.bm25 import BM25Oracle
from distributedcodesearchengine_spark.oracle.hybrid import enhance_query, rrf_fuse
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize
from distributedcodesearchengine_spark.sources.corpus import (
    generate_pages,
    generate_rows_local,
)


def _as_df(spark, ranked):
    # ranked: [(doc_id, score)] in rank order
    return spark.createDataFrame(
        [(int(d), float(s), i + 1) for i, (d, s) in enumerate(ranked)],
        "doc_id long, score double, rank int",
    )


def _collect(df):
    return [
        (r["doc_id"], round(r["score"], 12), round(r["semantic_score"], 12),
         round(r["bm25_score"], 12))
        for r in df.orderBy("rank").collect()
    ]


CASES = [
    # overlapping lists
    ([(1, 0.9), (2, 0.7), (3, 0.5)], [(2, 11.0), (4, 8.0), (1, 2.0)], "parse json"),
    # disjoint
    ([(1, 0.9), (2, 0.5)], [(3, 5.0), (4, 4.0)], None),
    # low-diversity semantic scores -> adaptive weight 0.3
    ([(1, 0.901), (2, 0.900), (3, 0.899)], [(3, 9.0), (1, 5.0)], "q"),
    # empty semantic side
    ([], [(5, 3.0), (6, 2.0)], "whatever"),
    # empty bm25 side
    ([(7, 0.8), (8, 0.6)], [], None),
    # tie case: same combined score -> insertion-order tie-break
    ([(1, 0.9), (2, 0.8)], [(2, 5.0), (1, 4.0)], None),
]


@pytest.mark.parametrize("sem,bm,query", CASES)
def test_rrf_matches_oracle(spark, sem, bm, query):
    want = rrf_fuse(sem, bm, query=query)
    got = _collect(
        rrf_merge(
            _as_df(spark, sem) if sem else None,
            _as_df(spark, bm) if bm else None,
            query=query,
        )
    )
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9
        assert abs(g[2] - w[2]) < 1e-9
        assert abs(g[3] - w[3]) < 1e-9


def test_rrf_boost(spark):
    sem = [(1, 0.9), (2, 0.7)]
    bm = [(2, 9.0), (3, 5.0)]
    # ids 1,2,3 -> paths/names exercising the reference rule table
    meta = {1: ("requests/api.py", "request"), 2: ("app/handlers.py", "handle_x"),
            3: ("requests/sessions.py", "send")}
    want = rrf_fuse(
        sem, bm, query="send http request",
        boosts={1: 1.5, 2: 0.7, 3: 1.5},
    )
    meta_df = spark.createDataFrame(
        [(k, p, n) for k, (p, n) in meta.items()], "doc_id long, path string, name string"
    )
    boost_df = meta_df.select(
        "doc_id", boost_col(F.col("path"), F.col("name")).alias("boost")
    )
    merged = rrf_merge(
        _as_df(spark, sem),
        _as_df(spark, bm),
        query="send http request",
        boost=boost_df,
    )
    got = _collect(merged)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9


def test_enhance_query_goldens():
    assert enhance_query("handle http requests") == (
        "function that sends makes HTTP requests GET POST PUT DELETE PATCH"
    )
    assert enhance_query("send http request") == (
        "function that sends or makes HTTP requests: send http request"
    )
    assert enhance_query("parse json").startswith("JSON parsing function:")
    assert enhance_query("login token").startswith("authentication function:")
    assert enhance_query("save file").startswith("file handling function:")
    assert enhance_query("sort a list") == "function or method that sort a list"


def test_hybrid_search_end_to_end(spark):
    """Full hybrid flow == oracle pipeline (BM25 replica + mock-embed
    cosine + rrf_fuse), including overfetch and normalization."""
    n = 300
    pages = generate_pages(spark, n, seed=5, parts=4)
    index = build_index_inmem(spark, pages)
    engine = SearchEngine(index)
    limit = 10
    query = "parse json data"

    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in engine.search(query, limit=limit, use_hybrid=True).collect()
    ]

    # oracle pipeline
    local = generate_rows_local(np.arange(n), seed=5).sort_values("url").reset_index(drop=True)
    corpus = [tokenize(t) for t in local["text"]]
    oracle = BM25Oracle(corpus)
    bm = oracle.search(query, limit=2 * limit)
    qvec = np.array(mock_embed_text(enhance_query(query), 64))
    doc_vecs = np.array(
        [mock_embed_text(" ".join(toks), 64) for toks in corpus]
    )
    # cosine == dot (both normalized), but replicate engine arithmetic:
    dots = doc_vecs @ qvec
    norms = np.linalg.norm(doc_vecs, axis=1) * np.linalg.norm(qvec)
    with np.errstate(invalid="ignore"):
        cos = np.where(norms > 0, dots / norms, 0.0)
    order = sorted(range(n), key=lambda i: (-cos[i], i))[: 2 * limit]
    sem = [(i, float(cos[i])) for i in order]
    want = rrf_fuse(sem, bm, query=query)[:limit]

    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-6


def test_hybrid_search_filtered(spark):
    """Filtered hybrid: the semantic list must be the top-2k of the
    FILTERED set with dense ranks (reference passes filters into
    vector_store.search, engine.py:205-209) — not the unfiltered top-2k
    post-filtered with gapped ranks."""
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    n = 300
    pages = generate_pages(spark, n, seed=5, parts=4)
    index = build_index_inmem(spark, pages)
    engine = SearchEngine(index)
    limit, query, lang = 10, "parse json data", "de"

    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in engine.search(query, limit=limit, lang=lang, use_hybrid=True).collect()
    ]

    qvec = np.array(mock_embed_text(enhance_query(query), 64))
    sem_all = []
    for r in index.docs.select("doc_id", "lang", "tokens").collect():
        if r["lang"] != lang:
            continue
        v = np.array(mock_embed_text(" ".join(r["tokens"]), 64))
        nrm = float(np.linalg.norm(v) * np.linalg.norm(qvec))
        sem_all.append((r["doc_id"], float(v @ qvec) / nrm if nrm > 0 else 0.0))
    sem = sorted(sem_all, key=lambda t: (-t[1], t[0]))[: 2 * limit]
    bm = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(index, query, k=2 * limit, filters={"lang": lang}).collect()
    ]
    want = rrf_fuse(sem, bm, query=query)[:limit]

    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-6


# --- linear retriever (minmax weighted fusion) -------------------------------


def test_linear_hybrid_hand_computed(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.rrf import (
        linear_hybrid_topk,
    )

    sem = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (3, 0.1)], "doc_id long, score double"
    )
    lex = spark.createDataFrame(
        [(2, 10.0), (3, 6.0), (4, 2.0)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r for r in linear_hybrid_topk(
        sem, lex, k=10, w_sem=0.5, w_lex=0.5).collect()}
    # sem norms: 1 -> 1.0, 2 -> 0.5, 3 -> 0.0; lex: 2 -> 1.0, 3 -> 0.5, 4 -> 0.0
    want = {1: 0.5 * 1.0, 2: 0.5 * 0.5 + 0.5 * 1.0, 3: 0.5 * 0.5, 4: 0.0}
    assert set(out) == set(want)
    for d, s in want.items():
        assert out[d]["score"] == pytest.approx(s, abs=1e-6)
    assert out[2]["sem_norm"] == pytest.approx(0.5, abs=1e-6)
    assert out[2]["lex_norm"] == pytest.approx(1.0, abs=1e-6)
    # winner is doc 2 (strong on both) — score fusion, not rank fusion
    assert min(out, key=lambda d: out[d]["rank"]) == 2


def test_linear_hybrid_score_vs_rank_fusion(spark):
    """Two docs 0.001 apart in cosine fuse almost identically under
    linear (score) fusion — the distinction from RRF's forced full
    rank step."""
    from distributedcodesearchengine_spark.operators.rrf import (
        linear_hybrid_topk,
    )

    sem = spark.createDataFrame(
        [(1, 0.900), (2, 0.899), (3, 0.1)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r["score"] for r in linear_hybrid_topk(
        sem, None, k=10, w_sem=1.0, w_lex=0.0).collect()}
    assert abs(out[1] - out[2]) < 0.01


def test_linear_hybrid_constant_list_and_guards(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.rrf import (
        linear_hybrid_topk,
    )

    const = spark.createDataFrame(
        [(1, 0.0), (2, 0.0)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r["lex_norm"] for r in linear_hybrid_topk(
        None, const, k=10).collect()}
    assert out == {1: 1.0, 2: 1.0}
    with pytest.raises(ValueError):
        linear_hybrid_topk(None, None)
    with pytest.raises(ValueError):
        linear_hybrid_topk(const, None, w_sem=-1.0)
