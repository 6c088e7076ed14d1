"""Scorer v2: posting-list intersection with block-max WAND pruning.

Batch-distributed adaptation of Block-Max WAND (Ding & Suel, SIGIR'11 —
public literature) over the compressed postings segments:

  1. Per query term t: cmax(t) = qtf * global_max(t); S = sum cmax.
  2. tau0 (score floor): decode only each term's globally-best block(s)
     (those with max_w == global_max), take per-doc max single-block
     contribution, kth largest => tau0. Contributions are nonnegative
     (pruning auto-disables if any idf < 0), so a single-block
     contribution lower-bounds the doc's true score => tau0 lower-bounds
     the true kth-best score.
  3. Block prune: decode block b of term t iff
     qtf*max_w(b) + (S - cmax(t)) >= tau0. A doc all of whose blocks are
     pruned has true score < tau0 — provably outside the top-k.
  4. Candidate cut: from the decoded partial scores ps(d), upper bound
     ub(d) = ps(d) + sum of cmax over terms NOT seen for d; keep
     C = {d : ub(d) >= kth largest ps} (small).
  5. Exact re-score of C: one targeted decode pass over ALL blocks whose
     doc-range intersects C (pruned ones included), then the same
     canonical term-sorted summation as scorer v1 — bit-identical
     doubles, shared finalize (threshold / filters / tie-break).

With metadata filters or negative idf, pruning is disabled and the full
postings are decoded (still the compressed index path); rank identity
holds either way and is asserted against scorer v1 + the oracle in
tests/test_wand.py.

All decoding is Arrow-batched ``mapInPandas`` with numpy varint
decode — no per-row Python, no driver-side posting traffic (only k-row
and |q|-row collects).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.tokenizer import tokenize
from .postings import bm25_weight, term_bucket
from .scorer import Index, finalize_topk
from .varint import varint_unpack

_PAD = 1e-9  # float-jitter safety margin on loose (reordered) sums
_C_CAP = 200_000  # candidate-broadcast cap before falling back to full decode


def _query_postings(index: Index, terms: List[str]) -> DataFrame:
    buckets = sorted({term_bucket(t, index.n_buckets) for t in terms})
    return (
        index.postings
        .where(F.col("term_bucket").isin(buckets))  # partition pruning
        .where(F.col("term").isin(terms))
        .select("term", "range_id", "idf", "global_max", "blocks")
    )


def _decode_contribs(
    prows: DataFrame,
    qmap: Dict[str, tuple],
    avgdl: float,
    keep_thresh: Optional[Dict[str, float]] = None,
    cand: Optional[np.ndarray] = None,
):
    """-> DataFrame(term, doc_id, contrib, cmax).

    keep_thresh: per-term minimum qtf*max_w for a block to be decoded
    (block-max pruning). cand: sorted doc-id array; when given, decode
    only blocks whose [first_doc,last_doc] intersects it and emit only
    docs in it (the targeted exact re-score pass).
    """

    def gen(batches):
        for pdf in batches:
            terms_out, docs_out, contribs_out, cmax_out = [], [], [], []
            for term, blocks in zip(pdf["term"], pdf["blocks"]):
                qtf, idf, g = qmap[term]
                thr = keep_thresh.get(term) if keep_thresh is not None else None
                cmax = qtf * g
                for blk in blocks:
                    if thr is not None and not (qtf * blk["max_w"] >= thr):
                        continue
                    if cand is not None:
                        lo = np.searchsorted(cand, blk["first_doc"], side="left")
                        if lo >= len(cand) or cand[lo] > blk["last_doc"]:
                            continue
                    n = blk["n"]
                    deltas = varint_unpack(bytes(blk["doc_deltas"]), n).astype(np.int64)
                    d = np.cumsum(deltas) + blk["first_doc"]
                    tfs = varint_unpack(bytes(blk["tfs"]), n).astype(np.int64)
                    dls = varint_unpack(bytes(blk["doc_lens"]), n).astype(np.int64)
                    if cand is not None:
                        mask = np.isin(d, cand, assume_unique=True)
                        if not mask.any():
                            continue
                        d, tfs, dls = d[mask], tfs[mask], dls[mask]
                    w = bm25_weight(tfs, dls, idf, avgdl)
                    contrib = qtf * w
                    terms_out.append(np.full(len(d), term, dtype=object))
                    docs_out.append(d)
                    contribs_out.append(contrib)
                    cmax_out.append(np.full(len(d), cmax))
            if docs_out:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms_out),
                        "doc_id": np.concatenate(docs_out),
                        "contrib": np.concatenate(contribs_out),
                        "cmax": np.concatenate(cmax_out),
                    }
                )

    return prows.mapInPandas(
        gen, schema="term string, doc_id long, contrib double, cmax double"
    )


def _canonical_scores(decoded: DataFrame) -> DataFrame:
    """Same term-sorted left-fold as scorer v1 -> (doc_id, score)."""
    return decoded.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )


def batch_topk_postings(index: Index, queries: Dict[int, str], k: int = 10) -> DataFrame:
    """Whole-query-set top-k from the COMPRESSED postings index in one
    plan -> (query_id, rank, doc_id, score).

    The throughput path at scale: reads only the posting rows of the
    union of query terms (term_bucket partition pruning + row-level term
    filter — a few hundred rows, never a corpus-sized scan), decodes
    each term's blocks ONCE even when queries share terms, broadcasts
    the (query_id, term, qtf) table onto the decoded (term, doc, w)
    stream, then per-query threshold/top-k via query-partitioned
    windows. Degenerate all-zero queries are the per-query scorer's job
    (same contract as scorer.bm25_topk_batch).
    """
    from collections import Counter

    from pyspark.sql.window import Window

    assert index.postings is not None, "build postings first"
    spark = index.spark
    rows = []
    for qid, q in queries.items():
        for t, qtf in sorted(Counter(tokenize(q)).items()):
            rows.append((int(qid), t, float(qtf)))
    if not rows:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    qdf = spark.createDataFrame(rows, "query_id int, term string, qtf double")
    uniq = sorted({t for _, t, _ in rows})
    prows = _query_postings(index, uniq).select("term", "idf", "blocks")

    avgdl = index.avgdl

    def gen(batches):
        for pdf in batches:
            terms_out, docs_out, w_out = [], [], []
            for term, idf, blocks in zip(pdf["term"], pdf["idf"], pdf["blocks"]):
                for blk in blocks:
                    n = blk["n"]
                    deltas = varint_unpack(bytes(blk["doc_deltas"]), n).astype(np.int64)
                    d = np.cumsum(deltas) + blk["first_doc"]
                    tfs = varint_unpack(bytes(blk["tfs"]), n).astype(np.int64)
                    dls = varint_unpack(bytes(blk["doc_lens"]), n).astype(np.int64)
                    terms_out.append(np.full(len(d), term, dtype=object))
                    docs_out.append(d)
                    w_out.append(bm25_weight(tfs, dls, float(idf), avgdl))
            if docs_out:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms_out),
                        "doc_id": np.concatenate(docs_out),
                        "w": np.concatenate(w_out),
                    }
                )

    decoded = prows.mapInPandas(gen, schema="term string, doc_id long, w double")
    contrib = decoded.join(F.broadcast(qdf), "term").withColumn(
        "contrib", F.col("qtf") * F.col("w")
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    wmax = Window.partitionBy("query_id")
    wrank = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("_mx", F.max("score").over(wmax))
        .where((F.col("_mx") <= 0) | (F.col("score") >= 0.01 * F.col("_mx")))
        .withColumn("rank", F.row_number().over(wrank))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def wand_topk(
    index: Index,
    query: str,
    k: int = 10,
    filters: Optional[Dict[str, str]] = None,
    prune: bool = True,
) -> DataFrame:
    """Top-k via the compressed postings index; rank-identical to v1."""
    assert index.postings is not None, "build postings first (build_postings)"
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "rank int, doc_id long, url string, score double"
        )
    # ONE fused job replaces the former stats lookup + tau0 rounds
    # (r06, guide §2.4/driver-round-trip removal): a single mapInPandas
    # pass over the pruned postings rows returns BOTH the per-term
    # (idf, global max) stats AND each partition's top-k per-doc best
    # single-block contributions (each partition decodes its rows' own
    # best blocks — a superset of the former "term-global best block"
    # set, so the merged tau0 can only be TIGHTER). Soundness is
    # unchanged: every emitted value lower-bounds its doc's true score,
    # so the kth largest over ANY subset of docs lower-bounds the true
    # kth-best score; rank identity is pinned by tests/test_wand.py.
    from collections import Counter

    counts = Counter(tokenize(query))
    terms = sorted(counts)
    prows = _query_postings(index, terms).persist()
    decoded_p = None  # released in the finally — a failed collect must
    # not leak the persisted pruned-decode relation in a serving session
    try:
        qtf_b = {t: float(counts[t]) for t in terms}
        kk = int(k)
        avgdl_f = float(index.avgdl)
        want_tau = bool(prune) and not filters and kk > 0

        def fused(batches):
            stats: dict = {}
            d_parts: list = []
            c_parts: list = []
            for pdf in batches:
                for term, idf, g, blocks in zip(
                    pdf["term"], pdf["idf"], pdf["global_max"], pdf["blocks"]
                ):
                    idf = float(idf)
                    g = float(g)
                    st = stats.get(term)
                    if st is None:
                        stats[term] = [idf, g]
                    elif g > st[1]:
                        st[1] = g
                    if not want_tau or idf < 0:
                        continue
                    qtf = qtf_b[term]
                    for blk in blocks:
                        if not (blk["max_w"] >= g):
                            continue  # this row's best block(s) only
                        n = blk["n"]
                        deltas = varint_unpack(
                            bytes(blk["doc_deltas"]), n
                        ).astype(np.int64)
                        d_parts.append(np.cumsum(deltas) + blk["first_doc"])
                        tfs = varint_unpack(bytes(blk["tfs"]), n).astype(np.int64)
                        dls = varint_unpack(bytes(blk["doc_lens"]), n).astype(
                            np.int64
                        )
                        c_parts.append(qtf * bm25_weight(tfs, dls, idf, avgdl_f))
            out_k, out_t, out_i, out_g, out_d, out_c = [], [], [], [], [], []
            for t, (i_, g_) in stats.items():
                out_k.append(0); out_t.append(t); out_i.append(i_)
                out_g.append(g_); out_d.append(0); out_c.append(0.0)
            if d_parts:
                d = np.concatenate(d_parts)
                c = np.concatenate(c_parts)
                order = np.lexsort((-c, d))
                sd, sc = d[order], c[order]
                first = np.ones(len(sd), bool)
                first[1:] = sd[1:] != sd[:-1]
                dd, cc = sd[first], sc[first]  # per-doc max (this task)
                if len(cc) > kk:
                    sel = np.argpartition(-cc, kk - 1)[:kk]
                    dd, cc = dd[sel], cc[sel]
                for di, ci in zip(dd, cc):
                    out_k.append(1); out_t.append(""); out_i.append(0.0)
                    out_g.append(0.0); out_d.append(int(di)); out_c.append(float(ci))
            if out_k:
                yield pd.DataFrame(
                    {
                        "kind": np.array(out_k, np.int32),
                        "term": out_t,
                        "idf": out_i,
                        "g": out_g,
                        "doc_id": np.array(out_d, np.int64),
                        "c": out_c,
                    }
                )

        fused_rows = prows.mapInPandas(
            fused,
            schema="kind int, term string, idf double, g double, "
            "doc_id long, c double",
        ).collect()
        stat_agg: dict = {}
        best_doc: dict = {}
        for r in fused_rows:
            if r["kind"] == 0:
                cur = stat_agg.get(r["term"])
                if cur is None:
                    stat_agg[r["term"]] = [float(r["idf"]), float(r["g"])]
                elif float(r["g"]) > cur[1]:
                    cur[1] = float(r["g"])
            else:
                d_ = int(r["doc_id"])
                c_ = float(r["c"])
                if c_ > best_doc.get(d_, -math.inf):
                    best_doc[d_] = c_
        if not stat_agg:
            # tokens exist but none are in the vocabulary
            return finalize_topk(index, None, k, filters)
        qmap = {
            t: (qtf_b[t], v[0], v[1]) for t, v in stat_agg.items()
        }
        S = sum(v[0] * v[2] for v in qmap.values())

        can_prune = (
            prune
            and not filters
            and k > 0
            and all(v[1] >= 0 for v in qmap.values())
            # S > 0 <=> some term has a positive best block <=> the true
            # max score is positive. At S == 0 (every matched idf exactly
            # 0) all scores are 0.0 — the degenerate regime whose
            # zero-backfill only finalize_topk implements; the pruned
            # path would return matched docs only and diverge from
            # bm25_topk/the oracle
            and S > 0
        )
        if not can_prune:
            decoded = _decode_contribs(prows, qmap, index.avgdl)
            scored = _canonical_scores(decoded)
            return finalize_topk(index, scored, k, filters)

        # --- tau0: kth largest merged per-doc best-block contribution
        vals = sorted(best_doc.values(), reverse=True)
        tau0 = float(vals[k - 1]) if len(vals) >= k else -math.inf

        # --- pruned decode
        # -_PAD guards the a >= c-b vs a+b >= c float rearrangement at
        # exact-tie boundaries (keeps strictly more blocks — still sound)
        keep_thresh = {
            t: tau0 - (S - v[0] * v[2]) - _PAD for t, v in qmap.items()
        }
        decoded = _decode_contribs(prows, qmap, index.avgdl, keep_thresh=keep_thresh).persist()
        decoded_p = decoded
        per_doc = decoded.groupBy("doc_id").agg(
            F.sum("contrib").alias("ps"), F.sum("cmax").alias("seen_cmax")
        )
        # kth partial score + candidate cut fused into ONE job: the kth
        # threshold is a 1-row TakeOrdered+agg subplan broadcast onto
        # per_doc (nk < k means fewer than k matches -> keep everything)
        kth_df = (
            per_doc.orderBy(F.desc("ps"))
            .limit(k)
            .agg(F.min("ps").alias("kth"), F.count("*").alias("nk"))
        )
        # limit(_C_CAP+1) bounds the driver pull BEFORE the cap check: a
        # degenerate query (candidates ~ the corpus) must decide the
        # fallback from at most _C_CAP+1 rows, never materialize the
        # oversized set on the driver. Under the cap the limit is a
        # no-op (the full candidate set is smaller than the bound).
        cand_rows = (
            per_doc.crossJoin(F.broadcast(kth_df))
            .where(
                (F.col("nk") < k)
                | (
                    F.col("ps") + (F.lit(S) - F.col("seen_cmax")) + F.lit(_PAD)
                    >= F.col("kth") - F.lit(_PAD)
                )
            )
            .select("doc_id")
            .limit(_C_CAP + 1)
            .collect()
        )
        cand = np.sort(np.array([r["doc_id"] for r in cand_rows], dtype=np.int64))
        decoded.unpersist()
        decoded_p = None

        if len(cand) > _C_CAP:
            exact = _decode_contribs(prows, qmap, index.avgdl)
            scored = _canonical_scores(exact)
            return finalize_topk(index, scored, k, filters)
        exact = _decode_contribs(prows, qmap, index.avgdl, cand=cand)
        scored = _canonical_scores(exact)
        return _finalize_candidates(index, scored, k)
    finally:
        prows.unpersist()
        if decoded_p is not None:
            decoded_p.unpersist()


def _finalize_candidates(index: Index, scored: DataFrame, k: int) -> DataFrame:
    """finalize for the pruned path: ``scored`` holds ONLY the candidate
    docs (provably ⊇ the true top-k, all-nonnegative contributions with
    S > 0 so max > 0 and the degenerate backfill can't trigger).
    Candidates are bounded (<= _C_CAP by construction), so the
    unfiltered-max threshold and the (score desc, doc_id asc) top-k run
    driver-side off one collect — same doubles, same order as the
    window form — and the url lookup is scorer.attach_urls_ranked's
    pruned point scan, not a per-query pass over the docs table."""
    from .scorer import attach_urls_ranked

    rows = scored.select("doc_id", "score").collect()
    mx = max(r["score"] for r in rows)
    keep = sorted(
        ((int(r["doc_id"]), float(r["score"])) for r in rows if r["score"] >= 0.01 * mx),
        key=lambda t: (-t[1], t[0]),
    )[: int(k)]
    return attach_urls_ranked(index, keep)
