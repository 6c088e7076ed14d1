"""Document-sharded index layout + shard-local batch scoring.

The serving-path layout (the Lucene/ES shard model re-expressed in
Spark): range_id = doc_id // shard_width for EVERY term, so one shard
holds the complete posting fragments for its doc range. Scoring is then
embarrassingly parallel — each shard computes exact BM25 scores for all
queries over its own docs in one numpy pass (dense accumulator per
query), emits only its local top-k, and a tiny global merge finishes.
No corpus-sized shuffle anywhere; the only movement is the query-term
posting rows themselves.

Rank identity: the per-doc accumulation adds term contributions in
sorted-term order — the SAME IEEE operation sequence as the canonical
fold in scorer v1 — and the relative threshold uses the global max over
shard maxima, so results are bit-compatible with the per-query scorer
(asserted in tests/test_sharded.py).

The POSTINGS schema is unchanged (a shard row is just a range row), so
the WAND scorer and segment merge work on this layout as-is.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..oracle.tokenizer import tokenize
from ..schemas import POSTINGS
from .postings import DEFAULT_BLOCK, bm25_weight, term_bucket
from .scorer import Index
from .varint import varint_pack_with_lengths, varint_unpack

DEFAULT_SHARD_WIDTH = 65536

def _pack_shard_arrow(
    rid: int,
    codes_s: np.ndarray,
    ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    idf_per_posting: np.ndarray,
    term_cols,
    avgdl_f: float,
    block_size: int,
):
    """Arrow-native shard packer: sorted (term-code, doc) posting arrays
    -> ONE pa.Table of POSTINGS rows with zero per-term / per-block
    Python objects (guide §4.2). The varint buffers are packed once per
    shard; because blocks are contiguous in pack order, each binary
    blocks child is an int32 OFFSET array over that single buffer
    (pa.Array.from_buffers) — no per-block byte copies. ``term_cols``
    maps the per-term first-posting codes -> (term pa.Array, bucket
    int32 np, df int64 np, idf float64 np). Bit-identical rows to the
    former pandas packer (pinned in tests/test_sharded.py)."""
    import pyarrow as pa

    n = len(ids)
    w = bm25_weight(tfs, dls, idf_per_posting, avgdl_f)
    term_start = np.ones(n, dtype=bool)
    term_start[1:] = codes_s[1:] != codes_s[:-1]
    if not np.isscalar(rid) and not isinstance(rid, int):
        # per-posting range ids (the WAND-layout build packs runs keyed
        # by (term, range_id) in one partition pass): a run breaks on
        # EITHER key change
        rid = np.asarray(rid)
        term_start[1:] |= rid[1:] != rid[:-1]
    t_starts = np.flatnonzero(term_start)
    t_ends = np.append(t_starts[1:], n)
    nt = len(t_starts)
    run_id = np.cumsum(term_start) - 1
    pos_in_run = np.arange(n, dtype=np.int64) - t_starts[run_id]
    blk_starts = np.flatnonzero(pos_in_run % block_size == 0)
    blk_ends = np.append(blk_starts[1:], n)
    nb = len(blk_starts)

    deltas = np.empty(n, np.int64)
    deltas[0] = 0
    deltas[1:] = ids[1:] - ids[:-1]
    deltas[blk_starts] = 0
    dbuf, dnb = varint_pack_with_lengths(deltas.astype(np.uint64))
    tbuf, tnb = varint_pack_with_lengths(tfs.astype(np.uint64))
    lbuf, lnb = varint_pack_with_lengths(dls.astype(np.uint64))
    doff = np.zeros(n + 1, np.int64); doff[1:] = np.cumsum(dnb)
    toff = np.zeros(n + 1, np.int64); toff[1:] = np.cumsum(tnb)
    loff = np.zeros(n + 1, np.int64); loff[1:] = np.cumsum(lnb)
    blk_max = np.maximum.reduceat(w, blk_starts)

    def bin_col(buf: bytes, off: np.ndarray):
        offs = np.empty(nb + 1, np.int32)
        offs[:-1] = off[blk_starts]
        offs[-1] = off[n]
        return pa.Array.from_buffers(
            pa.binary(), nb, [None, pa.py_buffer(offs), pa.py_buffer(buf)]
        )

    # exact Arrow types from the declared POSTINGS schema (non-null
    # fields, 'element' list naming) — applyInArrow validates strictly
    from pyspark.sql.pandas.types import to_arrow_schema

    list_type = to_arrow_schema(POSTINGS).field("blocks").type
    struct_type = list_type.value_type
    block_struct = pa.StructArray.from_arrays(
        [
            pa.array(ids[blk_starts], pa.int64()),
            pa.array(ids[blk_ends - 1], pa.int64()),
            pa.array((blk_ends - blk_starts).astype(np.int32), pa.int32()),
            bin_col(dbuf, doff),
            bin_col(tbuf, toff),
            bin_col(lbuf, loff),
            pa.array(blk_max, pa.float64()),
        ],
        fields=[struct_type.field(i) for i in range(struct_type.num_fields)],
    )
    # blocks are emitted term-ascending, so run_id at block starts is a
    # sorted map block -> term; searchsorted turns it into list offsets
    list_offs = np.searchsorted(run_id[blk_starts], np.arange(nt + 1)).astype(
        np.int32
    )
    blocks = pa.Array.from_buffers(
        list_type, nt, [None, pa.py_buffer(list_offs)], children=[block_struct]
    )

    tcodes = codes_s[t_starts]
    term_pa, bucket_np, df_np, idf_np = term_cols(tcodes)
    rid_col = (
        rid[t_starts].astype(np.int64)
        if isinstance(rid, np.ndarray)
        else np.full(nt, rid, np.int64)
    )
    return pa.table(
        {
            "term_bucket": pa.array(bucket_np, pa.int32()),
            "term": term_pa,
            "range_id": pa.array(rid_col, pa.int64()),
            "df": pa.array(df_np.astype(np.int64), pa.int64()),
            "idf": pa.array(idf_np.astype(np.float64), pa.float64()),
            "global_max": pa.array(np.maximum.reduceat(w, t_starts), pa.float64()),
            "n_postings": pa.array((t_ends - t_starts).astype(np.int64), pa.int64()),
            "blocks": blocks,
        }
    )


def build_sharded_postings(
    tf: DataFrame,
    terms: DataFrame,
    n_docs: int,
    avgdl: float,
    shard_width: int = DEFAULT_SHARD_WIDTH,
    block_size: int = DEFAULT_BLOCK,
    n_buckets: int = 64,
    dict_vocab_max: int = 2_000_000,
) -> DataFrame:
    """tf + terms -> postings rows keyed (term, shard); POSTINGS schema
    with range_id = shard. Uniform doc-range split subsumes hot-term
    splitting (every term is bounded by the shard width).

    When the vocabulary fits on the driver (<= ``dict_vocab_max``
    terms), the shard shuffle is DICTIONARY-ENCODED: rows carry an int64
    ``term_id`` instead of the term string + df + idf (roughly halves
    shuffle/Arrow bytes for this — the most bandwidth-bound — stage),
    and each shard recovers strings/stats from a broadcast vocab array,
    one lookup per UNIQUE term per shard, never per row. Larger
    vocabularies fall back to a plain shuffle hash join — above the
    dict threshold the vocab is by definition too big to broadcast
    (a 10^8-term broadcast is itself the OOM), so the fallback must
    NOT hint broadcast; AQE picks the join strategy."""
    # ONE vocabulary action instead of two (a count, then a re-collect
    # of the same uncached vocabulary lineage): probe for at most
    # dict_vocab_max+1 ordered rows — a short result IS the dictionary
    # the dict path needs
    vocab_rows = (
        terms.select("term", "df", "idf")
        .orderBy("term")
        .limit(dict_vocab_max + 1)
        .collect()
    )
    if len(vocab_rows) <= dict_vocab_max:
        return _build_sharded_dict(
            tf, vocab_rows, avgdl, shard_width, block_size, n_buckets
        )
    tf2 = (
        # vocab exceeds the broadcast-safe threshold: shuffle join on
        # term (tf is term-keyed already; AQE coalesces/skew-splits)
        tf.join(terms.select("term", "df", "idf"), "term")
        .withColumn("range_id", (F.col("doc_id") / F.lit(shard_width)).cast("long"))
        .select("term", "doc_id", "tf", "doc_len", "df", "idf", "range_id")
    )
    avgdl_f = float(avgdl)

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        """One pandas call per SHARD (not per term): all packing is one
        vectorized varint pass over the shard, byte-sliced per block."""
        rid = int(pdf["range_id"].iloc[0])
        # factorize terms to int codes BEFORE sorting: an object-array
        # lexsort drags every string through the comparator (pure
        # memory traffic — this stage showed 3.3x CPU stall inflation
        # at 32 threads); int codes sort in a fraction of the bandwidth
        codes, uniq_terms = pd.factorize(pdf["term"], sort=True)
        order = np.lexsort((pdf["doc_id"].to_numpy(), codes))
        codes_s = codes[order]
        ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["doc_len"].to_numpy()[order].astype(np.int64)
        dfs = pdf["df"].to_numpy()[order].astype(np.int64)
        idfs = pdf["idf"].to_numpy()[order].astype(np.float64)
        return _pack_shard(
            rid, codes_s, ids, tfs, dls, dfs, idfs,
            lambda c: uniq_terms[c], avgdl_f, block_size, n_buckets,
        )

    return tf2.groupBy("range_id").applyInPandas(build_shard, schema=POSTINGS)


def _pack_shard(
    rid, codes_s, ids, tfs, dls, dfs, idfs, term_of, avgdl_f,
    block_size, n_buckets,
) -> pd.DataFrame:
    """Shared per-shard packer: sorted (term-code, doc) arrays ->
    POSTINGS rows with per-block-reset varint deltas + block maxima.
    One vectorized varint pass over the shard, byte-sliced per block."""
    w = bm25_weight(tfs, dls, idfs, avgdl_f)
    n = len(ids)
    term_start = np.ones(n, dtype=bool)
    term_start[1:] = codes_s[1:] != codes_s[:-1]
    t_starts = np.flatnonzero(term_start)
    t_ends = np.append(t_starts[1:], n)

    # block starts: every block_size within each term run
    blk_starts = np.concatenate(
        [np.arange(s, e, block_size) for s, e in zip(t_starts, t_ends)]
    )
    blk_ends = np.append(blk_starts[1:], n)
    # per-block-reset doc-id deltas (first element of each block = 0)
    deltas = np.empty(n, np.int64)
    deltas[1:] = ids[1:] - ids[:-1]
    deltas[blk_starts] = 0

    dbuf, dnb = varint_pack_with_lengths(deltas.astype(np.uint64))
    tbuf, tnb = varint_pack_with_lengths(tfs.astype(np.uint64))
    lbuf, lnb = varint_pack_with_lengths(dls.astype(np.uint64))
    doff = np.zeros(n + 1, np.int64); doff[1:] = np.cumsum(dnb)
    toff = np.zeros(n + 1, np.int64); toff[1:] = np.cumsum(tnb)
    loff = np.zeros(n + 1, np.int64); loff[1:] = np.cumsum(lnb)
    blk_max = np.maximum.reduceat(w, blk_starts)

    out = {k: [] for k in (
        "term_bucket", "term", "range_id", "df", "idf",
        "global_max", "n_postings", "blocks",
    )}
    bi = 0
    for s, e in zip(t_starts, t_ends):
        blocks = []
        gmax = -math.inf
        while bi < len(blk_starts) and blk_starts[bi] < e:
            bs, be = int(blk_starts[bi]), int(blk_ends[bi])
            mw = float(blk_max[bi])
            gmax = max(gmax, mw)
            blocks.append(
                {
                    "first_doc": int(ids[bs]),
                    "last_doc": int(ids[be - 1]),
                    "n": be - bs,
                    "doc_deltas": dbuf[doff[bs]:doff[be]],
                    "tfs": tbuf[toff[bs]:toff[be]],
                    "doc_lens": lbuf[loff[bs]:loff[be]],
                    "max_w": mw,
                }
            )
            bi += 1
        term = term_of(codes_s[s])
        out["term_bucket"].append(term_bucket(term, n_buckets))
        out["term"].append(term)
        out["range_id"].append(rid)
        out["df"].append(int(dfs[s]))
        out["idf"].append(float(idfs[s]))
        out["global_max"].append(gmax)
        out["n_postings"].append(e - s)
        out["blocks"].append(blocks)
    return pd.DataFrame(out)


def _build_sharded_dict(
    tf: DataFrame,
    vocab_rows: list,
    avgdl: float,
    shard_width: int,
    block_size: int,
    n_buckets: int,
) -> DataFrame:
    """Dictionary-encoded shard build: the shuffle carries four int32s
    per row — (term_id, off = doc_id's offset within its shard, tf,
    doc_len) — no strings, no per-row df/idf, no 64-bit columns — and
    each shard recovers term/df/idf from broadcast vocab arrays (one
    fancy-index per shard, one string lookup per unique term) and
    reconstructs doc_id = shard_base + off. All four values fit int32 by
    construction (vocab capped at dict_vocab_max, off < shard_width,
    tf/doc_len bounded by document length), so this is a further 2x cut
    in shuffle/Arrow bytes for the stage that the scaling evidence pins
    as DRAM-bandwidth-bound (BENCH/BASELINE.md). Bit-identical output to
    the join path (tested)."""
    spark = tf.sparkSession
    rows = vocab_rows  # pre-collected term-ordered (term, df, idf)
    term_list = [r["term"] for r in rows]
    df_arr = np.array([r["df"] for r in rows], dtype=np.int64)
    idf_arr = np.array([r["idf"] for r in rows], dtype=np.float64)
    id_df = spark.createDataFrame(
        list(zip(term_list, range(len(term_list)))), "term string, term_id int"
    )
    bc = spark.sparkContext.broadcast((term_list, df_arr, idf_arr))
    tf2 = (
        tf.join(F.broadcast(id_df), "term")
        .withColumn("range_id", (F.col("doc_id") / F.lit(shard_width)).cast("long"))
        .select(
            "term_id",
            (F.col("doc_id") % F.lit(shard_width)).cast("int").alias("off"),
            F.col("tf").cast("int").alias("tf"),
            F.col("doc_len").cast("int").alias("doc_len"),
            "range_id",
        )
    )
    avgdl_f = float(avgdl)

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        term_list_b, df_b, idf_b = bc.value
        rid = int(pdf["range_id"].iloc[0])
        base = rid * shard_width
        tids = pdf["term_id"].to_numpy()
        order = np.lexsort((pdf["off"].to_numpy(), tids))
        codes_s = tids[order].astype(np.int64)
        ids = pdf["off"].to_numpy()[order].astype(np.int64) + base
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["doc_len"].to_numpy()[order].astype(np.int64)
        return _pack_shard(
            rid, codes_s, ids, tfs, dls, df_b[codes_s], idf_b[codes_s],
            lambda c: term_list_b[c], avgdl_f, block_size, n_buckets,
        )

    return tf2.groupBy("range_id").applyInPandas(build_shard, schema=POSTINGS)


def sharded_single_topk(
    index: Index,
    query: str,
    k: int = 10,
    shard_width: int = DEFAULT_SHARD_WIDTH,
) -> DataFrame:
    """Single-query latency path over the sharded layout ->
    (rank, doc_id, url, score).

    TWO small Spark jobs end-to-end (vs the WAND path's 4
    driver-synchronized rounds): (1) the applyInPandas shard-scoring
    pass collected PRE-merge — per-shard top-k candidates are <=
    shards*k rows, so the threshold/rank merge runs driver-side,
    bit-identically to the batch window form (same doubles, same
    (score desc, doc_id asc) order) and the merge's extra
    shuffle+window stage disappears; (2) a doc_id-IN point lookup for
    the k winners' urls — a pushed-predicate pruned scan, NOT a
    broadcast join that streams the whole docs table. Rank-identical on
    healthy queries (== sharded_batch_topk == bm25_topk, tested).
    Degenerate queries (no tokens / unknown terms / all-non-positive
    scores need the corpus zero-backfill) fall back to the exact
    per-query scorer."""
    from .scorer import bm25_topk

    local = sharded_batch_topk(
        index, {0: query}, k=k, shard_width=shard_width, merge=False
    )
    rows = local.collect()  # job 1: <= n_shards * k candidate rows
    cand: list = []
    if rows:
        mx = max(r["score"] for r in rows)
        cand = [r for r in rows if r["score"] >= 0.01 * mx] if mx > 0 else list(rows)
        cand.sort(key=lambda r: (-r["score"], r["doc_id"]))
        cand = cand[: int(k)]
    if not cand or cand[0]["score"] <= 0:
        # empty (no tokens / unknown terms) or all-non-positive: the
        # reference ranks unmatched zero-score docs too — exact path
        return bm25_topk(index, query, k=k)
    from .scorer import attach_urls_ranked

    return attach_urls_ranked(
        index, [(int(r["doc_id"]), float(r["score"])) for r in cand]
    )


def sharded_batch_topk(
    index: Index,
    queries: Dict[int, str],
    k: int = 10,
    shard_width: int = DEFAULT_SHARD_WIDTH,
    prune: bool = True,
    decode_stats: Optional[dict] = None,
    merge: bool = True,
) -> DataFrame:
    """All queries, shard-local exact scoring -> (query_id, rank,
    doc_id, score). index.postings must be sharded with ``shard_width``.
    Degenerate all-zero queries are the per-query scorer's job (same
    contract as the other batch scorers).

    ``prune=True`` applies per-(shard, query) block-max WAND inside
    ``score_shard``: a block is varint-decoded only if SOME query's
    upper bound needs it; pruned mass is tracked as a range-add upper
    bound (diff array) and the surviving candidates are exactly
    re-scored in canonical sorted-term order, so results stay
    bit-identical to the unpruned path (asserted in tests). Queries with
    a negative-idf term fall back to full decode (same soundness rule as
    operators/wand.py). ``decode_stats`` (a dict) receives
    ``decoded_blocks`` / ``total_blocks`` Spark-accumulator totals after
    the action runs — the measured decode reduction."""
    spark = index.spark
    qterms: Dict[str, list] = {}
    for qid, q in queries.items():
        for t, qtf in sorted(Counter(tokenize(q)).items()):
            qterms.setdefault(t, []).append((int(qid), float(qtf)))
    if not qterms:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    uniq = sorted(qterms)
    qids = sorted(queries)
    qpos = {qid: i for i, qid in enumerate(qids)}
    bq = spark.sparkContext.broadcast((qterms, qids, qpos))
    avgdl = float(index.avgdl)
    kk = int(k)
    sw = int(shard_width)
    do_prune = bool(prune)
    acc_decoded = spark.sparkContext.accumulator(0)
    acc_total = spark.sparkContext.accumulator(0)
    if decode_stats is not None:
        decode_stats["decoded_blocks"] = acc_decoded
        decode_stats["total_blocks"] = acc_total
    PAD = 1e-9

    prows = index.postings.where(F.col("term").isin(uniq)).select(
        "term", "range_id", "idf", "blocks"
    )

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        qterms_b, qids_b, qpos_b = bq.value
        shard = int(pdf["range_id"].iloc[0])
        base = shard * sw
        nq = len(qids_b)
        # sorted-term order == the canonical fold order
        pdf = pdf.sort_values("term")
        terms_a = pdf["term"].tolist()
        idf_a = [float(x) for x in pdf["idf"]]
        blocks_a = pdf["blocks"].tolist()
        nt = len(terms_a)
        # per-term block metadata (no decode): rel first/last, max_w
        bmeta = [
            [
                (int(b["first_doc"]) - base, int(b["last_doc"]) - base, float(b["max_w"]))
                for b in blocks_a[ti]
            ]
            for ti in range(nt)
        ]
        mws = [np.array([m[2] for m in bm]) for bm in bmeta]
        tmax = [float(m.max()) if len(m) else 0.0 for m in mws]
        acc_total.add(sum(len(bm) for bm in bmeta))

        decoded: dict = {}

        def get_block(ti: int, bi: int):
            key = (ti, bi)
            hit = decoded.get(key)
            if hit is None:
                blk = blocks_a[ti][bi]
                n = blk["n"]
                deltas = varint_unpack(bytes(blk["doc_deltas"]), n).astype(np.int64)
                ids = np.cumsum(deltas) + int(blk["first_doc"]) - base
                tfs = varint_unpack(bytes(blk["tfs"]), n).astype(np.int64)
                dls = varint_unpack(bytes(blk["doc_lens"]), n).astype(np.int64)
                w = bm25_weight(tfs, dls, idf_a[ti], avgdl)
                hit = decoded[key] = (ids, w)
                acc_decoded.add(1)
            return hit

        # per-query term entries (ti ascending = sorted-term order)
        term_index = {t: i for i, t in enumerate(terms_a)}
        q_entries: Dict[int, list] = {qid: [] for qid in qids_b}
        for t, lst in qterms_b.items():
            ti = term_index.get(t)
            if ti is None:
                continue
            for qid, qtf in lst:
                q_entries[qid].append((ti, float(qtf)))
        for qid in q_entries:
            q_entries[qid].sort()

        # --- plan: per-query kept-block masks (or None = keep all)
        q_plan = {}
        for qid, entries in q_entries.items():
            if not entries:
                continue
            S_q = sum(qtf * tmax[ti] for ti, qtf in entries)
            # S_q > 0 mirrors wand's pruning gate: at S_q == 0 every
            # contribution in this shard is exactly 0.0, and the
            # nonzero-score candidate cut would drop the matched docs
            # the exact batch scorer returns in its (_mx <= 0) regime
            prune_ok = (
                do_prune
                and kk > 0
                and all(idf_a[ti] >= 0 for ti, _ in entries)
                and S_q > 0
            )
            if not prune_ok:
                q_plan[qid] = (entries, None)
                continue
            # tau0: decode only each term's single best block; per-doc
            # max single-block contribution lower-bounds the true score
            m = np.zeros(sw)
            for ti, qtf in entries:
                bi = int(np.argmax(mws[ti]))
                ids, w = get_block(ti, bi)
                np.maximum.at(m, ids, qtf * w)
            nzm = m[m > 0]
            if len(nzm) >= kk:
                tau0 = float(np.partition(nzm, len(nzm) - kk)[len(nzm) - kk])
            else:
                tau0 = -np.inf
            kept = [
                qtf * mws[ti] + (S_q - qtf * tmax[ti]) >= tau0 - PAD
                for ti, qtf in entries
            ]
            q_plan[qid] = (entries, kept)

        # --- accumulate kept blocks; pruned mass -> range-add UB.
        # Fast path: a (query, term) that keeps EVERY block gets ONE
        # vectorized add over the term's concatenated postings (the
        # common case for multi-query batches, where pruning rarely
        # fires) — per-block adds only when the mask actually prunes.
        # rows only for queries with >=1 term IN THIS SHARD: sizing the
        # accumulator by the whole batch (nq x sw) would make per-task
        # memory scale with total batch size regardless of shard overlap
        active = {qid: i for i, qid in enumerate(sorted(q_plan))}
        ps = np.zeros((len(active), sw))
        ubx: Dict[int, np.ndarray] = {}
        term_cat: dict = {}

        def get_term(ti: int):
            hit = term_cat.get(ti)
            if hit is None:
                parts = [get_block(ti, bi) for bi in range(len(bmeta[ti]))]
                hit = term_cat[ti] = (
                    np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]),
                )
            return hit

        for qid, (entries, kept) in q_plan.items():
            qi = active[qid]
            for ei, (ti, qtf) in enumerate(entries):
                kmask = kept[ei] if kept is not None else None
                if kmask is None or kmask.all():
                    ids, w = get_term(ti)
                    ps[qi, ids] += qtf * w
                    continue
                for bi in range(len(bmeta[ti])):
                    if kmask[bi]:
                        ids, w = get_block(ti, bi)
                        ps[qi, ids] += qtf * w
                    else:
                        f, l, mw = bmeta[ti][bi]
                        d = ubx.get(qi)
                        if d is None:
                            d = ubx[qi] = np.zeros(sw + 1)
                        d[f] += qtf * mw
                        d[l + 1] -= qtf * mw

        out_q, out_d, out_s = [], [], []
        for qid, (entries, kept) in q_plan.items():
            qi = active[qid]
            s = ps[qi]
            if kept is None or qi not in ubx:
                # everything decoded: ps is exact and in canonical order
                cand_ids = np.flatnonzero(s != 0.0)
                cand_s = s[cand_ids]
                if len(cand_s) == 0 or cand_s.max() <= 0.0:
                    # degenerate all-nonpositive regime: matched docs can
                    # score exactly 0.0 (zero idf), which the nonzero cut
                    # misses — surface the full matched set, as the exact
                    # batch scorer's merge ((_mx <= 0) branch) returns
                    ids_list = [get_term(ti)[0] for ti, _ in entries]
                    if ids_list:
                        cand_ids = np.unique(np.concatenate(ids_list))
                        cand_s = s[cand_ids]
            else:
                ub_extra = np.cumsum(ubx[qi][:sw])
                nz_ids = np.flatnonzero((s != 0.0) | (ub_extra > 0.0))
                psn = s[nz_ids]
                if len(psn) > kk:
                    kth = float(np.partition(psn, len(psn) - kk)[len(psn) - kk])
                else:
                    kth = -np.inf
                cand_ids = nz_ids[psn + ub_extra[nz_ids] >= kth - PAD]
                # exact re-score of candidates in sorted-term order ->
                # bit-identical to the canonical fold
                sc = np.zeros(len(cand_ids))
                for ti, qtf in entries:
                    for bi in range(len(bmeta[ti])):
                        f, l, _mw = bmeta[ti][bi]
                        lo = int(np.searchsorted(cand_ids, f))
                        if lo >= len(cand_ids) or cand_ids[lo] > l:
                            continue
                        ids, w = get_block(ti, bi)
                        pos = np.searchsorted(cand_ids, ids)
                        pos_c = np.minimum(pos, len(cand_ids) - 1)
                        mask = cand_ids[pos_c] == ids
                        sc[pos_c[mask]] += qtf * w[mask]
                keep_nz = sc != 0.0
                cand_ids, cand_s = cand_ids[keep_nz], sc[keep_nz]
            if len(cand_s) > kk:
                # local top-k with the (score desc, doc_id asc) tie order
                sel = np.lexsort((cand_ids, -cand_s))[:kk]
                cand_ids, cand_s = cand_ids[sel], cand_s[sel]
            out_q.append(np.full(len(cand_ids), qid, dtype=np.int32))
            out_d.append(cand_ids + base)
            out_s.append(cand_s)
        if not out_q:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    local = prows.groupBy("range_id").applyInPandas(
        score_shard, schema="query_id int, doc_id long, score double"
    )
    if not merge:
        # pre-merge candidates (per-shard top-k, <= shards*queries*k
        # rows) — the single-query path merges these driver-side
        return local
    # tiny global merge: shards x queries x k rows
    wmax = Window.partitionBy("query_id")
    wrank = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("_mx", F.max("score").over(wmax))
        .where((F.col("_mx") <= 0) | (F.col("score") >= 0.01 * F.col("_mx")))
        .withColumn("rank", F.row_number().over(wrank))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
