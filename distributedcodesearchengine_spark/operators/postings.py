"""Posting-list segment build (SURVEY §7.1 M3/M4, north-rule structures).

From the uncompressed ``tf`` index, builds the compressed inverted index:

    postings(term_bucket, term, range_id, df, idf, global_max,
             n_postings, blocks: array<struct<first_doc, last_doc, n,
             doc_deltas varint, tfs varint, doc_lens varint, max_w>>)

Skew handling (the salted repartition-by-term shuffle): web-text term
frequencies are Zipfian — ``groupBy(term)`` alone would put a stopword's
entire posting list (potentially billions of docs) in one task. Terms
with df > ``target_row_postings`` are split into contiguous doc-id
RANGES (``range_id = doc_id // width``), so each (term, range_id) group
is bounded, tasks are even, and — because ranges are contiguous and
sorted — the per-range block lists concatenate into a valid global
posting list without re-encoding. Hot terms simply keep multiple rows
(the "skew-aware splitting of hot terms"); the query-side scorer is
row-count agnostic. This replaces what AQE cannot do for single-key
groupBy explosion (SURVEY §4.1).

Block-max: each block stores max_w = max over the block of the exact
BM25 per-term weight w(t,d) = idf * tf*(k1+1)/(tf + k1*(1-b+b*len/avgdl))
— enabling block-max WAND pruning at query time (operators/wand.py).

The doc-id deltas / tfs / doc_lens are LEB128 varints (operators/varint).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import POSTINGS
from .stats import B, K1
from .varint import varint_pack_with_lengths

DEFAULT_BLOCK = 128
DEFAULT_TARGET_ROW_POSTINGS = 65536
N_BUCKETS = 64


def term_bucket(term: str, n_buckets: int = N_BUCKETS) -> int:
    """Portable (engine-independent) term bucket for partition pruning."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def bm25_weight(
    tf: np.ndarray, doc_len: np.ndarray, idf: float, avgdl: float,
    k1: float = K1, b: float = B,
) -> np.ndarray:
    """Exact per-(term,doc) BM25 weight; operand order matches the JVM
    expression in operators/scorer.contribution_col for bit-identity."""
    tf = tf.astype(np.float64)
    dl = doc_len.astype(np.float64)
    norm = tf + k1 * ((1.0 - b) + (b * dl) / avgdl)
    return idf * ((tf * (k1 + 1.0)) / norm)


def build_postings(
    tf: DataFrame,
    terms: DataFrame,
    n_docs: int,
    avgdl: float,
    block_size: int = DEFAULT_BLOCK,
    target_row_postings: int = DEFAULT_TARGET_ROW_POSTINGS,
    n_buckets: int = N_BUCKETS,
    parallelism: int | None = None,
) -> DataFrame:
    """tf + terms -> compressed postings segments DataFrame."""
    # hot terms get a range width so each (term, range_id) has ~target rows
    hot = (
        terms.where(F.col("df") > target_row_postings)
        .select(
            "term",
            F.ceil(
                F.lit(float(n_docs))
                / F.ceil(F.col("df") / F.lit(float(target_row_postings)))
            ).cast("long").alias("width"),
        )
    )
    tf2 = (
        tf.join(terms.select("term", "df", "idf"), "term")
        .join(F.broadcast(hot), "term", "left")
        .withColumn(
            "range_id",
            F.when(F.col("width").isNull(), F.lit(0).cast("long")).otherwise(
                (F.col("doc_id") / F.col("width")).cast("long")
            ),
        )
    )

    avgdl_f = float(avgdl)

    def pack_partition(batches):
        """ONE vectorized pack per PARTITION (r06): the former
        per-(term, range_id) applyInPandas made ~|vocab| grouped-map
        calls, each paying pandas slicing + a one-row object-column
        result conversion (per-block Python dicts). Here the partition's
        rows are packed in one numpy/Arrow pass — runs keyed by
        (term-code, range_id), varints packed once and byte-sliced per
        block, and the POSTINGS rows emitted as raw Arrow buffers with
        zero per-term/per-block Python objects (sharded._pack_shard_arrow,
        guide §4.2). The repartition on exactly (term, range_id) above
        guarantees every run is complete within the partition. Row
        contents are bit-identical to the grouped-map form (pinned by
        tests/test_batch_postings.py round-trips + the wand gate).

        Per-task memory holds one shuffle partition's rows (bounded by
        total/parallelism; `parallelism` scales with cluster cores), the
        same order of magnitude a sort-merge task buffers."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from .sharded import _pack_shard_arrow

        blist = list(batches)
        if not blist:
            return
        tbl = pa.Table.from_batches(blist)
        if tbl.num_rows == 0:
            return
        tbl = tbl.combine_chunks()
        dic = tbl.column("term").dictionary_encode().combine_chunks()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.chunk(0)
        codes = dic.indices.to_numpy()
        uniq = dic.dictionary
        rid_a = tbl.column("range_id").to_numpy()
        doc_a = tbl.column("doc_id").to_numpy()
        order = np.lexsort((doc_a, rid_a, codes))
        codes_s = codes[order].astype(np.int64)
        rid_s = rid_a[order].astype(np.int64)
        ids = doc_a[order].astype(np.int64)
        tfs = tbl.column("tf").to_numpy()[order].astype(np.int64)
        dls = tbl.column("doc_len").to_numpy()[order].astype(np.int64)
        dfs = tbl.column("df").to_numpy()[order].astype(np.int64)
        idfs = tbl.column("idf").to_numpy()[order].astype(np.float64)
        # per-code df/idf/bucket (df and idf are per-TERM constants)
        ncodes = len(uniq)
        df_by_code = np.empty(ncodes, np.int64)
        idf_by_code = np.empty(ncodes, np.float64)
        df_by_code[codes_s] = dfs
        idf_by_code[codes_s] = idfs
        bucket_by_code = np.fromiter(
            (term_bucket(t, n_buckets) for t in uniq.to_pylist()),
            dtype=np.int32,
            count=ncodes,
        )

        def term_cols(tcodes):
            return (
                pc.take(uniq, pa.array(tcodes)),
                bucket_by_code[tcodes],
                df_by_code[tcodes],
                idf_by_code[tcodes],
            )

        out = _pack_shard_arrow(
            rid_s, codes_s, ids, tfs, dls, idfs, term_cols, avgdl_f, block_size
        )
        yield from out.to_batches()

    # width served only to derive range_id — drop it before the
    # repartition-by-(term, range_id) shuffle feeding the pack pass.
    # The explicit repartition widens the stage to 4x cores (vs the
    # session's shuffle.partitions = cores): group sizes are capped by
    # target_row_postings but still uneven, and at one-task-per-core a
    # straggler group idled its whole wave — measured as ~14/32 cores
    # busy on this stage in the N-vs-4N runs. Hash partitioning on
    # exactly (term, range_id) keeps every run complete within its
    # partition for the mapInArrow pass; AQE's 64KB floor won't
    # re-coalesce it at bench scale.
    if parallelism is None:
        parallelism = tf.sparkSession.sparkContext.defaultParallelism * 4
    return (
        tf2.drop("width")
        .select("term", "doc_id", "tf", "doc_len", "df", "idf", "range_id")
        .repartition(parallelism, "term", "range_id")
        .mapInArrow(pack_partition, schema=POSTINGS)
    )


def merge_postings(
    postings: DataFrame,
    target_row_postings: int = DEFAULT_TARGET_ROW_POSTINGS,
) -> DataFrame:
    """Segment merge / compaction (north rule M4).

    Incremental builds and bucket-group builds leave multiple small
    (term, range_id) rows per term. Compaction groups each term's rows
    and — because range rows hold CONTIGUOUS, disjoint, sorted doc-id
    ranges — concatenates their block lists in range order WITHOUT
    re-encoding any block. Skew awareness: a term whose total postings
    exceed ``target_row_postings`` keeps multiple rows (hot terms stay
    split so no single task/row becomes unbounded); cold terms collapse
    to one row. Query-side decoding is row-count agnostic, so this is a
    pure physical-layout optimization (equality-tested in
    tests/test_merge.py).
    """

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("range_id")
        total = int(pdf["n_postings"].sum())
        first = pdf.iloc[0]
        if total <= target_row_postings or len(pdf) == 1:
            blocks = [b for row in pdf["blocks"] for b in row]
            return pd.DataFrame(
                {
                    "term_bucket": [int(first["term_bucket"])],
                    "term": [first["term"]],
                    "range_id": [int(first["range_id"])],
                    "df": [int(first["df"])],
                    "idf": [float(first["idf"])],
                    "global_max": [float(pdf["global_max"].max())],
                    "n_postings": [total],
                    "blocks": [list(blocks)],
                }
            )
        # hot term: keep the split, pack adjacent rows up to the target
        out_rows = []
        cur_blocks, cur_n, cur_max, cur_rid = [], 0, -math.inf, None
        for _, row in pdf.iterrows():
            if cur_n and cur_n + int(row["n_postings"]) > target_row_postings:
                out_rows.append((cur_rid, cur_n, cur_max, cur_blocks))
                cur_blocks, cur_n, cur_max, cur_rid = [], 0, -math.inf, None
            if cur_rid is None:
                cur_rid = int(row["range_id"])
            # extend, never rebuild: cur_blocks + list(...) recopies the
            # accumulated list per input row — quadratic exactly on the
            # many-small-segments hot terms this path exists to compact
            cur_blocks.extend(row["blocks"])
            cur_n += int(row["n_postings"])
            cur_max = max(cur_max, float(row["global_max"]))
        if cur_n:
            out_rows.append((cur_rid, cur_n, cur_max, cur_blocks))
        return pd.DataFrame(
            {
                "term_bucket": [int(first["term_bucket"])] * len(out_rows),
                "term": [first["term"]] * len(out_rows),
                "range_id": [r[0] for r in out_rows],
                "df": [int(first["df"])] * len(out_rows),
                "idf": [float(first["idf"])] * len(out_rows),
                "global_max": [r[2] for r in out_rows],
                "n_postings": [r[1] for r in out_rows],
                "blocks": [r[3] for r in out_rows],
            }
        )

    return postings.groupBy("term").applyInPandas(merge_group, schema=POSTINGS)


def decode_blocks(row_blocks, predicate=None):
    """Decode a postings row's block list -> (doc_ids, tfs, doc_lens).

    ``predicate(block_dict) -> bool`` selects which blocks to decode
    (block-max pruning hook). Blocks are dicts (Arrow struct rows).
    """
    from .varint import varint_unpack

    ids, tfs, dls = [], [], []
    for blk in row_blocks:
        if predicate is not None and not predicate(blk):
            continue
        n = blk["n"]
        deltas = varint_unpack(bytes(blk["doc_deltas"]), n).astype(np.int64)
        d = np.cumsum(deltas) + blk["first_doc"]
        ids.append(d)
        tfs.append(varint_unpack(bytes(blk["tfs"]), n).astype(np.int64))
        dls.append(varint_unpack(bytes(blk["doc_lens"]), n).astype(np.int64))
    if not ids:
        z = np.zeros(0, np.int64)
        return z, z, z
    return np.concatenate(ids), np.concatenate(tfs), np.concatenate(dls)
