"""Compressed positional index + index-served phrase matching.

``operators/phrase.py`` answers phrase queries by re-deriving positions
from the docs table per query (fine for one-off analytics). This module
makes phrase search an INDEX feature, the way the BM25 postings are: a
persisted, varint-compressed positional-postings relation sharded by
doc range, and a phrase matcher that runs as one ``applyInPandas`` pass
over only the phrase terms' fragments.

Layout — one row per (term, shard):

    positional(term_bucket, term, range_id, n_docs,
               doc_deltas binary,   # LEB128 deltas of the term's doc ids
                                    # within the shard (first absolute,
                                    # relative to shard base)
               counts binary,       # LEB128 per-doc position count (=tf)
               positions binary)    # LEB128 per-doc position deltas
                                    # (first absolute), concatenated in
                                    # doc order

Scale shape mirrors the BM25 sharded build (sharded.py): ONE
posexplode + one groupBy(range_id) shuffle builds every shard's
fragments in a single vectorized numpy pass (factorize -> lexsort ->
run-length boundaries -> one varint pack, byte-sliced per term); the
matcher's only data movement is the term-pruned scan of the phrase
terms' rows — shards intersect locally and emit (doc_id, n_occur), so
no corpus-sized join shuffle exists anywhere. Phrase occurrences
intersect as (doc, aligned-position) keys packed into one int64
(doc << 21 | pos; positions are bounded by document length << 2^21).

Equality contract: identical (doc_id, n_occur) output to
``phrase.phrase_occurrences`` (tested) and to the driver's DuckDB
token-slice oracle (gate key ``phrase_match_indexed``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..oracle.tokenizer import tokenize
from .postings import term_bucket
from .varint import varint_pack_with_lengths, varint_unpack

DEFAULT_SHARD_WIDTH = 65536
_POS_BITS = 21  # doc << 21 | pos; max position 2,097,151

POSITIONAL = StructType(
    [
        StructField("term_bucket", IntegerType()),
        StructField("term", StringType()),
        StructField("range_id", LongType()),
        StructField("n_docs", LongType()),
        StructField("doc_deltas", BinaryType()),
        StructField("counts", BinaryType()),
        StructField("positions", BinaryType()),
    ]
)


def build_positional_index(
    docs: DataFrame,
    shard_width: int = DEFAULT_SHARD_WIDTH,
    n_buckets: int = 64,
) -> DataFrame:
    """docs(doc_id, tokens) -> positional rows (POSITIONAL schema)."""
    pos = docs.select(
        (F.col("doc_id") / F.lit(shard_width)).cast("long").alias("range_id"),
        (F.col("doc_id") % F.lit(shard_width)).cast("int").alias("off"),
        F.posexplode("tokens").alias("pos", "term"),
    )

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(pdf["range_id"].iloc[0])
        codes, uniq_terms = pd.factorize(pdf["term"], sort=True)
        offs = pdf["off"].to_numpy().astype(np.int64)
        poss = pdf["pos"].to_numpy().astype(np.int64)
        return pack_positional_shard(rid, codes, uniq_terms, offs, poss, n_buckets)

    return pos.groupBy("range_id").applyInPandas(build_shard, schema=POSITIONAL)


def pack_positional_shard(
    rid: int, codes, uniq_terms, offs, poss, n_buckets: int = 64
) -> pd.DataFrame:
    """One shard's (term-code, doc-offset, position) triples ->
    POSITIONAL rows. Module-level so the codec is property-testable
    without Spark (tests/test_phrase.py hypothesis roundtrip)."""
    if len(poss) and int(poss.max()) >= (1 << _POS_BITS):
        # the matcher packs doc << _POS_BITS | pos: a position past the
        # bit budget would silently overflow into the doc field and
        # corrupt phrase keys — fail the build loudly instead
        raise ValueError(
            f"document too long for positional packing: position "
            f"{int(poss.max())} >= 2^{_POS_BITS}; split or truncate the "
            "document at build time"
        )
    order = np.lexsort((poss, offs, codes))
    c = codes[order]
    d = offs[order]
    p = poss[order]
    n = len(c)

    # run boundaries
    term_start = np.ones(n, bool)
    term_start[1:] = c[1:] != c[:-1]
    doc_start = term_start.copy()
    doc_start[1:] |= d[1:] != d[:-1]

    # per-doc position deltas (first position absolute)
    pdelta = np.empty(n, np.int64)
    pdelta[1:] = p[1:] - p[:-1]
    pdelta[doc_start] = p[doc_start]
    pos_buf, pos_nb = varint_pack_with_lengths(pdelta.astype(np.uint64))
    pos_off = np.zeros(n + 1, np.int64)
    pos_off[1:] = np.cumsum(pos_nb)

    # per-(term, doc) rows: doc id + count
    ds = np.flatnonzero(doc_start)
    de = np.append(ds[1:], n)
    doc_ids = d[ds]
    doc_cnt = de - ds
    doc_term = c[ds]
    m = len(ds)
    tstart = np.ones(m, bool)
    tstart[1:] = doc_term[1:] != doc_term[:-1]
    ddelta = np.empty(m, np.int64)
    ddelta[1:] = doc_ids[1:] - doc_ids[:-1]
    ddelta[tstart] = doc_ids[tstart]
    doc_buf, doc_nb = varint_pack_with_lengths(ddelta.astype(np.uint64))
    doc_off = np.zeros(m + 1, np.int64)
    doc_off[1:] = np.cumsum(doc_nb)
    cnt_buf, cnt_nb = varint_pack_with_lengths(doc_cnt.astype(np.uint64))
    cnt_off = np.zeros(m + 1, np.int64)
    cnt_off[1:] = np.cumsum(cnt_nb)

    ts = np.flatnonzero(tstart)
    te = np.append(ts[1:], m)
    tse = np.flatnonzero(term_start)  # starts in the position arrays
    tee = np.append(tse[1:], n)
    out = {k: [] for k in (
        "term_bucket", "term", "range_id", "n_docs",
        "doc_deltas", "counts", "positions",
    )}
    for k in range(len(ts)):
        term = uniq_terms[doc_term[ts[k]]]
        out["term_bucket"].append(term_bucket(term, n_buckets))
        out["term"].append(term)
        out["range_id"].append(rid)
        out["n_docs"].append(int(te[k] - ts[k]))
        out["doc_deltas"].append(doc_buf[doc_off[ts[k]]:doc_off[te[k]]])
        out["counts"].append(cnt_buf[cnt_off[ts[k]]:cnt_off[te[k]]])
        out["positions"].append(pos_buf[pos_off[tse[k]]:pos_off[tee[k]]])
    return pd.DataFrame(out)


def _decode_row(row) -> tuple:
    """positional row -> (doc_offs int64[], keys int64[doc<<21|pos])."""
    nd = int(row["n_docs"])
    ddelta = varint_unpack(bytes(row["doc_deltas"]), nd).astype(np.int64)
    docs = np.cumsum(ddelta)
    cnts = varint_unpack(bytes(row["counts"]), nd).astype(np.int64)
    npos = int(cnts.sum())
    pdelta = varint_unpack(bytes(row["positions"]), npos).astype(np.int64)
    # segmented cumsum with per-doc reset, closed form: within doc k
    # (segment start s_k, absolute first position pdelta[s_k]),
    #   pos[j] = pdelta[s_k] + (csum[j] - csum[s_k])
    #          = csum[j] - (csum[s_k] - pdelta[s_k])
    starts = np.zeros(nd, np.int64)
    starts[1:] = np.cumsum(cnts)[:-1]
    csum = np.cumsum(pdelta)
    base = csum[starts] - pdelta[starts]
    pos = csum - np.repeat(base, cnts)
    doc_per_pos = np.repeat(docs, cnts)
    return docs, (doc_per_pos << _POS_BITS) | pos


def phrase_occurrences_indexed(
    positional: DataFrame,
    phrase: str,
    shard_width: int = DEFAULT_SHARD_WIDTH,
    n_buckets: int = 64,
) -> DataFrame:
    """positional index + phrase -> (doc_id, n_occur), identical to
    phrase.phrase_occurrences. Per-shard local intersection of
    (doc, pos - slot) key sets; only the phrase terms' rows are read —
    the term_bucket predicate partition-prunes the persisted
    partitionBy('term_bucket') layout so the scan touches only the
    phrase terms' bucket directories (``n_buckets`` must match the
    build; thread it from the index meta)."""
    toks = tokenize(phrase)
    spark = positional.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long, n_occur long")
    uniq = sorted(set(toks))
    sw = int(shard_width)
    buckets = sorted({term_bucket(t, n_buckets) for t in uniq})
    rows = (
        positional.where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(uniq))
        .select("term", "range_id", "n_docs", "doc_deltas", "counts", "positions")
    )
    toks_b = list(toks)

    def match_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(pdf["range_id"].iloc[0])
        by_term = {}
        for _, row in pdf.iterrows():
            by_term[row["term"]] = _decode_row(row)
        if any(t not in by_term for t in toks_b):
            return pd.DataFrame({"doc_id": [], "n_occur": []})
        pos_mask = (np.int64(1) << _POS_BITS) - 1
        cand = None
        for i, t in enumerate(toks_b):
            keys = by_term[t][1]
            # drop pos < i before aligning: subtracting i would borrow
            # into the doc field and forge a key in the previous doc
            keys = keys[(keys & pos_mask) >= i] - i
            cand = keys if cand is None else np.intersect1d(cand, keys)
            if len(cand) == 0:
                return pd.DataFrame({"doc_id": [], "n_occur": []})
        doc_off, counts = np.unique(cand >> _POS_BITS, return_counts=True)
        return pd.DataFrame(
            {
                "doc_id": doc_off + rid * sw,
                "n_occur": counts.astype(np.int64),
            }
        )

    return rows.groupBy("range_id").applyInPandas(
        match_shard, schema="doc_id long, n_occur long"
    )


def phrase_match_indexed(
    docs: DataFrame,
    phrase: str,
    shard_width: int = DEFAULT_SHARD_WIDTH,
) -> DataFrame:
    """Gate shape: build the positional index from docs, then match —
    (doc_id, n_occur) ordered by doc_id."""
    idx = build_positional_index(docs, shard_width=shard_width)
    return phrase_occurrences_indexed(idx, phrase, shard_width).orderBy("doc_id")
