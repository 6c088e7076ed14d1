"""Fixed StructType schemas (no runtime inference — byte-identity wants
declared types, mirroring the reference's pydantic-declared models,
``codesearch/models.py:36-165``)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The input table per BASELINE.json input_hint.
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

# Tokenized corpus with deterministic dense doc ids
# (doc_id = rank of url; replaces the reference's positional corpus index,
# bm25_index.py:38-41).
DOCS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("url", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("tokens", ArrayType(StringType()), False),
        StructField("doc_len", IntegerType(), False),
    ]
)

# Uncompressed per-(term,doc) index, denormalized with doc_len/lang so the
# query path never joins back to the full docs table.
TF = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("doc_len", IntegerType(), False),
        StructField("lang", StringType(), False),
    ]
)

TERMS = StructType(
    [
        StructField("term", StringType(), False),
        StructField("df", LongType(), False),
        StructField("idf", DoubleType(), False),
    ]
)

BLOCK = StructType(
    [
        StructField("first_doc", LongType(), False),
        StructField("last_doc", LongType(), False),
        StructField("n", IntegerType(), False),
        StructField("doc_deltas", BinaryType(), False),  # varint docID gaps
        StructField("tfs", BinaryType(), False),  # varint term freqs
        StructField("doc_lens", BinaryType(), False),  # varint doc lengths
        StructField("max_w", DoubleType(), False),  # block-max BM25 weight
    ]
)

POSTINGS = StructType(
    [
        StructField("term_bucket", IntegerType(), False),
        StructField("term", StringType(), False),
        StructField("range_id", LongType(), False),  # hot-term split unit
        StructField("df", LongType(), False),
        StructField("idf", DoubleType(), False),
        StructField("global_max", DoubleType(), False),  # max w over the row
        StructField("n_postings", LongType(), False),
        StructField("blocks", ArrayType(BLOCK), False),
    ]
)

# Per-partition lineage + metrics checkpoint (north rule; FIXTURES.md §7).
BUILD_STATE = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("input_fingerprint", StringType(), False),
        StructField("rows", LongType(), False),
        StructField("bytes", LongType(), False),
        StructField("wall_ms", DoubleType(), False),
        StructField("status", StringType(), False),
        StructField("updated_at", TimestampType(), False),
        # error lineage (ST3): failed work units record the exception
        # here — the dead-letter analog of the reference's DLQ
        # (queue/worker.py:144-158); NULL for successful rows
        StructField("error", StringType(), True),
    ]
)

RESULT = StructType(
    [
        StructField("rank", IntegerType(), False),
        StructField("doc_id", LongType(), False),
        StructField("url", StringType(), True),
        StructField("score", DoubleType(), False),
    ]
)
