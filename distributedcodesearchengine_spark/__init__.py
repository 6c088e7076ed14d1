"""PySpark-native full-text (BM25) indexing + query engine.

A from-scratch re-expression of the query/data semantics of
``Violet0725/DistributedCodeSearchEngine`` (reference, read-only at
/root/reference) as an idiomatic Spark DataFrame pipeline over an
Iceberg/parquet table of Common-Crawl-style web pages
``pages(url, warc_ts, html, text, lang)``.

Layout
------
- ``oracle/``     pure-Python reference replicas (tokenizer, BM25Okapi
                  scoring contract, html->text extraction) used as the
                  correctness oracle for rank-identity tests.
- ``functions/``  vectorized pandas/Arrow UDFs (extract, tokenize, mock
                  embedder) — no per-row Python UDFs anywhere.
- ``sources/``    deterministic synthetic pages corpus + testdata loaders.
- ``operators/``  DataFrame operators: doc-id assignment, corpus stats,
                  exact BM25 scorer, posting-list build (delta+varint
                  blocks, block-max), WAND-pruned scorer, RRF hybrid
                  merge, dedup / similarity / text-stats suites.
- ``build/``      checkpointed, resumable multi-stage index build with
                  per-partition lineage + metrics (_build_state).
- ``streaming/``  incremental indexing via Structured Streaming.
"""

__version__ = "0.1.0"
