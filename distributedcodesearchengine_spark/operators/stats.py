"""Index statistics as DataFrame aggregations (SURVEY §2.5 A1-A2).

- tf:  explode(tokens) -> groupBy(doc_id, term).count()   [hash agg,
  partial+final map-side combine for free]
- df:  groupBy(term).count() over the tf table (exact — approximate
  distinct would break rank identity)
- N, avgdl: one tiny agg over docs; empty-token docs COUNT in both
  (rank_bm25 keeps them; SURVEY §7.3.5)
- idf: ln(N - df + 0.5) - ln(df + 0.5) with the epsilon floor against the
  global vocab-average idf (rank_bm25 _calc_idf; epsilon=0.25). The
  vocab-average is the one global barrier in the build — a single cheap
  pass over the terms table.

doc_len is denormalized into the tf rows so scoring never joins back to
the corpus table; metadata (lang/site) stays on docs and joins onto the
thresholded candidates only (scorer.finalize_topk's docvalues lookup).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .doc_ids import assign_doc_ids

K1, B, EPSILON = 1.5, 0.75, 0.25  # BM25Okapi defaults (requirements.txt:26)


def build_docs(
    pages: DataFrame,
    num_partitions: int | None = None,
    meta_cols: tuple = (),
) -> DataFrame:
    """pages -> docs(doc_id, url, site, lang, *meta_cols, tokens, doc_len).

    Text is re-derived from html via the extract UDF (the per-row
    invariant extract(html) == text is asserted in tests, not assumed).
    Dedup on url mirrors the reference's add-time identity dedup
    (bm25_index.py:91-92). ``site`` is the repo_name analog
    (url host, reference repo_indexer.py:272-277). ``meta_cols`` are
    extra filterable metadata columns carried from the input table
    (reference filter keys, bm25_index.py:157-164).
    """
    slim = pages.select(
        "url",
        F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1).alias("site"),
        "lang",
        *meta_cols,
        "html",
    )
    # id assignment FIRST, tokenize AFTER the shuffle: the boundary
    # sample then reads only the url column (column-pruned scan), and
    # the fused UDF runs exactly once — attaching tokens before the
    # shuffle would re-execute the UDF in the partitioner's sampling
    # pass. url-dedup rides the same shuffle (no separate
    # dropDuplicates exchange over raw pages).
    # min-md5(html) survivor among recrawled urls — the same
    # deterministic rule as streaming ingest (_dedup_urls); an arbitrary
    # pick would make the built index a nondeterministic function of its
    # input partitioning whenever a url appears with differing html
    ids = assign_doc_ids(
        slim, "url", num_partitions, dedup=True, dedup_tie=F.md5(F.col("html"))
    )
    # fused extract+tokenize as ONE mapInArrow pass: html crosses to
    # Python once and the token lists come back as raw Arrow buffers
    # (udfs._tokens_list_array) — the pandas-UDF serializer would run a
    # per-row ArrayType converter on the way out (materializing every
    # token as a Python string); mapInArrow's serializer is
    # pass-through, so the byte-level tokenizer's zero-object output
    # survives to the JVM (guide §4.2). doc_len is computed in the same
    # pass (list_value_length). Semantics identical to
    # tokenize_udf(extract_text_udf(html)) — asserted in tests.
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from ..functions.udfs import _extract_series, _tokens_list_array

    sel = ids.select("doc_id", "url", "site", "lang", *meta_cols, "html")
    out_fields = [f for f in sel.schema.fields if f.name != "html"]
    out_schema = StructType(
        out_fields
        + [
            StructField("tokens", ArrayType(StringType())),
            StructField("doc_len", IntegerType()),
        ]
    )

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            names = rb.schema.names
            hidx = names.index("html")
            texts = _extract_series(rb.column(hidx).to_pandas())
            toks = _tokens_list_array(texts.tolist())
            arrs = [rb.column(i) for i in range(rb.num_columns) if i != hidx]
            arrs += [toks, pc.list_value_length(toks)]
            yield pa.RecordBatch.from_arrays(
                arrs, names=[n for n in names if n != "html"] + ["tokens", "doc_len"]
            )

    return sel.mapInArrow(gen, schema=out_schema).select(
        "doc_id", "url", "site", "lang", *meta_cols, "tokens", "doc_len"
    )


def corpus_stats(docs: DataFrame) -> Tuple[int, float]:
    row = docs.agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("total")
    ).first()
    n = int(row["n"])
    return n, (float(row["total"]) / n if n else 0.0)


def term_freqs(docs: DataFrame) -> DataFrame:
    """tf(term, doc_id, doc_len, tf) — the uncompressed index, computed
    with ZERO shuffle: one Arrow pass per partition (``mapInArrow``)
    counts each doc's terms with C++/numpy primitives — dictionary-encode
    the flattened token column, sort the (row, code) int64 keys, run-
    length the sorted keys, gather term strings back via ``pc.take`` on
    the batch dictionary. No per-token Python objects are created in
    either direction (guide §4.2: hand whole batches to vectorized
    native code). Output rows per doc are ordered by first-token
    appearance rather than alphabetically — tf is a relation, every
    consumer sorts or aggregates explicitly (postings sort by
    (term, doc), the scorer's fold array_sorts), so row order is not
    semantic. The tf relation is SLIM — (term, doc_id, tf, doc_len)
    only: metadata (lang/site/...) stays in the docs table and is joined
    onto the scored CANDIDATES when a filtered query needs it
    (finalize_topk). An explode+groupBy(term, doc_id) would shuffle
    ~|tokens| near-unique keys for no combine benefit. The previous
    JVM formulation is kept as ``term_freqs_hof`` (equivalence-tested);
    the Arrow pass measured ~2.5x less CPU on the sf0.1 build's
    ``sub_tf_write`` stage (OPTIMIZATION_r06.md).
    """
    import pyarrow as pa

    def gen(batches):
        import pyarrow.compute as pc

        for rb in batches:
            tok = rb.column(2)
            flat = pc.list_flatten(tok)
            if len(flat) == 0:
                continue
            rowidx = pc.list_parent_indices(tok).to_numpy()
            dic = pc.dictionary_encode(flat)
            codes = dic.indices.to_numpy().astype(np.int64)
            nd = len(dic.dictionary)
            key = rowidx.astype(np.int64) * nd + codes
            sk = np.sort(key)
            run = np.ones(len(sk), bool)
            run[1:] = sk[1:] != sk[:-1]
            sidx = np.flatnonzero(run)
            tf_cnt = np.diff(np.append(sidx, len(sk))).astype(np.int32)
            uk = sk[sidx]
            row_of = uk // nd
            code_of = uk % nd
            row_idx = pa.array(row_of)
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(dic.dictionary, pa.array(code_of)),
                    pc.take(rb.column(0), row_idx),
                    pc.take(rb.column(1), row_idx),
                    pa.array(tf_cnt, type=pa.int32()),
                ],
                names=["term", "doc_id", "doc_len", "tf"],
            )

    return (
        docs.select("doc_id", F.col("doc_len").cast("int"), "tokens")
        .mapInArrow(gen, schema="term string, doc_id long, doc_len int, tf int")
        .select("term", "doc_id", "doc_len", "tf")
    )


def term_freqs_hof(docs: DataFrame) -> DataFrame:
    """JVM run-length formulation of ``term_freqs`` (sort the token
    array, find run starts via a filtered index sequence, zip starts
    with ends — no Python). Kept as the equivalence baseline and for
    plan experiments; ``term_freqs`` (Arrow pass) replaced it on the
    build hot path in r06. The sorted array and run starts are
    materialized as real columns first — Catalyst does not CSE inside
    lambda bodies, so inlining sort_array into every element access
    would re-sort per access.
    """
    keys = ["doc_id", "doc_len"]
    s = F.col("_s")
    starts = F.col("_starts")
    d = (
        docs.withColumn("_s", F.sort_array("tokens"))
        .withColumn(
            "_starts",
            F.when(
                F.size(s) > 0,
                F.filter(
                    F.sequence(F.lit(0), F.size(s) - 1),
                    lambda i: (i == F.lit(0)) | (F.get(s, i) != F.get(s, i - 1)),
                ),
            ).otherwise(F.array().cast("array<int>")),
        )
        .withColumn(
            "_tc",
            F.when(
                F.size(starts) > 0,
                F.zip_with(
                    starts,
                    F.concat(
                        F.slice(
                            starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))
                        ),
                        F.array(F.size(s)),
                    ),
                    lambda a, b: F.struct(
                        F.get(s, a).alias("term"), (b - a).cast("int").alias("tf")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<term:string,tf:int>>")),
        )
    )
    # explode_outer, NOT explode: InferFiltersFromGenerate would push a
    # synthesized size(..)>0 filter below the projections, inlining the
    # whole HOF tree ~20x per row (measured 70x slowdown). explode_outer
    # is exempt; the null rows (empty docs) are dropped by a filter on
    # the generator OUTPUT, which cannot be pushed below the Generate.
    return (
        d.select(*keys, F.explode_outer("_tc").alias("tc"))
        .where(F.col("tc").isNotNull())
        .select(F.col("tc.term").alias("term"), *keys, F.col("tc.tf").alias("tf"))
    )


def idf_detail_from_df(df_rel: DataFrame, n_docs: int) -> DataFrame:
    """(term, df) + N -> (term, df, idf_raw, idf) with the epsilon
    floor (A2). The floor needs avg(idf) over the FULL vocabulary
    including negative idfs — computed as a 1-row agg and broadcast
    back as a literal via crossJoin so the whole thing stays one lazy
    plan. Shared by the per-corpus build (df counted from tf) and
    index federation (df = exact integer sum of the shards' dfs)."""
    n = float(n_docs)
    terms = df_rel.withColumn(
        "idf_raw", F.log(F.lit(n) - F.col("df") + 0.5) - F.log(F.col("df") + 0.5)
    )
    # canonical TWO-LEVEL tree fold, NOT F.avg: a partial-sum-order
    # average differs in the last ulp between plans (monolithic vs
    # federated vs DuckDB), and an ulp-shifted epsilon floor flips
    # membership at the 1%-of-max threshold boundary — a discrete,
    # visible divergence. Canonical definition (fixed fold order at BOTH
    # levels, replicated verbatim by the DuckDB epsv lane and the
    # two-level reference in tests):
    #   bucket(t) = first 3 hex chars of md5(t)      (4096 buckets)
    #   s_b  = left fold of idf_raw over terms of b, term-ascending
    #   total = left fold of s_b over buckets, bucket-ascending
    #   avg  = total / |vocab|
    # Unlike the former single collect_list of the WHOLE vocabulary
    # (one task owning 10^9 structs at web scale — the build path's
    # single point of scale failure), each first-level task holds only
    # ~|vocab|/4096 terms and the second level exactly <=4096 sums.
    bsums = terms.groupBy(
        F.substring(F.md5("term"), 1, 3).alias("_b")
    ).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "idf_raw"))),
            F.lit(0.0),
            lambda acc, x: acc + x["idf_raw"],
        ).alias("_s"),
        F.count("*").alias("_n"),
    )
    avg_idf = bsums.agg(
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_b", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            )
            / F.sum("_n")
        ).alias("avg_idf")
    )
    return (
        terms.crossJoin(F.broadcast(avg_idf))
        .withColumn(
            "idf",
            F.when(
                F.col("idf_raw") < 0, F.lit(EPSILON) * F.col("avg_idf")
            ).otherwise(F.col("idf_raw")),
        )
        .select("term", "df", "idf_raw", "idf")
    )


def terms_with_idf_detail(tf: DataFrame, n_docs: int) -> DataFrame:
    """terms(term, df, idf_raw, idf) — see idf_detail_from_df."""
    return idf_detail_from_df(
        tf.groupBy("term").agg(F.count("*").alias("df")), n_docs
    )


def terms_with_idf(tf: DataFrame, n_docs: int) -> DataFrame:
    """terms(term, df, idf) — see terms_with_idf_detail."""
    return terms_with_idf_detail(tf, n_docs).select("term", "df", "idf")
