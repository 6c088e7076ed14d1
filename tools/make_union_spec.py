#!/usr/bin/env python
"""Generate operators/union_spec.py — the round-5 union-gate-key spec.

The driver records only the FIRST 50 registry keys per round, so 164
registry keys had never received a driver-visible correctness row by
round-5 start (VERDICT r4 "What's missing" #1). The fix (VERDICT
"Next round" #2) packs those keys into family UNION-ALL gate entries:
one driver row certifies every member's full result set at once.

This script emits the static spec the union combinator
(operators/unionkeys.py) consumes:

* ``GROUPS``  — union key -> ordered member-key list (defined below;
  every never-driver-verified key appears in exactly one group).
* ``SPEC``    — member key -> [(column, kind), ...] with columns
  sorted by name and kind in {"str", "float"}. Kinds come from a
  DuckDB ``DESCRIBE`` of the member's oracle SQL at sf0.001:
  DOUBLE/FLOAT/REAL -> "float" (kept as native doubles in the union so
  the driver's bit-exact float hashing still applies); every other
  scalar type (VARCHAR/BIGINT/INTEGER/BOOLEAN) -> "str" (cast to
  string IN-ENGINE on both sides — integer casts are exact, so no
  2^53 double-precision loss on hash-derived int64 keys).

Both the Spark and the DuckDB side of a union key assign slots from
this one spec, so the two engines can never disagree on the mapping.

Usage: python tools/make_union_spec.py   # rewrites union_spec.py
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SPEC_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

OUT = os.path.join(
    REPO, "distributedcodesearchengine_spark", "operators", "union_spec.py"
)

# Family grouping of the 164 keys with no driver correctness row as of
# round-5 start (never = set(_registry()) - union(CORRECTNESS_r0{1..4})).
# Partition property (every key in exactly one group) is pinned by
# tests/test_unionkeys.py.
GROUPS: dict[str, list[str]] = {
    "u_dedup_suite": [
        "dedup_keep_best", "dedup_lines_within", "dedup_by_source",
        "dedup_fingerprint_sorted", "dedup_threshold_curve",
        "decontaminate_fuzzy", "c4_filters",
    ],
    "u_suggest_suite": [
        "completion_suggest", "completion_suggest_uni",
        "completion_suggest_ctx", "did_you_mean", "phrase_suggest",
        "categorize_text", "analyze_doc",
    ],
    "u_similarity_models": [
        "dismax_topk", "combined_fields_topk", "cross_fields_topk",
        "bm25plus_topk", "lmd_topk", "lmjm_topk", "dfr_topk",
        "classic_topk", "boolean_sim_topk", "ib_topk",
        "similarity_agreement",
    ],
    "u_query_ext": [
        "bm25_synonyms_graph", "bm25_excluded_ids", "bm25_boosted_query",
        "bm25_msm", "bm25_terms_set", "bm25_regexp", "constant_score",
        "match_phrase_prefix", "match_bool_prefix", "mget",
    ],
    "u_query_string": [
        "query_string_full", "query_string_filtered",
        "query_string_degenerate", "bm25_boosting", "bm25_boosting_zero",
        "more_like_this_unlike", "percolate_phrase",
    ],
    "u_pagination_sort": [
        "bm25_sort_desc", "bm25_sort_asc_degenerate", "bm25_search_after",
        "bm25_search_after_degenerate", "bm25_pinned", "bm25_rescore",
        "terms_enum", "terms_enum_after",
    ],
    "u_span_termvectors": [
        "bm25_span_first", "bm25_span_within", "bm25_span_not",
        "maxsim_topk", "term_vectors", "mterm_vectors",
    ],
    "u_aggs_histograms": [
        "bm25_histogram", "bm25_histogram_degenerate", "bm25_stats_agg",
        "significant_terms", "significant_terms_degenerate",
        "bm25_extended_stats", "bm25_percentile_ranks",
    ],
    "u_aggs_buckets": [
        "bm25_cardinality", "bm25_cardinality_degenerate",
        "bm25_filters_agg", "bm25_range_agg", "bm25_top_hits",
        "bm25_top_hits_degenerate", "bm25_rare_terms",
        "bm25_composite_agg", "bm25_composite_agg_after",
    ],
    "u_aggs_matrix": [
        "bm25_multi_terms", "bm25_adjacency_matrix", "bm25_weighted_avg",
        "bm25_matrix_stats", "bm25_boxplot", "bm25_boxplot_degenerate",
        "sampler_terms", "sampler_diversified", "bm25_random_score",
    ],
    "u_rank_features": [
        "bm25_fvf_log1p", "bm25_fvf_sqrt", "bm25_rank_feature",
        "bm25_rank_feature_sigmoid", "bm25_decay_gauss",
        "bm25_decay_linear", "distance_feature_topk",
        "distance_feature_degenerate", "sparse_vector_topk",
        "linear_hybrid", "ltr_rescore",
    ],
    "u_events_pipeline": [
        "events_pipeline_aggs", "events_cum_cardinality",
        "events_zscore_outliers", "events_varwidth_histogram",
        "events_ses_forecast", "events_bucket_sort",
        "events_percentiles_bucket", "events_change_point",
        "events_moving_median", "events_hour_profile",
        "events_heavy_hitters",
    ],
    "u_events_extra": [
        "events_auto_histogram", "events_bucket_stats",
        "events_serial_diff", "events_bucket_script", "events_date_range",
        "events_rate", "events_top_metrics", "events_normalize_pct",
        "events_normalize_01", "events_session_graph", "events_pagerank",
        "t_test_lang",
    ],
    "u_sketches_sampling": [
        "hll_distinct", "hll_distinct_raw", "bloom_membership",
        "random_sampler", "dsir_weights", "dsir_sample",
        "terms_partition",
    ],
    "u_ann_quantized": [
        "sq_codes", "sq_cosine_topk", "pq_codes", "pq_adc_topk",
        "ivfpq_topk", "ivfpq_residual_topk", "pq_refine_topk",
        "bq_codes", "bq_hamming_topk", "bq_refine_topk", "mrl_topk",
        "mrl_refine_topk",
    ],
    "u_ann_eval": [
        "ann_recall", "ann_recall_bq", "ann_recall_mrl",
        "embedding_drift", "cosine_topk_label", "cosine_topk_lang",
        "snapshot_kl", "term_drift",
    ],
    "u_geo_ip": [
        "geo_bbox", "geo_distance_topk", "geo_grid", "geo_bounds",
        "geo_centroid", "geo_distance_rings", "geohash_cells",
        "geo_line", "ip_range_buckets", "subnet_topk",
    ],
    "u_textstats": [
        "string_stats", "doclen_mad", "zipf_fit", "ngram_diversity",
        "bpe_merges", "bpe_symbols", "readability",
        "tokenizer_fertility", "frequent_pairs", "lang_id_confusion",
        "seq_len_histogram", "source_diversity",
    ],
}

_FLOAT_TYPES = {"DOUBLE", "FLOAT", "REAL", "FLOAT4", "FLOAT8"}


def _kind(duck_type: str) -> str:
    base = duck_type.split("(")[0].strip().upper()
    if base in _FLOAT_TYPES:
        return "float"
    if base in {
        "VARCHAR", "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
        "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT", "BOOLEAN",
    }:
        return "str"
    raise SystemExit(
        f"unsupported oracle column type {duck_type!r} — extend the "
        "kind mapping (and its Spark twin in unionkeys.py) first"
    )


def main() -> int:
    import __spark_entry__ as e

    osql = e.oracle_sql()
    members = [m for ms in GROUPS.values() for m in ms]
    assert len(members) == len(set(members)), "member in two groups"
    missing = [m for m in members if m not in osql]
    assert not missing, f"members without oracle SQL: {missing}"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spec: dict[str, list[tuple[str, str]]] = {}
    for m in members:
        sql = osql[m].rstrip().rstrip(";")
        rows = con.execute(f"DESCRIBE ({sql})").fetchall()
        cols = sorted((name, _kind(dtype)) for name, dtype, *_ in rows)
        spec[m] = cols

    lines = [
        '"""AUTO-GENERATED by tools/make_union_spec.py — do not edit.',
        "",
        "Union-gate-key spec: GROUPS maps each union key to its member",
        "registry keys; SPEC maps each member to its oracle output",
        "columns (sorted by name) with a cross-engine slot kind.",
        "Regenerate with: python tools/make_union_spec.py",
        '"""',
        "",
        "GROUPS = {",
    ]
    for g, ms in GROUPS.items():
        lines.append(f"    {g!r}: [")
        for m in ms:
            lines.append(f"        {m!r},")
        lines.append("    ],")
    lines.append("}")
    lines.append("")
    lines.append("SPEC = {")
    for m, cols in spec.items():
        lines.append(f"    {m!r}: {cols!r},")
    lines.append("}")
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    n = len(members)
    print(f"wrote {OUT}: {len(GROUPS)} groups, {n} members")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
