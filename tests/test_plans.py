"""Physical-plan shape invariants (.explain audit, SURVEY §4):

- query-term filters are PUSHED to the tf parquet scan
- the query side is BROADCAST (never a shuffled join of the big side)
- top-k compiles to TakeOrderedAndProject (no global sort)
- WAND postings reads prune term_bucket PARTITIONS
- the docs scan for lang-filtered zero-backfill prunes lang partitions
"""

import pytest

from distributedcodesearchengine_spark.build.checkpoint import (
    build_index_persisted,
    load_index,
)
from distributedcodesearchengine_spark.operators.scorer import (
    bm25_topk,
    query_term_weights,
    score_matched,
)
from distributedcodesearchengine_spark.operators.wand import _query_postings
from distributedcodesearchengine_spark.plans.audit import assert_plan, explain_str
from distributedcodesearchengine_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    pages = generate_pages(spark, 300, seed=2, parts=3)
    build_index_persisted(
        spark, pages, d, block_size=32, target_row_postings=128, n_buckets=8
    )
    return load_index(spark, d)


def test_term_filter_pushdown_and_broadcast(pidx):
    qw = query_term_weights(pidx, "parse json")
    scored = score_matched(pidx, qw)
    plan = assert_plan(scored, must_contain=["BroadcastHashJoin", "PushedFilters"])
    # the In(term, ...) predicate must reach the parquet scan
    assert "In(term" in plan or "in(term" in plan.lower(), plan[:4000]


def test_topk_is_take_ordered(pidx):
    top = bm25_topk(pidx, "parse json", k=10)
    assert_plan(top, must_contain=["TakeOrderedAndProject"])


def test_wand_prunes_term_buckets(pidx):
    prows = _query_postings(pidx, ["parse", "json"])
    plan = explain_str(prows)
    assert "term_bucket" in plan
    # partition filters present on the scan (pruned read, not full scan)
    assert "PartitionFilters: [" in plan and "term_bucket" in plan.split(
        "PartitionFilters"
    )[1][:200], plan[:4000]


def test_build_docs_single_shuffle_single_udf(spark):
    """Regression guard for the round-2 doc-id rewrite (updated r06 for
    the mapInArrow extract+tokenize pass): the docs build plan must
    contain exactly ONE exchange (hash on _pid) and exactly ONE Python
    eval node — repartitionByRange would re-execute the extract+tokenize
    pass in its sampling pass and the pid window would add a second
    exchange."""
    from distributedcodesearchengine_spark.operators.stats import build_docs

    pages = generate_pages(spark, 50, seed=1, parts=2)
    plan = explain_str(build_docs(pages), mode="simple")
    assert "rangepartitioning" not in plan, plan[:4000]
    # above the cached (already hash-clustered) relation: the rank
    # window and the Arrow pass run with NO further exchange, one eval
    live = plan.split("InMemoryRelation")[0]
    assert "Exchange" not in live, plan[:4000]
    n_eval = (
        live.count("ArrowEvalPython")
        + live.count("BatchEvalPython")
        + live.count("MapInArrow")
    )
    assert n_eval == 1, plan[:4000]
    # the cached subtree holds the single pid hash shuffle and no UDF
    cached = plan.split("InMemoryRelation", 1)[1].split("== Initial Plan ==")[0]
    assert cached.count("Exchange hashpartitioning") == 1, plan[:4000]
    assert "EvalPython" not in cached and "MapInArrow" not in cached, plan[:4000]


def test_term_suggest_prunes_prefix_partition(pidx):
    """The persisted term dictionary is partitioned by leading char and
    term-sorted within partitions: a suggest probe must partition-prune
    on term_pfx AND push the StartsWith(term) predicate to the scan
    (VERDICT r2 item 4 — no full-vocab scan for autocomplete)."""
    from distributedcodesearchengine_spark.operators.snippets import term_suggest

    sug = term_suggest(pidx.terms, "al", k=5)
    plan = explain_str(sug)
    assert "PartitionFilters" in plan
    assert "term_pfx" in plan.split("PartitionFilters")[1][:250], plan[:4000]
    assert "StartsWith(term,al)" in plan.replace(" ", "").replace("'", ""), plan[:4000]
    # correctness unchanged: matches the unpartitioned in-memory path
    rows = [(r["term"], r["df"]) for r in sug.collect()]
    base = [
        (r["term"], r["df"])
        for r in term_suggest(pidx.terms.drop("term_pfx"), "al", k=5).collect()
    ]
    assert rows == base and rows
    assert all(t.startswith("al") for t, _ in rows)


def test_docs_lang_partition_pruning(pidx):
    from pyspark.sql import functions as F

    d = pidx.docs.where(F.col("lang") == "de")
    plan = explain_str(d)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]


def test_curation_funnel_plan_shape(spark):
    """The curation ops must keep their scale story in the physical
    plan: the decontamination eval-set side is BROADCAST (never a
    shuffled join against the corpus-sized gram stream), the funnel has
    no cartesian product and no sort-merge join, and the mixture
    sample's keep decision is a pure per-row filter (zero Exchange)."""
    from pyspark.sql import Row

    from distributedcodesearchengine_spark.operators import pipeline as pl

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"t {i}", lang="en", tokens=[f"w{j}" for j in range(30)])
            for i in range(40)
        ],
        "doc_id long, text string, lang string, tokens array<string>",
    )
    decon = explain_str(pl.decontaminate(docs))
    assert "BroadcastHashJoin" in decon, decon[:4000]
    assert "SortMergeJoin" not in decon and "Cartesian" not in decon, decon[:4000]

    funnel = explain_str(
        pl.curate_corpus(docs, min_tokens=5), mode="simple"
    )
    assert "Cartesian" not in funnel and "SortMergeJoin" not in funnel, funnel[:4000]

    sample = explain_str(docs.filter(pl.mixture_keep_col()).select("doc_id"))
    assert "Exchange" not in sample, sample[:4000]
    assert "EvalPython" not in sample, sample[:4000]


def test_thinning_passes_plan_shapes(spark):
    """The web-corpus thinning passes keep their documented shapes: no
    cartesian/nested-loop join anywhere, the count-join skeleton of the
    fingerprint passes stays a hash/broadcast join, and domain_cap's
    under-cap branch carries no window (only the hot branch sorts)."""
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators import dedup as dd
    from distributedcodesearchengine_spark.operators import pipeline as pl

    docs = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g h", "en", f"s{i % 3}")
         for i in range(30)],
        "doc_id long, text string, lang string, source string",
    )
    toks = docs.select("doc_id", tokenize_udf("text").alias("tokens"))
    banned = ("CartesianProduct", "BroadcastNestedLoopJoin")
    assert_plan(dd.dedup_lines_augmented(docs), must_not_contain=banned)
    assert_plan(dd.dup_spans(toks), must_not_contain=banned)
    assert_plan(dd.dup_spans(toks, anchor_mod=4), must_not_contain=banned)
    assert_plan(pl.domain_cap(docs), must_not_contain=banned)
    # the under-cap pass-through branch must not sort: exactly ONE
    # Window (the hot branch's rank) in the applied plan
    import re

    plan = explain_str(pl.apply_domain_cap(docs))
    n_window_ops = len(re.findall(r"\bWindow \(\d+\)", plan))
    assert n_window_ops == 1, plan[:4000]
    # only the (tiny) over-cap key set is ever broadcast; the under-cap
    # majority side is that set's anti-join — no '_n <= cap' key filter
    # may exist anywhere (at web scale under-cap domains are the bulk
    # of all keys and broadcasting them is the OOM). The only <= cap
    # comparison left is the hot branch's _rn window filter.
    assert not re.search(r"_n#\d+L? <= 7", plan), plan[:4000]


def test_exploration_plan_shapes(spark):
    """Facets in the healthy regime: term filter pushed to the tf scan,
    query side broadcast (inherited from score_matched), no cartesian."""
    from distributedcodesearchengine_spark.operators.explore import bm25_facets
    from tests.test_explore import _index

    idx = _index(
        spark,
        [("rare words here indeed", "en", "s1", "a"),
         ("rare other tokens again", "de", "s2", "b"),
         ("plain unrelated stuff here", "en", "s3", "c")],
    )
    out = bm25_facets(idx, "rare")
    assert_plan(
        out,
        must_contain=["BroadcastHashJoin"],
        must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )


def test_round3_operators_have_no_cartesian(pidx, spark, sf_dir):
    """None of the round's new operators may plan a cartesian product
    or nested-loop join; the broadcast claims hold."""
    from distributedcodesearchengine_spark.entry_queries import docs_with_tokens
    from distributedcodesearchengine_spark.operators.evalrank import (
        eval_ranking,
        relevance_labels,
    )
    from distributedcodesearchengine_spark.operators.explore import (
        bm25_collapse_topk,
    )
    from distributedcodesearchengine_spark.operators.fields import (
        FieldSpec,
        bm25f_topk,
    )
    from distributedcodesearchengine_spark.operators.percolate import percolate
    from distributedcodesearchengine_spark.operators.scorer import (
        bm25_topk_batch,
        bm25_topk_range,
        explain_topk,
    )
    from distributedcodesearchengine_spark.operators.urltools import (
        messy_url_col,
        url_dedup_summary,
    )
    from pyspark.sql import functions as F

    d = docs_with_tokens(spark, sf_dir)
    fields = [FieldSpec("title", 2.0, 0.75), FieldSpec("body", 1.0, 0.75)]
    dd = d.select(
        "doc_id",
        F.substring("text", 1, 60).alias("title"),
        F.col("text").alias("body"),
    )
    queries = {1: "dup", 2: "dup table"}
    plans = {
        "bm25f": bm25f_topk(dd, "dup table", fields, k=5),
        "explain": explain_topk(pidx, "parse json", k=5),
        "range": bm25_topk_range(pidx, "parse json", k=5, ranges={"doc_len": (10, 400)}),
        "collapse": bm25_collapse_topk(pidx, "parse json", collapse="site", k=5),
        "percolate": percolate(d, queries),
        "url_dedup": url_dedup_summary(
            d.select("doc_id", messy_url_col().alias("url"))
        ),
        "eval": eval_ranking(
            bm25_topk_batch(_docs_index(spark, sf_dir), queries, k=5),
            relevance_labels(d, queries),
        ),
    }
    # bm25f and eval carry the engine's deliberate 1-row scalar
    # crossJoin (the broadcast avg-idf / totals fold), which Spark
    # plans as a BroadcastNestedLoopJoin of a 1-row side — allowed
    # there, forbidden everywhere else; a true CartesianProduct is
    # forbidden everywhere
    scalar_cross = {"bm25f", "eval"}
    for name, df in plans.items():
        forbid = ["CartesianProduct"]
        if name not in scalar_cross:
            forbid.append("BroadcastNestedLoopJoin")
        assert_plan(df, must_not_contain=forbid), name
    # the percolate query side must broadcast
    assert "BroadcastHashJoin" in explain_str(plans["percolate"]), "percolate"


def _docs_index(spark, sf_dir):
    from distributedcodesearchengine_spark.entry_queries import (
        get_documents_index,
    )

    return get_documents_index(spark, sf_dir)


def test_round4_operators_plan_shapes(spark, sf_dir):
    """significant_terms: no cartesian, no vocab broadcast on the
    terms-join side (the dictionary joins via shuffle; the only allowed
    BNLJ is the 1-row |fg| scalar fold). search_after: the top-k stays
    TakeOrderedAndProject at limit k regardless of cursor depth — the
    whole point of keyset paging."""
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk_after
    from distributedcodesearchengine_spark.operators.significant import (
        significant_terms,
    )

    idx = _docs_index(spark, sf_dir)
    sig = significant_terms(idx, "dup table", k=20, min_fg=2)
    plan = explain_str(sig)
    assert "CartesianProduct" not in plan
    # BNLJs are allowed ONLY in the engine's 1-row scalar-fold shape
    # (Cross BuildRight of a 1-row aggregate: the |fg| fold here plus
    # the terms relation's own avg-idf folds) — a genuine nested-loop
    # theta join would plan as Inner/BuildLeft with a condition
    import re

    for line in re.findall(r"BroadcastNestedLoopJoin[^\n(]*\([0-9]+\)", plan):
        assert "Cross BuildRight" in line, (line, plan[:4000])

    after = bm25_topk_after(idx, "dup table", k=7, after=(0.5, 123))
    aplan = explain_str(after)
    assert "CartesianProduct" not in aplan
    # the keyset page's top-k is a limit-7 TakeOrdered — never k+offset
    # (formatted explain carries the limit in the node details:
    # "TakeOrderedAndProject\nInput...\nArguments: 7, [...]")
    m = re.search(
        r"\(\d+\) TakeOrderedAndProject\n[^\n]*\nArguments: (\d+),", aplan
    )
    assert m and m.group(1) == "7", aplan[:4000]


def test_new_agg_family_plan_shapes(spark, pidx):
    """Round-4-late aggregation family: no cartesian anywhere; the
    composite page compiles to a TakeOrdered at exactly its size (page
    N costs page 1); rare_terms' k-cut is a TakeOrdered; every BNLJ is
    the 1-row scalar-fold shape (Cross BuildRight)."""
    import re

    from distributedcodesearchengine_spark.operators.aggs import (
        bm25_composite_agg,
        bm25_filters_agg,
        bm25_range_agg,
        bm25_rare_terms,
        bm25_top_hits,
    )
    from distributedcodesearchengine_spark.operators.decay import (
        bm25_decay_topk,
    )

    plans = {
        "filters": bm25_filters_agg(
            pidx, "parse json", {"en": ("lang", "en")}),
        "range": bm25_range_agg(pidx, "parse json", cuts=(50, 200)),
        "top_hits": bm25_top_hits(pidx, "parse json", key="lang"),
        "rare": bm25_rare_terms(pidx, "parse json", max_df=10**9, k=5),
        "composite": bm25_composite_agg(
            pidx, "parse json", keys=("lang",), size=4),
        "decay": bm25_decay_topk(pidx, "parse json", origin=100, scale=50),
    }
    for name, df in plans.items():
        plan = explain_str(df)
        assert "CartesianProduct" not in plan, (name, plan[:2000])
        for line in re.findall(
            r"BroadcastNestedLoopJoin[^\n(]*\([0-9]+\)", plan
        ):
            assert "Cross BuildRight" in line, (name, line)
    cplan = explain_str(plans["composite"])
    m = re.search(
        r"\(\d+\) TakeOrderedAndProject\n[^\n]*\nArguments: (\d+),", cplan
    )
    assert m and m.group(1) == "4", cplan[:4000]
    rplan = explain_str(plans["rare"])
    assert "TakeOrderedAndProject" in rplan


# --- continuation-wave plan shapes -------------------------------------------


def test_maxsim_plan_no_joins_one_agg(spark):
    """MaxSim: the multi-vector score must be scan -> codegen dots ->
    ONE hash aggregate -> TakeOrdered. No join of any kind exists."""
    from distributedcodesearchengine_spark.functions.embed import (
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.pipeline import maxsim_topk

    docs = spark.createDataFrame(
        [(i, f"some text number {i} here") for i in range(50)],
        "doc_id long, text string",
    ).select("doc_id", "text", tokenize_udf("text").alias("tokens"))
    qvs = [mock_embed_text(w, 64) for w in ("some", "text")]
    assert_plan(
        maxsim_topk(docs, qvs, k=5),
        must_contain=["TakeOrderedAndProject"],
        must_not_contain=["CartesianProduct", "SortMergeJoin",
                          "BroadcastNestedLoopJoin"],
    )


def test_distance_feature_plan_no_extra_join(pidx):
    """distance_feature adds a per-row expression to the kept chain —
    the plan must contain NO join beyond the kept chain's own
    broadcast joins and no cartesian/BNLJ anywhere."""
    from distributedcodesearchengine_spark.operators.geo import (
        bm25_distance_feature_topk,
    )

    df = bm25_distance_feature_topk(pidx, "parse json", 40.0, -74.0, k=5)
    assert_plan(
        df,
        must_contain=["TakeOrderedAndProject"],
        must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )


def test_frequent_pairs_plan_no_cartesian(spark):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.textstats import (
        frequent_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "aa bb cc dd") for i in range(20)], "doc_id long, text string"
    ).select("doc_id", tokenize_udf("text").alias("tokens"))
    assert_plan(
        frequent_pairs(docs, min_support=2, max_items=10, k=5),
        must_contain=["TakeOrderedAndProject", "BroadcastHashJoin"],
        must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )


def test_sparse_vector_plan_pushdown(pidx):
    from distributedcodesearchengine_spark.operators.scorer import (
        contribution_col_sparse,
        score_matched,
    )

    scored = score_matched(
        pidx, [("parse", 1.0, 2.0), ("json", 1.0, 1.0)],
        contribution_col_sparse(),
    )
    plan = assert_plan(scored, must_contain=["BroadcastHashJoin"])
    assert "In(term" in plan or "in(term" in plan.lower()
