"""Fuzzy query tests (operators/fuzzy)."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import get_documents_index
from distributedcodesearchengine_spark.operators.fuzzy import (
    bm25_fuzzy_topk,
    expand_fuzzy,
    is_fuzzy_query,
    parse_fuzzy_query,
)


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return get_documents_index(spark, sf_dir)


def test_parse():
    assert parse_fuzzy_query("dup sow~1") == (["dup"], [("sow", 1)])
    assert parse_fuzzy_query("tble~") == ([], [("tble", 1)])  # default d=1
    assert parse_fuzzy_query("word~2") == ([], [("word", 2)])
    assert parse_fuzzy_query("word~3") == (["word"], [])  # d capped at 2
    assert is_fuzzy_query("sow~") and not is_fuzzy_query("sow")


def test_symspell_candidates_equal_levenshtein_scan(idx):
    """d=1 deletion-key expansion == brute dictionary levenshtein."""
    got = [t for t, _ in expand_fuzzy(idx, "sow", 1, 100)]
    rows = idx.terms.select(
        "term", "df", F.levenshtein("term", F.lit("sow")).alias("d")
    ).where(F.col("d") <= 1).collect()
    want = [t for t, _, _ in sorted(
        ((r["term"], r["df"], r["d"]) for r in rows),
        key=lambda x: (x[2], -x[1], x[0]),
    )]
    assert got == want and len(got) >= 2  # multi-term correction


def test_exact_term_ranks_first(idx):
    got = [t for t, _ in expand_fuzzy(idx, "scan", 1, 10)]
    assert got and got[0] == "scan"


def test_fuzzy_equals_expanded_or_query(idx):
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk

    terms = [t for t, _ in expand_fuzzy(idx, "sow", 1)]
    explicit = " ".join(["dup"] + terms)
    a = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_fuzzy_topk(idx, "dup sow~1", k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_topk(idx, explicit, k=10).collect()]
    assert a == b


def test_symspell_d2_equals_levenshtein_scan(idx):
    """d=2 two-deletion-key probe == brute dictionary levenshtein scan
    (SymSpell depth-2 completeness, now that d=2 no longer scans)."""
    got = [t for t, _ in expand_fuzzy(idx, "tble", 2, 100)]
    rows = idx.terms.select(
        "term", "df", F.levenshtein("term", F.lit("tble")).alias("d")
    ).where(F.col("d") <= 2).collect()
    want = [t for t, _, _ in sorted(
        ((r["term"], r["df"], r["d"]) for r in rows),
        key=lambda x: (x[2], -x[1], x[0]),
    )]
    assert got == want and len(got) >= 2


def test_query_plan_probes_not_explodes(idx):
    """The query-time candidate plan probes the cached deletion-key
    relation — the full-vocab explode happens once at relation-build
    time, never per query (no Generate in the probe plan)."""
    from distributedcodesearchengine_spark.operators.fuzzy import (
        _deletions_py,
        get_fuzzy_keys,
    )
    from distributedcodesearchengine_spark.plans.audit import explain_str

    keyed = get_fuzzy_keys(idx)  # warm the cache (builds + persists)
    keyed.count()
    qkeys = _deletions_py("sow", 1)
    probe = keyed.where(F.col("key").isin(qkeys))
    plan = explain_str(probe)
    assert "InMemoryTableScan" in plan or "Scan parquet" in plan, plan[:3000]
    # the cached relation's own BUILD lineage (below the cache scan)
    # legitimately contains the one-time explode; the executed portion
    # above the cache scan must not
    executed_prefix = plan.split("InMemoryTableScan")[0]
    assert "Generate" not in executed_prefix, plan[:3000]


def test_persisted_fuzzy_keys_stage_roundtrip(spark, tmp_path):
    """fuzzy_index=True writes the deletion-key relation as a build
    stage; load_index attaches it and fuzzy queries point-probe the
    parquet artifact (partition-pruned on key_pfx) with results
    identical to the lazily-built relation."""
    from distributedcodesearchengine_spark.build.checkpoint import (
        build_index_persisted,
        load_index,
    )
    from distributedcodesearchengine_spark.plans.audit import explain_str
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    base = str(tmp_path / "fzidx")
    pages = generate_pages(spark, 120, seed=5, parts=2)
    built = build_index_persisted(spark, pages, base, fuzzy_index=True)
    assert "fuzzy_keys" in built.extras
    idx2 = load_index(spark, base)
    assert "fuzzy_keys" in idx2.extras
    got = expand_fuzzy(idx2, "jsonn", 1, 10)
    # reference: brute levenshtein over the persisted dictionary
    rows = idx2.terms.select(
        "term", "df", "idf", F.levenshtein("term", F.lit("jsonn")).alias("d")
    ).where(F.col("d") <= 1).collect()
    want = [(r["term"], float(r["idf"])) for r in sorted(
        rows, key=lambda r: (r["d"], -r["df"], r["term"])
    )][:10]
    assert got == want and got
    # probe plan partition-prunes the persisted artifact
    from distributedcodesearchengine_spark.operators.fuzzy import _deletions_py

    qkeys = _deletions_py("jsonn", 1)
    pfxs = sorted({k[:1] for k in qkeys})
    probe = idx2.extras["fuzzy_keys"].where(
        F.col("key_pfx").isin(pfxs) & F.col("key").isin(qkeys)
    )
    plan = explain_str(probe)
    assert "PartitionFilters" in plan and "key_pfx" in plan, plan[:3000]


def test_api_routing(spark, idx):
    from distributedcodesearchengine_spark.api import SearchEngine

    eng = SearchEngine(idx)
    got = eng.search("dup sow~1", limit=5).collect()
    want = bm25_fuzzy_topk(idx, "dup sow~1", k=5).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_max_dist_beyond_key_depth_refused(idx):
    """The deletion-key relation is complete only to its build depth —
    a deeper probe would silently under-match, so it must refuse."""
    import pytest as _pytest

    from distributedcodesearchengine_spark.operators.fuzzy import expand_fuzzy

    with _pytest.raises(ValueError, match="deletion-key depth"):
        expand_fuzzy(idx, "duplcate", max_dist=3)


# --- did_you_mean (whole-query spell correction) ----------------------------


def test_did_you_mean_three_regimes(idx):
    from distributedcodesearchengine_spark.operators.snippets import did_you_mean

    rows = did_you_mean(idx, "dup tble zzzzqqq", max_dist=1).collect()
    by_pos = {r.pos: r for r in rows}
    assert len(rows) == 3
    # exact: in-dictionary token is its own best candidate at dist 0
    assert (by_pos[0].suggestion, by_pos[0].dist, by_pos[0].corrected) == (
        "dup", 0, 0)
    assert by_pos[0].df > 0
    # corrected: 'tble' -> 'table' at dist 1
    assert (by_pos[1].suggestion, by_pos[1].dist, by_pos[1].corrected) == (
        "table", 1, 1)
    # no candidate: token kept, df 0, dist -1
    assert (by_pos[2].suggestion, by_pos[2].df, by_pos[2].dist,
            by_pos[2].corrected) == ("zzzzqqq", 0, -1, 0)
    corrected_query = " ".join(
        r.suggestion for r in sorted(rows, key=lambda r: r.pos))
    assert corrected_query == "dup table zzzzqqq"


def test_did_you_mean_ties_break_by_df_then_term(idx):
    from distributedcodesearchengine_spark.operators.snippets import did_you_mean

    # 'sow' has multiple dist-1 dictionary candidates (sort, slow, row);
    # the winner must match the brute scan's (dist, df desc, term asc)
    row = did_you_mean(idx, "sow", max_dist=1).first()
    rows = idx.terms.select(
        "term", "df", F.levenshtein("term", F.lit("sow")).alias("d")
    ).where(F.col("d") <= 1).collect()
    want = sorted(
        ((r["term"], r["df"]) for r in rows),
        key=lambda x: (-x[1], x[0]),
    )[0][0]
    assert row.suggestion == want and row.corrected == 1


def test_did_you_mean_guards(idx):
    from distributedcodesearchengine_spark.operators.snippets import did_you_mean

    assert did_you_mean(idx, "!! ??").count() == 0
    with pytest.raises(ValueError, match="deletion-key depth"):
        did_you_mean(idx, "dup", max_dist=5)
