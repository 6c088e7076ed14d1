

# --- completion suggester ----------------------------------------------------


def _comp_docs(spark, texts):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return d.select("doc_id", tokenize_udf("text").alias("tokens"))


def test_completion_bigram_ranked_by_count(spark):
    from distributedcodesearchengine_spark.operators.snippets import (
        completion_suggest,
    )

    texts = [
        "open table open tab open table",
        "open tabs near open table",
        "close table open tango",
    ]
    docs = _comp_docs(spark, texts)
    rows = completion_suggest(docs, "open ta", k=10).collect()
    got = [(r["suggestion"], r["cnt"]) for r in rows]
    # corpus bigrams starting 'open ta': open table x3, open tab x1,
    # open tabs x1, open tango x1 -> count desc, suggestion asc
    assert got == [
        ("open table", 3), ("open tab", 1), ("open tabs", 1),
        ("open tango", 1),
    ]
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]


def test_completion_unigram_ranked_by_ctf(spark):
    from distributedcodesearchengine_spark.operators.snippets import (
        completion_suggest,
    )

    # 'tab' occurs 3x in ONE doc; 'table' once in each of two docs —
    # ctf ranking puts 'tab' first where term_suggest's df would not
    texts = ["tab tab tab", "table zebra", "table yak"]
    docs = _comp_docs(spark, texts)
    got = [(r["suggestion"], r["cnt"])
           for r in completion_suggest(docs, "ta", k=10).collect()]
    assert got == [("tab", 3), ("table", 2)]


def test_completion_context_restricts(spark):
    from distributedcodesearchengine_spark.operators.snippets import (
        completion_suggest,
    )

    texts = ["alpha table", "beta table", "alpha tango"]
    docs = _comp_docs(spark, texts)
    got = [r["suggestion"]
           for r in completion_suggest(docs, "alpha ta", k=10).collect()]
    assert got == ["alpha table", "alpha tango"]  # 'beta table' excluded


def test_completion_empty_inputs(spark):
    from distributedcodesearchengine_spark.operators.snippets import (
        completion_suggest,
    )

    docs = _comp_docs(spark, ["alpha beta"])
    assert completion_suggest(docs, "!! ??", k=5).count() == 0
    # 1-char prefix never tokenizes -> not completable
    assert completion_suggest(docs, "a", k=5).count() == 0
