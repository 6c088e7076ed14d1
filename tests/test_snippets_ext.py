

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


# --- phrase suggester --------------------------------------------------------


def _ps_index(spark, texts):
    from tests.test_search_after import _index

    return _index(spark, texts)


def test_phrase_suggest_context_beats_df(spark):
    """'grape tble' must correct tble -> table (the bigram 'grape
    table' exists) even though 'cable' has HIGHER df — the context
    ranking did_you_mean cannot express."""
    from distributedcodesearchengine_spark.operators.snippets import (
        phrase_suggest,
    )

    texts = (
        ["grape table here"] * 3
        + ["tale cord spool"] * 8           # tale: df 8 > table: df 3
        + ["grape vine yard"] * 2
    )
    idx = _ps_index(spark, texts)
    rows = phrase_suggest(idx, "grape tble", k=3, max_cands=2).collect()
    assert rows[0]["suggestion"] == "grape table"
    assert rows[0]["n_changed"] == 1
    # and the per-token df-ranked pick would have chosen cable
    from distributedcodesearchengine_spark.operators.snippets import (
        did_you_mean,
    )

    dym = {r["original"]: r["suggestion"]
           for r in did_you_mean(idx, "grape tble").collect()}
    assert dym["tble"] == "tale"


def test_phrase_suggest_scores_match_python(spark):
    import math

    import pytest

    from distributedcodesearchengine_spark.operators.snippets import (
        phrase_suggest,
    )

    texts = ["alpha beta gamma", "alpha beta", "beta gamma delta"]
    idx = _ps_index(spark, texts)
    rows = phrase_suggest(idx, "alpha beta", k=5, max_cands=1).collect()
    toks = [t.split() for t in texts]
    total = sum(len(t) for t in toks)
    vocab = len({w for t in toks for w in t})
    uni = {}
    big = {}
    for t in toks:
        for w_ in t:
            uni[w_] = uni.get(w_, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1

    def score(ws):
        s = math.log((uni.get(ws[0], 0) + 1.0) / float(total + vocab))
        for i in range(1, len(ws)):
            s += math.log(
                (big.get((ws[i - 1], ws[i]), 0) + 1.0)
                / (uni.get(ws[i - 1], 0) + float(vocab))
            )
        return s

    got = {r["suggestion"]: r["score"] for r in rows}
    for sugg, sc in got.items():
        assert sc == pytest.approx(score(tuple(sugg.split())), abs=1e-6)
    # the identity correction ranks first (it IS a corpus bigram)
    assert rows[0]["suggestion"] == "alpha beta"
    assert rows[0]["n_changed"] == 0


def test_phrase_suggest_guards(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.snippets import (
        phrase_suggest,
    )

    idx = _ps_index(spark, ["aa bb"])
    assert phrase_suggest(idx, "!! ??").count() == 0
    with pytest.raises(ValueError):
        phrase_suggest(idx, "aa bb aa bb aa bb")  # > 5 tokens
    with pytest.raises(ValueError):
        phrase_suggest(idx, "aa", k=0)


def test_completion_context_slice(spark):
    """The lang context restricts the continuation statistics to the
    category slice — the same prefix completes differently per lang."""
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.snippets import (
        completion_suggest,
    )

    rows = [
        (0, "open table now", "en"),
        (1, "open table now", "en"),
        (2, "open tango club", "de"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).select("doc_id", "lang", tokenize_udf("text").alias("tokens"))
    en = [r["suggestion"]
          for r in completion_suggest(docs, "open ta", lang="en").collect()]
    de = [r["suggestion"]
          for r in completion_suggest(docs, "open ta", lang="de").collect()]
    assert en == ["open table"]
    assert de == ["open tango"]
    # no context = union statistics
    both = {r["suggestion"]
            for r in completion_suggest(docs, "open ta").collect()}
    assert both == {"open table", "open tango"}
