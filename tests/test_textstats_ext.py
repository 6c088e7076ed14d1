

# --- readability (Flesch / Flesch-Kincaid) -----------------------------------


def test_readability_hand_computed(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.textstats import readability

    # en: "The cat sat. It ran!" -> words 5... write exactly:
    t0 = "The cat sat on a mat. It ran away!"   # 9 words, 2 sentences
    t1 = "Readability approximations everywhere."  # 3 words, 1 sentence
    docs = spark.createDataFrame(
        [(0, t0, "en"), (1, t1, "en"), (2, "no terminal punctuation here", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in readability(docs).collect()}

    def _syll(s):
        import re

        return len(re.findall(r"[aeiouy]+", s.lower()))

    en_words = 9 + 3
    en_sents = 2 + 1
    en_syll = _syll(t0) + _syll(t1)
    r = out["en"]
    assert (r["n_docs"], r["n_words"], r["n_sentences"], r["n_syllables"]) == (
        2, en_words, en_sents, en_syll)
    wps = en_words / en_sents
    spw = en_syll / en_words
    assert r["flesch"] == pytest.approx(
        206.835 - 1.015 * wps - 84.6 * spw, abs=1e-6)
    assert r["fk_grade"] == pytest.approx(
        0.39 * wps + 11.8 * spw - 15.59, abs=1e-6)
    # the de doc has no [.!?] -> sentence floor 1
    assert out["de"]["n_sentences"] == 1


def test_readability_simple_beats_complex(spark):
    from distributedcodesearchengine_spark.operators.textstats import readability

    simple = " ".join(["The cat sat."] * 20)
    complex_ = " ".join(
        ["Extraordinarily convoluted municipalities reorganize "
         "internationalization infrastructures."] * 20
    )
    docs = spark.createDataFrame(
        [(0, simple, "simple"), (1, complex_, "complex")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in readability(docs).collect()}
    assert out["simple"]["flesch"] > out["complex"]["flesch"]
    assert out["simple"]["fk_grade"] < out["complex"]["fk_grade"]


def test_readability_empty_lang_zero(spark):
    from distributedcodesearchengine_spark.operators.textstats import readability

    docs = spark.createDataFrame(
        [(0, "", "empty")], "doc_id long, text string, lang string"
    )
    r = readability(docs).collect()[0]
    assert r["n_words"] == 0 and r["flesch"] == 0.0 and r["fk_grade"] == 0.0


def test_ws_split_does_not_eat_x0B_letters(spark):
    """Regression: the \\x0B class member must reach the Java regex as
    a hex escape, not the literal chars x/0/B — 'approximations',
    '0day' and 'B2B' must each stay ONE whitespace word on BOTH
    engines."""
    import duckdb

    from distributedcodesearchengine_spark.operators.textstats import (
        readability,
        token_counts,
        token_counts_sql,
    )

    texts = ["approximations everywhere", "0day B2B exploit", "a\x0bb c"]
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r["ws_tokens"] for r in token_counts(docs).collect()}
    assert got == {0: 2, 1: 3, 2: 3}  # \x0b itself DOES split
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        {"doc_id": [0, 1, 2], "text": texts}))
    ora = {r[0]: int(r[1]) for r in con.execute(token_counts_sql()).fetchall()}
    assert {k: got[k] for k in ora} == ora
    # readability words use the same lane
    r = readability(docs).collect()[0]
    assert r["n_words"] == 2 + 3 + 3


# --- tokenizer fertility -----------------------------------------------------


def test_tokenizer_fertility_hand_computed(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.textstats import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [
            (0, "hello world", "en"),       # 2 tokens, 11 chars, 11 bytes
            (1, "naïve café", "fr"),        # 2 tokens, 10 chars, 12 bytes
            (2, "", "empty"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in tokenizer_fertility(docs).collect()}
    en = out["en"]
    assert (en["n_chars"], en["n_bytes"], en["n_tokens"]) == (11, 11, 2)
    assert en["chars_per_token"] == pytest.approx(5.5, abs=1e-6)
    fr = out["fr"]
    # ï and é are 2 UTF-8 bytes each -> bytes > chars; the ASCII BPE
    # regex splits them out as their own tokens ("na|ï|ve", "caf|é")
    # -> 5 tokens: exactly the fertility penalty the metric surfaces
    assert fr["n_chars"] == 10 and fr["n_bytes"] == 12
    assert fr["n_tokens"] == 5
    assert fr["bytes_per_token"] == pytest.approx(12 / 5, abs=1e-6)
    assert fr["bytes_per_token"] > fr["chars_per_token"]
    # fr pays more tokens per char than en under the ASCII-centric
    # tokenizer — the underserved-language signal
    assert fr["chars_per_token"] < en["chars_per_token"]
    emp = out["empty"]
    assert emp["n_tokens"] == 0 and emp["chars_per_token"] == 0.0


# --- terms-agg partitioning --------------------------------------------------


def test_terms_partition_covers_and_disjoint(spark):
    import hashlib

    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.textstats import (
        terms_partition,
    )

    texts = [" ".join(f"term{i:02d}" for i in range(30))] * 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", tokenize_udf("text").alias("tokens"))
    P = 4
    parts = [
        {r["term"] for r in terms_partition(
            docs, partition=p, num_partitions=P, k=100).collect()}
        for p in range(P)
    ]
    # disjoint and covering the whole vocabulary
    allt = set().union(*parts)
    assert allt == {f"term{i:02d}" for i in range(30)}
    assert sum(len(s) for s in parts) == len(allt)
    # partition assignment matches the python md5 replication
    for p, s in enumerate(parts):
        for t in s:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % P
            assert h == p


def test_terms_partition_guard(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.textstats import (
        terms_partition,
    )

    with pytest.raises(ValueError):
        terms_partition(None, partition=8, num_partitions=8)


# --- categorize_text ---------------------------------------------------------


def test_categorize_text_groups_by_template(spark):
    from distributedcodesearchengine_spark.operators.textstats import (
        categorize_text,
    )

    docs = spark.createDataFrame(
        [
            (0, "Request 123 failed with code 500 after retry"),
            (5, "request 999 failed with code 404 something"),
            (2, "request 7 failed with code 301"),
            (3, "user login ok session 42"),
            (4, "user login ok session 77 extended"),
        ],
        "doc_id long, text string",
    )
    out = {r["category"]: r for r in categorize_text(docs, head_tokens=4).collect()}
    assert out["request # failed with"]["n_docs"] == 3
    assert out["request # failed with"]["min_doc_id"] == 0
    assert out["user login ok session"]["n_docs"] == 2
    # top-1 is the bigger category
    top = categorize_text(docs, head_tokens=4, k=1).collect()[0]
    assert top["category"] == "request # failed with"


def test_categorize_text_guard(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.textstats import (
        categorize_text,
    )

    with pytest.raises(ValueError):
        categorize_text(None, head_tokens=0)


# --- frequent_item_sets (pairs) ----------------------------------------------


def test_frequent_pairs_hand_computed(spark):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.textstats import (
        frequent_pairs,
    )

    texts = [
        "coffee milk sugar",
        "coffee milk",
        "coffee milk bread",
        "tea bread",
        "tea sugar coffee",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", tokenize_udf("text").alias("tokens"))
    out = {(r["t1"], r["t2"]): r["support"]
           for r in frequent_pairs(docs, min_support=2, max_items=50,
                                   k=50).collect()}
    # (coffee, milk) in docs 0,1,2 -> 3; (coffee, sugar) in 0,4 -> 2
    assert out[("coffee", "milk")] == 3
    assert out[("coffee", "sugar")] == 2
    # pairs below support are absent ((bread, tea) has 1... actually
    # docs 3 has tea+bread -> support 1 -> absent)
    assert ("bread", "tea") not in out
    # ordering keys are sorted within the pair
    assert all(a < b for a, b in out)


def test_frequent_pairs_apriori_cap(spark):
    """max_items excludes infrequent items from pair generation even
    if a pair of them would have reached support — the documented
    Apriori cut."""
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.textstats import (
        frequent_pairs,
    )

    texts = ["aa bb rare1 rare2"] * 3 + ["aa bb"] * 5
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", tokenize_udf("text").alias("tokens"))
    out = {(r["t1"], r["t2"]) for r in frequent_pairs(
        docs, min_support=3, max_items=2, k=50).collect()}
    assert out == {("aa", "bb")}


# --- lang-ID confusion matrix ------------------------------------------------


def test_lang_id_confusion_cells(spark):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.textstats import (
        lang_id_confusion,
    )

    # en stopword-heavy docs labeled en, one de-ish doc labeled de,
    # one en-looking doc MISLABELED de -> the off-diagonal cell
    texts = [
        ("the and of with here", "en"),
        ("the and of other words", "en"),
        ("der die und das ist", "de"),
        ("the and of confusing", "de"),
    ]
    docs = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(texts)],
        "doc_id long, text string, lang string",
    ).select("doc_id", "lang", "text", tokenize_udf("text").alias("tokens"))
    out = {(r["lang"], r["pred"]): r["n"]
           for r in lang_id_confusion(docs).collect()}
    assert out[("en", "en")] == 2
    assert out[("de", "de")] == 1
    assert out[("de", "en")] == 1
    assert sum(out.values()) == 4


# --- sequence-length histogram -----------------------------------------------


def test_seq_len_histogram_buckets(spark):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
    from distributedcodesearchengine_spark.operators.textstats import (
        seq_len_histogram,
    )

    texts = {
        0: "",                                   # 0 tokens -> [0, 1)
        1: "aa",                                 # 1 -> [1, 2)
        2: "aa bb",                              # 2 -> [2, 4)
        3: "aa bb cc",                           # 3 -> [2, 4)
        4: " ".join(f"w{i:02d}" for i in range(4)),   # 4 -> [4, 8)
        5: " ".join(f"w{i:02d}" for i in range(8)),   # 8 -> [8, 16)
        6: " ".join(f"w{i:02d}" for i in range(15)),  # 15 -> [8, 16)
        7: " ".join(f"w{i:02d}" for i in range(16)),  # 16 -> [16, 32)
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    ).select("doc_id", tokenize_udf("text").alias("tokens"))
    out = {(r["bucket_lo"], r["bucket_hi"]): (r["n_docs"], r["total_tokens"])
           for r in seq_len_histogram(docs).collect()}
    assert out == {
        (0, 1): (1, 0),
        (1, 2): (1, 1),
        (2, 4): (2, 5),
        (4, 8): (1, 4),
        (8, 16): (2, 23),
        (16, 32): (1, 16),
    }


# --- source diversity --------------------------------------------------------


def test_source_diversity_balanced_and_skewed(spark):
    import math

    import pytest

    from distributedcodesearchengine_spark.operators.textstats import (
        source_diversity,
    )

    bal = spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4]) for i in range(40)],
        "doc_id long, source string",
    )
    r = source_diversity(bal).collect()[0]
    assert r["n_sources"] == 4 and r["n_docs"] == 40
    assert r["entropy_nats"] == pytest.approx(math.log(4), abs=1e-6)
    assert r["effective_sources"] == pytest.approx(4.0, abs=1e-5)
    # 90/10 skew -> effective sources well below 2
    skew = spark.createDataFrame(
        [(i, "a" if i < 36 else "b") for i in range(40)],
        "doc_id long, source string",
    )
    r2 = source_diversity(skew).collect()[0]
    p = [0.9, 0.1]
    h = -sum(x * math.log(x) for x in p)
    assert r2["entropy_nats"] == pytest.approx(h, abs=1e-6)
    assert r2["effective_sources"] < 2.0
    # single source -> zero entropy, effective 1
    one = spark.createDataFrame([(0, "a")], "doc_id long, source string")
    r3 = source_diversity(one).collect()[0]
    assert r3["entropy_nats"] == 0.0 and r3["effective_sources"] == 1.0
