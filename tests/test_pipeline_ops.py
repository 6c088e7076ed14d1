"""Semantics tests for the corpus-curation operators
(operators/pipeline.py) — the Spark/DuckDB parity is covered by the
driver gate; these pin the behaviors the gate's corpus can't show
(explicit bench sets, bin straddling, handcrafted PII)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators import pipeline as pl


def _toks(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, tokens=t) for i, t in rows], "doc_id long, tokens array<string>"
    )


def test_decontaminate_flags_shared_ngram(spark):
    shared = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs"]
    docs = _toks(
        spark,
        [
            (1, shared + ["extra", "tail"]),  # one window == the bench 8-gram
            (2, ["totally", "different", "words", "number", "nine", "ten", "eleven", "twelve"]),
            (3, ["pad"] + shared),  # contaminated via offset window
        ],
    )
    bench = _toks(spark, [(100, shared)])
    out = pl.decontaminate(docs, n=8, bench_docs=bench).collect()
    assert [(r.doc_id, r.n_hit_grams) for r in out] == [(1, 1), (3, 1)]


def test_decontaminate_self_split_excludes_bench_docs(spark):
    shared = list("abcdefgh")
    docs = _toks(spark, [(0, shared), (7, shared), (1, shared)])
    # bench_mod=7 -> docs 0 and 7 are the bench slice; only doc 1 reports
    out = pl.decontaminate(docs, n=8, bench_mod=7).collect()
    assert [(r.doc_id, r.n_hit_grams) for r in out] == [(1, 1)]


def test_pack_sequences_offsets_and_bins(spark):
    # budget 10: doc 0 fills [0,4), doc 1 [4,12) straddles bin 0->1 but
    # is assigned the bin it STARTS in; doc 2 starts at 12 -> bin 1
    docs = _toks(
        spark,
        [(0, ["x"] * 4), (1, ["x"] * 8), (2, ["x"] * 3)],
    )
    out = pl.pack_sequences(docs, budget=10).collect()
    assert [(r.doc_id, r.n_tokens, r.start_offset, r.bin_id) for r in out] == [
        (0, 4, 0, 0),
        (1, 8, 4, 0),
        (2, 3, 12, 1),
    ]


def test_pack_sequences_crosses_range_boundary(spark):
    # doc_ids straddle an explicit 256-wide range partitioning: the
    # two-level cumsum must compose to the same global prefix sum
    rows = [(250 + i, ["x"] * (i + 1)) for i in range(12)]  # ids 250..261
    out = pl.pack_sequences(_toks(spark, rows), budget=7, range_width=256).collect()
    expected_start = 0
    for r, (_, toks) in zip(out, rows):
        assert r.start_offset == expected_start
        assert r.bin_id == expected_start // 7
        expected_start += len(toks)


def test_mixture_sample_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang=l) for i in range(200) for l in ("en", "zh")],
        "doc_id long, lang string",
    )
    out = {r.lang: r for r in pl.mixture_sample(docs).collect()}
    assert out["en"].n_kept == out["en"].n_total  # rate 1.0 keeps all
    assert 0 < out["zh"].n_kept < out["zh"].n_total  # rate 0.25 thins
    assert out["zh"].target_rate == pytest.approx(0.25)
    # keep decision is a pure doc_id hash: re-running yields identical counts
    again = {r.lang: r for r in pl.mixture_sample(docs).collect()}
    assert again["zh"].n_kept == out["zh"].n_kept


def test_chunk_documents_windows(spark):
    toks = [f"t{i}" for i in range(10)]
    docs = _toks(spark, [(1, toks), (2, ["solo"]), (3, [])])
    out = pl.chunk_documents(docs, size=4, overlap=2).collect()
    got = [(r.doc_id, r.chunk_id, r.start_tok, r.n_tokens, r.chunk_text) for r in out]
    assert got == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 2, 4, "t2 t3 t4 t5"),
        (1, 2, 4, 4, "t4 t5 t6 t7"),
        (1, 3, 6, 4, "t6 t7 t8 t9"),
        (1, 4, 8, 2, "t8 t9"),  # partial tail window kept
        (2, 0, 0, 1, "solo"),
        # doc 3 (empty) yields no chunks
    ]
    with pytest.raises(ValueError):
        pl.chunk_documents(docs, size=4, overlap=4)


def test_chunk_semantic_topk_matches_python_mock(spark):
    """The JVM sha2/conv hash-embed must reproduce the Python mock
    embedder bit-for-bit: scoring a doc whose single chunk IS the query
    text must yield cosine 1.0 at rank 1, and every score must equal the
    numpy dot of mock_embed_text vectors."""
    import math

    from distributedcodesearchengine_spark.functions.embed import mock_embed_text

    texts = ["alpha beta gamma", "delta epsilon", "alpha beta gamma"]
    docs = _toks(spark, [(i, t.split()) for i, t in enumerate(texts)])
    q = mock_embed_text("alpha beta gamma", 64)
    out = pl.chunk_semantic_topk(docs, q, k=3, size=8, overlap=0).collect()
    assert (out[0].doc_id, out[0].chunk_id, out[0].score) == (0, 0, 1.0)
    for r in out:
        ref = mock_embed_text(texts[r.doc_id], 64)
        expected = sum(a * b for a, b in zip(ref, q))
        assert math.isclose(r.score, math.floor(expected * 1e6 + 0.5) / 1e6, abs_tol=0)


def test_curate_corpus_funnel_stages(spark):
    """Each funnel stage drops exactly the doc planted for it."""
    base = [f"w{i}" for i in range(30)]  # 30 tokens: clears the quality floor
    bench_toks = [f"b{i}" for i in range(30)]
    rows = [
        # doc 7: bench slice (7 % 7 == 0) -> excluded as eval data
        (7, " ".join(bench_toks), "en", bench_toks),
        # doc 1: clean survivor
        (1, " ".join(base), "en", base),
        # doc 8: exact duplicate of doc 1 -> deduped (rep is min doc_id)
        (8, " ".join(base), "en", base),
        # doc 2: too short -> quality-dropped
        (2, "a b", "en", ["alpha", "beta"]),
        # doc 3: shares an 8-gram with the bench doc -> decontaminated
        (3, "x", "en", ["pre"] + bench_toks[:8] + [f"y{i}" for i in range(21)]),
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lg, tokens=tk) for i, t, lg, tk in rows],
        "doc_id long, text string, lang string, tokens array<string>",
    )
    out = pl.curate_corpus(docs, min_tokens=25, n=8, bench_mod=7, budget=16).collect()
    # en rate is 1.0, so mixture keeps every survivor; only doc 1 remains
    assert [(r.doc_id, r.lang, r.n_tokens, r.start_offset, r.bin_id) for r in out] == [
        (1, "en", 30, 0, 0)
    ]


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text="mail a.user+tag@sub.example.co.uk or 212-555-0142 from 10.1.2.3 end",
            ),
            Row(doc_id=2, text="no pii here"),
        ]
    )
    out = {r.doc_id: r for r in pl.pii_scrub(docs).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (1, 1, 1)
    assert (out[2].n_emails, out[2].n_phones, out[2].n_ips) == (0, 0, 0)
    scrubbed = docs.filter("doc_id = 1").select(
        pl.scrub_text_col(F.col("text")).alias("t")
    ).first().t
    assert scrubbed == "mail <EMAIL> or <PHONE> from <IP> end"


def test_pii_scrub_counts_match_actual_replacements(spark):
    """An IP-shaped domain inside an email is consumed by the email
    pass — it must NOT be reported as an IP redaction (counts are
    measured on the staged text each replacement actually runs on)."""
    docs = spark.createDataFrame([Row(doc_id=1, text="x a@10.1.2.3.com y")])
    r = pl.pii_scrub(docs).first()
    assert (r.n_emails, r.n_phones, r.n_ips) == (1, 0, 0)
    scrubbed = docs.select(pl.scrub_text_col(F.col("text")).alias("t")).first().t
    assert scrubbed == "x <EMAIL> y"
    assert scrubbed.count("<IP>") == r.n_ips


# ---------------------------------------------------------------------------
# line-level dedup + domain caps (web-corpus thinning passes)


def _pages(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


def test_dedup_lines_removes_corpus_wide_boilerplate(spark):
    from distributedcodesearchengine_spark.operators import dedup as dd

    boiler = "subscribe to our newsletter"
    docs = _pages(
        spark,
        [
            (0, f"{boiler}\nunique zero\n{boiler}"),
            (1, f"unique one\n{boiler}"),
            (2, "unique two a\nunique two b"),
        ],
    )
    out = {r.doc_id: r for r in dd.dedup_lines(docs, min_dup=3).collect()}
    # boiler occurs 3x corpus-wide -> every copy removed, incl. both in doc 0
    assert (out[0].n_lines, out[0].n_removed) == (3, 2)
    assert (out[1].n_lines, out[1].n_removed) == (2, 1)
    assert (out[2].n_lines, out[2].n_removed) == (2, 0)
    import hashlib

    assert out[0].clean_hash == hashlib.md5(b"unique zero").hexdigest()
    assert out[1].clean_hash == hashlib.md5(b"unique one").hexdigest()
    assert out[2].clean_hash == hashlib.md5(b"unique two a\nunique two b").hexdigest()


def test_dedup_lines_preserves_order_and_handles_all_removed(spark):
    from distributedcodesearchengine_spark.operators import dedup as dd

    docs = _pages(
        spark,
        [(0, "dup\ndup"), (1, "dup\nkeep b\nkeep a"), (2, "dup")],
    )
    out = {r.doc_id: r for r in dd.dedup_lines(docs, min_dup=4).collect()}
    import hashlib

    # doc 0: every line removed -> hash of the empty reassembly
    assert out[0].n_removed == 2
    assert out[0].clean_hash == hashlib.md5(b"").hexdigest()
    # doc 1: surviving lines keep ORIGINAL order (b before a)
    assert out[1].clean_hash == hashlib.md5(b"keep b\nkeep a").hexdigest()


def test_apply_domain_cap_under_over_union(spark):
    rows = [(i, "hot" if i < 40 else ("mid" if i < 48 else "cold")) for i in range(52)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    kept = pl.apply_domain_cap(d, cap=7).collect()
    by = {}
    for r in kept:
        by.setdefault(r.source, []).append(r.doc_id)
    # hot (40 docs) and mid (8 docs) are over-cap: lowest doc_ids win;
    # cold (4 docs) passes through the under-cap branch untouched
    assert sorted(by["hot"]) == list(range(7))
    assert sorted(by["mid"]) == list(range(40, 47))
    assert sorted(by["cold"]) == list(range(48, 52))


def test_dup_spans_catches_planted_duplicate_and_offsets(spark):
    from distributedcodesearchengine_spark.operators import dedup as dd

    shared = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    uniq1 = [f"u{i}" for i in range(6)]
    uniq2 = [f"v{i}" for i in range(9)]
    docs = _toks(
        spark,
        [
            (0, uniq1 + shared),            # shared span at offset 6
            (1, uniq2 + shared + ["tail"]),  # same span at offset 9
            (2, [f"w{i}" for i in range(12)]),  # fully unique
        ],
    )
    out = {r.doc_id: r for r in dd.dup_spans(docs, w=8).collect()}
    assert out[0].n_dup_windows == 1 and out[0].first_dup_tok == 6
    assert out[1].n_dup_windows == 1 and out[1].first_dup_tok == 9
    assert out[2].n_dup_windows == 0 and out[2].first_dup_tok == -1
    assert out[2].dup_frac == 0.0


def test_dup_spans_content_anchoring_is_offset_invariant(spark):
    """A fixed-stride subsample would miss copies at different parities;
    content-defined anchors fire at the same tokens in both copies."""
    from distributedcodesearchengine_spark.operators import dedup as dd

    shared = [f"s{i}" for i in range(20)]
    docs = _toks(
        spark,
        [
            (0, ["x0"] + shared),       # odd offset
            (1, ["y0", "y1"] + shared),  # even offset
        ],
    )
    out = {r.doc_id: r for r in dd.dup_spans(docs, w=8, anchor_mod=3).collect()}
    # whatever anchors land inside the shared span land identically in
    # both copies -> both docs report the same number of dup windows > 0
    assert out[0].n_dup_windows == out[1].n_dup_windows > 0


def test_domain_quality_flags_low_quality_domains(spark):
    from distributedcodesearchengine_spark.operators import textstats as ts

    # 'junk' domain: terse punctuation-heavy docs; 'good' domain: long
    # stopword-bearing prose-ish docs
    good = "the quick brown fox jumps over the lazy dog and then " * 12
    junk = "@@ ## !! %% ^^ zz"
    rows = [(i, good, "good") for i in range(4)] + [
        (i + 10, junk, "junk") for i in range(4)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf

    d = d.select("doc_id", "text", "source", tokenize_udf("text").alias("tokens"))
    out = {r.source: r for r in ts.domain_quality(d).collect()}
    assert out["junk"].flagged and out["junk"].low_frac == 1.0
    assert not out["good"].flagged and out["good"].n_low == 0


def test_unigram_logppl_separates_common_from_rare(spark):
    from distributedcodesearchengine_spark.operators import textstats as ts

    # 9 docs of pure boilerplate + 1 doc of corpus-rare tokens: the
    # rare doc must carry the highest per-token surprise, boilerplate
    # the lowest, and ppl must be exp(nll) after rounding
    rows = [(i, ["the", "quick", "fox"] * 4) for i in range(9)]
    rows.append((9, ["zyzzyva", "quux", "xylem", "the"]))
    d = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    out = {r.doc_id: r for r in ts.unigram_logppl(d.withColumn("text", F.lit(""))).collect()}
    assert len(out) == 10
    assert out[9].nll_per_tok == max(r.nll_per_tok for r in out.values())
    assert out[0].nll_per_tok == min(r.nll_per_tok for r in out.values())
    assert out[0].doc_len == 12 and out[9].doc_len == 4
    import math

    assert abs(out[9].ppl - math.exp(out[9].nll_per_tok)) < 1e-4


def test_normalize_text_lanes(spark):
    rows = [
        (0, "café one"),          # NFD -> NFC composition
        (1, "a b​c"),         # NBSP -> space, zero-width dropped
        (2, " lots\t\tof\n\nspace  "),  # runs collapse + trim
        (3, "ctrl\x00\x07here"),        # C0 controls dropped
        (4, "already clean"),
        (5, None),                      # null-safe
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pl.normalize_text(d).collect()}
    assert out[0].text_norm == "café one" and out[0].changed
    assert out[0].n_chars_raw == 9 and out[0].n_chars_norm == 8
    assert out[1].text_norm == "a bc"
    assert out[2].text_norm == "lots of space"
    assert out[3].text_norm == "ctrlhere"
    assert out[4].text_norm == "already clean" and not out[4].changed
    assert out[5].text_norm == ""


def test_corpus_ngrams_counts_and_tiebreak(spark):
    from distributedcodesearchengine_spark.operators import textstats as ts

    rows = [
        (0, ["a", "b", "a", "b"]),   # "a b" x2, "b a" x1
        (1, ["a", "b", "c"]),        # "a b", "b c"
        (2, ["z"]),                  # too short for a bigram
    ]
    d = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    out = ts.corpus_ngrams(d, n=2, k=10).collect()
    got = {r.gram: (r.cnt, r.df) for r in out}
    assert got["a b"] == (3, 2) and got["b a"] == (1, 1) and got["b c"] == (1, 1)
    assert out[0].gram == "a b"            # top by count
    assert [r.gram for r in out[1:]] == ["b a", "b c"]  # tie -> gram asc
    assert all(r.n == 2 for r in out)


def test_normalize_series_matches_duckdb_oracle_property():
    """Cross-engine property test for the normalization chain: the
    pandas/Python pipeline (_normalize_series) must equal the DuckDB
    RE2/nfc_normalize chain from normalize_text_sql character-for-
    character over adversarial unicode — combining marks (NFD->NFC),
    precomposed chars, CJK, zero-widths/BOM, NBSP, C0/DEL controls,
    whitespace runs at every position.

    NUL is excluded from the shared alphabet: DuckDB VARCHAR truncates
    at an embedded NUL (losing the tail), while the engine strips just
    the NUL and keeps the rest — asserted separately below. The gate's
    augmented entry never carries NUL, so its oracle is unaffected."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from distributedcodesearchengine_spark.functions.udfs import _normalize_series

    con = duckdb.connect()
    norm_sql = (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        "replace(nfc_normalize(?), chr(160), ' '), "
        r"'[\x{200b}\x{200c}\x{200d}\x{feff}]', '', 'g'), "
        r"'[\x00-\x08\x0b\x0e-\x1f\x7f]', '', 'g'), "
        r"'[ \t\n\r\f]+', ' ', 'g'), ' ')"
    )
    alphabet = (
        "abcXYZ09 \t\n\r\f"
        "̧́̈"      # combining acute/diaeresis/cedilla
        "éÅñÅ"               # precomposed + Angstrom sign (NFC -> Å)
        "日本語中"                 # CJK
        "​‌‍﻿ "  # zero-widths, BOM, NBSP
        "\x07\x0b\x1f\x7f"        # C0 / DEL controls (NUL tested separately)
        ".,!-_"
    )

    @given(st.text(alphabet=alphabet, max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(s):
        py = _normalize_series(pd.Series([s]))[0]
        db = con.execute(f"select {norm_sql}", [s]).fetchone()[0]
        assert py == db, (repr(s), repr(py), repr(db))

    check()

    # NUL lane (python side only; DuckDB truncates VARCHAR at NUL)
    assert _normalize_series(pd.Series(["a\x00é b"]))[0] == "aé b"


def test_curate_corpus_classifier_stage(spark):
    """With a custom verdict model, exactly the below-threshold doc is
    dropped; with the stage off the doc survives."""
    base = [f"w{i}" for i in range(30)]
    other = [f"v{i}" for i in range(30)]
    rows = [
        (1, " ".join(base), "en", base),
        (2, " ".join(other), "en", other),
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lg, tokens=tk) for i, t, lg, tk in rows],
        "doc_id long, text string, lang string, tokens array<string>",
    )

    def loader():
        return lambda texts: [0.9 if t.startswith("w0") else 0.1 for t in texts]

    kept = pl.curate_corpus(
        docs, min_tokens=25, n=8, bench_mod=1000, budget=64,
        classifier_threshold=0.5, classifier_loader=loader,
    ).collect()
    assert [r.doc_id for r in kept] == [1]
    both = pl.curate_corpus(docs, min_tokens=25, n=8, bench_mod=1000, budget=64).collect()
    assert [r.doc_id for r in both] == [1, 2]


# --- PMI collocations -------------------------------------------------------

def test_collocations_pmi_formula(spark):
    import math

    from distributedcodesearchengine_spark.functions.rounding import round6_py
    from distributedcodesearchengine_spark.operators.textstats import (
        collocations_pmi,
    )

    # 'aa bb' always adjacent (perfect collocation), 'cc'/'dd' scattered
    rows = [
        (1, ["aa", "bb", "cc", "dd"]),
        (2, ["cc", "aa", "bb", "dd"]),
        (3, ["dd", "cc", "aa", "bb"]),
        (4, ["aa", "bb", "dd", "cc"]),
    ]
    d = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = {
        (r["t1"], r["t2"]): (r["cnt"], r["pmi"])
        for r in collocations_pmi(d, min_count=2, k=50).collect()
    }
    # python mirror
    from collections import Counter

    uni, big = Counter(), Counter()
    for _, toks in rows:
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    t_uni, t_big = sum(uni.values()), sum(big.values())
    for (a, b), cnt in big.items():
        if cnt < 2:
            assert (a, b) not in got
            continue
        pmi = math.log((cnt * 1.0 / t_big) / ((uni[a] * 1.0 / t_uni) * (uni[b] * 1.0 / t_uni)))
        assert got[(a, b)] == (cnt, round6_py(pmi)), (a, b)
    # the perfect collocation outranks every scattered pair
    top = max(got.items(), key=lambda kv: kv[1][1])
    assert top[0] == ("aa", "bb")


def test_collocations_min_count_filter(spark):
    from distributedcodesearchengine_spark.operators.textstats import (
        collocations_pmi,
    )

    d = spark.createDataFrame(
        [(1, ["xx", "yy", "xx", "yy", "xx", "yy"]), (2, ["zz", "qq"])],
        "doc_id long, tokens array<string>",
    )
    pairs = {(r["t1"], r["t2"]) for r in collocations_pmi(d, min_count=2, k=50).collect()}
    assert ("zz", "qq") not in pairs and ("xx", "yy") in pairs


# --- train/val/test split ---------------------------------------------------

def test_split_is_deterministic_partition(spark):
    from distributedcodesearchengine_spark.operators.pipeline import split_label_col

    d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["s"] for r in d.select("doc_id", split_label_col().alias("s")).collect()}
    b = {r["doc_id"]: r["s"] for r in d.select("doc_id", split_label_col().alias("s")).collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
    # approximate proportions at n=2000
    n = len(a)
    frac_train = sum(1 for v in a.values() if v == "train") / n
    assert 0.85 < frac_train < 0.95


def test_split_is_growth_stable(spark):
    """A doc's split never changes when the corpus grows — the holdout
    stays holdout."""
    from distributedcodesearchengine_spark.operators.pipeline import split_label_col

    small = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["s"] for r in small.select("doc_id", split_label_col().alias("s")).collect()}
    b = {r["doc_id"]: r["s"] for r in big.select("doc_id", split_label_col().alias("s")).collect()}
    assert all(b[i] == a[i] for i in a)


def test_split_salt_differs_from_mixture_hash(spark):
    """The split bucket is salted: it must not be the mixture-sampling
    bucket in disguise (an unsalted hash would correlate the two)."""
    from distributedcodesearchengine_spark.operators.pipeline import (
        mixture_keep_col,
        split_label_col,
    )
    from pyspark.sql import functions as F

    d = (
        spark.range(0, 4000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.lit("en"))
    )
    j = d.select("doc_id", split_label_col().alias("s"), mixture_keep_col().alias("k"))
    rows = j.collect()
    kept = [r for r in rows if r["k"]]
    # under independence, train-share among mixture-kept docs tracks the
    # global 0.9 (an unsalted hash would nest val/test inside the
    # mixture-dropped set and push this to ~1.0)
    share = sum(1 for r in kept if r["s"] == "train") / len(kept)
    assert 0.85 < share < 0.95


def test_split_leakage_detects_crossing_ngrams(spark):
    from distributedcodesearchengine_spark.operators.pipeline import (
        split_label_col,
        split_leakage,
    )

    base = [(i, [f"tok{i}_{j}" for j in range(10)]) for i in range(400)]
    d0 = spark.createDataFrame(base, "doc_id long, tokens array<string>")
    labels = {r["doc_id"]: r["s"] for r in d0.select("doc_id", split_label_col().alias("s")).collect()}
    train_ids = [i for i, s in labels.items() if s == "train"]
    test_ids = [i for i, s in labels.items() if s == "test"]
    assert train_ids and test_ids
    # copy one train doc's token stream onto one test doc -> that test
    # doc leaks; all other docs have globally unique grams -> no leak
    rows = [
        (i, base[train_ids[0]][1] if i == test_ids[0] else toks)
        for i, toks in base
    ]
    d = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = {r["split"]: (r["n_docs"], r["n_leaked"]) for r in split_leakage(d, n=8).collect()}
    assert got["test"][1] == 1
    assert got.get("val", (0, 0))[1] == 0
    # control: without the graft nothing leaks
    clean = {r["split"]: r["n_leaked"] for r in split_leakage(d0, n=8).collect()}
    assert set(clean.values()) == {0}


def test_apply_domain_cap_null_keys_are_a_group(spark):
    """NULL domains form a window partition in the SQL the result must
    match — the equality anti-join would wave every null-key row
    through uncapped (the exact spam flood the cap exists to stop)."""
    rows = [(i, None) for i in range(12)] + [(100 + i, "ok") for i in range(3)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    kept = pl.apply_domain_cap(d, cap=7).collect()
    nulls = sorted(r.doc_id for r in kept if r.source is None)
    assert nulls == list(range(7))  # capped, lowest doc_ids win
    assert sorted(r.doc_id for r in kept if r.source == "ok") == [100, 101, 102]


# --- fuzzy decontamination ---------------------------------------------------


def _fz_docs(spark, texts):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return d.select("doc_id", "text", tokenize_udf("text").alias("tokens"))


def test_decontaminate_fuzzy_catches_near_dup_of_bench(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.pipeline import (
        decontaminate_fuzzy,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    texts = [
        base,                                   # doc 0: bench (0 % 2 == 0)
        base + " extra",                        # doc 1: near-dup of bench
        "totally different content here today " * 3,  # doc 3? index 2: bench
        "unrelated words entirely about other things nothing shared",  # 3
    ]
    out = decontaminate_fuzzy(
        _fz_docs(spark, texts), bench_mod=2, jaccard_min=0.5
    ).collect()
    pairs = {(r["doc_id"], r["bench_id"]): r["jaccard"] for r in out}
    assert (1, 0) in pairs
    assert pairs[(1, 0)] > 0.9
    # the unrelated corpus doc is NOT flagged
    assert all(d != 3 for d, _ in pairs)
    # jaccard matches the exact shingle computation
    def sh(t):
        ts = t.split()
        return {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)}

    a, b = sh(texts[1]), sh(texts[0])
    want = len(a & b) / len(a | b)
    assert pairs[(1, 0)] == pytest.approx(want, abs=1e-6)


def test_decontaminate_fuzzy_guard(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.pipeline import (
        decontaminate_fuzzy,
    )

    with pytest.raises(ValueError):
        decontaminate_fuzzy(_fz_docs(spark, ["aa bb cc"]), bench_mod=1)
