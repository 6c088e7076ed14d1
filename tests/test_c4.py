"""C4 rule-based page cleaning (operators/pipeline.c4_clean): each line
rule and page rule pinned on hand-built pages, the md5 reassembly
contract, and the empty-survivor hash."""

import hashlib

from distributedcodesearchengine_spark.operators.pipeline import c4_clean


def _docs(spark, pages):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)],
        "doc_id long, text string",
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


GOOD = "the quick brown fox jumps high."  # 6 words, terminal '.'


def test_line_rules(spark):
    page = "\n".join(
        [
            GOOD,
            "the quick brown fox jumps high",  # no terminal punct
            "too short line.",  # 3 words
            "please enable javascript to view this site.",  # js line
            'she said "hello there my old friend."',  # quote terminal? ends '."' -> '.' then '"'
            GOOD,
        ]
    )
    r = c4_clean(_docs(spark, [page]), min_kept=1).collect()[0]
    assert r.n_lines == 6
    # kept: GOOD, the quoted line (ends in "), GOOD
    assert r.n_kept == 3
    assert r.page_keep is True
    assert r.clean_hash == _md5(
        "\n".join([GOOD, 'she said "hello there my old friend."', GOOD])
    )


def test_page_rules(spark):
    three_good = "\n".join([GOOD, GOOD, GOOD])
    pages = [
        three_good,  # keeps
        "\n".join([GOOD, GOOD]),  # only 2 kept lines -> dropped
        three_good + "\nwe embed Lorem Ipsum filler here.",  # lorem (ci)
        three_good + "\nvar x = { a: 1 };",  # brace
    ]
    rows = {r.doc_id: r for r in c4_clean(_docs(spark, pages)).collect()}
    assert rows[0].page_keep is True
    assert rows[1].page_keep is False and rows[1].n_kept == 2
    assert rows[2].page_keep is False  # lorem rule, case-insensitive
    assert rows[3].page_keep is False  # brace rule
    # page rules never change the line accounting
    assert rows[2].n_kept == 4  # the lorem line itself survives line rules


def test_empty_survivors_hash_is_md5_of_empty(spark):
    r = c4_clean(_docs(spark, ["home\nmenu\nabout"])).collect()[0]
    assert r.n_kept == 0
    assert r.page_keep is False
    assert r.clean_hash == _md5("")


def test_thresholds_are_parameters(spark):
    page = "\n".join(["one two tiny line.", GOOD])  # 4 words
    strict = c4_clean(_docs(spark, [page]), min_words=5, min_kept=2).collect()[0]
    loose = c4_clean(_docs(spark, [page]), min_words=4, min_kept=2).collect()[0]
    assert strict.n_kept == 1 and strict.page_keep is False
    assert loose.n_kept == 2 and loose.page_keep is True
