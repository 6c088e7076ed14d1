"""BPE tokenizer induction (Sennrich et al. 2016) — the byte-pair-
encoding merge learner every modern tokenizer (GPT-2 BPE,
SentencePiece-BPE) builds on, run IN-ENGINE over the corpus term
dictionary: start from single characters, repeatedly count adjacent
symbol pairs weighted by term frequency and merge the most frequent
pair, for a fixed number of iterations (the pagerank fixed-iteration
precedent).

Classic BPE trains on the word-frequency dictionary, not the corpus
scan — so the working relation is VOCABULARY-sized (optionally capped
to the top ``max_terms`` by frequency), never the corpus, and each
iteration is: one pair explode + one map-side-combinable weighted
count + a 1-row TakeOrdered argmax broadcast back + one literal string
replace. Everything is integer counts and string ops — NO float exists
anywhere in the lane, so cross-engine parity is exact by construction
(the geohash/bloom design rule).

Merge-apply convention: symbols live in a space-delimited string
(`' a b c '`) and a merge (a, b) is the engine's literal
``replace(s, ' a b ', ' ab ')`` — non-overlapping left-to-right, the
shared semantics of Spark SQL replace, DuckDB replace, and Python
str.replace (on an odd run ``a a a`` the first pair merges, exactly
the canonical BPE left-to-right tie rule). Pair counting is the
classic all-adjacent count. Argmax tie-break: (cnt desc, left asc,
right asc) — deterministic.

The DuckDB mirror unrolls the same N iterations as MATERIALIZED CTE
triples (pairs / 1-row argmax / merged dictionary) — the pagerank
lesson: DuckDB inlines CTE references, and the t[i] <- t[i-1] chain
re-executes exponentially without the MATERIALIZED hint. The Spark
side localCheckpoints each iteration's dictionary for the same reason
(lineage, not re-execution).

Serving seam: ``save_bpe`` / ``load_bpe`` persist the learned merge
list as a JSON artifact (the PQ-codebook pattern) and
``bpe_apply_col`` compiles it into a chained-replace column expression
for encoding arbitrary analyzed text at query/pipeline time — zero
Python per row.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_MERGES = 12
BPE_MAX_TERMS = 4096

Merges = List[Tuple[str, str]]


def _spaced_col(term_col):
    """' a b c ' — each symbol space-delimited with leading and
    trailing space (the replace-convention working form)."""
    return F.concat(F.lit(" "), F.regexp_replace(term_col, "(.)", "$1 "))


def _pairs(t: DataFrame) -> DataFrame:
    """(l_sym, r_sym, cnt) — adjacent symbol pairs over the spaced
    dictionary, weighted by term frequency; single-symbol terms
    contribute nothing (the corpus_ngrams empty-array guard)."""
    return (
        t.select(
            "f",
            F.explode(
                F.expr(
                    "CASE WHEN size(split(trim(s), ' ')) >= 2 THEN "
                    "transform(sequence(0, size(split(trim(s), ' ')) - 2), "
                    "i -> struct(split(trim(s), ' ')[i] AS l_sym, "
                    "split(trim(s), ' ')[i + 1] AS r_sym)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        .select("f", "p.l_sym", "p.r_sym")
        .groupBy("l_sym", "r_sym")
        .agg(F.sum("f").cast("long").alias("cnt"))
    )


def _dict0(docs: DataFrame, max_terms: int) -> DataFrame:
    """(s, f) — the spaced top-``max_terms`` term-frequency dictionary
    (cnt desc, term asc cut: a bounded TakeOrdered, never a vocab
    collect)."""
    return (
        docs.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("f"))
        .orderBy(F.desc("f"), F.asc("term"))
        .limit(int(max_terms))
        .select(_spaced_col(F.col("term")).alias("s"), "f")
    )


def _bpe_chain(docs: DataFrame, n_merges: int, max_terms: int):
    """Run the merge loop; returns (merge_steps, final_dict) where
    merge_steps is a list of 1-or-0-row DataFrames (step, l_sym,
    r_sym, cnt) and final_dict is the (s, f) dictionary after all
    merges."""
    if int(n_merges) < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges!r}")
    if int(max_terms) < 1:
        raise ValueError(f"max_terms must be >= 1: {max_terms!r}")
    t = _dict0(docs, max_terms).localCheckpoint(eager=False)
    steps = []
    for i in range(1, int(n_merges) + 1):
        m = (
            _pairs(t)
            .orderBy(F.desc("cnt"), F.asc("l_sym"), F.asc("r_sym"))
            .limit(1)
            .localCheckpoint(eager=False)
        )
        steps.append(
            m.select(
                F.lit(i).cast("int").alias("step"), "l_sym", "r_sym", "cnt"
            )
        )
        # left join the 1-row argmax so an exhausted dictionary (no
        # pairs left) passes through unchanged instead of vanishing
        t = (
            t.join(F.broadcast(m), F.lit(True), "left")
            .select(
                F.coalesce(
                    F.replace(
                        F.col("s"),
                        F.concat(
                            F.lit(" "), F.col("l_sym"), F.lit(" "),
                            F.col("r_sym"), F.lit(" "),
                        ),
                        F.concat(
                            F.lit(" "), F.col("l_sym"), F.col("r_sym"),
                            F.lit(" "),
                        ),
                    ),
                    F.col("s"),
                ).alias("s"),
                "f",
            )
            .localCheckpoint(eager=False)
        )
    return steps, t


def bpe_merges(
    docs: DataFrame, n_merges: int = BPE_MERGES, max_terms: int = BPE_MAX_TERMS
) -> DataFrame:
    """(step, l_sym, r_sym, cnt) — the learned merge table in training
    order: step i merged (l_sym, r_sym), which occurred ``cnt``
    weighted times in the step-(i-1) dictionary. Fewer than
    ``n_merges`` rows iff the dictionary ran out of pairs."""
    steps, _ = _bpe_chain(docs, n_merges, max_terms)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.orderBy("step")


def bpe_symbols(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    max_terms: int = BPE_MAX_TERMS,
    k: int = 50,
) -> DataFrame:
    """(symbol, cnt) — the top-k corpus symbol counts AFTER the learned
    merges (the induced vocabulary's head), weighted by term frequency;
    cnt desc, symbol asc, TakeOrdered k-cut."""
    _, t = _bpe_chain(docs, n_merges, max_terms)
    return (
        t.select("f", F.explode(F.split(F.trim(F.col("s")), " ")).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("f").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("symbol"))
        .limit(int(k))
    )


# ---------------------------------------------------------------------------
# artifact seam + apply
# ---------------------------------------------------------------------------


def train_bpe_merges(
    docs: DataFrame, n_merges: int = BPE_MERGES, max_terms: int = BPE_MAX_TERMS
) -> Merges:
    """Collect the learned merge list (bounded: <= n_merges rows) as
    the persistable artifact."""
    rows = bpe_merges(docs, n_merges, max_terms).collect()
    return [(r["l_sym"], r["r_sym"]) for r in rows]


def save_bpe(path: str, merges: Merges) -> None:
    import json

    with open(path, "w") as f:
        json.dump([[a, b] for a, b in merges], f)


def load_bpe(path: str) -> Merges:
    import json

    with open(path) as f:
        return [(str(a), str(b)) for a, b in json.load(f)]


def bpe_apply_col(term_col, merges: Merges):
    """Spaced-symbol string of ``term_col`` after applying ``merges``
    in training order — a chained literal-replace expression (zero
    Python per row). split(trim(result), ' ') yields the encoding."""
    s = _spaced_col(term_col)
    for a, b in merges:
        s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return s


# ---------------------------------------------------------------------------
# DuckDB mirrors
# ---------------------------------------------------------------------------


def _bpe_sql_chain(
    toks_cte: str, n_merges: int, max_terms: int
) -> Tuple[str, List[str]]:
    """The shared unrolled CTE chain; returns (with_body, step_names)
    where with_body defines t0..t{n} and m1..m{n} (all MATERIALIZED —
    the pagerank CTE-inlining lesson)."""
    parts = [
        toks_cte,
        "dict0 AS (SELECT term, CAST(count(*) AS BIGINT) AS f "
        "FROM (SELECT unnest(toks) AS term FROM docs) GROUP BY term "
        f"ORDER BY f DESC, term ASC LIMIT {int(max_terms)})",
        "t0 AS MATERIALIZED (SELECT ' ' || "
        "regexp_replace(term, '(.)', '\\1 ', 'g') AS s, f FROM dict0)",
    ]
    msteps = []
    for i in range(1, int(n_merges) + 1):
        prev = f"t{i - 1}"
        parts.append(
            f"p{i} AS (SELECT syms[i] AS l_sym, syms[i + 1] AS r_sym, "
            "CAST(sum(f) AS BIGINT) AS cnt FROM "
            f"(SELECT string_split(trim(s), ' ') AS syms, f FROM {prev}), "
            "unnest(generate_series(1, len(syms) - 1)) AS _t(i) "
            "GROUP BY 1, 2)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT l_sym, r_sym, cnt FROM p{i} "
            "ORDER BY cnt DESC, l_sym ASC, r_sym ASC LIMIT 1)"
        )
        parts.append(
            f"t{i} AS MATERIALIZED (SELECT coalesce(replace(s, "
            "' ' || m.l_sym || ' ' || m.r_sym || ' ', "
            "' ' || m.l_sym || m.r_sym || ' '), s) AS s, f "
            f"FROM {prev} LEFT JOIN m{i} m ON true)"
        )
        msteps.append(f"m{i}")
    return ", ".join(parts), msteps


def bpe_merges_sql(
    toks_cte: str, n_merges: int = BPE_MERGES, max_terms: int = BPE_MAX_TERMS
) -> str:
    body, msteps = _bpe_sql_chain(toks_cte, n_merges, max_terms)
    union = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS INT) AS step, l_sym, r_sym, cnt FROM {m}"
        for i, m in enumerate(msteps)
    )
    return f"WITH {body} SELECT * FROM ({union}) ORDER BY step"


def bpe_symbols_sql(
    toks_cte: str,
    n_merges: int = BPE_MERGES,
    max_terms: int = BPE_MAX_TERMS,
    k: int = 50,
) -> str:
    body, msteps = _bpe_sql_chain(toks_cte, n_merges, max_terms)
    last = f"t{len(msteps)}"
    return (
        f"WITH {body} "
        "SELECT symbol, CAST(sum(f) AS BIGINT) AS cnt FROM "
        f"(SELECT unnest(string_split(trim(s), ' ')) AS symbol, f FROM {last}) "
        f"GROUP BY symbol ORDER BY cnt DESC, symbol ASC LIMIT {int(k)}"
    )
