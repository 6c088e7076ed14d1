"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023): the standard pretraining-data selection operator. Score
every raw document by how much more likely its hashed n-gram features
are under a TARGET bag-of-words model than under the RAW one
(importance log-weight), then resample via deterministic Gumbel top-k
so the selected set follows the importance distribution instead of
greedily taking the head (the paper's key correction over top-k-by-
weight).

Public algorithm, re-expressed Spark-first:

1. features: unigrams + space-joined bigrams (the corpus_ngrams gram
   spelling) hashed into ``m`` buckets by the house md5 idiom —
   hashing collisions are part of the method, not a defect;
2. two Laplace-smoothed bag-of-words models over the same buckets:
   p (target = one language slice here; any doc predicate works) and
   q (raw = the whole corpus): p_b = (cnt_b + 1) / (tot + m);
3. per-doc log-weight = sum_b cnt_db * (ln p_b - ln q_b), folded in
   bucket order on both engines (the unigram_logppl canonical-fold
   discipline — ln is the house exp/ln precedent, 6-dp rounded at the
   gate boundary);
4. Gumbel top-k resample: key = logw + g, g = -ln(-ln(u)) with
   u = (md5_bucket('dsir|' || doc_id) + 0.5) / 2^32 — exactly
   representable, salt-independent of the mixture/split hashes, so
   the sample is deterministic, layout-independent, and identically
   computed by both engines.

Scale shape: one gram explode pre-aggregated per (doc_id, bucket)
before any join (map-side combinable), the two LM relations are
m-bucket-bounded groupBys, totals enter as 1-row broadcasts, the
scoring join is bucket-keyed against an m-row relation, and the
selection is a TakeOrdered k-cut — no corpus-wide sort, no vocabulary
collect, zero Python. At 10^12 docs the only corpus-scale shuffle is
the (doc_id, bucket) pre-agg that any featurizer pays.

Reference note: the reference repo has no data-selection stage; this
extends the curation suite (mixture/temperature/decontaminate) with
the published DSIR method over the same documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql

DSIR_M = 256  # hashed feature buckets
_DSIR_SALT = "dsir"
_U32 = 4294967296  # 2^32


def _bucket_col(gram_col, m: int):
    """md5 bucket of a gram string — the house hash idiom (mixture /
    split / geo): first 8 md5 hex chars as an integer, mod m."""
    return (
        F.conv(
            F.substring(F.md5(F.encode(gram_col, "utf-8")), 1, 8), 16, 10
        ).cast("long")
        % int(m)
    )


def _grams_col():
    """unigrams ++ space-joined bigrams over the tokens array — the
    corpus_ngrams gram spelling, in one JVM expression."""
    return F.expr(
        "concat(tokens, CASE WHEN size(tokens) >= 2 THEN "
        "transform(sequence(0, size(tokens) - 2), "
        "i -> tokens[i] || ' ' || tokens[i + 1]) "
        "ELSE array() END)"
    )


def dsir_weights(
    docs: DataFrame, target_lang: str = "en", m: int = DSIR_M
) -> DataFrame:
    """(doc_id, n_grams, logw) — per-doc DSIR importance log-weight of
    every document against the ``lang == target_lang`` slice as the
    target distribution. ``docs`` must carry (doc_id, lang, tokens).
    A doc with no grams (empty tokens) gets logw 0.0."""
    if int(m) < 1:
        raise ValueError(f"m must be >= 1: {m!r}")
    grams = docs.select(
        "doc_id", "lang", F.explode(_grams_col()).alias("gram")
    ).select("doc_id", "lang", _bucket_col(F.col("gram"), m).alias("bucket"))
    # per-(doc, bucket) counts BEFORE any join — the map-side combine.
    # lang rides along (functionally dependent on doc_id) so BOTH LM
    # lanes derive from this ONE checkpointed pass over the corpus —
    # the explode/tokenize never runs twice.
    db = grams.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )
    db = db.localCheckpoint(eager=False)  # feeds both LMs + the score join
    raw = db.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("cnt_r"))
    tgt = (
        db.where(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt_t"))
    )
    lm = raw.join(tgt, "bucket", "left").na.fill({"cnt_t": 0})
    tot = lm.agg(
        F.sum("cnt_r").cast("double").alias("_tr"),
        F.sum("cnt_t").cast("double").alias("_tt"),
    )
    # ln p - ln q with Laplace smoothing, identical operand sequence
    # in the SQL mirror
    lr = lm.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("cnt_t") + F.lit(1.0)) / (F.col("_tt") + F.lit(float(m))))
            - F.log((F.col("cnt_r") + F.lit(1.0)) / (F.col("_tr") + F.lit(float(m))))
        ).alias("lr"),
    )
    contrib = db.join(lr, "bucket").select(
        "doc_id", "cnt", "bucket", (F.col("cnt") * F.col("lr")).alias("c")
    )
    agg = contrib.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("logw"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def _gumbel_col():
    """Deterministic Gumbel noise from the salted doc_id hash:
    u = (bucket32 + 0.5) / 2^32 (exactly representable on both
    engines), g = -ln(-ln(u))."""
    hb = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(
                        F.lit(_DSIR_SALT + "|"), F.col("doc_id").cast("string")
                    ),
                    "utf-8",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (hb.cast("double") + F.lit(0.5)) / F.lit(float(_U32))
    return -F.log(-F.log(u))


def dsir_sample(
    docs: DataFrame,
    k: int = 50,
    target_lang: str = "en",
    m: int = DSIR_M,
) -> DataFrame:
    """(rank, doc_id, logw) — the Gumbel-top-k importance resample:
    top ``k`` docs by logw + Gumbel(doc_id), ties on doc_id asc. This
    IS sampling-without-replacement proportional to the importance
    weights (the Gumbel-max trick), deterministic by construction."""
    if int(k) < 1:
        raise ValueError(f"k must be >= 1: {k!r}")
    from pyspark.sql.window import Window

    w = dsir_weights(docs, target_lang, m)
    keyed = w.select(
        "doc_id", "logw", (F.col("logw") + _gumbel_col()).alias("_key")
    )
    top = keyed.orderBy(F.desc("_key"), F.asc("doc_id")).limit(int(k))
    win = Window.orderBy(F.desc("_key"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(win)).select(
        "rank", "doc_id", round6("logw").alias("logw")
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors
# ---------------------------------------------------------------------------


def _dsir_ctes(target_lang: str, m: int, table: str = "documents") -> str:
    """CTE chain ending in w(doc_id, n_grams, logw). The docs CTE
    carries lang; grams = unigrams ++ bigrams with the corpus_ngrams
    spelling; every arithmetic step mirrors the Spark operand order."""
    from ..functions.sql_oracle import tokenize_col

    tl = target_lang.replace("'", "''")
    return (
        f"docs AS (SELECT doc_id, lang, {tokenize_col('text')} AS toks "
        f"FROM {table}), "
        "gr AS (SELECT doc_id, lang, unnest(toks) AS gram FROM docs "
        "UNION ALL "
        "SELECT doc_id, lang, toks[i] || ' ' || toks[i + 1] AS gram "
        "FROM docs, unnest(generate_series(1, len(toks) - 1)) AS _t(i)), "
        f"gb AS (SELECT doc_id, lang, "
        f"('0x' || substr(md5(gram), 1, 8))::BIGINT % {int(m)} AS bucket "
        "FROM gr), "
        "db AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt "
        "FROM gb GROUP BY 1, 2), "
        "raw AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cnt_r "
        "FROM db GROUP BY 1), "
        f"tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_t "
        f"FROM gb WHERE lang = '{tl}' GROUP BY 1), "
        "lm AS (SELECT r.bucket, r.cnt_r, coalesce(t.cnt_t, 0) AS cnt_t "
        "FROM raw r LEFT JOIN tgt t USING (bucket)), "
        "tot AS (SELECT CAST(sum(cnt_r) AS DOUBLE) AS tr, "
        "CAST(sum(cnt_t) AS DOUBLE) AS tt FROM lm), "
        f"lr AS (SELECT bucket, "
        f"ln((cnt_t + 1.0) / (tt + {float(m)})) - "
        f"ln((cnt_r + 1.0) / (tr + {float(m)})) AS lr "
        "FROM lm CROSS JOIN tot), "
        "contrib AS (SELECT db.doc_id, db.cnt, db.bucket, "
        "db.cnt * lr.lr AS c FROM db JOIN lr USING (bucket)), "
        "agg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams, "
        "sum(c ORDER BY bucket) AS logw FROM contrib GROUP BY doc_id), "
        f"w AS (SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams, "
        "coalesce(a.logw, 0.0) AS logw "
        "FROM (SELECT doc_id FROM docs) d LEFT JOIN agg a USING (doc_id))"
    )


def dsir_weights_sql(
    target_lang: str = "en", m: int = DSIR_M, table: str = "documents"
) -> str:
    return (
        f"WITH {_dsir_ctes(target_lang, m, table)} "
        f"SELECT doc_id, n_grams, {round6_sql('logw')} AS logw "
        "FROM w ORDER BY doc_id"
    )


def dsir_sample_sql(
    k: int = 50,
    target_lang: str = "en",
    m: int = DSIR_M,
    table: str = "documents",
) -> str:
    g = (
        f"(('0x' || substr(md5('{_DSIR_SALT}|' || doc_id::VARCHAR), 1, 8))"
        f"::BIGINT + 0.5) / {float(_U32)}"
    )
    return (
        f"WITH {_dsir_ctes(target_lang, m, table)}, "
        f"keyed AS (SELECT doc_id, logw, logw + (-ln(-ln({g}))) AS key "
        "FROM w) "
        "SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id ASC) AS INT) "
        f"AS rank, doc_id, {round6_sql('logw')} AS logw FROM keyed "
        f"ORDER BY key DESC, doc_id ASC LIMIT {int(k)}"
    )
