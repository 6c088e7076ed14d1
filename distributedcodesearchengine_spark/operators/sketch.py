"""Distributed frequency / cardinality sketches (Count-Min, KMV).

The reference keeps exact corpus statistics only (tf/df/N maps,
``codesearch/storage/bm25_index.py:84-115``) — fine at 10^5 docs,
impossible at 10^12, where pipeline bookkeeping (df estimation before
an index exists, vocab-size tracking across shards, heavy-hitter
detection for stop lists) wants MERGEABLE fixed-size sketches. Both
sketches here are built with the engine-portable md5 lanes the dedup
suite established, so the DuckDB oracles agree bit-for-bit — no
"approximately equal" testing, the sketch itself is deterministic.

* Count-Min (Cormode & Muthukrishnan): ``depth x width`` counter
  matrix; every token occurrence increments one bucket per depth row
  (bucket = md5(d|term) mod width). Built with ONE explode + ONE
  map-side-combinable groupBy — the sketch is a sum, so partitions
  combine before the shuffle and sketches of different corpus shards
  merge by addition. Point estimate = min over depths of the bucket
  count; always an over-estimate (one-sided error), proven per-term
  against the exact counts in the gate entry.

* KMV / bottom-k (Bar-Yossef et al.): cardinality from the k smallest
  hash values of the distinct key set. est = (k-1) / (h_k / 2^32) with
  h_k the k-th minimum of the 32-bit md5-prefix lane. The k-row
  bottom is a distributed TakeOrdered (no global sort); shard sketches
  merge by keeping the k smallest of the union.

* HyperLogLog (Flajolet et al. 2007 — the ES `cardinality` agg):
  2^p registers, register = max leading-zero-run of the 48-bit md5
  tail among keys hashing to that register; harmonic-mean estimate
  with the paper's linear-counting small-range correction. Registers
  merge by max. The leading-zero count runs on hex characters (strip
  '0's + a 15-way first-digit CASE) so both engines compute it with
  the same string ops — no bit_length/log2 float hazard.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql, sql_double

CMS_DEPTH = 4
CMS_WIDTH = 256
KMV_K = 64
_HASH_SPACE = float(1 << 32)


def _bucket_col(depth_col, term_col, width: int):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat(
                            depth_col.cast("string"), F.lit("|"), term_col
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
        % width
    )


def cms_build(
    docs: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """docs(doc_id, tokens) -> (d, bucket, cnt) — the CMS counter
    matrix over token OCCURRENCES (ctf). depth*width rows max."""
    # pre-aggregate occurrences per term BEFORE the depth explode: the
    # md5 bucket pipeline then runs depth*|vocab| times instead of
    # depth*total_occurrences (the sketch is a sum of per-term counts,
    # so weighting the bucket agg by ctf is count-identical)
    tok = docs.select(F.explode("tokens").alias("term"))
    ctf = tok.groupBy("term").agg(F.count("*").alias("ctf"))
    deep = ctf.select(
        "term", "ctf",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        deep.select(
            "d", "ctf",
            _bucket_col(F.col("d"), F.col("term"), width).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("ctf").cast("long").alias("cnt"))
    )


def cms_estimates(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(term, ctf, est) for every dictionary term: exact corpus
    frequency beside its CMS point estimate (min over depths). The
    one-sided bound est >= ctf is asserted in tests and visible in the
    gate artifact. The dictionary join probes the depth*width matrix —
    broadcastable at any corpus size (the sketch is fixed-size)."""
    cms = cms_build(docs, depth, width)
    tok = docs.select(F.explode("tokens").alias("term"))
    truth = tok.groupBy("term").agg(F.count("*").cast("long").alias("ctf"))
    probes = truth.select(
        "term", "ctf",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    probes = probes.withColumn(
        "bucket", _bucket_col(F.col("d"), F.col("term"), width)
    )
    joined = probes.join(F.broadcast(cms), ["d", "bucket"])
    return (
        joined.groupBy("term", "ctf")
        .agg(F.min("cnt").cast("long").alias("est"))
        .orderBy("term")
    )


def cms_estimates_sql(
    toks_cte: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    return (
        f"WITH {toks_cte}, "
        "tok AS (SELECT unnest(toks) AS term FROM docs), "
        f"deep AS (SELECT term, unnest(range({depth})) AS d FROM tok), "
        "cms AS (SELECT d, ('0x' || substr(md5(d::VARCHAR || '|' || term), 1, 8))::BIGINT "
        f"% {width} AS bucket, CAST(count(*) AS BIGINT) AS cnt FROM deep GROUP BY 1, 2), "
        "truth AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM tok GROUP BY term), "
        f"probes AS (SELECT term, ctf, unnest(range({depth})) AS d FROM truth), "
        "pb AS (SELECT term, ctf, d, ('0x' || substr(md5(d::VARCHAR || '|' || term), 1, 8))::BIGINT "
        f"% {width} AS bucket FROM probes) "
        "SELECT pb.term, pb.ctf, CAST(min(cms.cnt) AS BIGINT) AS est "
        "FROM pb JOIN cms ON cms.d = pb.d AND cms.bucket = pb.bucket "
        "GROUP BY pb.term, pb.ctf ORDER BY pb.term"
    )


def kmv_distinct(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """1 row (n_distinct, est) — exact distinct token count beside the
    bottom-k (KMV) estimate from the k smallest 32-bit hash values of
    the distinct term set. The bottom-k is a TakeOrdered (distributed
    partial top-k, no global sort); the exact count is one agg and is
    reported for the gate's side-by-side only — a production sketch
    run would keep just the k-row bottom."""
    # persist: count() and the bottom-k collect are two actions over
    # the same corpus-tokenize + distinct lineage — without the pin the
    # dominant cost of the sketch build runs twice
    terms = docs.select(F.explode("tokens").alias("term")).distinct().persist()
    hashed = terms.select(
        F.conv(F.substring(F.md5(F.encode(F.col("term"), "utf-8")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    n = terms.count()
    bottom = [r["h"] for r in hashed.orderBy("h").limit(k).collect()]
    terms.unpersist()
    if len(bottom) >= k:
        est = (k - 1) / (float(bottom[-1]) / _HASH_SPACE)
    else:
        est = float(len(bottom))  # fewer keys than k: bottom is exact
    spark = docs.sparkSession
    from ..functions.rounding import round6_py

    return spark.createDataFrame(
        [(int(n), float(round6_py(est)))], "n_distinct long, est double"
    )


def _dd_consts(alpha: float):
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    return math.log(gamma), gamma + 1.0


def ddsketch_buckets(df: DataFrame, col: str, alpha: float = 0.01) -> DataFrame:
    """DDSketch log-bucket histogram over a positive numeric column ->
    (k, c) with k = ceil(ln(x)/ln(gamma)), gamma = (1+alpha)/(1-alpha)
    (Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable Quantile
    Sketch with Relative-Error Guarantees", VLDB 2019 — public paper).

    One map-side-combinable groupBy; the sketch is a sum, so corpus
    shards pre-combine before the shuffle and shard sketches merge by
    bucket-count addition (``ddsketch_merge``) with NO approximation
    added by the merge — unlike rank-based sketches (t-digest), the
    bucket boundaries are data-independent, so merged == rebuilt,
    exactly (integer counts; property-tested). Non-positive values are
    out of the sketch's domain and are excluded (callers needing them
    keep a separate sign store, as the paper does)."""
    ln_g, _ = _dd_consts(alpha)
    return (
        df.where(F.col(col) > 0)
        .select(
            F.ceil(F.log(F.col(col).cast("double")) / F.lit(ln_g))
            .cast("long")
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("c"))
    )


def ddsketch_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two bucket relations by addition — exact, associative."""
    return a.unionByName(b).groupBy("k").agg(F.sum("c").cast("long").alias("c"))


def ddsketch_quantiles(
    df: DataFrame, col: str, qs: List[float], alpha: float = 0.01
) -> DataFrame:
    """(q, k, est, n): for each quantile q, the first bucket (ascending
    key) whose cumulative count exceeds rank q*(n-1), and the bucket
    midpoint estimate 2*gamma^k/(gamma+1) — within alpha relative error
    of the exact rank item (asserted in tests). The cumulative window
    runs over the BUCKET relation (fixed-size, bounded by
    ln(max/min)/ln(gamma) buckets), never the data."""
    from pyspark.sql.window import Window

    ln_g, g1 = _dd_consts(alpha)
    spark = df.sparkSession
    b = ddsketch_buckets(df, col, alpha)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    cum = b.withColumn("cum", F.sum("c").over(w))
    tot = b.agg(F.sum("c").cast("long").alias("n"))
    qdf = spark.createDataFrame([(float(q),) for q in sorted(qs)], "q double")
    sel = (
        qdf.crossJoin(F.broadcast(tot))
        .join(cum, F.col("cum") > F.col("q") * (F.col("n") - 1))
        .groupBy("q", "n")
        .agg(F.min("k").cast("long").alias("k"))
    )
    est = F.lit(2.0) * F.exp(F.col("k") * F.lit(ln_g)) / F.lit(g1)
    return sel.select(
        "q", "k", round6(est).alias("est"), F.col("n")
    ).orderBy("q")


def ddsketch_quantiles_sql(
    source_sql: str, qs: List[float], alpha: float = 0.01
) -> str:
    """DuckDB mirror: ``source_sql`` must yield one positive double
    column ``x``. Same ln/exp lanes, same Python-computed literals."""
    ln_g, g1 = _dd_consts(alpha)
    qvals = ", ".join(f"({sql_double(q)})" for q in sorted(qs))
    return (
        # x > 0 mirrors the Spark side's filter — without it one
        # non-positive source value crashes ln() in DuckDB while Spark
        # silently sketches the positive subset
        f"WITH v AS (SELECT x FROM ({source_sql}) WHERE x > 0), "
        f"b AS (SELECT CAST(ceil(ln(x) / {sql_double(ln_g)}) AS BIGINT) AS k, "
        "CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1), "
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM b), "
        "cum AS (SELECT k, c, sum(c) OVER (ORDER BY k) AS cum FROM b), "
        f"qs(q) AS (VALUES {qvals}), "
        "sel AS (SELECT q, (SELECT n FROM tot) AS n, CAST(min(k) AS BIGINT) AS k "
        "FROM qs JOIN cum ON cum.cum > qs.q * ((SELECT n FROM tot) - 1) GROUP BY q) "
        f"SELECT q, k, {round6_sql(f'2.0 * exp(k * {sql_double(ln_g)}) / {sql_double(g1)}')} AS est, n "
        "FROM sel ORDER BY q"
    )


def kmv_distinct_sql(toks_cte: str, k: int = KMV_K) -> str:
    return (
        f"WITH {toks_cte}, "
        "terms AS (SELECT DISTINCT unnest(toks) AS term FROM docs), "
        "hashed AS (SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM terms), "
        f"bottom AS (SELECT h FROM hashed ORDER BY h LIMIT {k}), "
        "kth AS (SELECT max(h) AS hk, count(*) AS nb FROM bottom) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM terms) AS n_distinct, "
        f"{round6_sql(f'CASE WHEN (SELECT nb FROM kth) >= {k} THEN ({k} - 1) / (CAST((SELECT hk FROM kth) AS DOUBLE) / {sql_double(_HASH_SPACE)}) ELSE CAST((SELECT nb FROM kth) AS DOUBLE) END')} AS est"
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA 2007 — public
# paper; the Elasticsearch `cardinality` aggregation's sketch)
# ---------------------------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 registers, ~1.6% relative error
_HLL_W_CHARS = 12  # 48-bit rho tail (12 hex chars), rho in 1..49


def _hll_alpha(m: int) -> float:
    # the paper's bias-correction constants
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_check_p(p: int) -> int:
    # hex-aligned register prefixes only: bucket = the first p/4 md5
    # hex chars, rho tail = the NEXT 12 chars — both engines slice the
    # same characters, so the sketch is bit-identical by construction
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(f"p must be one of 4, 8, 12, 16: {p}")
    return p


# the engine-portable leading-zero count of the 48-bit rho tail: strip
# leading '0' hex chars, then map the first surviving hex digit to its
# in-digit leading-zero count. Spelled as ONE expression string used
# verbatim by both engines (Spark F.expr / DuckDB SQL).
_HLL_RHO_EXPR = (
    "CASE WHEN t = '' THEN 49 ELSE 4 * (12 - length(t)) + "
    "(CASE WHEN substr(t, 1, 1) = '1' THEN 3 "
    "WHEN substr(t, 1, 1) IN ('2', '3') THEN 2 "
    "WHEN substr(t, 1, 1) IN ('4', '5', '6', '7') THEN 1 "
    "ELSE 0 END) + 1 END"
)


def hll_registers(docs: DataFrame, p: int = HLL_P) -> DataFrame:
    """docs(doc_id, tokens) -> (bucket, rho) — the HLL register table
    over the corpus's DISTINCT token set: bucket = the first p/4 md5
    hex chars (2^p registers), rho = leading-zero count of the next
    48 bits + 1, register value = max rho seen.

    Scale shape: one explode + distinct (the only shuffle), then a
    map-side-combinable max groupBy onto at most 2^p rows. Shard
    sketches merge by register-wise max (hll_merge) — the estimate of
    the merged table is exactly the estimate of the union corpus,
    which is the whole point of carrying the sketch instead of the
    distinct set."""
    _hll_check_p(p)
    terms = docs.select(F.explode("tokens").alias("term")).distinct()
    return _hll_registers_from_terms(terms, p)


def _hll_registers_from_terms(terms: DataFrame, p: int) -> DataFrame:
    bc = p // 4
    br = terms.select(
        F.conv(F.substring(F.md5(F.encode(F.col("term"), "utf-8")), 1, bc), 16, 10)
        .cast("long")
        .alias("bucket"),
        F.regexp_replace(
            F.substring(
                F.md5(F.encode(F.col("term"), "utf-8")), bc + 1, _HLL_W_CHARS
            ),
            "^0+",
            "",
        ).alias("t"),
    )
    return (
        br.withColumn("rho", F.expr(_HLL_RHO_EXPR).cast("int"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketches: List[DataFrame]) -> DataFrame:
    """Register-wise max of shard sketches — the HLL merge. The merged
    table is identical to the sketch rebuilt over the union corpus
    (max is associative/commutative over the per-term rho values)."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, p: int = HLL_P) -> DataFrame:
    """register table -> 1 row (n_empty, est): the raw HLL harmonic
    estimate alpha_m * m^2 / sum_j 2^-M[j] (empty registers contribute
    2^0 = 1), with the paper's small-range linear-counting correction
    (raw <= 2.5m and V > 0 -> m * ln(m / V)). The 2^-rho terms are
    exact powers of two but their SUM is not order-free at 53-bit
    mantissa, so both engines fold in bucket order (canonical fold —
    the <=2^p-row collect is bounded by the sketch size, never the
    corpus)."""
    m = 1 << _hll_check_p(p)
    md = float(m)
    a = _hll_alpha(m) * md * md
    one = regs.agg(
        F.count("*").cast("long").alias("n_reg"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "rho"))),
            F.lit(0.0),
            lambda acc, x: acc + F.pow(F.lit(2.0), -x["rho"].cast("double")),
        ).alias("s_reg"),
    )
    fin = one.select(
        (F.lit(m).cast("long") - F.col("n_reg")).alias("n_empty"),
        (F.lit(a) / F.expr(f"s_reg + ({m} - n_reg) * 1.0")).alias("raw"),
    )
    est = F.when(
        (F.col("raw") <= F.lit(2.5 * md)) & (F.col("n_empty") > 0),
        F.lit(md) * F.log(F.lit(md) / F.col("n_empty").cast("double")),
    ).otherwise(F.col("raw"))
    return fin.select("n_empty", round6(est).alias("est"))


def hll_distinct(docs: DataFrame, p: int = HLL_P) -> DataFrame:
    """1 row (n_distinct, n_empty, est) — exact distinct token count
    beside the HLL estimate (the ES `cardinality` agg's sketch). The
    exact count exists for the gate's side-by-side only; a production
    run keeps just the 2^p-register table (hll_registers) and merges
    shards by register max."""
    _hll_check_p(p)
    terms = docs.select(F.explode("tokens").alias("term")).distinct().persist()
    try:
        n = terms.count()
        out = hll_estimate(_hll_registers_from_terms(terms, p), p)
        row = out.first()
    finally:
        terms.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(int(n), int(row["n_empty"]), float(row["est"]))],
        "n_distinct long, n_empty long, est double",
    )


def hll_distinct_sql(toks_cte: str, p: int = HLL_P) -> str:
    """DuckDB mirror of hll_distinct: identical md5 hex slices,
    identical rho CASE text, bucket-ordered register fold, identical
    correction-branch operand sequence."""
    m = 1 << _hll_check_p(p)
    bc = p // 4
    md = float(m)
    a = _hll_alpha(m) * md * md
    correction = (
        f"CASE WHEN raw <= {sql_double(2.5 * md)} AND n_empty > 0 "
        f"THEN {sql_double(md)} * ln({sql_double(md)} / CAST(n_empty AS DOUBLE)) "
        "ELSE raw END"
    )
    return (
        f"WITH {toks_cte}, "
        "terms AS (SELECT DISTINCT unnest(toks) AS term FROM docs), "
        "hx AS (SELECT md5(term) AS hx FROM terms), "
        f"br AS (SELECT ('0x' || substr(hx, 1, {bc}))::BIGINT AS bucket, "
        f"regexp_replace(substr(hx, {bc + 1}, {_HLL_W_CHARS}), '^0+', '') AS t FROM hx), "
        f"rho AS (SELECT bucket, {_HLL_RHO_EXPR} AS rho FROM br), "
        "regs AS (SELECT bucket, max(rho) AS rho FROM rho GROUP BY bucket), "
        "agg AS (SELECT CAST(count(*) AS BIGINT) AS n_reg, "
        "coalesce(sum(pow(2.0, -rho) ORDER BY bucket), 0.0) AS s_reg FROM regs), "
        f"fin AS (SELECT ({m} - n_reg) AS n_empty, "
        f"{sql_double(a)} / (s_reg + ({m} - n_reg) * 1.0) AS raw FROM agg) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM terms) AS n_distinct, "
        "CAST(n_empty AS BIGINT) AS n_empty, "
        f"{round6_sql(correction)} AS est FROM fin"
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970 — public paper; the membership sketch a
# pipeline consults before touching the index: "might this term /
# url / fingerprint exist?" with zero false negatives)
# ---------------------------------------------------------------------------

BLOOM_BITS = 65536          # 2^16 bits
_BLOOM_WORD = 32            # bits per word, stored in BIGINT (< 2^32: no
                            # sign hazard in either engine's << / bit_or)
BLOOM_WORDS = BLOOM_BITS // _BLOOM_WORD
BLOOM_K = 7                 # double-hashing probes (Kirsch & Mitzenmacher)


def _bloom_h12(term_col):
    """(h1, h2) — two independent 32-bit lanes from one md5 (the
    established md5-slice parity lane; double hashing makes the k
    probe positions h1 + i*h2 mod m, all integer arithmetic)."""
    hx = F.md5(F.encode(term_col, "utf-8"))
    h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return h1, h2


def bloom_build(docs: DataFrame) -> DataFrame:
    """(word_idx, bits) — sparse Bloom bitset over the corpus's DISTINCT
    token set. One distinct + one explode(k probes) + ONE
    map-side-combinable bit_or groupBy into <= BLOOM_WORDS rows;
    sketches of corpus shards merge by bit_or (tested: merge ==
    rebuild). Absent word_idx rows are all-zero words."""
    terms = (
        docs.select(F.explode("tokens").alias("term")).distinct()
        if "tokens" in docs.columns
        else docs.select(F.col("term")).distinct()
    )
    h1, h2 = _bloom_h12(F.col("term"))
    pos = terms.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(BLOOM_K - 1)),
                lambda i: (h1 + i.cast("long") * h2) % F.lit(BLOOM_BITS),
            )
        ).alias("p")
    )
    return (
        pos.select(
            F.expr(f"CAST(p DIV {_BLOOM_WORD} AS INT)").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BLOOM_WORD} AS INT))"
            ).alias("b"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """bit_or union of two sparse Bloom bitsets (same geometry)."""
    return (
        a.unionAll(b).groupBy("word_idx").agg(F.expr("bit_or(bits)").alias("bits"))
    )


def bloom_membership(docs: DataFrame, probes: List[str]) -> DataFrame:
    """(probe, in_bloom, in_vocab) — Bloom probe vs exact membership
    for each probe term: in_bloom is true iff all BLOOM_K probed bits
    are set (never false when in_vocab is true — the zero-false-negative
    contract, asserted by the gate whenever in_vocab holds); in_vocab
    is the exact dictionary answer. The sketch side of the probe join
    is <= BLOOM_WORDS rows and broadcasts."""
    if not probes:
        raise ValueError("probes must be non-empty")
    spark = docs.sparkSession
    bloom = bloom_build(docs)
    terms = (
        docs.select(F.explode("tokens").alias("term")).distinct()
        if "tokens" in docs.columns
        else docs.select(F.col("term")).distinct()
    )
    pr = spark.createDataFrame([(p,) for p in sorted(set(probes))], "probe string")
    h1, h2 = _bloom_h12(F.col("probe"))
    ppos = pr.select(
        "probe",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(BLOOM_K - 1)),
                lambda i: (h1 + i.cast("long") * h2) % F.lit(BLOOM_BITS),
            )
        ).alias("p"),
    ).select(
        "probe",
        F.expr(f"CAST(p DIV {_BLOOM_WORD} AS INT)").alias("word_idx"),
        (F.col("p") % _BLOOM_WORD).cast("int").alias("bit"),
    )
    checked = ppos.join(F.broadcast(bloom), "word_idx", "left").select(
        "probe",
        (
            F.coalesce(
                F.expr("shiftright(bits, bit)") % 2, F.lit(0).cast("long")
            )
            == 1
        ).alias("hit"),
    )
    in_bloom = checked.groupBy("probe").agg(
        F.min(F.col("hit").cast("int")).cast("boolean").alias("in_bloom")
    )
    vocab = pr.join(
        terms, pr["probe"] == terms["term"], "left"
    ).select("probe", F.col("term").isNotNull().alias("in_vocab"))
    return in_bloom.join(vocab, "probe").orderBy("probe")


def bloom_membership_sql(toks_cte: str, probes: List[str]) -> str:
    """DuckDB mirror: identical md5 double-hash lanes, identical
    integer bit arithmetic (m=65536, k=7, 32-bit words in BIGINT)."""
    if not probes:
        raise ValueError("probes must be non-empty")
    pvals = ", ".join(f"('{p}')" for p in sorted(set(probes)))
    m, k, wbits = BLOOM_BITS, BLOOM_K, _BLOOM_WORD
    return (
        f"WITH {toks_cte}, "
        "terms AS (SELECT DISTINCT unnest(toks) AS term FROM docs), "
        "th AS (SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT AS h1, "
        "('0x' || substr(md5(term), 9, 8))::BIGINT AS h2 FROM terms), "
        f"ks AS (SELECT unnest(generate_series(0, {k - 1})) AS i), "
        f"pos AS (SELECT (h1 + i * h2) % {m} AS p FROM th CROSS JOIN ks), "
        f"bloom AS (SELECT CAST(p // {wbits} AS INT) AS word_idx, "
        f"bit_or(1::BIGINT << CAST(p % {wbits} AS INT)) AS bits FROM pos GROUP BY 1), "
        f"probes(probe) AS (VALUES {pvals}), "
        "ph AS (SELECT probe, ('0x' || substr(md5(probe), 1, 8))::BIGINT AS h1, "
        "('0x' || substr(md5(probe), 9, 8))::BIGINT AS h2 FROM probes), "
        f"pp AS (SELECT probe, (h1 + i * h2) % {m} AS p FROM ph CROSS JOIN ks), "
        f"chk AS (SELECT probe, coalesce((b.bits >> CAST(p % {wbits} AS INT)) % 2, 0) = 1 AS hit "
        f"FROM pp LEFT JOIN bloom b ON b.word_idx = CAST(p // {wbits} AS INT)) "
        "SELECT probe, CAST(min(CAST(hit AS INT)) AS BOOLEAN) AS in_bloom, "
        "probe IN (SELECT term FROM terms) AS in_vocab "
        "FROM chk GROUP BY probe ORDER BY probe"
    )
