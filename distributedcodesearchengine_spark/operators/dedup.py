"""Deduplication operators for a training-data pipeline.

- exact dedup: content-hash groupBy (the scalable exact pass)
- MinHash + LSH: token-3-gram shingles -> NH md5-minhashes -> banded
  signatures -> bucket self-join candidates -> exact Jaccard verify.
  The minhash uses the LEXICOGRAPHIC MIN OF MD5 HEX STRINGS, which is a
  portable uniform hash both Spark and DuckDB compute identically (no
  engine-specific hash()), so every stage is oracle-checkable.
- SimHash (32-bit): per-token md5-derived uint32, per-bit +/-1 votes
  summed per doc, sign -> bit.
- n-gram Jaccard: exact pairwise similarity on a bounded sample.

Scale notes: shingle explosion + groupBy(doc) minhash is a single
shuffle; the LSH self-join is band-bucket-partitioned (candidates only,
never all-pairs); exact verify touches candidate pairs only. At 10^12
docs the band join is the standard near-dup pattern (e.g. the C4 /
RefinedWeb pipelines in public literature).

Spark impls are JVM expressions end-to-end; DuckDB SQL builders are
colocated and mirror them operand-for-operand.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql

N_HASHES = 8
N_BANDS = 4  # rows-per-band = N_HASHES // N_BANDS = 2

SHINGLES_EXPR = (
    "CASE WHEN size(tokens) >= 3 THEN "
    "transform(sequence(0, size(tokens) - 3), "
    "i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2])) "
    "ELSE array() END"
)

SHINGLES_SQL = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) "
    "ELSE [] END"
)


def exact_dedup_summary(documents: DataFrame) -> DataFrame:
    """Single-row exact-dup stats by content hash (md5 of raw text)."""
    h = documents.select(F.md5(F.encode(F.col("text"), "utf-8")).alias("h"))
    g = h.groupBy("h").agg(F.count("*").alias("n"))
    return g.agg(
        F.count("*").alias("n_distinct"),
        F.sum("n").alias("n_docs"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)).alias("n_dup_docs"),
    )


def exact_dedup_summary_sql() -> str:
    return (
        "WITH g AS (SELECT md5(text) AS h, count(*) AS n FROM documents GROUP BY 1) "
        "SELECT count(*) AS n_distinct, CAST(sum(n) AS BIGINT) AS n_docs, "
        "CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_dup_docs FROM g"
    )


def with_shingles(docs: DataFrame) -> DataFrame:
    return docs.withColumn("shingles", F.expr(SHINGLES_EXPR))


def minhash_signatures(
    docs: DataFrame, n_hashes: int = N_HASHES, ordered: bool = True
) -> DataFrame:
    """(doc_id, mh0..mh{n-1}) — min over shingles of md5(i || '|' || s).
    Docs with no shingles (< 3 tokens) are excluded.

    ``ordered=False`` skips the final global sort — the LSH/cross-dedup
    pipelines immediately re-shuffle by band bucket, so paying a
    corpus-wide range sort there buys nothing; ordering is an
    oracle-comparison concern only."""
    sh = (
        with_shingles(docs)
        .where(F.size("shingles") > 0)
        .select("doc_id", F.explode("shingles").alias("sh"))
    )
    aggs = [
        F.min(F.md5(F.encode(F.concat(F.lit(f"{i}|"), F.col("sh")), "utf-8"))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    out = sh.groupBy("doc_id").agg(*aggs)
    return out.orderBy("doc_id") if ordered else out


def minhash_signatures_sql(table_toks_cte: str, n_hashes: int = N_HASHES) -> str:
    mins = ", ".join(
        f"min(md5('{i}|' || sh)) AS mh{i}" for i in range(n_hashes)
    )
    return (
        f"WITH {table_toks_cte}, "
        f"shd AS (SELECT doc_id, {SHINGLES_SQL} AS shingles FROM docs), "
        "sh AS (SELECT doc_id, unnest(shingles) AS sh FROM shd WHERE len(shingles) > 0) "
        f"SELECT doc_id, {mins} FROM sh GROUP BY doc_id ORDER BY doc_id"
    )


def _band_cols(n_bands: int = N_BANDS, rows: int = N_HASHES // N_BANDS):
    return [
        F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(n_bands)
    ]


def lsh_candidate_pairs(
    docs: DataFrame, jaccard_min: float = 0.2, max_bucket: int = 2000
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — banded-LSH candidates verified with the
    exact shingle-set Jaccard; only pairs sharing >= 1 band bucket.

    ``max_bucket`` drops degenerate mega-buckets (e.g. boilerplate pages
    that collide an entire band) from candidate generation so no bucket
    can go quadratic in the self-join; the cap is mirrored in the DuckDB
    oracle, and capped content still pairs through its other bands."""
    sigs = minhash_signatures(docs, ordered=False).select("doc_id", *_band_cols())
    bands = None
    for b in range(N_BANDS):
        part = sigs.select(
            F.lit(b).alias("band_id"), F.col(f"band{b}").alias("sig"), "doc_id"
        )
        bands = part if bands is None else bands.unionByName(part)
    # anti-join against the OVER-cap bucket list: that list is tiny
    # (degenerate buckets only) and broadcastable even at 10^12 docs,
    # where the complement (all kept buckets) would not be
    overfull = (
        bands.groupBy("band_id", "sig")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
        .select("band_id", "sig")
    )
    bands = bands.join(F.broadcast(overfull), ["band_id", "sig"], "left_anti")
    a = bands.alias("a")
    bb = bands.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _jaccard_verify(docs, cand, jaccard_min)


def _jaccard_verify(docs: DataFrame, pairs: DataFrame, jaccard_min: float) -> DataFrame:
    sh = (
        with_shingles(docs)
        .select("doc_id", F.explode(F.array_distinct("shingles")).alias("sh"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        pairs.join(sha, "doc_a").join(shb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(na, "doc_a").join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= jaccard_min)
        .select("doc_a", "doc_b", round6("jaccard").alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )
    return out


def lsh_candidate_pairs_sql(
    table_toks_cte: str, jaccard_min: float = 0.2, max_bucket: int = 2000
) -> str:
    rows = N_HASHES // N_BANDS
    band_select = ", ".join(
        "(" + " || ".join(f"mh{b * rows + r}" for r in range(rows)) + f") AS band{b}"
        for b in range(N_BANDS)
    )
    band_union = " UNION ALL ".join(
        f"SELECT {b} AS band_id, band{b} AS sig, doc_id FROM sigs"
        for b in range(N_BANDS)
    )
    mins = ", ".join(f"min(md5('{i}|' || sh)) AS mh{i}" for i in range(N_HASHES))
    return (
        f"WITH {table_toks_cte}, "
        f"shd AS (SELECT doc_id, {SHINGLES_SQL} AS shingles FROM docs), "
        "sh0 AS (SELECT doc_id, unnest(shingles) AS sh FROM shd WHERE len(shingles) > 0), "
        f"mh AS (SELECT doc_id, {mins} FROM sh0 GROUP BY doc_id), "
        f"sigs AS (SELECT doc_id, {band_select} FROM mh), "
        f"bands0 AS ({band_union}), "
        "overfull AS (SELECT band_id, sig FROM bands0 GROUP BY band_id, sig "
        f"  HAVING count(*) > {max_bucket}), "
        "bands AS (SELECT b.* FROM bands0 b ANTI JOIN overfull o "
        "  ON o.band_id = b.band_id AND o.sig = b.sig), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.sig = b.sig "
        "  AND a.doc_id < b.doc_id), "
        "shd2 AS (SELECT doc_id, unnest(list_distinct(shingles)) AS sh FROM shd), "
        "sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd2 GROUP BY doc_id), "
        "inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter "
        "  FROM cand c JOIN shd2 x ON x.doc_id = c.doc_a "
        "  JOIN shd2 y ON y.doc_id = c.doc_b AND y.sh = x.sh "
        "  GROUP BY c.doc_a, c.doc_b) "
        f"SELECT i.doc_a, i.doc_b, {round6_sql('CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter)')} AS jaccard "
        "FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a "
        "JOIN sizes sb ON sb.doc_id = i.doc_b "
        f"WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) >= {jaccard_min} "
        "ORDER BY doc_a, doc_b"
    )


def dedup_clusters(docs: DataFrame, jaccard_min: float = 0.2, max_iter: int = 25) -> DataFrame:
    """(doc_id, cluster_id) — connected components over the LSH near-dup
    pair graph (the C4/RefinedWeb 'cluster near-dups, keep one
    representative per cluster' pass). cluster_id = min doc_id in the
    component; only docs appearing in >= 1 candidate pair are emitted
    (everything else is its own trivial cluster).

    Iterative min-label propagation: each round one key-partitioned
    shuffle (edges ⋈ labels, groupBy min), O(component diameter) rounds;
    convergence when the label sum stops decreasing (labels are
    monotonically non-increasing). Each round's labels are
    localCheckpoint'ed to cut lineage (labels feeds the plan twice per
    round, so without truncation the logical plan QUADRUPLES per round
    and a high-diameter component stalls the driver) — the joins
    themselves stay shuffle-bounded by the (small) pair graph, never
    the corpus."""
    pairs = lsh_candidate_pairs(docs, jaccard_min).select("doc_a", "doc_b")
    labels = min_label_propagation(pairs, max_iter=max_iter)
    return labels.select("doc_id", F.col("lab").alias("cluster_id")).orderBy("doc_id")


def min_label_propagation(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """pairs(doc_a, doc_b) -> (doc_id, lab) with lab = min doc_id of the
    connected component. Factored out of ``dedup_clusters`` so the
    convergence/lineage behavior is testable on synthetic graphs
    (e.g. a path of diameter >> 5)."""
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("lab", F.col("doc_id"))
        .persist()
    )
    prev_sum = labels.agg(F.sum("lab")).first()[0]
    converged = False
    for it in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("doc_id", "doc_b"), "doc_b")
            .groupBy("doc_a")
            .agg(F.min("lab").alias("nbr_lab"))
            .withColumnRenamed("doc_a", "doc_id")
        )
        new_labels = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("lab"), F.coalesce("nbr_lab", F.col("lab"))).alias("lab"),
        )
        # lineage control: labels appears TWICE per round (nbr side +
        # join side), so under plain persist the LOGICAL plan quadruples
        # every round (4 -> 20 -> 84 -> 340 joins measured) and a
        # high-diameter component stalls the driver on plan analysis.
        # localCheckpoint truncates to a LogicalRDD each round; the
        # convergence action below materializes it anyway, so this costs
        # nothing extra over persist
        new_labels = new_labels.localCheckpoint(eager=False)
        new_sum = new_labels.agg(F.sum("lab")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    edges.unpersist()
    if not converged:
        # min propagates ONE hop per round: a component whose diameter
        # exceeds max_iter (a 30-doc near-dup chain of incrementally
        # edited boilerplate) would otherwise return silently WRONG
        # multi-label components while the recursive-CTE oracle computes
        # the true ones — fail loudly instead of under-deduping
        raise RuntimeError(
            f"min_label_propagation did not converge in {max_iter} "
            "rounds (component diameter exceeds max_iter); raise "
            "max_iter for this graph"
        )
    return labels


def dedup_clusters_sql(table_toks_cte: str, jaccard_min: float = 0.2) -> str:
    lsh = lsh_candidate_pairs_sql(table_toks_cte, jaccard_min)
    return (
        f"WITH RECURSIVE edges AS (SELECT doc_a, doc_b FROM ({lsh})), "
        "sym AS (SELECT doc_a AS s, doc_b AS d FROM edges "
        "  UNION ALL SELECT doc_b, doc_a FROM edges), "
        "verts AS (SELECT DISTINCT s FROM sym), "
        "reach(s, d) AS (SELECT s, s FROM verts "
        "  UNION SELECT r.s, y.d FROM reach r JOIN sym y ON y.s = r.d) "
        "SELECT s AS doc_id, CAST(min(d) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY s ORDER BY doc_id"
    )


def simhash32(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 32-bit simhash from md5-derived token hashes
    (per-bit +/-1 votes with multiplicity; tie -> bit 0)."""
    tok = docs.select("doc_id", F.explode("tokens").alias("t"))
    tok = tok.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.encode(F.col("t"), "utf-8")), 1, 8), 16, 10).cast("long"),
    )
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{j}")
        for j in range(32)
    ]
    per_doc = tok.groupBy("doc_id").agg(*votes)
    bit_sum = None
    for j in range(32):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
        bit_sum = term if bit_sum is None else bit_sum + term
    return per_doc.select("doc_id", bit_sum.alias("simhash")).orderBy("doc_id")


def simhash32_sql(table_toks_cte: str) -> str:
    votes = ", ".join(
        f"sum((((('0x' || substr(md5(t), 1, 8))::BIGINT) >> {j}) & 1) * 2 - 1) AS s{j}"
        for j in range(32)
    )
    bits = " + ".join(
        f"CASE WHEN s{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END" for j in range(32)
    )
    return (
        f"WITH {table_toks_cte}, "
        "tok AS (SELECT doc_id, unnest(toks) AS t FROM docs), "
        f"v AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id) "
        f"SELECT doc_id, {bits} AS simhash FROM v ORDER BY doc_id"
    )


def ngram_jaccard_sample(docs: DataFrame, max_doc: int = 40, jmin: float = 0.0) -> DataFrame:
    """Exact all-pairs Jaccard on a bounded doc_id sample (the oracle
    baseline the LSH path approximates)."""
    small = docs.where(F.col("doc_id") < max_doc)
    pairs = (
        small.select(F.col("doc_id").alias("doc_a"))
        .crossJoin(small.select(F.col("doc_id").alias("doc_b")))
        .where(F.col("doc_a") < F.col("doc_b"))
    )
    return _jaccard_verify(small, pairs, jmin).where(F.col("jaccard") > 0)


def ngram_jaccard_sample_sql(table_toks_cte: str, max_doc: int = 40) -> str:
    return (
        f"WITH {table_toks_cte}, "
        f"small AS (SELECT doc_id, {SHINGLES_SQL} AS shingles FROM docs WHERE doc_id < {max_doc}), "
        "shd2 AS (SELECT doc_id, unnest(list_distinct(shingles)) AS sh FROM small), "
        "sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd2 GROUP BY doc_id), "
        "inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter "
        "  FROM shd2 x JOIN shd2 y ON y.sh = x.sh AND x.doc_id < y.doc_id "
        "  GROUP BY x.doc_id, y.doc_id) "
        f"SELECT i.doc_a, i.doc_b, {round6_sql('CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter)')} AS jaccard "
        "FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a "
        "JOIN sizes sb ON sb.doc_id = i.doc_b "
        "WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) > 0 "
        "ORDER BY doc_a, doc_b"
    )


# ---------------------------------------------------------------------------
# line-level dedup (corpus-wide boilerplate removal)

LINE_DUP_MIN = 3
_LINE_GROUP = 6  # tokens per synthetic line in the gate augmentation


def dedup_lines(
    docs: DataFrame, min_dup: int = LINE_DUP_MIN, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_lines, n_removed, clean_hash) — corpus-wide LINE-level
    dedup, the C4/RefinedWeb boilerplate-removal pass: a line occurring
    ``min_dup``+ times anywhere in the corpus (nav menus, cookie
    banners, copyright footers) is removed from EVERY document;
    survivors are reassembled in original order and pinned by md5 (the
    hash, not the body, keeps the gate rows narrow while pinning every
    surviving byte and its order).

    Scale shape: line frequencies are a groupBy with map-side combine —
    a billion-copy boilerplate line collapses to one row per map task
    BEFORE the shuffle, so hot lines cannot skew the aggregation — and
    the count join back is a hash join on ``line`` that AQE skew-splits
    on the hot keys; reassembly is one groupBy(doc_id) over
    (pos, line) structs. Two shuffles total; no window over a skewed
    key anywhere (a ``count() OVER (PARTITION BY line)`` formulation
    would serialize every copy of a hot line through one task).
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    )
    cnts = lines.groupBy("line").agg(F.count("*").alias("n_occ"))
    j = lines.join(cnts, "line")
    kept = F.when(F.col("n_occ") < min_dup, F.struct("pos", "line"))
    return (
        j.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum((F.col("n_occ") >= min_dup).cast("int"))
            .cast("long")
            .alias("n_removed"),
            F.md5(
                F.encode(
                    F.array_join(
                        # collect_list drops the nulls from the removed
                        # lines; array_sort on (pos, line) restores
                        # document order
                        F.transform(
                            F.array_sort(F.collect_list(kept)), lambda x: x["line"]
                        ),
                        "\n",
                    ),
                    "utf-8",
                )
            ).alias("clean_hash"),
        )
        .orderBy("doc_id")
    )


def dedup_lines_sql(
    augmented_cte: str, min_dup: int = LINE_DUP_MIN, text_col: str = "txt"
) -> str:
    """Oracle over ``augmented_cte`` = ``a AS (SELECT doc_id, ... AS txt
    FROM ...)`` — the same two-shuffle plan as straight-line SQL."""
    return (
        f"WITH {augmented_cte}, "
        f"l0 AS (SELECT doc_id, string_split({text_col}, chr(10)) AS ls FROM a), "
        "l AS (SELECT doc_id, i AS pos, ls[i] AS line FROM l0, "
        "unnest(generate_series(1, len(ls))) AS _t(i)), "
        "c AS (SELECT line, count(*) AS n_occ FROM l GROUP BY 1), "
        "j AS (SELECT l.doc_id, l.pos, l.line, c.n_occ FROM l JOIN c USING (line)) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
        f"CAST(sum(CASE WHEN n_occ >= {min_dup} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_removed, "
        "md5(coalesce(string_agg(line, chr(10) ORDER BY pos) "
        f"FILTER (WHERE n_occ < {min_dup}), '')) AS clean_hash "
        "FROM j GROUP BY doc_id ORDER BY doc_id"
    )


# The corpus is single-line word-soup, so the gate wrapper (same
# pattern as pipeline.pii_scrub_augmented) renders each document as a
# multi-line page IDENTICALLY in both engines: a shared nav header,
# the body split into 6-token lines, and one of two rotating footers —
# the header/footers are the corpus-wide boilerplate the pass removes,
# while body lines dedup only where content genuinely repeats.
_LINE_HEADER = "site menu home about contact"
_LINE_FOOT_A = "subscribe to our newsletter today"
_LINE_FOOT_B = "copyright example corp all rights reserved"


def _lines_augment_spark() -> F.Column:
    g = _LINE_GROUP
    return F.expr(
        f"concat('{_LINE_HEADER}', chr(10), "
        f"array_join(transform(sequence(0, (size(w) - 1) DIV {g}), "
        f"g -> array_join(slice(w, g * {g} + 1, {g}), ' ')), chr(10)), chr(10), "
        f"CASE WHEN doc_id % 3 = 0 THEN '{_LINE_FOOT_A}' "
        f"ELSE '{_LINE_FOOT_B}' END)"
    )


def _lines_augment_sql(table: str = "documents") -> str:
    g = _LINE_GROUP
    return (
        f"w0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}), "
        f"a AS (SELECT doc_id, '{_LINE_HEADER}' || chr(10) || "
        f"array_to_string(list_transform(generate_series(0, (len(w) - 1) // {g}), "
        f"g -> array_to_string(w[g * {g} + 1:g * {g} + {g}], ' ')), chr(10)) "
        f"|| chr(10) || CASE WHEN doc_id % 3 = 0 THEN '{_LINE_FOOT_A}' "
        f"ELSE '{_LINE_FOOT_B}' END AS txt FROM w0)"
    )


def dedup_lines_augmented(documents: DataFrame) -> DataFrame:
    """Gate wrapper: render the corpus as multi-line pages with shared
    boilerplate, then run the line-dedup pass."""
    return dedup_lines(
        documents.select(
            "doc_id", F.split("text", " ", -1).alias("w")
        ).select("doc_id", _lines_augment_spark().alias("text"))
    )


def dedup_lines_augmented_sql(table: str = "documents") -> str:
    return dedup_lines_sql(_lines_augment_sql(table))


# ---------------------------------------------------------------------------
# duplicated-substring detection (ExactSubstr-family profile)

SPAN_W = 8


def dup_spans(
    docs: DataFrame, w: int = SPAN_W, anchor_mod: int = 1
) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_frac, first_dup_tok) —
    per-document duplicated-substring profile: every ``w``-token window
    is fingerprinted (md5 of the joined window) and a window whose
    fingerprint occurs 2+ times ANYWHERE in the corpus (other docs or
    elsewhere in the same doc) counts as duplicated. The per-doc
    duplicated fraction is the drop/trim signal of the ExactSubstr
    dedup family (suffix-array substring dedup re-expressed as a
    fingerprint frequency join); ``first_dup_tok`` (-1 if none) is
    where a trimmer would start cutting.

    ``anchor_mod`` is the scale knob: with 1 every position anchors a
    window (exact, |tokens| rows). With s > 1 only positions whose
    FIRST token hashes to 0 mod s do — CONTENT-DEFINED anchoring
    (winnowing-style), so both copies of a duplicated span anchor at
    the same tokens regardless of their offsets in their documents; a
    fixed-stride subsample would misalign copies at different parities
    and silently miss them. Expected row reduction ~s with recall on
    spans containing >= 1 anchor.

    Scale shape: one explode (|tokens|/s rows of 16-byte fingerprints),
    one map-side-combined groupBy(h), one join back (AQE skew-splits a
    mega-duplicated span's fingerprint), one groupBy(doc_id). Same
    skeleton as minhash/dedup_lines — the canonical pattern.
    """
    anchor = (
        ""
        if anchor_mod <= 1
        else (
            f"filter(_starts0, i -> (conv(substring(md5(encode("
            f"tokens[i], 'utf-8')), 1, 8), 16, 10) % {anchor_mod}) = 0)"
        )
    )
    base = (
        f"CASE WHEN size(tokens) >= {w} THEN "
        f"sequence(0, size(tokens) - {w}) ELSE array() END"
    )
    d = docs.withColumn("_starts0", F.expr(base))
    if anchor:
        d = d.withColumn("_starts0", F.expr(anchor))
    spans = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(_starts0, i -> struct(i AS pos, "
                f"md5(encode(array_join(slice(tokens, i + 1, {w}), ' '), "
                "'utf-8')) AS h))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    cnts = spans.groupBy("h").agg(F.count("*").alias("n"))
    j = spans.join(cnts, "h")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum((F.col("n") >= 2).cast("int")).cast("long").alias("n_dup_windows"),
            F.min(F.when(F.col("n") >= 2, F.col("pos"))).alias("_first"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            round6(
                F.col("n_dup_windows") * F.lit(1.0) / F.col("n_windows")
            ).alias("dup_frac"),
            F.coalesce(F.col("_first"), F.lit(-1)).cast("long").alias("first_dup_tok"),
        )
        .orderBy("doc_id")
    )


def dup_spans_sql(
    table_toks_cte: str, w: int = SPAN_W, anchor_mod: int = 1
) -> str:
    anchor_pred = (
        ""
        if anchor_mod <= 1
        else (
            f" AND ('0x' || substr(md5(toks[i + 1]), 1, 8))::BIGINT "
            f"% {anchor_mod} = 0"
        )
    )
    return (
        f"WITH {table_toks_cte}, "
        f"g AS (SELECT doc_id, i AS pos, "
        f"md5(array_to_string(toks[i + 1:i + {w}], ' ')) AS h "
        f"FROM docs, unnest(generate_series(0, len(toks) - {w})) AS _t(i) "
        f"WHERE len(toks) >= {w}{anchor_pred}), "
        "c AS (SELECT h, count(*) AS n FROM g GROUP BY 1), "
        "j AS (SELECT g.doc_id, g.pos, c.n FROM g JOIN c USING (h)) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows, "
        "CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows, "
        f"{round6_sql('sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)')} "
        "AS dup_frac, "
        "CAST(coalesce(min(CASE WHEN n >= 2 THEN pos END), -1) AS BIGINT) "
        "AS first_dup_tok "
        "FROM j GROUP BY doc_id ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# survivorship policy: keep-best-quality dedup
# ---------------------------------------------------------------------------


def dedup_keep_best(docs: DataFrame) -> DataFrame:
    """(doc_id, group_n, quality) — exact dedup with a QUALITY
    survivorship policy: group by the whitespace-normalized lowercase
    content fingerprint (doc_fingerprint's key) and keep, per group,
    the member with the highest quality score (ties -> smallest
    doc_id) — the curation-grade alternative to min-doc_id
    survivorship (two mirrors of one page rarely have equal boiler-
    plate; you want the clean one, not the first-crawled one).
    ``quality`` is the round6 output of the gate-proven quality_score
    lane, so the comparison key is bit-identical cross-engine.

    Scale: the quality pass is per-row; the group reduce is ONE
    map-side-combinable struct-max (the events_latest shape — each
    partition reduces its members to one candidate before the
    shuffle; the naive per-group row_number sort would move every
    duplicate of every mirror farm)."""
    from .textstats import quality_score

    q = quality_score(docs, keep=("text",))
    keyed = q.select(
        "doc_id",
        "quality",
        F.md5(
            F.encode(
                F.trim(
                    F.regexp_replace(
                        F.lower(F.col("text")), r"[ \t\n\x0B\f\r]+", " "
                    )
                ),
                "utf-8",
            )
        ).alias("fp"),
    )
    g = keyed.groupBy("fp").agg(
        F.count("*").cast("long").alias("group_n"),
        F.max(
            F.struct(
                F.col("quality"),
                (-F.col("doc_id")).alias("nd"),
                F.col("doc_id").alias("d"),
            )
        ).alias("m"),
    )
    return g.select(
        F.col("m.d").alias("doc_id"),
        "group_n",
        F.col("m.quality").alias("quality"),
    ).orderBy("doc_id")


def dedup_keep_best_sql(table_toks_cte: str) -> str:
    """DuckDB mirror of dedup_keep_best: the quality chain + the
    per-fingerprint (quality desc, doc_id asc) rank-1 cut."""
    from .textstats import quality_score_sql

    q = quality_score_sql(table_toks_cte)
    return (
        f"WITH qq AS ({q}), "
        "keyed AS (SELECT qq.doc_id, qq.quality, "
        r"md5(trim(regexp_replace(lower(t.text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp "
        "FROM qq JOIN documents t ON t.doc_id = qq.doc_id), "
        "r AS (SELECT doc_id, quality, fp, "
        "CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS group_n, "
        "row_number() OVER (PARTITION BY fp "
        "ORDER BY quality DESC, doc_id ASC) AS rn FROM keyed) "
        "SELECT doc_id, group_n, quality FROM r WHERE rn = 1 ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# within-document repeated-line removal (the Gopher in-doc dedup rule)
# ---------------------------------------------------------------------------


def dedup_lines_within(pages: DataFrame) -> DataFrame:
    """(doc_id, n_lines, n_removed, clean_hash) — WITHIN-document
    repeated-line removal (the Gopher/RefinedWeb in-document rule,
    complementing corpus-level ``dedup_lines``): every line keeps only
    its FIRST occurrence inside its own page (repeated nav headers,
    duplicated footers, copy-paste stutter), survivors reassembled in
    original order and pinned by md5 (the dedup_lines narrow-row
    contract).

    First-occurrence is an indexed lambda — keep line i iff
    array_position(lines, line) == i (Spark's 0-based filter index vs
    DuckDB's 1-based spelled accordingly) — a per-row O(lines^2)
    expression with NO corpus-wide state at all: zero shuffle, zero
    Python, size-independent by construction."""
    lines = F.split(F.col("text"), "\n")
    d = pages.select("doc_id", lines.alias("ls"))
    kept = F.filter(
        F.col("ls"),
        lambda x, i: F.array_position(F.col("ls"), x) == i + F.lit(1),
    )
    return d.select(
        "doc_id",
        F.size("ls").cast("long").alias("n_lines"),
        (F.size("ls") - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.encode(F.array_join(kept, "\n"), "utf-8")).alias("clean_hash"),
    ).orderBy("doc_id")


def _lines_within_augment_spark() -> F.Column:
    """Gate augmentation: render each corpus row as a page with REAL
    within-doc duplicates — the 'home' nav line opens AND closes every
    page, and every third doc carries a doubled footer."""
    g = 6
    return F.expr(
        "concat('home', chr(10), "
        f"array_join(transform(sequence(0, (size(w) - 1) DIV {g}), "
        f"g -> array_join(slice(w, g * {g} + 1, {g}), ' ')), chr(10)), "
        "chr(10), 'home', "
        "CASE WHEN doc_id % 3 = 0 THEN concat(chr(10), 'contact us.', "
        "chr(10), 'contact us.') ELSE '' END)"
    )


def dedup_lines_within_augmented(documents: DataFrame) -> DataFrame:
    """Gate wrapper: multi-line page rendering with deterministic
    duplicate lines, then the within-doc dedup."""
    return dedup_lines_within(
        documents.select(
            "doc_id", F.expr("split(text, ' ')").alias("w")
        ).select("doc_id", _lines_within_augment_spark().alias("text"))
    )


def dedup_lines_within_sql(table: str = "documents") -> str:
    """DuckDB mirror: identical rendering, list_filter with the
    1-based (l, i) lambda, coalesce for the NULL-on-empty
    array_to_string (the dedup_lines precedent)."""
    g = 6
    return (
        f"WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}), "
        "a AS (SELECT doc_id, 'home' || chr(10) || "
        f"array_to_string(list_transform(generate_series(0, (len(w) - 1) // {g}), "
        f"g -> array_to_string(w[g * {g} + 1:g * {g} + {g}], ' ')), chr(10)) "
        "|| chr(10) || 'home' "
        "|| CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'contact us.' || "
        "chr(10) || 'contact us.' ELSE '' END AS txt FROM w0), "
        "l0 AS (SELECT doc_id, string_split(txt, chr(10)) AS ls FROM a), "
        "k AS (SELECT doc_id, len(ls) AS n_lines, "
        "list_filter(ls, (l, i) -> list_position(ls, l) = i) AS kept FROM l0) "
        "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, "
        "CAST(n_lines - len(kept) AS BIGINT) AS n_removed, "
        "md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_hash "
        "FROM k ORDER BY doc_id"
    )


def dedup_by_source(documents: DataFrame) -> DataFrame:
    """(source, n_docs, n_distinct, n_dup_docs, dup_ratio) — the
    exact-dup ledger PER SOURCE (exact_dedup_summary's grouped form):
    which feeds are mirror-heavy, the number an ingestion pipeline
    uses to deprioritize or cap a source before paying tokenization
    for its copies. Counts are exact integers from one
    (source, content-hash) groupBy + one per-source rollup (both
    map-side combinable); dup_ratio = dup docs / docs is the single
    division per source row."""
    h = documents.select(
        "source", F.md5(F.encode(F.col("text"), "utf-8")).alias("h")
    )
    g = h.groupBy("source", "h").agg(F.count("*").cast("long").alias("n"))
    agg = g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(
            F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)
        ).cast("long").alias("n_dup_docs"),
    )
    ratio = F.col("n_dup_docs").cast("double") / F.col("n_docs").cast("double")
    return agg.select(
        "source", "n_docs", "n_distinct", "n_dup_docs",
        round6(ratio).alias("dup_ratio"),
    ).orderBy("source")


def dedup_by_source_sql() -> str:
    return (
        "WITH g AS (SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS n "
        "FROM documents GROUP BY source, md5(text)), "
        "a AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_distinct, "
        "CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_dup_docs "
        "FROM g GROUP BY source) "
        "SELECT source, n_docs, n_distinct, n_dup_docs, "
        + "(floor((CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5) "
        "/ 1000000.0) AS dup_ratio "
        "FROM a ORDER BY source"
    )


def dedup_fingerprint_sorted(docs: DataFrame) -> DataFrame:
    """(fp, n_docs, min_doc_id) for groups with n_docs >= 2 — the ES
    ``fingerprint`` ANALYZER (and OpenRefine's fingerprint clustering
    method) as a dedup key: tokens sorted, deduplicated and rejoined
    before hashing, so the key is WORD-ORDER- and REPETITION-
    insensitive — it clusters shuffled boilerplate and reordered
    listings that the order-preserving doc_fingerprint treats as
    distinct (the complementary pair: content-identity vs
    bag-identity). Only multi-member groups emit (the dedup ledger's
    interesting rows); min_doc_id pins membership.

    One per-row expression (sort + distinct + join + md5, all JVM) +
    one map-side-combinable groupBy."""
    fp = F.md5(
        F.encode(
            F.array_join(F.array_sort(F.array_distinct(F.col("tokens"))), " "),
            "utf-8",
        )
    )
    return (
        docs.select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy("fp")
    )


def dedup_fingerprint_sorted_sql(table_toks_cte: str) -> str:
    return (
        f"WITH {table_toks_cte}, "
        "f AS (SELECT doc_id, "
        "md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp "
        "FROM docs) "
        "SELECT fp, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS min_doc_id "
        "FROM f GROUP BY fp HAVING count(*) >= 2 ORDER BY fp"
    )


def dedup_threshold_curve(
    docs: DataFrame, thresholds=(0.2, 0.4, 0.6, 0.8), max_bucket: int = 2000
) -> DataFrame:
    """(threshold, n_pairs) — the dedup-calibration table: how many
    verified near-dup pairs survive at each Jaccard threshold, from
    ONE LSH candidate generation + verification pass (candidates are
    computed once at the lowest threshold; each row is a conditional
    count over the same verified-pairs relation). A deployment reads
    this curve to pick its threshold — the knee between mirror
    collapse and false merges — without re-running the expensive
    banded join per candidate setting."""
    ts = sorted(float(t) for t in thresholds)
    if not ts or ts[0] <= 0 or ts[-1] > 1:
        raise ValueError(f"thresholds must be in (0, 1]: {thresholds!r}")
    pairs = lsh_candidate_pairs(docs, jaccard_min=ts[0], max_bucket=max_bucket)
    aggs = [
        F.sum(F.when(F.col("jaccard") >= F.lit(t), 1).otherwise(0))
        .cast("long")
        .alias(f"n{i}")
        for i, t in enumerate(ts)
    ]
    row = pairs.agg(*aggs).first()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(float(t), int(row[f"n{i}"] or 0)) for i, t in enumerate(ts)],
        "threshold double, n_pairs long",
    )


def dedup_threshold_curve_sql(
    table_toks_cte: str, thresholds=(0.2, 0.4, 0.6, 0.8),
    max_bucket: int = 2000,
) -> str:
    """Mirror: the lsh_candidate_pairs statement at the lowest
    threshold wrapped as a subquery (the nested-WITH precedent), one
    conditional count per threshold row."""
    from ..functions.rounding import sql_double

    ts = sorted(float(t) for t in thresholds)
    if not ts or ts[0] <= 0 or ts[-1] > 1:
        raise ValueError(f"thresholds must be in (0, 1]: {thresholds!r}")
    base = lsh_candidate_pairs_sql(
        table_toks_cte, jaccard_min=ts[0], max_bucket=max_bucket
    )
    selects = []
    for t in ts:
        td = sql_double(t)
        selects.append(
            f"SELECT {td} AS threshold, "
            f"CAST((SELECT count(*) FROM (SELECT * FROM ({base})) p "
            f"WHERE p.jaccard >= {td}) AS BIGINT) AS n_pairs"
        )
    return " UNION ALL ".join(selects) + " ORDER BY threshold"
