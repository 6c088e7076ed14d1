"""Cross-corpus incremental dedup: a NEW batch against an EXISTING
corpus (the per-crawl production pattern — each snapshot dedups
against everything already accepted, never against itself here; the
in-batch pass is operators/dedup.py's job).

The reference has only whole-corpus identity dedup on add
(``codesearch/storage/bm25_index.py`` url identity); incremental
corpus-vs-corpus dedup is a training-data-pipeline mandate operator.

Stages (both mirrored in the DuckDB oracle):

* ``cross_exact_survivors`` — drop new docs whose content hash (md5 of
  raw text) already exists in the old corpus: one hash anti-join. At
  the 10^12-doc design point the old side's hash set is a plain
  hash-shuffle anti-join (AQE handles skew); with the old corpus's
  hashes maintained as a sorted/bucketed artifact the join co-locates
  without reshuffling the accumulated side every run.
* ``cross_lsh_pairs`` — near-dup candidates ONLY across new x old:
  each side computes MinHash band signatures (same shingle/hash lanes
  as the in-batch LSH, dedup.py), buckets join new-side against
  old-side — never new-new or old-old — and candidates verify with
  the exact shingle-set Jaccard. Per-side mega-bucket caps bound the
  worst bucket product at ``max_bucket^2`` instead of quadratic blowup
  on boilerplate collisions.
* ``cross_dedup_survivors`` — the composition: exact stage first
  (cheap, shrinks the near stage's left side), then drop new docs with
  ANY verified near-dup in old.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql
from .dedup import (
    N_BANDS,
    N_HASHES,
    SHINGLES_SQL,
    _band_cols,
    minhash_signatures,
    with_shingles,
)


def _content_hash(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.md5(F.encode(F.col("text"), "utf-8")).alias("h"))


def cross_exact_survivors(new_docs: DataFrame, old_docs: DataFrame) -> DataFrame:
    """new docs (all columns) whose content hash is absent from old."""
    kill = _content_hash(old_docs).select("h").distinct()
    # the hash is derivable IN PLACE — joining new_docs against its own
    # hash projection would shuffle the full new batch on doc_id just
    # to add a column
    newh = new_docs.withColumn(
        "h", F.md5(F.encode(F.col("text"), "utf-8"))
    )
    return newh.join(kill, "h", "left_anti").drop("h")


def _bands_of(docs: DataFrame) -> DataFrame:
    sigs = minhash_signatures(docs, ordered=False).select("doc_id", *_band_cols())
    bands = None
    for b in range(N_BANDS):
        part = sigs.select(
            F.lit(b).alias("band_id"), F.col(f"band{b}").alias("sig"), "doc_id"
        )
        bands = part if bands is None else bands.unionByName(part)
    return bands


def _cap_buckets(bands: DataFrame, max_bucket: int) -> DataFrame:
    overfull = (
        bands.groupBy("band_id", "sig")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
        .select("band_id", "sig")
    )
    return bands.join(F.broadcast(overfull), ["band_id", "sig"], "left_anti")


def cross_lsh_pairs(
    new_docs: DataFrame,
    old_docs: DataFrame,
    jaccard_min: float = 0.2,
    max_bucket: int = 2000,
) -> DataFrame:
    """(new_id, old_id, jaccard) — verified near-dup pairs ACROSS the
    corpora only. Requires (doc_id, tokens) on both sides; the two
    sides' doc_id key spaces may overlap (they are different tables)."""
    nb = _cap_buckets(_bands_of(new_docs), max_bucket).alias("n")
    ob = _cap_buckets(_bands_of(old_docs), max_bucket).alias("o")
    cand = (
        nb.join(
            ob,
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.sig") == F.col("o.sig")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id")
        )
        .distinct()
    )
    shn = with_shingles(new_docs).select(
        F.col("doc_id").alias("new_id"),
        F.explode(F.array_distinct("shingles")).alias("sh"),
    )
    sho = with_shingles(old_docs).select(
        F.col("doc_id").alias("old_id"),
        F.explode(F.array_distinct("shingles")).alias("sh"),
    )
    sizes_n = shn.groupBy("new_id").agg(F.count("*").alias("na"))
    sizes_o = sho.groupBy("old_id").agg(F.count("*").alias("nb"))
    inter = (
        cand.join(shn, "new_id")
        .join(sho, ["old_id", "sh"])
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes_n, "new_id")
        .join(sizes_o, "old_id")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= jaccard_min)
        .select("new_id", "old_id", round6("jaccard").alias("jaccard"))
        .orderBy("new_id", "old_id")
    )


def cross_dedup_survivors(
    new_docs: DataFrame,
    old_docs: DataFrame,
    jaccard_min: float = 0.2,
    max_bucket: int = 2000,
) -> DataFrame:
    """(doc_id) — new docs surviving both stages, ordered."""
    # stage1 feeds BOTH the LSH candidate side and the final anti-join:
    # cut the lineage so the exact-stage anti-join runs once, not per
    # consumer (at the 10^12-doc design point a repeated corpus-scale
    # anti-join is a material cost)
    stage1 = cross_exact_survivors(new_docs, old_docs).localCheckpoint(
        eager=False
    )
    near = (
        cross_lsh_pairs(stage1, old_docs, jaccard_min, max_bucket)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    return stage1.select("doc_id").join(near, "doc_id", "left_anti").orderBy("doc_id")


# --- DuckDB oracle builders (colocated) ---


def _side_ctes(name: str, table_expr: str, tok_sql: str) -> str:
    """shingle/minhash/band CTE chain for one side, prefixed ``name``."""
    mins = ", ".join(f"min(md5('{i}|' || sh)) AS mh{i}" for i in range(N_HASHES))
    rows = N_HASHES // N_BANDS
    band_select = ", ".join(
        "(" + " || ".join(f"mh{b * rows + r}" for r in range(rows)) + f") AS band{b}"
        for b in range(N_BANDS)
    )
    band_union = " UNION ALL ".join(
        f"SELECT {b} AS band_id, band{b} AS sig, doc_id FROM {name}_sigs"
        for b in range(N_BANDS)
    )
    return (
        f"{name}_docs AS (SELECT doc_id, {tok_sql} AS toks FROM {table_expr}), "
        f"{name}_shd AS (SELECT doc_id, {SHINGLES_SQL.replace('toks', 'toks')} AS shingles FROM {name}_docs), "
        f"{name}_sh0 AS (SELECT doc_id, unnest(shingles) AS sh FROM {name}_shd WHERE len(shingles) > 0), "
        f"{name}_mh AS (SELECT doc_id, {mins} FROM {name}_sh0 GROUP BY doc_id), "
        f"{name}_sigs AS (SELECT doc_id, {band_select} FROM {name}_mh), "
        f"{name}_bands0 AS ({band_union}), "
        f"{name}_overfull AS (SELECT band_id, sig FROM {name}_bands0 GROUP BY band_id, sig HAVING count(*) > {{max_bucket}}), "
        f"{name}_bands AS (SELECT b.* FROM {name}_bands0 b ANTI JOIN {name}_overfull o "
        f"ON o.band_id = b.band_id AND o.sig = b.sig), "
        f"{name}_shd2 AS (SELECT doc_id, unnest(list_distinct(shingles)) AS sh FROM {name}_shd), "
        f"{name}_sizes AS (SELECT doc_id, count(*) AS n_sh FROM {name}_shd2 GROUP BY doc_id)"
    )


def cross_dedup_sql(
    new_expr: str,
    old_expr: str,
    tok_sql: str,
    jaccard_min: float = 0.2,
    max_bucket: int = 2000,
    survivors: bool = True,
) -> str:
    """Oracle for cross_lsh_pairs (survivors=False: (new_id, old_id,
    jaccard)) or cross_dedup_survivors (survivors=True: (doc_id)).

    ``new_expr`` / ``old_expr``: parenthesized table expressions with
    (doc_id, text); ``tok_sql``: the tokenizer expression over ``text``.
    """
    new_side = (
        f"stage1 AS (SELECT n.doc_id, n.text FROM {new_expr} n "
        # NOT EXISTS, not NOT IN: one NULL text in old would make the
        # NOT IN NULL for every row (empty survivors) while the Spark
        # left_anti keeps non-matching rows — SQL three-valued logic
        f"WHERE NOT EXISTS (SELECT 1 FROM {old_expr} o "
        "WHERE md5(o.text) = md5(n.text))), "
        if survivors
        else f"stage1 AS (SELECT doc_id, text FROM {new_expr}), "
    )
    body = (
        "WITH "
        + new_side
        + _side_ctes("nn", "stage1", tok_sql).format(max_bucket=max_bucket)
        + ", "
        + _side_ctes("oo", old_expr, tok_sql).format(max_bucket=max_bucket)
        + ", "
        "cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id "
        "  FROM nn_bands a JOIN oo_bands b ON a.band_id = b.band_id AND a.sig = b.sig), "
        "inter AS (SELECT c.new_id, c.old_id, count(*) AS inter "
        "  FROM cand c JOIN nn_shd2 x ON x.doc_id = c.new_id "
        "  JOIN oo_shd2 y ON y.doc_id = c.old_id AND y.sh = x.sh "
        "  GROUP BY c.new_id, c.old_id), "
        "pairs AS (SELECT i.new_id, i.old_id, "
        "  CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) AS j "
        "  FROM inter i JOIN nn_sizes sa ON sa.doc_id = i.new_id "
        "  JOIN oo_sizes sb ON sb.doc_id = i.old_id "
        f"  WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) >= {jaccard_min})"
    )
    if survivors:
        return (
            body
            + " SELECT doc_id FROM stage1 WHERE doc_id NOT IN "
            "(SELECT new_id FROM pairs) ORDER BY doc_id"
        )
    return (
        body
        + f" SELECT new_id, old_id, {round6_sql('j')} AS jaccard "
        "FROM pairs ORDER BY new_id, old_id"
    )
