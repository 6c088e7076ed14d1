"""User-facing search engine facade — the analog of the reference's
``HybridSearchEngine`` / ``LocalSearchEngine`` (codesearch/search/engine.py)
and its ``SearchQuery`` surface (models.py:144-153).

- ``search(...)``: BM25-only (exact or WAND scorer) with the reference's
  LocalSearchEngine max-normalization (engine.py:484-489), or hybrid
  (mock-embedder semantic branch + BM25 + RRF merge with overfetch 2k,
  adaptive weight, optional http boost — engine.py:158-238).
- Filters map to the reference's language/entity_type/repo_name equality
  filters (lang / site / source here).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.embed import cosine_topk, mock_embed_text, mock_embed_udf
from .operators.rrf import DEFAULT_SEMANTIC_WEIGHT, boost_col, rrf_merge
from .operators.scorer import Index, bm25_topk
from .operators.wand import wand_topk
from .oracle.hybrid import enhance_query

# Serving split (round-5): single interactive queries default to
# "auto" — the persisted doc-range-sharded layout when the index has
# one (the sub-second low-latency path; it degrades to "exact" for
# filtered requests or layout-less indexes inside _bm25, a physical
# choice that is never a semantic one — all scorers are
# rank-identical). "wand" (block-max pruning over the compressed
# postings) is the BATCH-side scorer: its pruned path chains 3-4
# bounded jobs (tau0, kth/cut, targeted re-score), whose fixed
# job-launch overhead dominates single-query latency at local[*] even
# though every stage is data-bounded — the right trade for the
# many-query batch scorer (batch_topk_postings amortizes it), the
# wrong default for one interactive query.
VALID_SCORERS = ("auto", "exact", "wand", "sharded")


def build_doc_embeddings(docs, dim: int = 64) -> DataFrame:
    """(doc_id, embedding) via the deterministic mock embedder over the
    tokenized doc text (tokens joined by space — the searchable-text
    projection analog, models.py:66-103). ``docs`` is a docs DataFrame
    or an Index."""
    if isinstance(docs, Index):
        docs = docs.docs
    return docs.select(
        "doc_id",
        mock_embed_udf(dim)(F.concat_ws(" ", "tokens")).alias("embedding"),
    )


class SearchEngine:
    def __init__(self, index: Index, embeddings: Optional[DataFrame] = None, dim: int = 64):
        self.index = index
        self.dim = dim
        self.embeddings = embeddings
        self._langs: Optional[set] = None
        # point-in-time handles: pit_id -> the Index handle that was
        # being served at open time. Index handles are immutable
        # (persisted segments are never rewritten in place; reload_index
        # swaps the handle), so pinning one IS a consistent snapshot.
        self._pits: Dict[str, Index] = {}
        self._pit_seq = 0

    def warm(self) -> "SearchEngine":
        """Pin the serving relations in executor storage and materialize
        them (docs, terms, postings when present), plus the lang set.

        Two jobs, both per the serving design: (a) per-query latency —
        no parquet re-scan per request, queries start from the
        in-memory relations; (b) rebuild isolation — while a
        ``POST /index`` build overwrites the parquet beneath, searches
        keep reading the old in-memory copy until the atomic swap."""
        idx = self.index
        # tf included: the default exact scorer scans it on every query
        # (scorer.score_matched), so leaving it on parquet would defeat
        # both jobs above for the most common path
        rels = [idx.docs, idx.tf, idx.terms]
        if idx.postings is not None:
            rels.append(idx.postings)
        for key in ("sharded", "positional"):
            if key in idx.extras:
                rels.append(idx.extras[key])
        for df in rels:
            df.persist()
        for df in rels:
            df.count()
        self._known_langs()
        return self

    def reload_index(self, index: Index, warm: bool = False) -> None:
        """Swap in a freshly (re)built index (the serving side of the
        REST ``POST /index`` trigger). ``warm=True`` materializes the
        NEW index's serving relations before the swap, so the first
        post-swap query is already warm. The reference is replaced
        atomically (an in-flight search keeps its old handle); the OLD
        index's persisted relations and derived caches are dropped
        after the swap so nothing stale pins executor memory."""
        old_idx, old_emb = self.index, self.embeddings
        # unpersist the OLD relations BEFORE warming the new ones: a
        # rebuild into the same index dir yields identical logical
        # plans, and Spark's cache is keyed by plan — unpersisting old
        # afterwards would evict the just-warmed entries and the engine
        # would silently serve uncached until the next restart.
        # (In-flight searches on the old handle recompute lazily during
        # the warm window — a transient perf dip, never wrong results.)
        old = [old_emb, old_idx.docs, old_idx.tf, old_idx.terms,
               old_idx.postings, *old_idx.extras.values()]
        for df in old:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 - None / non-DF extras / dead session
                pass
        if warm:
            SearchEngine(index).warm()
        # the new index handle is published FIRST: a request thread that
        # reads the engine mid-swap then sees (new index, cleared
        # caches) — it rebuilds a derived cache from the new index — and
        # never (old index, cleared caches), which would let a stale
        # derived cache be rebuilt from the OLD index and assigned after
        # the swap. Request paths snapshot self.index once at entry, so
        # an in-flight search keeps one consistent handle throughout.
        self.index = index
        self.embeddings = None
        self._langs = None

    def _known_langs(self) -> set:
        """Valid lang filter values (F8). lang is a partition column of
        the persisted docs table, so this distinct is a metadata-cheap
        one-time probe, cached on the engine."""
        if self._langs is None:
            self._langs = {
                r["lang"] for r in self.index.docs.select("lang").distinct().collect()
            }
        return self._langs

    def _require_cols(self, *cols) -> None:
        """F8 for column-valued parameters: an agg key / col / filter
        column that the served docs relation doesn't carry raises
        ValueError (-> HTTP 400 / CLI exit 2) instead of leaking
        Spark's UNRESOLVED_COLUMN analysis error through the
        catch-all (the round-4 ADVICE defect class, pinned by
        tests/test_server_sweep.py)."""
        have = set(self.index.docs.columns)
        missing = [c for c in cols if c is not None and c not in have]
        if missing:
            raise ValueError(
                f"unknown column(s) {missing}; this index has "
                f"{sorted(c for c in have if c != 'tokens')}"
            )

    def _meta_default(self, *prefer: str) -> str:
        """First of ``prefer`` present on the served docs relation —
        schema-aware agg-key defaults (the facets precedent: optional
        metadata columns like `source` exist only on indexes whose
        corpus carried them)."""
        for c in prefer:
            if c in self.index.docs.columns:
                return c
        return "lang"

    def _ensure_embeddings(self, index: Optional[Index] = None):
        idx = index if index is not None else self.index
        emb = self.embeddings
        if emb is None:
            emb = build_doc_embeddings(idx, self.dim).persist()
            # cache only while the handle is still the served one: a
            # reload_index racing this build must not end up with OLD-id
            # embeddings cached against the NEW index
            if self.index is idx:
                self.embeddings = emb
        return emb

    def _bm25(
        self, query: str, limit: int, filters, scorer: str,
        index: Optional[Index] = None,
    ) -> DataFrame:
        if index is None:
            index = self.index
        # quoted query -> exact-phrase search (BM25-ranked over docs
        # containing the phrase; operators/phrase.bm25_phrase_topk)
        q = query.strip()
        if len(q) >= 2 and q[0] == '"' and q[-1] == '"':
            from .operators.phrase import bm25_phrase_topk

            return bm25_phrase_topk(
                index, q[1:-1], k=limit, filters=filters or None
            )
        # '"terms"~ow' -> ORDERED proximity (Surround W operator)
        from .operators.proximity import (
            bm25_ordered_near_topk,
            bm25_proximity_topk,
            parse_near_query,
            parse_ordered_near_query,
        )

        onear = parse_ordered_near_query(q)
        if onear is not None:
            return bm25_ordered_near_topk(
                index, onear[0], onear[1], k=limit, filters=filters or None
            )
        # '"terms"~w' -> proximity (NEAR) search
        near = parse_near_query(q)
        if near is not None:
            return bm25_proximity_topk(
                index, near[0], near[1], k=limit, filters=filters or None
            )
        # occur flags (+required / -excluded clauses) -> boolean search
        from .operators.boolquery import bm25_boolean_topk, is_boolean_query

        if is_boolean_query(q):
            return bm25_boolean_topk(
                index, q, k=limit, filters=filters or None
            )
        # trailing-star clauses -> dictionary prefix expansion
        from .operators.wildcard import bm25_wildcard_topk, is_wildcard_query

        if is_wildcard_query(q):
            return bm25_wildcard_topk(
                index, q, k=limit, filters=filters or None
            )
        # 'word~' / 'word~1' / 'word~2' -> edit-distance expansion
        from .operators.fuzzy import bm25_fuzzy_topk, is_fuzzy_query

        if is_fuzzy_query(q):
            return bm25_fuzzy_topk(
                index, q, k=limit, filters=filters or None
            )
        # 'word^2.5' -> query-time clause boosts (Lucene boost syntax)
        from .operators.boostquery import bm25_boosted_topk, is_boosted_query

        if is_boosted_query(q):
            return bm25_boosted_topk(
                index, q, k=limit, filters=filters or None
            )
        if scorer == "sharded" and not filters and "sharded" in index.extras:
            # the low-latency serving path: shard-local scoring over the
            # persisted doc-range-sharded layout (build --sharded-index).
            # Metadata filters need the F4 unfiltered-threshold + F5
            # filter staging the exact scorer implements, so filtered
            # (or layout-less) requests take the rank-identical exact
            # path instead — a physical choice, never a semantic one
            from dataclasses import replace

            from .operators.sharded import sharded_single_topk

            sidx = replace(index, postings=index.extras["sharded"])
            return sharded_single_topk(
                sidx, query, k=limit,
                shard_width=index.extras.get("sharded_width", 65536),
            )
        fn = wand_topk if scorer == "wand" else bm25_topk
        return fn(index, query, k=limit, filters=filters or None)

    def search(
        self,
        query: str,
        limit: int = 20,
        lang: Optional[str] = None,
        site: Optional[str] = None,
        source: Optional[str] = None,
        use_hybrid: bool = False,
        semantic_weight: float = DEFAULT_SEMANTIC_WEIGHT,
        scorer: str = "exact",
        enhance: bool = True,
        normalize: bool = True,
        on_invalid: str = "error",
        offset: int = 0,
    ) -> DataFrame:
        """``on_invalid`` (F8 entry validation): 'error' raises
        ValueError for an unknown scorer or a lang value absent from the
        index (the reference CLI behavior, cli/main.py:69-85); 'drop'
        silently ignores the invalid filter (the reference API behavior,
        api/server.py:122-133). An unknown scorer always errors.

        ``offset`` pages the ranked list: rows offset+1..offset+limit
        with their ABSOLUTE ranks (and, under ``normalize``, scores
        still normalized by the page-1 top score — page 2 of the same
        query is the same ranking, just a later window)."""
        if scorer not in VALID_SCORERS:
            raise ValueError(f"unknown scorer {scorer!r}; valid: {VALID_SCORERS}")
        if scorer == "auto":
            # rank-identical either way; "sharded" itself degrades to
            # exact inside _bm25 when filters apply or no layout exists
            scorer = "sharded" if "sharded" in self.index.extras else "exact"
        filters: Dict[str, str] = {}
        if lang:
            if lang not in self._known_langs():
                if on_invalid == "error":
                    raise ValueError(
                        f"unknown lang {lang!r}; valid: {sorted(self._known_langs())}"
                    )
            else:
                filters["lang"] = lang
        if site:
            filters["site"] = site
        if source:
            filters["source"] = source

        # one handle for the whole request: a concurrent reload_index
        # must not mix old and new relations inside a single search
        idx = self.index
        if not use_hybrid:
            res = self._bm25(query, limit + offset, filters, scorer, index=idx)
            if normalize:
                # LocalSearchEngine normalization: divide by top score
                # if > 0 (the ABSOLUTE top, also when paging — the rank-1
                # row is always among the fetched rows since _bm25
                # fetched from rank 1). Folded into the plan as a window
                # over the <= limit+offset result rows: a separate
                # rank-1 collect would execute the scoring job twice
                from pyspark.sql.window import Window

                mx = F.max(
                    F.when(F.col("rank") == 1, F.col("score"))
                ).over(Window.partitionBy())
                res = res.withColumn(
                    "score",
                    F.when(mx > 0, F.col("score") / mx).otherwise(
                        F.col("score")
                    ),
                )
            if offset:
                res = res.where(F.col("rank") > offset)
            return res

        # hybrid: overfetch both branches at 2*limit (engine.py:207,214)
        emb = self._ensure_embeddings(idx)
        qvec = mock_embed_text(enhance_query(query) if enhance else query, self.dim)
        # filters apply BEFORE the cosine top-k (the reference passes
        # filters into vector_store.search, engine.py:205-209): the
        # semantic list is the top-2k of the FILTERED set with dense
        # ranks — filtering the unfiltered top-2k afterwards would feed
        # RRF fewer candidates with gapped ranks
        if filters:
            docs_f = idx.docs
            for c, v in filters.items():
                docs_f = docs_f.where(F.col(c) == v)
            emb = emb.join(docs_f.select("doc_id"), "doc_id", "left_semi")
        sem = cosine_topk(emb, qvec, 2 * (limit + offset), id_col="doc_id")
        bm = self._bm25(
            query, 2 * (limit + offset), filters, scorer, index=idx
        ).select(
            "rank", "doc_id", "score"
        )
        merged = rrf_merge(
            sem.select("rank", "doc_id", "score"),
            bm,
            id_col="doc_id",
            semantic_weight=semantic_weight,
            query=query,
            limit=limit + offset,
        )
        # merged is k local rows (rrf_merge's limit tail): attach urls
        # via a pushed doc_id-IN point lookup — never a per-query pass
        # over the corpus-sized docs relation
        rows = merged.collect()
        ids = [int(r["doc_id"]) for r in rows]
        urls = {
            r["doc_id"]: r["url"]
            for r in idx.docs.where(F.col("doc_id").isin(ids))
            .select("doc_id", "url")
            .collect()
        }
        data = [
            (
                r["rank"], int(r["doc_id"]), urls.get(int(r["doc_id"])),
                float(r["score"]), float(r["semantic_score"]), float(r["bm25_score"]),
            )
            for r in sorted(rows, key=lambda r: r["rank"])
            if int(r["doc_id"]) in urls  # inner-join semantics preserved
            and r["rank"] > offset
        ]
        return idx.spark.createDataFrame(
            data,
            "rank int, doc_id long, url string, score double, "
            "semantic_score double, bm25_score double",
        )

    def collapse(
        self, query: str, field: str = "source", per_group: int = 1, limit: int = 10,
        **filters,
    ) -> DataFrame:
        """Diversified top-k: at most ``per_group`` results per value
        of ``field`` (operators/explore.bm25_collapse_topk). Extra
        keyword args are equality metadata filters (lang/site/source),
        applied at the F5 stage like the plain search path; an unknown
        lang is silently dropped (the API's on_invalid='drop'
        semantics)."""
        from .operators.explore import bm25_collapse_topk

        fs = {k: v for k, v in filters.items() if v}
        if fs.get("lang") and fs["lang"] not in self._known_langs():
            del fs["lang"]
        return bm25_collapse_topk(
            self.index, query, collapse=field, per_group=per_group, k=limit,
            filters=fs or None,
        )

    def search_range(
        self,
        query: str,
        limit: int = 10,
        ranges: Optional[Dict[str, tuple]] = None,
        **filters,
    ) -> DataFrame:
        """BM25 top-k with numeric range filters at the F5 stage
        (operators/scorer.bm25_topk_range)."""
        from .operators.scorer import bm25_topk_range

        fs = {k: v for k, v in filters.items() if v}
        # on_invalid='drop' consistency with search()/collapse(): an
        # unknown lang is dropped, not applied verbatim to an empty set
        if fs.get("lang") and fs["lang"] not in self._known_langs():
            del fs["lang"]
        return bm25_topk_range(
            self.index, query, k=limit, filters=fs or None, ranges=ranges,
        )

    def explain(self, query: str, limit: int = 10) -> DataFrame:
        """Per-term score breakdown of the top-k
        (operators/scorer.explain_topk — the ES explain=true surface)."""
        from .operators.scorer import explain_topk

        return explain_topk(self.index, query, k=limit)

    def count(self, query: str, lang=None, site=None, source=None) -> dict:
        """Total-hits count over the kept set ('About N results') ->
        {'n_hits': N, 'max_score': s} (operators/scorer.bm25_count)."""
        from .operators.scorer import bm25_count

        filters = {}
        # on_invalid='drop' consistency: 'About N results' must agree
        # with the result list for identical params, so an unknown lang
        # drops here exactly as it does in search()
        if lang and lang in self._known_langs():
            filters["lang"] = lang
        if site:
            filters["site"] = site
        if source:
            filters["source"] = source
        row = bm25_count(self.index, query, filters or None).first()
        return {"n_hits": int(row["n_hits"]), "max_score": float(row["max_score"])}

    def facets(self, query: str, keys=None) -> DataFrame:
        """Facet sidebar counts over the query's BM25 kept set
        (operators/explore.bm25_facets). Default keys are whichever of
        lang/site/source the served docs relation carries."""
        from .operators.explore import bm25_facets

        if keys is None:
            keys = [
                c for c in ("lang", "site", "source")
                if c in self.index.docs.columns
            ]
        return bm25_facets(self.index, query, keys=keys)

    def histogram(
        self, query: str, col: str = "doc_len", interval: int = 50
    ) -> DataFrame:
        """Histogram aggregation over the query's BM25 kept set
        (operators/explore.bm25_histogram)."""
        from .operators.explore import bm25_histogram

        self._require_cols(col)
        return bm25_histogram(self.index, query, col=col, interval=int(interval))

    def stats_agg(self, query: str, col: str = "doc_len") -> DataFrame:
        """Stats aggregation (min/max/sum/avg of a numeric docs column)
        over the query's BM25 kept set
        (operators/explore.bm25_stats_agg)."""
        from .operators.explore import bm25_stats_agg

        self._require_cols(col)
        return bm25_stats_agg(self.index, query, col=col)

    def filters_agg(self, query: str, buckets) -> DataFrame:
        """Named-filter-bucket counts over the query's BM25 kept set
        (operators/aggs.bm25_filters_agg — the ES filters agg).
        ``buckets`` maps name -> (docs column, value)."""
        from .operators.aggs import bm25_filters_agg

        self._require_cols(*[c for c, _ in buckets.values()])
        return bm25_filters_agg(self.index, query, buckets)

    def range_agg(
        self, query: str, col: str = "doc_len", cuts=(20, 40)
    ) -> DataFrame:
        """Explicit-bounds range buckets over the query's BM25 kept set
        (operators/aggs.bm25_range_agg — the ES range agg)."""
        from .operators.aggs import bm25_range_agg

        self._require_cols(col)
        return bm25_range_agg(self.index, query, col=col, cuts=cuts)

    def top_hits(
        self, query: str, key: str = "lang", per_bucket: int = 3
    ) -> DataFrame:
        """Per-bucket independent top-n rankings over the query's BM25
        kept set (operators/aggs.bm25_top_hits — ES terms + top_hits)."""
        from .operators.aggs import bm25_top_hits

        self._require_cols(key)
        return bm25_top_hits(self.index, query, key=key,
                             per_bucket=int(per_bucket))

    def rare_terms(
        self, query: str, max_df: int = 2, limit: int = 20
    ) -> DataFrame:
        """Rarest terms of the query's BM25 kept set
        (operators/aggs.bm25_rare_terms — the ES rare_terms agg)."""
        from .operators.aggs import bm25_rare_terms

        return bm25_rare_terms(self.index, query, max_df=int(max_df),
                               k=int(limit))

    def extended_stats(self, query: str, col: str = "doc_len") -> DataFrame:
        """Extended stats (exact moments + variance/std) over the
        query's BM25 kept set (operators/aggs.bm25_extended_stats)."""
        from .operators.aggs import bm25_extended_stats

        self._require_cols(col)
        return bm25_extended_stats(self.index, query, col=col)

    def percentile_ranks(
        self, query: str, col: str = "doc_len", values=(20, 40)
    ) -> DataFrame:
        """Exact percentile ranks of probe values over the query's BM25
        kept set (operators/aggs.bm25_percentile_ranks)."""
        from .operators.aggs import bm25_percentile_ranks

        self._require_cols(col)
        return bm25_percentile_ranks(self.index, query, col=col, values=values)

    def cardinality(self, query: str, col: Optional[str] = None) -> DataFrame:
        """Exact value_count + distinct count of a docs column over the
        query's BM25 kept set (operators/aggs.bm25_cardinality).
        Default col: `source` where the index has it, else `site`."""
        from .operators.aggs import bm25_cardinality

        if col is None:
            col = self._meta_default("source", "site")
        self._require_cols(col)
        return bm25_cardinality(self.index, query, col=col)

    def decay_search(
        self,
        query: str,
        col: str = "doc_len",
        origin: int = 30,
        scale: int = 20,
        decay: str = "gauss",
        limit: int = 10,
    ) -> DataFrame:
        """BM25 rescored by an ES-style decay function of a numeric
        docs column (operators/decay.bm25_decay_topk)."""
        from .operators.decay import bm25_decay_topk

        return bm25_decay_topk(
            self.index, query, col=col, origin=int(origin),
            scale=int(scale), decay=decay, k=int(limit),
        )

    def did_you_mean(self, query: str, max_dist: int = 1) -> DataFrame:
        """Whole-query spell correction via the persisted SymSpell
        deletion keys (operators/snippets.did_you_mean)."""
        from .operators.snippets import did_you_mean

        return did_you_mean(self.index, query, max_dist=int(max_dist))

    def _default_keys(self, keys):
        """Schema-aware default for compound-key aggs: whichever of
        lang/source the served docs relation carries (explicit keys
        are validated instead)."""
        if keys is None:
            return tuple(
                c for c in ("lang", "source")
                if c in self.index.docs.columns
            ) or ("lang",)
        keys = tuple(keys)
        self._require_cols(*keys)
        return keys

    def composite_agg(
        self, query: str, keys=None, size: int = 10, after=None
    ) -> DataFrame:
        """Keyset-paginated facet buckets over the query's BM25 kept
        set (operators/aggs.bm25_composite_agg — the ES composite
        agg). Default keys: lang + source where present."""
        from .operators.aggs import bm25_composite_agg

        return bm25_composite_agg(
            self.index, query, keys=self._default_keys(keys),
            size=int(size), after=after
        )

    def multi_terms(
        self, query: str, keys=None, limit: int = 10
    ) -> DataFrame:
        """Compound-key buckets ordered by count over the query's BM25
        kept set (operators/aggs.bm25_multi_terms — ES multi_terms).
        Default keys: lang + source where present."""
        from .operators.aggs import bm25_multi_terms

        return bm25_multi_terms(
            self.index, query, keys=self._default_keys(keys), k=int(limit)
        )

    def adjacency_matrix(self, query: str, filters) -> DataFrame:
        """Named-filter + pairwise-intersection counts over the query's
        BM25 kept set (operators/aggs.bm25_adjacency_matrix).
        ``filters`` maps name -> (docs column, value)."""
        from .operators.aggs import bm25_adjacency_matrix

        self._require_cols(*[c for c, _ in filters.values()])
        return bm25_adjacency_matrix(self.index, query, filters)

    def weighted_avg(self, query: str) -> DataFrame:
        """doc_len weighted by distinct-term count over the query's
        BM25 kept set (operators/aggs.bm25_weighted_avg)."""
        from .operators.aggs import bm25_weighted_avg

        return bm25_weighted_avg(self.index, query)

    def matrix_stats(self, query: str) -> DataFrame:
        """Covariance/correlation of (doc_len, distinct-term count)
        over the query's BM25 kept set
        (operators/aggs.bm25_matrix_stats)."""
        from .operators.aggs import bm25_matrix_stats

        return bm25_matrix_stats(self.index, query)

    def boxplot(self, query: str, col: str = "doc_len") -> DataFrame:
        """Exact type-1 quartiles of a numeric docs column over the
        query's BM25 kept set (operators/aggs.bm25_boxplot)."""
        from .operators.aggs import bm25_boxplot

        self._require_cols(col)
        return bm25_boxplot(self.index, query, col=col)

    def fvf_search(
        self,
        query: str,
        col: str = "doc_len",
        factor: float = 0.5,
        modifier: str = "log1p",
        limit: int = 10,
    ) -> DataFrame:
        """BM25 rescored by an ES-style field_value_factor
        (operators/decay.bm25_fvf_topk)."""
        from .operators.decay import bm25_fvf_topk

        self._require_cols(col)
        return bm25_fvf_topk(
            self.index, query, col=col, factor=float(factor),
            modifier=modifier, k=int(limit),
        )

    def random_search(
        self, query: str, seed: str = "0", limit: int = 10
    ) -> DataFrame:
        """BM25 rescored by the seeded deterministic random_score
        (operators/decay.bm25_random_topk)."""
        from .operators.decay import bm25_random_topk

        return bm25_random_topk(self.index, query, seed=str(seed),
                                k=int(limit))

    VALID_SIMILARITIES = ("lmd", "lmjm", "dfr", "ib", "classic", "bool")

    def similarity_search(
        self, query: str, model: str = "dfr", limit: int = 10,
        lang: str | None = None, site: str | None = None,
        source: str | None = None,
    ) -> DataFrame:
        """Top-k under a non-Okapi similarity (the Lucene similarity
        module as a SERVING surface): lmd / lmjm (language models),
        dfr (InL2), ib (LL-DF-H2) — all on the score_matched
        contribution seam, sharing the threshold/degenerate/tie-break
        chain with the BM25 paths. Unknown model raises (F8)."""
        if model not in self.VALID_SIMILARITIES:
            raise ValueError(
                f"unknown similarity {model!r}; valid: {self.VALID_SIMILARITIES}"
            )
        from .operators.scorer import (
            boolean_sim_topk,
            classic_topk,
            dfr_topk,
            ib_topk,
            lmd_topk,
            lmjm_topk,
        )

        fn = {"lmd": lmd_topk, "lmjm": lmjm_topk, "dfr": dfr_topk,
              "ib": ib_topk, "classic": classic_topk,
              "bool": boolean_sim_topk}[model]
        filters = {}
        if lang:
            filters["lang"] = lang
        if site:
            filters["site"] = site
        if source:
            filters["source"] = source
        return fn(self.index, query, k=int(limit), filters=filters or None)

    def phrase_suggest(
        self, query: str, limit: int = 5, max_cands: int = 2,
        max_dist: int = 1,
    ) -> DataFrame:
        """Context-aware whole-phrase correction (operators/snippets
        .phrase_suggest): SymSpell candidate sets ranked by a Laplace
        bigram LM."""
        from .operators.snippets import phrase_suggest

        return phrase_suggest(
            self.index, query, k=int(limit), max_cands=int(max_cands),
            max_dist=int(max_dist),
        )

    def ltr_search(
        self, query: str, limit: int = 10, window_size: int = 20,
        weights=None,
    ) -> DataFrame:
        """LTR-rescored search (operators/ltr.ltr_rescore_topk): the
        linear model over (bm25, n_matched, ln dl, max tf) re-ranks
        the rescore window; a trained weight artifact (load_ltr)
        injects via ``weights``."""
        from .operators.ltr import ltr_rescore_topk

        return ltr_rescore_topk(
            self.index, query, weights=weights, window_size=int(window_size),
            k=int(limit),
        )

    def maxsim(self, text: str, limit: int = 10) -> DataFrame:
        """ColBERT MaxSim late-interaction search (operators/pipeline
        .maxsim_topk): one query vector per tokenized word vs the
        served corpus's chunk embeddings."""
        from .functions.embed import mock_embed_text
        from .operators.pipeline import maxsim_topk
        from .oracle.tokenizer import tokenize

        toks = tokenize(text)
        if not toks:
            return self.index.spark.createDataFrame(
                [], "rank int, doc_id long, score double"
            )
        qvecs = [mock_embed_text(w, self.dim) for w in toks]
        return maxsim_topk(self.index.docs, qvecs, k=int(limit))

    def autocomplete(
        self, text: str, limit: int = 10, lang: str | None = None
    ) -> DataFrame:
        """Search-as-you-type completion over the served corpus
        (operators/snippets.completion_suggest): bigram continuation
        of 'context prefix*' (or ctf-ranked unigram for a single
        token); ``lang`` applies the ES completion ``contexts``
        category slice."""
        from .operators.snippets import completion_suggest

        return completion_suggest(
            self.index.docs, text, k=int(limit), lang=lang
        )

    def distance_search(
        self, query: str, lat: float, lon: float,
        pivot_km: float = 1000.0, boost: float = 5.0, limit: int = 10,
    ) -> DataFrame:
        """BM25 + the ES distance_feature reciprocal-saturation
        geo-proximity boost (operators/geo.bm25_distance_feature_topk)
        over the derived positions."""
        from .operators.geo import bm25_distance_feature_topk

        return bm25_distance_feature_topk(
            self.index, query, float(lat), float(lon),
            pivot_km=float(pivot_km), boost=float(boost), k=int(limit),
        )

    def rank_feature_search(
        self, query: str, col: str = "doc_len",
        function: str = "saturation", pivot: float = 40.0,
        boost: float = 2.0, exponent: float = 2.0, limit: int = 10,
    ) -> DataFrame:
        """BM25 + the ES rank_feature additive boost
        (operators/decay.bm25_rank_feature_topk)."""
        from .operators.decay import bm25_rank_feature_topk

        return bm25_rank_feature_topk(
            self.index, query, col=col, function=function,
            pivot=float(pivot), boost=float(boost),
            exponent=float(exponent), k=int(limit),
        )

    def term_vectors(self, doc_id: int) -> DataFrame:
        """Per-document term vector with corpus df
        (operators/termvectors.term_vectors — the ES _termvectors
        API)."""
        from .operators.termvectors import term_vectors

        return term_vectors(self.index, int(doc_id))

    def regexp_search(
        self, pattern: str, limit: int = 10, max_expansions: int = 16
    ) -> DataFrame:
        """Whole-term regexp query over the capped dictionary expansion
        (operators/queryext.bm25_regexp_topk — the ES regexp query)."""
        from .operators.queryext import bm25_regexp_topk

        return bm25_regexp_topk(
            self.index, pattern, k=int(limit),
            max_expansions=int(max_expansions),
        )

    def query_string(
        self,
        query: str,
        limit: int = 10,
        lang=None,
        site=None,
        source=None,
        max_expansions: int = 16,
    ) -> DataFrame:
        """The Lucene/ES query_string mini-language — ``+must -not
        "phrase" pre* word~1 term^2.5 lang:en`` compiled onto the
        house primitives (operators/querystring). Explicit filter
        arguments outrank the query's own field clauses."""
        from .operators.querystring import bm25_query_string_topk

        filters = {
            k: v
            for k, v in (("lang", lang), ("site", site), ("source", source))
            if v
        }
        return bm25_query_string_topk(
            self.index, query, k=int(limit), filters=filters or None,
            max_expansions=int(max_expansions),
        )

    def constant_score(
        self, query: str, boost: float = 1.5, limit: int = 10
    ) -> DataFrame:
        """Filter-context search: every matching doc scores exactly
        boost (operators/queryext.constant_score_topk — the ES
        constant_score query)."""
        from .operators.queryext import constant_score_topk

        return constant_score_topk(
            self.index, query, boost=float(boost), k=int(limit)
        )

    def span_first(self, term: str, end: int = 3, limit: int = 10) -> DataFrame:
        """BM25 ranking restricted to docs where the term occurs within
        the first ``end`` positions (operators/queryext
        .bm25_span_first_topk — Lucene SpanFirstQuery)."""
        from .operators.queryext import bm25_span_first_topk

        return bm25_span_first_topk(self.index, term, end=int(end),
                                    k=int(limit))

    def span_not(
        self, include: str, exclude: str, pre: int = 0, post: int = 0,
        limit: int = 10,
    ) -> DataFrame:
        """BM25 ranking of ``include`` restricted to docs with at least
        one occurrence outside the pre/post window of every ``exclude``
        occurrence (operators/queryext.bm25_span_not_topk — Lucene
        SpanNotQuery)."""
        from .operators.queryext import bm25_span_not_topk

        return bm25_span_not_topk(
            self.index, include, exclude, pre=int(pre), post=int(post),
            k=int(limit),
        )

    def analyze(self, text: Optional[str] = None,
                doc_id: Optional[int] = None) -> DataFrame:
        """The ES _analyze API: the analyzer's ordered (pos, token)
        stream for raw text or a stored doc (operators/queryext)."""
        from .operators.queryext import analyze_doc, analyze_text

        if (text is None) == (doc_id is None):
            raise ValueError("analyze takes exactly one of text / doc_id")
        if doc_id is not None:
            return analyze_doc(self.index, int(doc_id))
        return analyze_text(self.index.spark, text)

    def sampler(
        self, query: str, key: Optional[str] = None, shard_size: int = 50,
        limit: int = 10, dedup_field: Optional[str] = None,
        max_docs_per_value: int = 1,
    ) -> DataFrame:
        """sampler / diversified_sampler terms agg over the best
        shard_size kept docs (operators/queryext.sampler_terms).
        Default key: `source` where the index has it, else `site`."""
        from .operators.queryext import sampler_terms

        if key is None:
            key = self._meta_default("source", "site")
        self._require_cols(key, dedup_field)
        return sampler_terms(
            self.index, query, key=key, shard_size=int(shard_size),
            k=int(limit), dedup_field=dedup_field,
            max_docs_per_value=int(max_docs_per_value),
        )

    def phrase_prefix(
        self, query: str, limit: int = 10, max_expansions: int = 8
    ) -> DataFrame:
        """match_phrase_prefix: the query's last token expands as a
        prefix; docs must contain the phrase with any expansion in the
        last slot (operators/queryext.match_phrase_prefix_topk)."""
        from .operators.queryext import match_phrase_prefix_topk

        return match_phrase_prefix_topk(
            self.index, query, k=int(limit),
            max_expansions=int(max_expansions),
        )

    def mget(self, doc_ids) -> DataFrame:
        """Multi-document fetch by id (operators/termvectors.mget —
        the ES _mget API)."""
        from .operators.termvectors import mget

        return mget(self.index, doc_ids)

    def terms_enum(
        self, prefix: str, size: int = 10, search_after=None
    ) -> DataFrame:
        """Dictionary prefix enumeration with keyset pagination
        (operators/queryext.terms_enum — the ES _terms_enum API)."""
        from .operators.queryext import terms_enum

        return terms_enum(
            self.index, prefix, size=int(size), search_after=search_after
        )

    def pinned(self, query: str, pinned_ids, limit: int = 10) -> DataFrame:
        """Curated promotions first in provided order, organic BM25
        after (operators/queryext.bm25_pinned_topk — the ES pinned
        query)."""
        from .operators.queryext import bm25_pinned_topk

        return bm25_pinned_topk(self.index, query, pinned_ids, k=int(limit))

    def rescore(
        self, query: str, phrase: str, window_size: int = 20,
        rescore_weight: float = 2.0, limit: int = 10,
    ) -> DataFrame:
        """ES native rescore: the top window re-ranks by base +
        rescore_weight * phrase occurrences
        (operators/queryext.bm25_rescore_topk)."""
        from .operators.queryext import bm25_rescore_topk

        return bm25_rescore_topk(
            self.index, query, phrase, window_size=int(window_size),
            rescore_weight=float(rescore_weight), k=int(limit),
        )

    def boosting(
        self,
        positive: str,
        negative: str,
        negative_boost: float = 0.5,
        limit: int = 10,
    ) -> DataFrame:
        """The ES boosting query: BM25(positive) ranking with docs
        matching the negative part demoted by negative_boost
        (operators/boosting)."""
        from .operators.boosting import bm25_boosting_topk

        return bm25_boosting_topk(
            self.index, positive, negative,
            negative_boost=float(negative_boost), k=int(limit),
        )

    KNN_MODES = ("exact", "bq", "mrl")

    def knn(
        self, text: str, limit: int = 10, lang=None, mode: str = "exact",
        min_sim: float | None = None,
    ) -> DataFrame:
        """ES kNN search (with optional filter): cosine top-k of the
        query text's embedding over the doc embeddings, restricted
        DURING the search to docs matching the filter. ``mode`` picks
        the serving tier: ``exact`` (full-precision scan,
        functions/embed.cosine_topk_filtered), ``bq`` (1-bit Hamming
        first stage + exact refine — the 32x-smaller scan,
        similarity.bq_hamming_topk), ``mrl`` (Matryoshka quarter-
        prefix funnel + full-dim refine, similarity.mrl_topk). The
        quantized tiers apply the filter by restricting the scanned
        relation (true restricted top-k, same as exact). ``min_sim``
        is the ES kNN ``similarity`` parameter: hits whose final
        cosine falls below it are dropped from the returned window
        (every mode's final score is a cosine — the quantized tiers
        serve with refine, so the cutoff composes identically)."""
        from pyspark.sql import functions as F

        from .functions.embed import cosine_topk_filtered, mock_embed_text

        if mode not in self.KNN_MODES:
            raise ValueError(
                f"unknown knn mode {mode!r}; valid: {self.KNN_MODES}"
            )
        emb = self._ensure_embeddings()
        qvec = mock_embed_text(text, self.dim)
        id_filter = None
        if lang:
            if lang not in self._known_langs():
                return self.index.spark.createDataFrame(
                    [], "rank int, doc_id long, score double"
                )
            id_filter = self.index.docs.where(
                F.col("lang") == lang
            ).select("doc_id")
        def _cut(df):
            if min_sim is None:
                return df
            return df.where(F.col("score") >= float(min_sim))

        if mode == "exact":
            return _cut(cosine_topk_filtered(
                emb, qvec, int(limit), id_filter=id_filter, id_col="doc_id"
            ))
        from .operators import similarity as _sim

        # plain semi join — the filter set can be corpus-scale (a
        # majority lang), so no broadcast hint (the domain-cap lesson);
        # AQE picks the strategy from the actual build side
        if id_filter is not None:
            emb = emb.join(id_filter, "doc_id", "leftsemi")
        if mode == "bq":
            return _cut(_sim.bq_hamming_topk(
                emb, qvec, k=int(limit), refine=4, id_col="doc_id"
            ))
        return _cut(_sim.mrl_topk(
            emb, qvec, dim_prefix=max(8, self.dim // 4), k=int(limit),
            refine=4, id_col="doc_id",
        ))

    SORT_FIELDS = ("doc_len",)

    def search_sorted(
        self, query: str, sort: str = "doc_len", asc: bool = False,
        limit: int = 10,
    ) -> DataFrame:
        """Sort-by-field search (the ES ``sort`` option): the query
        defines the match set, the top-k is cut by a document field
        ((field, doc_id) total order) with the BM25 score riding along
        (operators/explore.bm25_sort_topk). Unknown sort fields raise
        (F8 — the endpoint 400s)."""
        if sort not in self.SORT_FIELDS:
            raise ValueError(
                f"unknown sort field {sort!r}; valid: {self.SORT_FIELDS}"
            )
        from .operators.explore import bm25_sort_topk

        return bm25_sort_topk(self.index, query, sort=sort, asc=asc,
                              k=int(limit))

    def rank_eval(self, queries: Dict[int, str], k: int = 10) -> DataFrame:
        """The ES ``_rank_eval`` API over the served index: run the
        batch BM25 ranking for ``queries`` and score it against the
        corpus-derived graded labels (rel = distinct query terms
        present) -> one row per query with nDCG@k / MRR / recall@k /
        precision@k / ERR@k (operators/evalrank). The quality
        regression check an index or analyzer change runs before a
        serving swap."""
        from .operators.evalrank import eval_ranking, relevance_labels
        from .operators.scorer import bm25_topk_batch

        if not queries:
            raise ValueError("rank_eval needs at least one query")
        qmap = {int(qid): str(q) for qid, q in queries.items()}
        res = bm25_topk_batch(self.index, qmap, k=int(k))
        labels = relevance_labels(self.index.docs, qmap)
        return eval_ranking(res, labels, k=int(k))

    def open_pit(self) -> str:
        """The ES point-in-time API: pin the CURRENTLY served index
        handle under an id. Searches through the pit see exactly this
        snapshot — a concurrent reload_index swap never changes a
        pit-pinned ranking mid-pagination (the consistency guarantee
        search_after alone cannot give across index swaps)."""
        import hashlib

        # a leaked-handle backstop, not a quota: clients that never
        # close would otherwise pin every historical index handle (and
        # its cached relations) forever
        if len(self._pits) >= 256:
            raise ValueError(
                "too many open point-in-time handles (256); close some"
            )
        self._pit_seq += 1
        pid = hashlib.sha256(
            f"pit:{id(self.index)}:{self._pit_seq}".encode()
        ).hexdigest()[:16]
        self._pits[pid] = self.index
        return pid

    def close_pit(self, pit_id: str) -> bool:
        """Release a pit handle -> True if it existed. The pinned
        relations become collectable once no pit references them."""
        return self._pits.pop(pit_id, None) is not None

    def search_pit(
        self, pit_id: str, query: str, limit: int = 10,
        lang=None, site=None, source=None,
    ) -> DataFrame:
        """BM25 search against a pinned point-in-time snapshot (the
        full _bm25 dispatcher — quoted/NEAR/boolean/wildcard/fuzzy/
        boosted — over the pit's index handle). Unknown pit ids raise
        (the ES search_context_missing analog -> 400 at the API)."""
        if pit_id not in self._pits:
            raise ValueError(f"unknown or expired pit id: {pit_id!r}")
        filters = {
            k: v
            for k, v in (("lang", lang), ("site", site), ("source", source))
            if v
        }
        return self._bm25(
            query, int(limit), filters or None, "exact",
            index=self._pits[pit_id],
        )

    def validate(self, query: str) -> dict:
        """The ES _validate/query API: is the query parseable, which
        query type would the dispatcher route it to, and what does it
        analyze to? Never executes the query — parse/classify only.
        Uses the SAME detector predicates in the SAME order as the
        _bm25 dispatcher, so the classification cannot drift from the
        routing."""
        from .operators.boolquery import is_boolean_query
        from .operators.boostquery import is_boosted_query
        from .operators.fuzzy import is_fuzzy_query
        from .operators.proximity import (
            parse_near_query,
            parse_ordered_near_query,
        )
        from .operators.wildcard import is_wildcard_query
        from .oracle.tokenizer import tokenize

        q = (query or "").strip()
        try:
            if len(q) >= 2 and q[0] == '"' and q[-1] == '"':
                kind, toks = "phrase", tokenize(q[1:-1])
            elif parse_ordered_near_query(q) is not None:
                kind, toks = "ordered_near", parse_ordered_near_query(q)[0]
            elif parse_near_query(q) is not None:
                kind, toks = "near", parse_near_query(q)[0]
            elif is_boolean_query(q):
                kind, toks = "boolean", tokenize(q.replace("+", " ").replace("-", " "))
            elif is_wildcard_query(q):
                kind, toks = "wildcard", tokenize(q.replace("*", " "))
            elif is_fuzzy_query(q):
                kind, toks = "fuzzy", tokenize(q.replace("~", " "))
            elif is_boosted_query(q):
                kind, toks = "boosted", tokenize(q.replace("^", " "))
            else:
                kind, toks = "match", tokenize(q)
            return {"valid": True, "query_type": kind,
                    "tokens": list(toks), "matches_nothing": not toks}
        except ValueError as e:
            return {"valid": False, "error": str(e)}

    def field_caps(self) -> list:
        """The ES _field_caps API: the searchable/aggregatable fields
        of the served index with their types — docs-relation columns
        plus the derived surfaces (embedding kNN when present)."""
        out = []
        for f in self.index.docs.schema.fields:
            name, dt = f.name, f.dataType.simpleString()
            out.append({
                "field": name,
                "type": dt,
                # full-text search runs over the tokenized text; the
                # metadata strings are filter/agg fields
                "searchable": name in ("text", "tokens", "url"),
                "aggregatable": dt in ("string", "bigint", "int", "long",
                                       "double") and name not in ("text",),
            })
        out.append({
            "field": "_embedding",
            "type": f"array<float>[{self.dim}]",
            "searchable": True,   # via /knn
            "aggregatable": False,
        })
        return sorted(out, key=lambda r: r["field"])

    def similar(self, doc_id: int, m: int = 5, limit: int = 10) -> DataFrame:
        """More-like-this over the served index
        (operators/explore.more_like_this)."""
        from .operators.explore import more_like_this

        return more_like_this(self.index, int(doc_id), m=m, k=limit)

    def search_msm(
        self,
        query: str,
        limit: int = 20,
        msm: int = 2,
        lang: Optional[str] = None,
        site: Optional[str] = None,
        source: Optional[str] = None,
    ) -> DataFrame:
        """minimum_should_match search
        (operators/boolquery.bm25_topk_msm): at least ``msm`` of the
        query's distinct terms must be present. Unknown lang drops,
        like search()/count()."""
        from .operators.boolquery import bm25_topk_msm

        filters: Dict[str, str] = {}
        if lang and lang in self._known_langs():
            filters["lang"] = lang
        if site:
            filters["site"] = site
        if source:
            filters["source"] = source
        return bm25_topk_msm(
            self.index, query, k=int(limit), msm=int(msm),
            filters=filters or None,
        )

    def terms_set(
        self,
        query: str,
        limit: int = 20,
        lang: Optional[str] = None,
        site: Optional[str] = None,
        source: Optional[str] = None,
    ) -> DataFrame:
        """terms_set search (operators/boolquery.bm25_topk_terms_set):
        per-doc minimum_should_match — a doc matches only if it
        contains at least its own required number of the query's
        distinct terms (the deterministic doc_id % 3 + 1 derivation;
        a materialized required_matches column swaps in unchanged).
        Filter semantics match search_msm."""
        from .operators.boolquery import bm25_topk_terms_set

        filters: Dict[str, str] = {}
        if lang and lang in self._known_langs():
            filters["lang"] = lang
        if site:
            filters["site"] = site
        if source:
            filters["source"] = source
        return bm25_topk_terms_set(
            self.index, query, k=int(limit), filters=filters or None
        )

    def search_after(
        self,
        query: str,
        limit: int = 20,
        after_score: Optional[float] = None,
        after_doc: Optional[int] = None,
        lang: Optional[str] = None,
        site: Optional[str] = None,
        source: Optional[str] = None,
    ) -> DataFrame:
        """Keyset pagination (operators/scorer.bm25_topk_after): the
        next ``limit`` rows strictly after the (after_score, after_doc)
        cursor — RAW scores in and out (no page-1 normalization: the
        cursor must cut the unnormalized total order), so deep paging
        costs a plain top-``limit`` regardless of depth. Without a
        cursor this is the unnormalized first page. Unknown lang drops,
        like search()/count() ('About N results' consistency)."""
        from .operators.scorer import bm25_topk_after

        filters: Dict[str, str] = {}
        if lang and lang in self._known_langs():
            filters["lang"] = lang
        if site:
            filters["site"] = site
        if source:
            filters["source"] = source
        after = None
        if after_score is not None and after_doc is not None:
            after = (float(after_score), int(after_doc))
        return bm25_topk_after(
            self.index, query, k=int(limit), after=after,
            filters=filters or None,
        )

    def significant(
        self, query: str, limit: int = 20, min_fg: int = 2
    ) -> DataFrame:
        """Significant-terms aggregation over the query's BM25 kept set
        (operators/significant.significant_terms)."""
        from .operators.significant import significant_terms

        return significant_terms(
            self.index, query, k=int(limit), min_fg=int(min_fg)
        )
