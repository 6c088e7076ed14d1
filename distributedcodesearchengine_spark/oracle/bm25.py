"""Pure-Python BM25Okapi replica — the rank-identity oracle.

Implements the public scoring contract of the MIT-licensed ``rank_bm25``
library's ``BM25Okapi`` (pinned by the reference at requirements.txt:26 and
invoked at ``codesearch/storage/bm25_index.py:115``), plus the reference's
search post-processing (threshold / filters / stable sort / limit,
``bm25_index.py:117-170``):

    tf(t,d)   = count of t in tokenize(d)
    len(d)    = |tokenize(d)|;  avgdl = mean(len) over ALL docs (incl. empty)
    df(t)     = #docs containing t
    idf(t)    = ln(N - df + 0.5) - ln(df + 0.5)
    avg_idf   = sum_t idf(t) / |vocab|          (sum includes negatives)
    idf(t)   := epsilon * avg_idf  if idf(t) < 0     (epsilon = 0.25)
    score(q,d)= sum over query tokens WITH multiplicity of
                idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*len(d)/avgdl))
    then: keep score >= 0.01 * max(score) if max > 0 else keep all
          (threshold computed on the UNFILTERED corpus, bm25_index.py:149-152)
    then: metadata equality filters                  (bm25_index.py:157-164)
    then: stable sort desc (ties keep corpus order = ascending doc position)
    then: [:limit]                                   (bm25_index.py:169-170)

Defaults k1=1.5, b=0.75, epsilon=0.25 (rank_bm25 BM25Okapi defaults).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .tokenizer import tokenize


class BM25Oracle:
    """In-memory BM25Okapi replica over a token-list corpus."""

    def __init__(
        self,
        corpus: Sequence[List[str]],
        k1: float = 1.5,
        b: float = 0.75,
        epsilon: float = 0.25,
    ):
        if not corpus:
            raise ValueError("empty corpus")
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.corpus_size = len(corpus)
        self.doc_len = np.array([len(d) for d in corpus], dtype=np.float64)
        # avgdl over ALL docs, empty ones included (rank_bm25 _initialize)
        self.avgdl = float(self.doc_len.sum()) / self.corpus_size
        self.doc_freqs: List[Dict[str, int]] = []
        nd: Dict[str, int] = {}
        for doc in corpus:
            freqs: Dict[str, int] = {}
            for w in doc:
                freqs[w] = freqs.get(w, 0) + 1
            self.doc_freqs.append(freqs)
            for w in freqs:
                nd[w] = nd.get(w, 0) + 1
        # _calc_idf: epsilon floor against the vocab-average idf
        self.idf: Dict[str, float] = {}
        idf_sum = 0.0
        negative: List[str] = []
        for w, df in nd.items():
            idf = math.log(self.corpus_size - df + 0.5) - math.log(df + 0.5)
            self.idf[w] = idf
            idf_sum += idf
            if idf < 0:
                negative.append(w)
        self.average_idf = idf_sum / len(self.idf)
        eps = self.epsilon * self.average_idf
        for w in negative:
            self.idf[w] = eps

    def get_scores(self, query_tokens: Sequence[str]) -> np.ndarray:
        """Dense score array over the whole corpus, rank_bm25 op order."""
        score = np.zeros(self.corpus_size)
        for q in query_tokens:
            q_freq = np.array(
                [(doc.get(q) or 0) for doc in self.doc_freqs], dtype=np.float64
            )
            score += (self.idf.get(q) or 0.0) * (
                q_freq
                * (self.k1 + 1)
                / (q_freq + self.k1 * (1 - self.b + self.b * self.doc_len / self.avgdl))
            )
        return score

    def search(
        self,
        query: str,
        limit: int = 20,
        filters: Optional[Dict[str, Sequence[str]]] = None,
        meta: Optional[Dict[str, Sequence]] = None,
    ) -> List[Tuple[int, float]]:
        """Reference search post-processing -> [(doc_position, score)].

        ``meta`` maps a filter key (e.g. 'lang') to a per-doc value list;
        ``filters`` maps the same key to the required equality value.
        Mirrors bm25_index.py:117-170 including threshold-before-filter.
        """
        query_tokens = tokenize(query)
        if not query_tokens:
            return []
        scores = self.get_scores(query_tokens)
        mx = float(scores.max())
        min_score = mx * 0.01 if len(scores) > 0 and mx > 0 else float("-inf")
        results: List[Tuple[int, float]] = []
        for idx in range(self.corpus_size):
            s = float(scores[idx])
            if s < min_score:
                continue
            if filters and meta:
                skip = False
                for key, want in filters.items():
                    if meta[key][idx] != want:
                        skip = True
                        break
                if skip:
                    continue
            results.append((idx, s))
        # Python list.sort is stable: ties keep ascending corpus position
        results.sort(key=lambda x: x[1], reverse=True)
        return results[:limit]
