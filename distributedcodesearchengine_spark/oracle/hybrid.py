"""Pure-Python replicas of the reference's hybrid-search driver logic:
query enhancement (engine.py:240-271) and RRF fusion (engine.py:273-392).
Used as the oracle for operators/rrf.py tests."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


def enhance_query(query: str) -> str:
    """Transcription of HybridSearchEngine._enhance_query
    (codesearch/search/engine.py:240-271)."""
    q = query.lower()
    if any(t in q for t in ["http", "request", "api", "url", "web"]):
        if "handle" in q and not any(
            t in q for t in ["redirect", "response", "error", "exception", "cookie", "process"]
        ):
            return "function that sends makes HTTP requests GET POST PUT DELETE PATCH"
        if any(t in q for t in ["make", "send", "perform", "execute", "do"]):
            return f"function that sends or makes HTTP requests: {query}"
        return f"HTTP request function: {query}"
    if any(t in q for t in ["json", "parse", "decode"]):
        return f"JSON parsing function: {query}"
    if any(t in q for t in ["auth", "login", "token"]):
        return f"authentication function: {query}"
    if any(t in q for t in ["download", "file", "save"]):
        return f"file handling function: {query}"
    return f"function or method that {query}"


def rrf_fuse(
    semantic: Sequence[Tuple[object, float]],
    bm25: Sequence[Tuple[object, float]],
    semantic_weight: float = 0.7,
    k: int = 60,
    query: Optional[str] = None,
    boosts: Optional[Dict[object, float]] = None,
) -> List[Tuple[object, float, float, float]]:
    """Transcription of _reciprocal_rank_fusion (engine.py:273-392).

    ``boosts``: per-id multiplicative factor standing in for the
    path/name pattern rules (engine.py:338-367); applied only when the
    query mentions http/request/api, factor defaults to 1.0."""
    if semantic:
        ss = [s for _, s in semantic]
        if max(ss) - min(ss) < 0.05:
            semantic_weight = 0.3
    bm25_weight = 1 - semantic_weight

    scores: Dict[object, dict] = {}
    for rank, (eid, score) in enumerate(semantic):
        scores[eid] = {
            "semantic_rrf": (1 / (k + rank + 1)) * semantic_weight,
            "semantic_raw": score,
            "bm25_rrf": 0.0,
            "bm25_raw": 0.0,
        }
    for rank, (eid, score) in enumerate(bm25):
        rrf = (1 / (k + rank + 1)) * bm25_weight
        if eid in scores:
            scores[eid]["bm25_rrf"] = rrf
            scores[eid]["bm25_raw"] = score
        else:
            scores[eid] = {
                "semantic_rrf": 0.0,
                "semantic_raw": 0.0,
                "bm25_rrf": rrf,
                "bm25_raw": score,
            }

    http_query = bool(query) and any(
        t in query.lower() for t in ("http", "request", "api")
    )
    combined = []
    for eid, d in scores.items():
        boost = (boosts or {}).get(eid, 1.0) if http_query else 1.0
        combined.append(
            (eid, (d["semantic_rrf"] + d["bm25_rrf"]) * boost, d["semantic_raw"], d["bm25_raw"])
        )
    combined.sort(key=lambda x: x[1], reverse=True)  # stable: insertion order ties
    if combined:
        mx = combined[0][1]
        if mx > 0:
            combined = [(e, s / mx, a, b) for e, s, a, b in combined]
    return combined
