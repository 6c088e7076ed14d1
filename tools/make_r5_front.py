#!/usr/bin/env python
"""Generate the round-5 registry front (_R5_FRONT).

The driver records only the FIRST 50 registry keys per round, so each
round rotates never-driver-verified keys into the front (see
__spark_entry__._R4_FRONT). This script computes the round-5 front
from the CORRECTNESS artifacts present at round-5 start:

    never_verified = registry - union(CORRECTNESS_r0*.json keys)
    _R5_FRONT = 6 index-warmer stats keys
              + up to 39 never-verified keys (registry insertion order,
                i.e. oldest additions first)
              + 5 core BM25 keys
              (deduplicated, capped at 50)

Usage: python tools/make_r5_front.py   # prints a paste-ready list
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARMERS = [
    "doc_token_stats", "corpus_stats", "term_df_topk", "idf_sample",
    "lang_histogram", "highlights",
]
CORE_BM25 = [
    "bm25_topk_healthy", "bm25_topk_batch", "rrf_hybrid",
    "bm25_topk_sharded_healthy", "bm25_phrase_healthy",
]


def main() -> int:
    import __spark_entry__ as e

    reg = list(e._registry().keys())
    verified: set = set()
    arts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json")))
    for p in arts:
        with open(p) as f:
            data = json.load(f)
        keys = data.keys() if isinstance(data, dict) else [
            r.get("key") or r.get("name") for r in data
        ]
        verified.update(k for k in keys if k)
    never = [k for k in reg if k not in verified]
    front: list = []
    for k in WARMERS + never + CORE_BM25:
        if k in reg and k not in front:
            front.append(k)
        if len(front) >= 50:
            break
    print(f"# registry: {len(reg)} keys; artifacts: "
          f"{[os.path.basename(a) for a in arts]}")
    print(f"# never driver-verified: {len(never)}")
    print(f"# front: {len(front)} keys "
          f"({len([k for k in front if k in never])} never-verified)")
    print("_R5_FRONT = [")
    for k in front:
        print(f'    "{k}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
