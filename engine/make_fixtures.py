"""Generate committed query fixtures + golden top-k from the pure oracle.

Run: python -m engine.make_fixtures
Writes fixtures/queries.json and fixtures/topk_golden.json. Deterministic
(corpus seed fixed). The golden file is the rank-identity gate: the Spark
engine must reproduce doc_ids AND float64 scores exactly (JSON round-trips
doubles losslessly via shortest-repr).

Query mix per FIXTURES.md §4: hot single terms, rare single terms, 2–4 term
conjunctions (overlapping/disjoint), absent terms, duplicate terms (set
semantics — reference Searcher.java:42), punctuation/case normalization
cases, an all-stopword query, one k=300 (reference's server cap,
Searcher.java:196).
"""

from __future__ import annotations

import json
import os

from .corpus import make_corpus
from .oracle import Bm25Oracle

FIXTURE_CORPUS_DOCS = 1200
FIXTURE_CORPUS_SEED = 42

_QUERIES: list[tuple[str, str, int]] = []
_id = 0


def _q(text: str, mode: str, k: int = 10):
    global _id
    _QUERIES.append({"query_id": _id, "query": text, "mode": mode, "k": k})
    _id += 1


for mode in ("ranked", "conjunctive"):
    _q("def", mode)                       # hottest keyword
    _q("return", mode)
    _q("identifier_40", mode)             # mid-frequency
    _q("identifier_1500", mode)           # rare tail
    _q("def return", mode)                # hot+hot overlap
    _q("def identifier_300", mode)        # hot+rare
    _q("identifier_100 identifier_101", mode)
    _q("def return if for", mode)         # 4-term all-stopword analog
    _q("class import self static", mode)
    _q("zzz_absent_term", mode)           # absent term
    _q("def zzz_absent_term", mode)       # hot + absent (AND -> empty)
    _q("DEF Return!", mode)               # case + punctuation normalization
    _q("def, def; DEF", mode)             # duplicates -> set semantics
    _q("identifier_7 identifier_8 identifier_9", mode)
    _q("<b>def</b> return", mode)         # tag stripping
    _q("identifier_2 identifier_999 identifier_1999", mode)
    _q("int for while", mode)
    _q("   ", mode)                       # empty after normalization
_q("def", "ranked", 300)                  # server-cap fixture
_q("return identifier_50", "ranked", 100)
_q("def return", "conjunctive", 300)


def main(out_dir: str = "fixtures") -> None:
    os.makedirs(out_dir, exist_ok=True)
    pdf = make_corpus(FIXTURE_CORPUS_DOCS, seed=FIXTURE_CORPUS_SEED)
    corpus = dict(zip(pdf["doc_id"], pdf["content"]))
    oracle = Bm25Oracle(corpus)
    golden = []
    for q in _QUERIES:
        for rank, doc_id, score in oracle.topk(q["query"], q["k"], q["mode"]):
            golden.append({"query_id": q["query_id"], "rank": rank,
                           "doc_id": doc_id, "score": score})
    with open(os.path.join(out_dir, "queries.json"), "w") as f:
        json.dump(_QUERIES, f, indent=1)
    with open(os.path.join(out_dir, "topk_golden.json"), "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {len(_QUERIES)} queries, {len(golden)} golden rows")


if __name__ == "__main__":
    main()
