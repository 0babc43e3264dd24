"""Sequential, obviously-correct scoring oracles (pure Python/NumPy, no Spark).

Golden-truth generators for the rank-identity gate (BASELINE.json: the
distributed engine must match these exactly — docIDs AND scores).

- ``Bm25Oracle``: BM25 (k1=1.2, b=0.75), conjunctive (AND) and ranked (OR)
  modes, per BASELINE.json north_rule.
- ``tfidf_reference_scores``: the reference engine's actual formula —
  sum over query terms of (1+log10 tf)·log10(N/df), OR semantics, score>0.3
  threshold, top 300 (searchEngine/src/cis5550/search/Searcher.java:108,113,
  139-159,196) — kept as a documented secondary scorer.

Float discipline (SURVEY.md §7.4): per-doc score is the sum over query terms
in *sorted term order*, accumulated in float64, one term at a time. The Spark
engine replicates the identical order, so equality is bitwise.
"""

from __future__ import annotations

import math
from collections import Counter

from . import B, K1
from .tokenizer import query_terms, tokenize


class Bm25Oracle:
    """In-memory inverted index + BM25 scorer over a corpus dict.

    corpus: mapping doc_id -> content string.
    """

    def __init__(self, corpus: dict[int, str]):
        self.doc_len: dict[int, int] = {}
        self.postings: dict[str, dict[int, int]] = {}
        for doc_id, content in corpus.items():
            toks = tokenize(content)
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(corpus)
        total = sum(self.doc_len.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        # BM25+ style idf: ln((N - df + 0.5)/(df + 0.5) + 1)  — always >= 0
        df = self.df(term)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def _tf_weight(self, tf: int, dl: int) -> float:
        return (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * (dl / self.avgdl)))

    def score_doc(self, terms: list[str], doc_id: int) -> float:
        """BM25 score of one doc for sorted unique terms (fixed sum order)."""
        dl = self.doc_len[doc_id]
        s = 0.0
        for t in terms:  # caller passes sorted unique terms
            tf = self.postings.get(t, {}).get(doc_id, 0)
            if tf:
                s += self.idf(t) * self._tf_weight(tf, dl)
        return s

    def topk(self, query: str, k: int = 10,
             mode: str = "ranked") -> list[tuple[int, int, float]]:
        """Return [(rank, doc_id, score)] — rank 1-based, tie-break
        score DESC then doc_id ASC (SURVEY.md §2.4)."""
        terms = query_terms(query)
        if not terms:
            return []
        if mode == "conjunctive":
            cands: set[int] | None = None
            for t in terms:
                docs = set(self.postings.get(t, {}))
                cands = docs if cands is None else (cands & docs)
                if not cands:
                    return []
            candidates = cands or set()
        elif mode == "ranked":
            candidates = set()
            for t in terms:
                candidates |= set(self.postings.get(t, {}))
        else:
            raise ValueError(f"unknown mode {mode!r}")
        scored = [(d, self.score_doc(terms, d)) for d in candidates]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return [(i + 1, d, s) for i, (d, s) in enumerate(scored[:k])]


def tfidf_reference_scores(corpus: dict[int, str], query: str,
                           threshold: float = 0.3,
                           k: int = 300) -> list[tuple[int, int, float]]:
    """Reference TF-IDF semantics (Searcher.java:108,113,139-159,196)."""
    oracle = Bm25Oracle(corpus)  # reuse index structures
    terms = query_terms(query)
    acc: dict[int, float] = {}
    n = oracle.n_docs
    for t in terms:
        plist = oracle.postings.get(t, {})
        if not plist:
            continue
        idf = math.log10(n / len(plist))
        for d, tf in plist.items():
            acc[d] = acc.get(d, 0.0) + (1.0 + math.log10(tf)) * idf
    scored = [(d, s) for d, s in acc.items() if s > threshold]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [(i + 1, d, s) for i, (d, s) in enumerate(scored[:k])]
