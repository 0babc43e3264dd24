"""Shared tokenizer — the single term-space authority for index AND query paths.

The reference duplicates its normalization regex between the (missing) Indexer
and the Searcher (searchEngine/src/cis5550/search/Searcher.java:39: strip
``<...>`` tags, ``\\p{Punct}``->space, lowercase, split on whitespace) and the
two only agree by luck. Here one function is used by both paths:

- strip HTML-ish tags,
- split camelCase boundaries (code-aware extension; the reference corpus was
  HTML, ours is source code per BASELINE.json input_hint),
- punctuation (incl. ``_``, which is ``\\p{Punct}``) -> space, so snake_case
  splits too,
- lowercase, split on whitespace.

Pure-Python `tokenize` is the oracle-side truth; `tokenize_series` is the
vectorized pandas implementation used inside Spark pandas UDFs (no per-row
Python in the hot path, per BASELINE.json input_hint).
"""

from __future__ import annotations

import re

import pandas as pd

_TAG_RE = re.compile(r"<[^>]*>")
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
# ASCII/unicode punctuation + underscore -> space. \w keeps letters/digits.
_PUNCT_RE = re.compile(r"[^\w\s]|_")


def tokenize(text: str) -> list[str]:
    """Normalize + split one document/query string into terms."""
    if not text:
        return []
    text = _TAG_RE.sub(" ", text)
    text = _CAMEL_RE.sub(" ", text)
    text = _PUNCT_RE.sub(" ", text)
    return text.lower().split()


def query_terms(query: str) -> list[str]:
    """Unique query terms in sorted order (set semantics, like the
    reference's HashSet dedup at Searcher.java:42; sorted so BM25 summation
    order is deterministic — SURVEY.md §7.4 rank-identity discipline)."""
    return sorted(set(tokenize(query)))


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: pd.Series[str] -> pd.Series[list[str]].

    Uses pandas' C-backed .str ops for the regex passes; the final split
    produces Python lists (needed for Arrow list<string> transfer anyway).
    Must stay behaviorally identical to ``tokenize`` — tests enforce it.
    """
    s = texts.fillna("")
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace(_CAMEL_RE, " ", regex=True)
    s = s.str.replace(_PUNCT_RE, " ", regex=True)
    return s.str.lower().str.split()
