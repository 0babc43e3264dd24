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
import pyarrow as pa
import pyarrow.compute as pc

_TAG_RE = re.compile(r"<[^>]*>")
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
# unicode punctuation + underscore -> space. \w keeps letters/digits.
_PUNCT_RE = re.compile(r"[^\w\s]|_")

# RE2 (Arrow) equivalents — RE2 has no lookaround, so the camel boundary is
# a capture-group replace; char classes are spelled with \p{..} to stay
# unicode-equivalent to Python's \w. Parity is enforced by tests.
_TAG_RE2 = r"<[^>]*>"
_CAMEL_RE2 = r"([a-z0-9])([A-Z])"
_PUNCT_RE2 = r"[^\p{L}\p{N}\s]|_"


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


#: metadata fields a query may filter on (the corpus/input_hint columns;
#: `path:` is a PREFIX match, the rest are exact). The field names are the
#: docs-snapshot column names, so the filter pushes straight down to the
#: docs parquet scan.
FILTER_FIELDS = ("repo", "path", "lang", "commit")


def parse_query(query: str) -> tuple[str, dict[str, str] | None, list[str]]:
    """Split a raw query string into (text, filters, not_terms) — the
    GitHub-code-search-style surface over the input_hint metadata columns:

    - ``field:value`` tokens (field in FILTER_FIELDS, value non-empty)
      become metadata filters: ``lang:python``, ``repo:org1/repo4``,
      ``path:src/pkg3/`` (path is a prefix match, the others exact; the
      last occurrence of a repeated field wins);
    - ``-term`` tokens become NOT terms (docs containing them are excluded
      from the result set); the leading ``-`` is only an operator at a
      whitespace boundary, matching user expectation — inside a token the
      tokenizer already treats ``-`` as punctuation;
    - everything else joins (whitespace-preserved order) into the scored
      query text.

    Filters and NOT terms restrict the RESULT SET only; BM25/TF-IDF
    statistics (N, avgdl, df) stay as built — Lucene filter-query
    semantics, the same stats discipline as logical deletes."""
    filters: dict[str, str] = {}
    nots: list[str] = []
    text_parts: list[str] = []
    for tok in query.split():
        if ":" in tok:
            field, _, value = tok.partition(":")
            if field in FILTER_FIELDS and value:
                filters[field] = value
                continue
        if tok.startswith("-") and len(tok) > 1:
            nots.extend(tokenize(tok[1:]))
            continue
        text_parts.append(tok)
    return (" ".join(text_parts), filters or None,
            sorted(set(nots)))


#: a maximal \w-run minus underscore — the raw-text span of one-or-more
#: tokens (tokenize() splits these runs only at camelCase boundaries, since
#: every other boundary it uses IS a non-\w character or '_')
_TOKEN_RUN_RE = re.compile(r"[^\W_]+")


def strip_tags_preserving(text: str) -> str:
    """The engine's DOCUMENT MODEL: ``text`` with each ``<...>`` tag
    replaced by an equal-length space run. ``tokenize(text)`` is exactly
    the alnum-camel token split of this string (length preserved, so every
    token span maps back into the original input)."""
    return _TAG_RE.sub(lambda m: " " * (m.end() - m.start()), text)


def token_spans(s: str) -> list[tuple[str, int, int]]:
    """(term, start, end) for every token of ``s`` WITHOUT tag stripping —
    the split step alone. On document-model text (strip_tags_preserving
    output) this emits exactly ``tokenize``'s term list; regex literal
    analysis also runs it on raw pattern fragments, where not re-stripping
    is what keeps the containment argument sound (a fragment of stripped
    text never needs stripping again)."""
    out: list[tuple[str, int, int]] = []
    for m in _TOKEN_RUN_RE.finditer(s):
        off = m.start()
        for part in _CAMEL_RE.split(m.group(0)):
            out.append((part.lower(), off, off + len(part)))
            off += len(part)
    return out


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """``tokenize`` plus the [start, end) character span of every term in
    the ORIGINAL string — the bridge between token space and text space
    (regex literal analysis, snippet slicing). The emitted term list is
    exactly ``tokenize(text)`` (test-enforced parity)."""
    if not text:
        return []
    return token_spans(strip_tags_preserving(text))


def highlight(text: str, terms, prefixes=()) -> str:
    """Wrap every token occurrence of ``text`` that matches a query term in
    ``<em>..</em>`` (the Lucene-highlighter result surface). A "token
    occurrence" is a maximal alnum run sub-split at the SAME camelCase
    boundaries ``tokenize`` uses, so highlighting agrees with what the
    index matched: query term ``foo`` highlights the ``Foo`` part of
    ``FooBar``, and ``foo_bar`` highlights both parts for query
    ``foo bar``. ``prefixes`` marks wildcard stems (token startswith).
    Matching is case-insensitive (terms are normalized lowercase).
    Pure driver-side string work on k display rows — never in a plan."""
    if not text or (not terms and not prefixes):
        return text
    tset = {t.lower() for t in terms}
    pfx = tuple(p.lower() for p in prefixes)
    spans: list[tuple[int, int]] = []
    for m in _TOKEN_RUN_RE.finditer(text):
        off = m.start()
        for part in _CAMEL_RE.split(m.group(0)):
            lp = part.lower()
            if lp in tset or (pfx and lp.startswith(pfx)):
                spans.append((off, off + len(part)))
            off += len(part)
    if not spans:
        return text
    out, last = [], 0
    for s, e in spans:
        out.append(text[last:s])
        out.append("<em>")
        out.append(text[s:e])
        out.append("</em>")
        last = e
    out.append(text[last:])
    return "".join(out)


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


def spark_token_count_expr(col):
    """JVM Column expression: token count of `col` under the SAME
    normalization as ``tokenize`` (Java regex supports lookaround and, via
    (?U), unicode \\w — parity with the Python tokenizer is test-enforced).
    Used where only doc_len is needed: whole-stage codegen, no Python."""
    from pyspark.sql import functions as F
    x = F.regexp_replace(col, r"<[^>]*>", " ")
    x = F.regexp_replace(x, r"(?<=[a-z0-9])(?=[A-Z])", " ")
    x = F.regexp_replace(x, r"(?U)[^\w\s]|_", " ")
    toks = F.split(F.lower(x), r"\s+")
    return F.size(F.filter(toks, lambda t: t != F.lit("")))


def tokenize_arrow(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Arrow-native tokenizer: StringArray -> ListArray<string>.

    Semantically identical to ``tokenize``/``tokenize_series`` (tests
    enforce parity) but runs entirely in Arrow C++ (RE2 + vectorized utf8
    kernels): NO Python objects are created per token. This is the hot-path
    variant for the index build — per-token Python string allocation was the
    dominant cost and killed multi-worker scaling.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    x = pc.replace_substring_regex(texts, pattern=_TAG_RE2, replacement=" ")
    x = pc.replace_substring_regex(x, pattern=_CAMEL_RE2,
                                   replacement=r"\1 \2")
    x = pc.replace_substring_regex(x, pattern=_PUNCT_RE2, replacement=" ")
    x = pc.utf8_lower(x)
    toks = pc.utf8_split_whitespace(x)
    # strip empty tokens produced by leading/trailing whitespace
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    # rebuild list offsets after dropping empties: offset[i+1] = kept tokens
    # up to the end of list i (lists cover `flat` contiguously)
    import numpy as np
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths).astype(np.int64)
    keep_np = keep.to_numpy(zero_copy_only=False).astype(np.int64)
    kept_cum = np.concatenate(([0], np.cumsum(keep_np)))
    new_offsets = np.empty(len(lengths) + 1, dtype=np.int64)
    new_offsets[0] = 0
    new_offsets[1:] = kept_cum[np.cumsum(lengths)]
    values = pc.filter(flat, keep)
    return pa.LargeListArray.from_arrays(
        pa.array(new_offsets, pa.int64()), values)
