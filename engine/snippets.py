"""Query-relevant snippet extraction — best-window selection.

The reference returns a doc's stored leading text as ``body``
(Searcher.java builds results from whatever the KV row carries); Lucene's
highlighter instead picks the fragment of the document most relevant to
THIS query. This module is that fragment chooser: given display text and
the query's matched terms, pick the token window that covers the most
distinct query terms (then the most total occurrences, then the tightest
char span, then earliest), and render it with word-boundary padding and
ellipses.

Scale posture: this is pure driver-side string work on the k display rows
only — never in a plan. The text it windows is whatever the display store
carries per doc (this engine's build materializes a bounded leading
snippet column; a deployment that stores full content gets full-document
windows from the same code path). Token/char mapping comes from
tokenizer.tokenize_with_offsets, so "matched term" agrees exactly with
what the index matched — camelCase/snake_case sub-tokens included.
"""

from __future__ import annotations

from .tokenizer import tokenize_with_offsets

#: default window size, in tokens (matched window, before char padding)
SNIPPET_WINDOW = 30
#: chars of context added either side of the chosen window
SNIPPET_PAD = 20


def best_window(text: str, terms, prefixes=(), width: int = SNIPPET_WINDOW
                ) -> tuple[int, int, int] | None:
    """The [start_char, end_char) span of the best <=``width``-token
    window of ``text`` and its distinct-matched-term count, or None when
    no term (or wildcard prefix) occurs. Ranking: most distinct matched
    terms, then most total matches, then tightest char span, then
    earliest — deterministic for a given (text, query)."""
    if not text or (not terms and not prefixes) or width < 1:
        return None
    spans = tokenize_with_offsets(text)
    tset = {t.lower() for t in terms}
    pfx = tuple(p.lower() for p in prefixes)
    hits = [i for i, (t, _s, _e) in enumerate(spans)
            if t in tset or (pfx and t.startswith(pfx))]
    if not hits:
        return None
    best_key, best_ij = None, None
    for a, i in enumerate(hits):
        lim = i + width  # token window [i, i+width)
        sub = [h for h in hits[a:] if h < lim]
        distinct = len({spans[h][0] for h in sub})
        first_s, last_e = spans[i][1], spans[sub[-1]][2]
        key = (-distinct, -len(sub), last_e - first_s, first_s)
        if best_key is None or key < best_key:
            best_key, best_ij = key, (first_s, last_e, distinct)
    return best_ij


def make_snippet(text: str, terms, prefixes=(),
                 width: int = SNIPPET_WINDOW, pad: int = SNIPPET_PAD
                 ) -> str | None:
    """Render the best window of ``text`` as a display snippet: pad both
    sides to the nearest whitespace boundary, mark truncation with an
    ellipsis. None when nothing matched (caller keeps its default
    body)."""
    got = best_window(text, terms, prefixes, width=width)
    if got is None:
        return None
    s, e, _ = got
    s = max(0, s - pad)
    while s > 0 and not text[s - 1].isspace():
        s -= 1
    e = min(len(text), e + pad)
    while e < len(text) and not text[e].isspace():
        e += 1
    core = text[s:e].strip()
    return ("… " if s > 0 else "") + core + (" …" if e < len(text) else "")
