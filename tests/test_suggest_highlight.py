"""Autocomplete (/suggest) and result highlighting — search-UX surfaces the
reference's frontend lacks (frontEnd/search_engine/src/pages/Results.jsx
renders plain ranked results only); both are standard engine features
(Lucene suggesters / highlighter), so they round out the serving tier.

suggest: one pushdown StringStartsWith dictionary scan + distributed
sort+limit (exactly k rows to the driver). highlight: pure driver-side
string work on the k display rows, camelCase/snake_case-aware so marked
spans agree with what the index matched."""

import json
import os
import threading
import urllib.request

import pytest

from engine.query import SearchEngine, suggest_terms, suggest_terms_federated
from engine.server import SearchService, make_server
from engine.tokenizer import highlight, tokenize


# ---------------------------------------------------------------- highlight

def test_highlight_basic():
    assert highlight("return the value", ["return"]) == \
        "<em>return</em> the value"


def test_highlight_case_insensitive_and_multiple():
    out = highlight("Return foo; return bar", ["return"])
    assert out == "<em>Return</em> foo; <em>return</em> bar"


def test_highlight_camel_case_part():
    # tokenize("FooBar") == ["foo", "bar"]; term 'foo' marks only its part
    assert highlight("FooBar baz", ["foo"]) == "<em>Foo</em>Bar baz"
    assert highlight("FooBar baz", ["bar"]) == "Foo<em>Bar</em> baz"


def test_highlight_snake_case_parts():
    out = highlight("foo_bar()", ["foo", "bar"])
    assert out == "<em>foo</em>_<em>bar</em>()"


def test_highlight_prefix_stem():
    out = highlight("scan scanner scope", [], prefixes=("scan",))
    assert out == "<em>scan</em> <em>scanner</em> scope"


def test_highlight_no_match_passthrough():
    text = "nothing to see"
    assert highlight(text, ["absent"]) is text
    assert highlight(text, []) is text
    assert highlight("", ["x"]) == ""


def test_highlight_spans_tokenize_back_to_query_terms():
    """Every <em>-wrapped span's own tokenization is a query term — the
    agree-with-the-index property."""
    text = "def readFile(path): return read_file(path)  # README"
    terms = ["read", "file"]
    out = highlight(text, terms)
    import re
    spans = re.findall(r"<em>(.*?)</em>", out)
    assert spans, "expected matches"
    for s in spans:
        assert tokenize(s) == [s.lower()]
        assert s.lower() in terms
    # and stripping the markup restores the original text
    assert out.replace("<em>", "").replace("</em>", "") == text


# ------------------------------------------------------------------ suggest

@pytest.fixture(scope="module")
def dictionary(spark, built_index):
    out, _man = built_index
    pdf = (spark.read.parquet(os.path.join(out, "index"))
           .select("term", "df").toPandas())
    return out, pdf


def _expected_suggest(pdf, prefix, k):
    m = pdf[pdf["term"].str.startswith(prefix)]
    m = m.sort_values(["df", "term"], ascending=[False, True])
    return [(t, int(d)) for t, d in zip(m["term"].head(k),
                                        m["df"].head(k))]


def test_suggest_matches_brute_force(spark, dictionary):
    out, pdf = dictionary
    eng = SearchEngine(spark, out)
    for prefix in ["s", "re", "def", "zzzz"]:
        got = suggest_terms(eng.index_df, prefix, k=5)
        assert got == _expected_suggest(pdf, prefix, 5), prefix


def test_suggest_k_bounds(spark, dictionary):
    out, pdf = dictionary
    eng = SearchEngine(spark, out)
    assert suggest_terms(eng.index_df, "s", k=0) == []
    with pytest.raises(ValueError):
        suggest_terms(eng.index_df, "", k=5)


def test_suggest_federated_equals_merged(spark, dictionary):
    """A single-member federation must equal the single index; df sums are
    exercised by splitting the dictionary into two doc-disjoint halves via
    the union rule (same term in both -> dfs add)."""
    out, pdf = dictionary
    idx = spark.read.parquet(os.path.join(out, "index"))
    got = suggest_terms_federated([idx], "s", k=5)
    assert got == _expected_suggest(pdf, "s", 5)
    # two copies: every df doubles, order (df desc, term asc) is preserved
    got2 = suggest_terms_federated([idx, idx], "s", k=5)
    assert got2 == [(t, 2 * d) for t, d in _expected_suggest(pdf, "s", 5)]


# ------------------------------------------------------------- HTTP surface

@pytest.fixture(scope="module")
def served(spark, built_index):
    out, _man = built_index
    service = SearchService(spark, out)
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield service, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp, json.loads(resp.read().decode())


def test_suggest_endpoint(served, dictionary):
    _service, base = served
    _out, pdf = dictionary
    resp, got = _get(f"{base}/suggest?q=s&k=4")
    assert resp.headers["Access-Control-Allow-Origin"] == "*"
    assert got == [{"term": t, "df": d}
                   for t, d in _expected_suggest(pdf, "s", 4)]


def test_suggest_endpoint_empty_prefix_400(served):
    _service, base = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{base}/suggest?q=&k=4", timeout=30)
    assert ei.value.code == 400


def test_search_highlight_param(served):
    service, base = served
    _, plain = _get(f"{base}/search?query=def+return&k=3")
    _, marked = _get(f"{base}/search?query=def+return&k=3&highlight=1")
    assert len(plain) == len(marked) > 0
    saw_em = False
    for p, m in zip(plain, marked):
        assert m["url"] == p["url"]
        assert m["rank_score"] == p["rank_score"]
        # stripping markup restores the plain payload byte-for-byte
        assert m["title"].replace("<em>", "").replace("</em>", "") \
            == p["title"]
        assert m["body"].replace("<em>", "").replace("</em>", "") \
            == p["body"]
        saw_em = saw_em or "<em>" in (m["title"] + m["body"])
    assert saw_em, "top hits for a matching query must highlight something"


def test_search_highlight_wildcard_stem(served):
    _service, base = served
    _, marked = _get(f"{base}/search?query=re*&k=3&highlight=1")
    import re
    spans = [s for h in marked
             for s in re.findall(r"<em>(.*?)</em>", h["body"] + h["title"])]
    assert spans and all(s.lower().startswith("re") for s in spans)
