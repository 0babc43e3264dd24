import pandas as pd

from engine.tokenizer import query_terms, tokenize, tokenize_series


def test_golden_cases():
    assert tokenize("Hello, World!") == ["hello", "world"]
    # reference rule: tags stripped, punct -> space (Searcher.java:39)
    assert tokenize("<b>Bold</b> text.") == ["bold", "text"]
    # code-aware: snake_case via punct rule (_ is punct), camelCase split
    assert tokenize("def get_user_name(self):") == [
        "def", "get", "user", "name", "self"]
    assert tokenize("parseHTTPResponse2 fooBar") == [
        "parse", "httpresponse2", "foo", "bar"]
    assert tokenize("x=1; y+=2") == ["x", "1", "y", "2"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("   \n\t  ") == []


def test_query_terms_dedup_sorted():
    # set semantics like the reference (Searcher.java:42), sorted order
    assert query_terms("The the THE quick") == ["quick", "the"]
    assert query_terms("") == []


def test_series_matches_scalar():
    texts = [
        "Hello, World!", "<i>tag</i> body", "def foo_bar(baz):",
        "camelCaseId mixedUPPERLower", "", None, "a b  c\nd",
        "x=1;y=2", "ALL CAPS TEXT", "num42ber 3.14 v2_0",
    ]
    got = tokenize_series(pd.Series(texts)).tolist()
    want = [tokenize(t) for t in texts]
    assert got == want
