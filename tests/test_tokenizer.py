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


def test_arrow_matches_scalar():
    import pyarrow as pa

    from engine.tokenizer import tokenize_arrow
    cases = ["Hello, World!", "<i>tag</i> body", "def foo_bar(baz):",
             "camelCaseId mixedUPPERLower", "", "a b  c\nd", "x=1;y=2",
             "é café naïve", "中文 分词 test", "num42ber 3.14 v2_0",
             "   \t\n  ", "a1B2c3D eF"]
    got = tokenize_arrow(pa.array(cases)).to_pylist()
    assert got == [tokenize(c) for c in cases]


def test_jvm_token_count_matches_python(spark):
    from pyspark.sql import functions as F

    from engine.tokenizer import spark_token_count_expr
    cases = ["Hello, World!", "<i>tag</i> body", "def foo_bar(baz):",
             "camelCaseId mixedUPPERLower", "", "a b  c\nd", "x=1;y=2",
             "é café naïve", "中文 分词 test", "num42ber 3.14 v2_0",
             "   \t\n  ", "a1B2c3D eF"]
    df = spark.createDataFrame([(c,) for c in cases], "content string")
    got = [r["n"] for r in
           df.select(spark_token_count_expr(F.col("content")).alias("n"))
           .collect()]
    assert got == [len(tokenize(c)) for c in cases]
