import math

from engine import B, K1
from engine.oracle import Bm25Oracle, tfidf_reference_scores

CORPUS = {
    1: "def foo return foo foo",
    2: "def bar return",
    3: "class baz import foo",
    4: "unrelated words entirely different",
}


def test_stats():
    o = Bm25Oracle(CORPUS)
    assert o.n_docs == 4
    assert o.doc_len == {1: 5, 2: 3, 3: 4, 4: 4}
    assert o.avgdl == 4.0
    assert o.df("foo") == 2
    assert o.df("def") == 2
    assert o.df("missing") == 0


def test_bm25_hand_computed():
    o = Bm25Oracle(CORPUS)
    # doc 1, term "foo": tf=3, dl=5, avgdl=4, df=2, N=4
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    tfw = (3 * (K1 + 1)) / (3 + K1 * (1 - B + B * (5 / 4.0)))
    assert o.score_doc(["foo"], 1) == idf * tfw


def test_conjunctive_vs_ranked():
    o = Bm25Oracle(CORPUS)
    # "def foo": conjunctive -> only doc 1 has both
    conj = o.topk("def foo", k=10, mode="conjunctive")
    assert [d for _, d, _ in conj] == [1]
    # ranked (OR) -> docs 1,2,3 have at least one term
    ranked = o.topk("def foo", k=10, mode="ranked")
    assert sorted(d for _, d, _ in ranked) == [1, 2, 3]
    assert ranked[0][1] == 1  # doc 1 scores highest
    # ranks are 1-based consecutive
    assert [r for r, _, _ in ranked] == [1, 2, 3]


def test_missing_term_and_empty_query():
    o = Bm25Oracle(CORPUS)
    assert o.topk("zzz_absent", 10, "conjunctive") == []
    assert o.topk("zzz_absent", 10, "ranked") == []
    assert o.topk("", 10, "ranked") == []
    # conjunction with one absent term is empty even if other matches
    assert o.topk("foo zzz_absent", 10, "conjunctive") == []


def test_tie_break_doc_id_asc():
    corpus = {7: "same text", 3: "same text", 5: "same text"}
    o = Bm25Oracle(corpus)
    res = o.topk("same", 10, "ranked")
    assert [d for _, d, _ in res] == [3, 5, 7]
    assert res[0][2] == res[1][2] == res[2][2]


def test_tfidf_reference_semantics():
    # mirror of Searcher.java: (1+log10 tf)*log10(N/df), OR, >0.3, top 300
    res = tfidf_reference_scores(CORPUS, "foo bar", threshold=0.0, k=300)
    got = {d: s for _, d, s in res}
    idf_foo = math.log10(4 / 2)
    idf_bar = math.log10(4 / 1)
    assert math.isclose(got[1], (1 + math.log10(3)) * idf_foo)
    assert math.isclose(got[2], (1 + math.log10(1)) * idf_bar)
    assert math.isclose(got[3], (1 + math.log10(1)) * idf_foo)
