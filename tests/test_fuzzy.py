"""Fuzzy (edit-distance <= 1) term queries — engine/fuzzy.py.

Completeness proof obligation: the SymSpell deletion-neighborhood lookup
(artifact path) must return EXACTLY the dictionary terms with ED <= 1 —
the same set as a brute-force DP Levenshtein over the whole dictionary —
and the artifact-free scan fallback must agree. Then the ranked-OR BM25
over the expansion must be bitwise identical across the driver engine,
the zero-driver-array big path, and the HTTP service."""

import json
import os
import shutil
import threading
import urllib.request

import numpy as np
import pytest

from engine.fuzzy import (
    FUZZY_EXPANSION_CAP,
    deletion_keys,
    ensure_fuzzy,
    expand_fuzzy,
    expand_fuzzy_federated,
    expand_fuzzy_scan,
)
from engine.query import SearchEngine, search_big_fuzzy
from engine.server import SearchService, make_server


def _ed(a: str, b: str) -> int:
    """Plain DP Levenshtein (test oracle)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_keys():
    assert deletion_keys("ab") == ["a", "ab", "b"]
    assert deletion_keys("aa") == ["a", "aa"]
    assert deletion_keys("x") == ["", "x"]


def test_deletion_neighborhood_complete_for_ed1():
    """keys(q) ∩ keys(t) != ∅ whenever ED(q, t) <= 1 — the SymSpell
    candidate-completeness property, exhaustively over a small alphabet."""
    import itertools
    vocab = ["".join(w) for n in (1, 2, 3)
             for w in itertools.product("abc", repeat=n)]
    for q in vocab:
        kq = set(deletion_keys(q))
        for t in vocab:
            if _ed(q, t) <= 1:
                assert kq & set(deletion_keys(t)), (q, t)


@pytest.fixture(scope="module")
def dictionary(spark, built_index):
    out, _man = built_index
    pdf = (spark.read.parquet(os.path.join(out, "index"))
           .select("term", "df").toPandas())
    return out, pdf


def _brute_expand(pdf, q, cap=FUZZY_EXPANSION_CAP):
    m = pdf[[_ed(t, q) <= 1 for t in pdf["term"]]]
    m = m.sort_values(["df", "term"], ascending=[False, True]).head(cap)
    return sorted(m["term"])


def _pick_query(pdf):
    """A dictionary term of length >= 5, with its middle char dropped —
    guaranteed >= 1 fuzzy match that is NOT an exact dictionary hit in
    general."""
    terms = sorted(t for t in pdf["term"] if len(t) >= 5)
    base = terms[len(terms) // 2]
    return base[:2] + base[3:]


def test_expansion_matches_brute_force_both_paths(spark, dictionary):
    out, pdf = dictionary
    eng = SearchEngine(spark, out)
    queries = [_pick_query(pdf), "retur", "zzzzzz",
               sorted(pdf["term"])[0]]  # mutated, near-miss, absent, exact
    # scan fallback first — drop any fuzzy artifact another test (e.g. the
    # alphabetically-earlier did-you-mean suite) already materialized on the
    # shared index, so this test exercises the artifact-less path regardless
    # of suite ordering; ensure_fuzzy below rebuilds it.
    from engine.checkpoint import BuildManifest
    shutil.rmtree(os.path.join(out, "fuzzy"), ignore_errors=True)
    assert not BuildManifest(out).is_complete("fuzzy")
    scan = {q: expand_fuzzy(spark, out, q, index_df=eng.index_df)
            for q in queries}
    # materialize the artifact; the lookup path must agree exactly
    ensure_fuzzy(spark, out)
    assert BuildManifest(out).is_complete("fuzzy")
    for q in queries:
        want = _brute_expand(pdf, q)
        assert scan[q] == want, (q, "scan")
        assert expand_fuzzy(spark, out, q) == want, (q, "artifact")
        assert expand_fuzzy_scan(eng.index_df, q) == want, (q, "scan-fn")
    assert scan["zzzzzz"] == []


def test_ensure_fuzzy_idempotent_and_sorted(spark, dictionary):
    out, _pdf = dictionary
    p1 = ensure_fuzzy(spark, out)
    p2 = ensure_fuzzy(spark, out)  # second call: manifest no-op
    assert p1 == p2
    tbl = spark.read.parquet(p1).toPandas()
    assert set(tbl.columns) == {"del_key", "term", "df"}
    # every term is within ED<=1 of each of its keys by construction
    for dk, t in zip(tbl["del_key"].head(200), tbl["term"].head(200)):
        assert _ed(dk, t) <= 1


def test_search_fuzzy_equals_ranked_or_over_expansion(spark, dictionary):
    out, pdf = dictionary
    eng = SearchEngine(spark, out)
    q = _pick_query(pdf)
    expanded = _brute_expand(pdf, q)
    assert expanded, "fixture query must expand"
    got = eng.search_fuzzy(q, k=10)
    want = eng.search(" ".join(expanded), k=10)
    assert got == want
    assert eng.search_fuzzy(q, k=0) == []
    assert eng.search_fuzzy("zzzzzz", k=10) == []


def test_search_big_fuzzy_bitwise_equal(spark, dictionary):
    out, pdf = dictionary
    eng = SearchEngine(spark, out)
    q = _pick_query(pdf)
    for filters, nots in [(None, None), ({"lang": "python"}, ["import"])]:
        want = eng.search_fuzzy(q, k=10, filters=filters, not_terms=nots)
        got = search_big_fuzzy(spark, out, q, k=10, filters=filters,
                               not_terms=nots)
        assert got == want, (filters, nots)


def test_expand_fuzzy_federated_df_sums(spark, dictionary):
    out, pdf = dictionary
    eng = SearchEngine(spark, out)
    q = _pick_query(pdf)
    assert expand_fuzzy_federated([eng.index_df], q) == _brute_expand(pdf, q)
    # duplicated member: dfs double, the expansion SET is unchanged
    assert expand_fuzzy_federated([eng.index_df, eng.index_df], q) == \
        _brute_expand(pdf, q)


def test_fuzzy_http_syntax(spark, dictionary):
    out, pdf = dictionary
    service = SearchService(spark, out)
    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        q = _pick_query(pdf)
        with urllib.request.urlopen(f"{base}/search?query={q}~&k=5",
                                    timeout=30) as resp:
            got = json.loads(resp.read().decode())
        want = service.engine.search_fuzzy(q, k=5)
        assert [h["rank_score"] for h in got] == [s for _, _, s in want]
        assert len(got) > 0
    finally:
        srv.shutdown()
