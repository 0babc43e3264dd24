"""Bulk query evaluation (engine/bulk.py): the whole fixture query set in
ONE distributed job must be bitwise-identical, per query, to looping
SearchEngine.search."""

import pytest

from engine.bulk import bulk_topk
from engine.query import SearchEngine


@pytest.fixture(scope="module")
def eng(spark, built_index):
    idx, _ = built_index
    return idx, SearchEngine(spark, idx)


def _by_qid(rows):
    out = {}
    for r in rows:
        out.setdefault(int(r["qid"]), []).append(
            (int(r["rank"]), int(r["doc_id"]), float(r["score"])))
    for v in out.values():
        v.sort()
    return out


def _queries(golden):
    qs, _ = golden
    return [(int(q["query_id"]), q["query"]) for q in qs]


def test_bulk_bitwise_equals_engine_loop(spark, built_index, golden, eng):
    idx, engine = eng
    queries = _queries(golden)
    got = _by_qid(bulk_topk(spark, idx, queries, k=10).collect())
    for qid, q in queries:
        want = [(r, d, s) for r, d, s in engine.search(q, k=10)]
        assert got.get(qid, []) == want, f"qid={qid} query={q!r}"


def test_bulk_conjunctive_parity(spark, golden, eng):
    idx, engine = eng
    queries = _queries(golden)
    got = _by_qid(
        bulk_topk(spark, idx, queries, k=10, mode="conjunctive").collect())
    for qid, q in queries:
        want = [(r, d, s)
                for r, d, s in engine.search(q, k=10, mode="conjunctive")]
        assert got.get(qid, []) == want, f"qid={qid} query={q!r}"


def test_bulk_salt_invariance(spark, golden, eng):
    idx, _ = eng
    queries = _queries(golden)[:6]
    a = _by_qid(bulk_topk(spark, idx, queries, k=10, salts=1).collect())
    b = _by_qid(bulk_topk(spark, idx, queries, k=10, salts=8).collect())
    assert a == b


def test_bulk_edge_queries(spark, eng):
    idx, engine = eng
    queries = [(0, ""), (1, "zzzz_not_in_dictionary_qq"),
               (2, "def def def"), (3, "def zzzz_not_in_dictionary_qq")]
    got = _by_qid(bulk_topk(spark, idx, queries, k=10).collect())
    assert 0 not in got and 1 not in got
    # duplicate terms collapse (set semantics): same as the single query
    assert got[2] == [(r, d, s) for r, d, s in engine.search("def", k=10)]
    # ranked mode ignores the missing term, scores the present one
    assert got[3] == [(r, d, s) for r, d, s in engine.search("def", k=10)]
    # conjunctive with a missing term -> the qid disappears entirely
    gc = _by_qid(bulk_topk(spark, idx, queries, k=10,
                           mode="conjunctive").collect())
    assert 3 not in gc


def test_bulk_filters_parity(spark, eng):
    from engine.query import search_big
    idx, engine = eng
    filt = {"lang": "python"}
    queries = [(0, "def return"), (1, "class import")]
    got = _by_qid(bulk_topk(spark, idx, queries, k=10,
                            filters=filt).collect())
    for qid, q in queries:
        want = [(r, d, s)
                for r, d, s in search_big(spark, idx, q, k=10, filters=filt)]
        assert got.get(qid, []) == want, f"qid={qid}"


def test_bulk_cli_roundtrip(spark, eng, golden, tmp_path):
    """CLI `bulk`: queries parquet in -> top-k parquet out, identical to
    the library call."""
    from engine import cli
    idx, engine = eng
    queries = _queries(golden)[:4]
    qpath, opath = str(tmp_path / "queries"), str(tmp_path / "out")
    spark.createDataFrame(queries, "qid long, query string") \
         .write.parquet(qpath)
    cli.main(["bulk", "--index", idx, "--queries", qpath,
              "--out", opath, "--k", "5"])
    got = _by_qid(spark.read.parquet(opath).collect())
    for qid, q in queries:
        want = [(r, d, s) for r, d, s in engine.search(q, k=5)]
        assert got.get(qid, []) == want, f"qid={qid}"


def test_bulk_rounded_mode_schema(spark, golden, eng):
    idx, _ = eng
    df = bulk_topk(spark, idx, _queries(golden)[:3], k=5, rounded=True)
    assert set(df.columns) == {"qid", "doc_id", "rank", "score_r"}
    rows = df.collect()
    assert all(abs(r["score_r"] - round(r["score_r"], 6)) < 1e-12
               for r in rows)
