"""Segment merge: build two disjoint batches separately, merge, compare to
one monolithic build over the union — index byte-identical, search
rank-identical to the oracle; disjointness violation rejected."""

import numpy as np
import pytest

from engine.corpus import corpus_to_spark, make_corpus
from engine.index_build import build_index
from engine.merge import merge_indexes
from engine.oracle import Bm25Oracle
from engine.query import SearchEngine


def _fingerprint(spark, out):
    rows = (spark.read.parquet(f"{out}/index")
            .select("term", "df", "postings").collect())
    return sorted((r["term"], r["df"], bytes(r["postings"])) for r in rows)


def test_merge_equals_monolithic_build(spark, tmp_path):
    pdf = make_corpus(500, seed=17)
    a, b = pdf.iloc[:300], pdf.iloc[300:]

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, corpus_to_spark(spark, a), out_a,
                n_salts=4, partitions=4)
    build_index(spark, corpus_to_spark(spark, b), out_b,
                n_salts=4, partitions=4)

    out_m = str(tmp_path / "merged")
    merge_indexes(spark, [out_a, out_b], out_m, n_salts=4, partitions=4)

    out_full = str(tmp_path / "full")
    build_index(spark, corpus_to_spark(spark, pdf), out_full,
                n_salts=4, partitions=4)
    assert _fingerprint(spark, out_m) == _fingerprint(spark, out_full)

    # and the merged index serves rank-identical BM25
    eng = SearchEngine(spark, out_m)
    oracle = Bm25Oracle(dict(zip(pdf["doc_id"], pdf["content"])))
    for q in ["def return", "class self", "value index merge"]:
        assert eng.search(q, k=10) == oracle.topk(q, 10), q
        assert eng.search(q, k=10, mode="conjunctive") == \
            oracle.topk(q, 10, "conjunctive"), q


def test_merge_rejects_overlapping_doc_ids(spark, tmp_path):
    pdf = make_corpus(100, seed=19)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, corpus_to_spark(spark, pdf.iloc[:60]), out_a,
                n_salts=2, partitions=2)
    build_index(spark, corpus_to_spark(spark, pdf.iloc[40:]), out_b,
                n_salts=2, partitions=2)  # overlaps rows 40..59
    with pytest.raises(ValueError, match="disjoint"):
        merge_indexes(spark, [out_a, out_b], str(tmp_path / "m"))


def test_merge_beyond_broadcast_limit_identical(spark, tmp_path, monkeypatch):
    """Force the over-BROADCAST_DOC_LIMIT merge path (postings decode to
    rows and JOIN the partitioned ordinal maps — no driver arrays): the
    result must stay byte-identical to the monolithic build."""
    import engine.index_build as ib
    pdf = make_corpus(300, seed=23)
    a, b = pdf.iloc[:180], pdf.iloc[180:]
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, corpus_to_spark(spark, a), out_a,
                n_salts=4, partitions=4)
    build_index(spark, corpus_to_spark(spark, b), out_b,
                n_salts=4, partitions=4)
    out_full = str(tmp_path / "full")
    build_index(spark, corpus_to_spark(spark, pdf), out_full,
                n_salts=4, partitions=4)

    monkeypatch.setattr(ib, "BROADCAST_DOC_LIMIT", 0)
    out_m = str(tmp_path / "merged_fallback")
    merge_indexes(spark, [out_a, out_b], out_m, n_salts=4, partitions=4)
    assert _fingerprint(spark, out_m) == _fingerprint(spark, out_full)
