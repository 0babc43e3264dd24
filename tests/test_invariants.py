"""Structural invariants over the built index (SURVEY.md §5.3):
- content_sha256 per-row equality source <-> docs table (BASELINE.json
  input_hint invariant; reference analog: content-seen hash,
  Crawler.java:177-190),
- count(docs) == count(corpus),
- sum(doc_len) == sum of tf mass over all postings,
- df == decoded posting length, doc_ids strictly ascending,
- doc_id derivation in Spark is bit-exact with the Python rule.
"""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from engine.codec import decode_postings
from engine.corpus import doc_id_of


def test_sha256_invariant(spark, built_index, fixture_corpus_pdf):
    out, _ = built_index
    docs = spark.read.parquet(f"{out}/docs")
    got = {r["doc_id"]: r["content_sha256"]
           for r in docs.select("doc_id", "content_sha256").collect()}
    assert len(got) == len(fixture_corpus_pdf)
    for _, row in fixture_corpus_pdf.iterrows():
        want = hashlib.sha256(row["content"].encode()).hexdigest()
        assert got[row["doc_id"]] == want


def test_spark_doc_identity_matches_python(spark, fixture_corpus_pdf):
    """with_doc_identity derives doc_id/sha256 JVM-side; must equal the
    Python rule used by corpus generation and the oracle."""
    from engine.index_build import with_doc_identity
    raw = spark.createDataFrame(
        fixture_corpus_pdf[["repo", "path", "commit", "lang", "content"]])
    derived = with_doc_identity(raw).select(
        "repo", "path", "commit", "doc_id", "content_sha256").collect()
    for r in derived:
        assert r["doc_id"] == doc_id_of(r["repo"], r["path"], r["commit"])


def test_tf_mass_conservation(spark, built_index):
    out, _ = built_index
    total_len = spark.read.parquet(f"{out}/docs").agg(
        F.sum("doc_len")).first()[0]
    total_tf = spark.read.parquet(f"{out}/index").agg(
        F.sum("total_tf")).first()[0]
    assert total_len == total_tf


def test_postings_sorted_and_df_exact(spark, built_index):
    out, _ = built_index
    rows = spark.read.parquet(f"{out}/index").collect()
    assert len(rows) > 0
    n_docs = spark.read.parquet(f"{out}/docs").count()
    for r in rows:
        ids, tfs = decode_postings(bytes(r["postings"]))
        assert ids.size == r["df"]
        assert (tfs >= 1).all()
        assert r["df"] <= n_docs
        if ids.size > 1:
            assert (np.diff(ids) > 0).all(), f"unsorted postings for {r['term']}"
        assert int(tfs.sum()) == r["total_tf"]
        assert int(tfs.max()) == r["max_tf"]
        # block metadata consistent
        assert r["block_last_ids"][-1] == ids[-1]
        assert max(r["block_max_tfs"]) == r["max_tf"]


def test_lineage_and_manifest(spark, built_index):
    out, man = built_index
    lin = spark.read.parquet(f"{out}/_lineage")
    assert set(lin.columns) == {"stage", "partition_id", "docs_processed",
                                "postings_emitted", "bytes_compressed"}
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"docs", "index"} <= stages
    docs_total = (lin.where(F.col("stage") == "docs")
                  .agg(F.sum("docs_processed")).first()[0])
    assert docs_total == spark.read.parquet(f"{out}/docs").count()
    idx_bytes = (lin.where(F.col("stage") == "index")
                 .agg(F.sum("bytes_compressed")).first()[0])
    assert idx_bytes == man.state["completed"]["index"]["metrics"][
        "bytes_compressed"]
    # monotone snapshot ids
    snaps = [s["snapshot_id"] for s in man.state["snapshots"]]
    assert snaps == sorted(snaps) and len(set(snaps)) == len(snaps)


def test_compression_ratio(spark, built_index):
    """varint/delta blob must be far smaller than raw 12B/posting."""
    out, man = built_index
    m = man.state["completed"]["index"]["metrics"]
    assert m["bytes_compressed"] < m["postings_emitted"] * 12 * 0.5
