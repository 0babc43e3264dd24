"""Batch index merge: N independently built indexes -> one, byte-identical
to a monolithic build over the union corpus (tests enforce).

This is how incremental ingestion composes without streaming: build each
arriving batch as its own index (cheap, isolated, resumable), then merge.
The reference has no analog — its indexer is one monolithic job over the
whole `crawl` table (SURVEY.md §2.3); Lucene-style segment merging is the
standard scale answer.

Mechanics: each input index's postings are keyed by that input's dense
ordinals. Ordinals are monotone in external doc_id (index_build docs
stage), so remapping old ordinal -> external doc_id -> new union ordinal
is two monotone maps — runs STAY sorted, and per-term merging is the same
salt-ordered concatenation/argsort used by the streaming compactor.

Scale notes: the remap arrays (per-input external ids + union ids) ride to
executors as closure captures (Spark broadcast) — the same
BROADCAST_DOC_LIMIT regime as the build; past it the remap becomes a join
against the docs tables (same shape as index_build.ordinal_content_pairs).
Inputs must have disjoint doc_id sets (asserted) — dedup belongs to the
corpus layer (content_sha256), not the merger.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .checkpoint import BuildManifest
from .index_build import INDEX_SCHEMA
from .streaming import RUN_SCHEMA, _merge_sorting

DEFAULT_N_SALTS = 8


def _decode_to_runs_factory(ext_of_old: np.ndarray, union_sorted: np.ndarray,
                            n_docs: int, n_salts: int):
    """index rows (term, postings) of ONE input -> remapped packed runs."""
    from .codec import decode_postings
    salt_div = max(1, (n_docs + n_salts - 1) // n_salts)

    def run(batches):
        for rb in batches:
            terms, salts, ns, ids_col, tfs_col = [], [], [], [], []
            for term, blob in zip(rb.column("term").to_pylist(),
                                  rb.column("postings").to_pylist()):
                old_ords, tfs = decode_postings(bytes(blob))
                new_ords = np.searchsorted(
                    union_sorted, ext_of_old[old_ords]).astype(np.int64)
                # both maps monotone -> new_ords sorted; runs may span salt
                # ranges, the final per-term argsort handles overlap
                terms.append(term)
                salts.append(int(new_ords[0] // salt_div))
                ns.append(len(new_ords))
                ids_col.append(new_ords.tobytes())
                tfs_col.append(tfs.astype(np.int32).tobytes())
            if terms:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(terms, pa.string()),
                     pa.array(salts, pa.int32()),
                     pa.array(ns, pa.int64()),
                     pa.array(ids_col, pa.binary()),
                     pa.array(tfs_col, pa.binary())],
                    names=["term", "salt", "n", "ids", "tfs"])
    return run


def merge_indexes(spark: SparkSession, index_dirs: list[str], out_dir: str,
                  *, n_salts: int = DEFAULT_N_SALTS,
                  partitions: int = 16) -> BuildManifest:
    """Merge built indexes (each an index_build/compact output dir) into a
    new index dir with the same layout, loadable by SearchEngine."""
    man = BuildManifest(out_dir)

    # ---- docs stage: union snapshots, re-assign dense ordinals ----
    t0 = man.begin("docs")
    docs_parts = [spark.read.parquet(os.path.join(d, "docs"))
                  .drop("ordinal") for d in index_dirs]
    union = docs_parts[0]
    for p in docs_parts[1:]:
        union = union.unionByName(p, allowMissingColumns=True)
    pdf = union.orderBy("doc_id").toPandas()
    n_union = len(pdf)
    assert pdf["doc_id"].is_unique, \
        "merge inputs must have disjoint doc_id sets (dedup upstream)"
    pdf["ordinal"] = np.arange(n_union, dtype=np.int64)
    union_sorted = pdf["doc_id"].to_numpy(np.int64)
    total_len = int(pdf["doc_len"].sum())
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        man.stage_path("docs"))
    man.commit("docs", t0, n_union,
               {"n_docs": n_union, "total_len": total_len,
                "merged_from": len(index_dirs)})
    t0 = man.begin("stats")
    man.commit("stats", t0, 1, {"n_docs": n_union, "total_len": total_len},
               has_output=False)

    # ---- index stage: remap each input's postings, merge per term ----
    t0 = man.begin("index")
    runs = None
    for d in index_dirs:
        ext_of_old = (spark.read.parquet(os.path.join(d, "docs"))
                      .select("ordinal", "doc_id").orderBy("ordinal")
                      .toPandas()["doc_id"].to_numpy(np.int64))
        r = (spark.read.parquet(os.path.join(d, "index"))
             .select("term", "postings")
             .mapInArrow(_decode_to_runs_factory(
                 ext_of_old, union_sorted, n_union, n_salts),
                 schema=RUN_SCHEMA))
        runs = r if runs is None else runs.unionByName(r)
    index = (runs.repartition(partitions, "term")
             .sortWithinPartitions("term", "salt")
             .mapInPandas(_merge_sorting, schema=INDEX_SCHEMA))
    index.write.mode("overwrite").parquet(man.stage_path("index"))
    idx = spark.read.parquet(man.stage_path("index"))
    agg = idx.agg(F.count(F.lit(1)).alias("n"), F.sum("df").alias("p"),
                  F.sum(F.length("postings")).alias("b")).first()
    man.commit("index", t0, int(agg["n"]),
               {"postings_emitted": int(agg["p"]),
                "bytes_compressed": int(agg["b"]),
                "n_salts": n_salts, "partitions": partitions})

    # ---- lineage ----
    t0 = man.begin("_lineage")
    lin = (idx.groupBy(F.spark_partition_id().alias("partition_id"))
           .agg(F.count(F.lit(1)).alias("docs_processed"),
                F.sum("df").alias("postings_emitted"),
                F.sum(F.length("postings")).alias("bytes_compressed"))
           .withColumn("stage", F.lit("index"))
           .select("stage", "partition_id", "docs_processed",
                   "postings_emitted", "bytes_compressed"))
    lin.write.mode("overwrite").parquet(man.stage_path("_lineage"))
    man.commit("_lineage", t0, lin.count())
    return man
