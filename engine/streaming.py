"""Incremental index ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §1.4: no streaming surface), but a
production 10^12-file corpus arrives continuously. This module adds an
incremental path with the same final semantics as the batch build:

  readStream(file source, exactly-once tracking via checkpoint)
    -> with_doc_identity (JVM)
    -> mapInArrow map-side combine (same kernel as batch: packed
       per-(term, salt) posting runs keyed by EXTERNAL doc_id)
    -> append-mode parquet of partial runs

  compact(spark, partials_dir, out_dir)
    -> assigns dense ordinals over ALL docs seen so far, remaps the runs'
       doc_ids -> ordinals, merges + varint-encodes into a full index
       (reuses the batch reducer/merger), byte-identical to a batch build
       over the same corpus (test-enforced).

Streaming partials store raw sorted doc_id runs (not ordinals): ordinals are
corpus-global and can't be assigned until compaction. The remap at compaction
is a sorted-array searchsorted — O(n log n) NumPy, no Python per element.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_build import (
    INDEX_SCHEMA,
    _map_partial_runs_factory,
    with_doc_identity,
)

RUN_SCHEMA = "term string, salt int, n long, ids binary, tfs binary"
DOCLEN_SCHEMA = "doc_id long, doc_len long"


def start_ingest(spark: SparkSession, source_dir: str, work_dir: str,
                 corpus_schema, n_salts: int = 8,
                 trigger_available_now: bool = True):
    """Start the streaming ingest of corpus parquet files landing in
    source_dir. Emits posting partial-runs and doc stats under work_dir.
    Returns the two StreamingQuery handles."""
    stream = (spark.readStream.schema(corpus_schema)
              .parquet(source_dir))
    stream = with_doc_identity(stream)

    # identical kernel to the batch build, but keyed by external doc_id
    # (dense ordinals are assigned at compaction); salt = high bits of the
    # hash-uniform doc_id so runs stay range-bucketed.
    map_fn = _map_partial_runs_factory(1 << 62, n_salts)

    runs = (stream
            .withColumnRenamed("doc_id", "_ext_id")
            .withColumn("ordinal", F.col("_ext_id"))
            .select("ordinal", "content")
            .mapInArrow(map_fn, schema=RUN_SCHEMA))

    from .tokenizer import spark_token_count_expr
    docs = stream.select(
        "doc_id", spark_token_count_expr(F.col("content"))
        .cast("long").alias("doc_len"))

    trigger = {"availableNow": True} if trigger_available_now else \
        {"processingTime": "10 seconds"}
    q1 = (runs.writeStream.format("parquet")
          .option("path", os.path.join(work_dir, "run_partials"))
          .option("checkpointLocation", os.path.join(work_dir, "_ckpt_runs"))
          .outputMode("append").trigger(**trigger).start())
    q2 = (docs.writeStream.format("parquet")
          .option("path", os.path.join(work_dir, "doc_stats"))
          .option("checkpointLocation", os.path.join(work_dir, "_ckpt_docs"))
          .outputMode("append").trigger(**trigger).start())
    return q1, q2


def _remap_runs_factory(ext_sorted: np.ndarray, n_docs: int, n_salts: int):
    """Remap partial runs from external doc_ids to dense ordinals.
    ext_sorted is the sorted external-id array (ordinal == index)."""
    def remap(batches):
        for rb in batches:
            terms = rb.column("term")
            salts_old = rb.column("salt")
            ids_col = rb.column("ids").to_pylist()
            tfs_col = rb.column("tfs").to_pylist()
            out_ids, out_tfs, out_salt, out_n = [], [], [], []
            for ids_b, tfs_b in zip(ids_col, tfs_col):
                ext = np.frombuffer(ids_b, dtype=np.int64)
                ords = np.searchsorted(ext_sorted, ext).astype(np.int64)
                # runs were sorted by ext id -> ordinals are sorted too
                out_ids.append(ords.tobytes())
                out_tfs.append(tfs_b)
                out_salt.append(int(ords[0] * n_salts // max(n_docs, 1)))
                out_n.append(len(ords))
            yield pa.RecordBatch.from_arrays(
                [terms, pa.array(out_salt, pa.int32()),
                 pa.array(out_n, pa.int64()),
                 pa.array(out_ids, pa.binary()),
                 pa.array(out_tfs, pa.binary())],
                names=["term", "salt", "n", "ids", "tfs"])
    return remap


def compact(spark: SparkSession, work_dir: str, out_dir: str,
            n_salts: int = 8, partitions: int = 16) -> None:
    """Merge all streamed partial runs into a final index + docs + stats —
    same layout as engine.index_build.build_index output, loadable by
    SearchEngine. Byte-identical postings vs a batch build of the same
    corpus (tests enforce)."""
    from .checkpoint import BuildManifest

    man = BuildManifest(out_dir)
    doc_stats = (spark.read.parquet(os.path.join(work_dir, "doc_stats"))
                 .dropDuplicates(["doc_id"]))
    pdf = doc_stats.orderBy("doc_id").toPandas()
    ext_sorted = pdf["doc_id"].to_numpy(np.int64)
    n_docs = len(pdf)
    pdf["ordinal"] = np.arange(n_docs, dtype=np.int64)

    t0 = man.begin("docs")
    docs_df = spark.createDataFrame(pdf[["doc_id", "doc_len", "ordinal"]])
    docs_df.write.mode("overwrite").parquet(man.stage_path("docs"))
    man.commit("docs", t0, n_docs,
               {"n_docs": n_docs, "total_len": int(pdf["doc_len"].sum())})
    t0 = man.begin("stats")
    man.commit("stats", t0, 1,
               {"n_docs": n_docs, "total_len": int(pdf["doc_len"].sum())},
               has_output=False)

    t0 = man.begin("index")
    runs = spark.read.parquet(os.path.join(work_dir, "run_partials"))
    # salt was doc_id-range based at ingest; recompute over dense ordinals
    # note: a streamed run may span ordinal-salt boundaries; the reducer
    # re-sorts within (term, salt) anyway, and the merger concatenates
    # salt-ordered runs — but boundary-spanning would misplace postings, so
    # remap assigns the salt of the run's FIRST ordinal and we rely on the
    # final merge doing a full argsort per term (see _merge_full below).
    remapped = runs.mapInArrow(
        _remap_runs_factory(ext_sorted, n_docs, n_salts), schema=RUN_SCHEMA)
    index = (remapped.repartition(partitions, "term")
             .sortWithinPartitions("term", "salt")
             .mapInPandas(_merge_sorting, schema=INDEX_SCHEMA))
    index.write.mode("overwrite").parquet(man.stage_path("index"))
    idx = spark.read.parquet(man.stage_path("index"))
    agg = idx.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("df").alias("p"),
                  F.sum(F.length("postings")).alias("b")).first()
    man.commit("index", t0, int(agg["n"]),
               {"postings_emitted": int(agg["p"]),
                "bytes_compressed": int(agg["b"]),
                "n_salts": n_salts, "partitions": partitions})

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


def _merge_sorting(batches):
    """Like index_build._merge_term_runs but with a full per-term argsort
    (streamed runs from different micro-batches overlap in ordinal range)."""
    import pandas as pd
    parts = [p for p in batches if len(p)]
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
    from .codec import block_maxes, encode_postings
    rows = []
    for term, g in pdf.groupby("term", sort=True):
        ids = np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in g["ids"]])
        tfs = np.concatenate(
            [np.frombuffer(b, dtype=np.int32) for b in g["tfs"]])
        order = np.argsort(ids, kind="stable")
        ids, tfs = ids[order], tfs[order]
        blob = encode_postings(ids.astype(np.uint64), tfs.astype(np.uint64))
        last_ids, max_tfs = block_maxes(ids, tfs.astype(np.int64))
        rows.append((term, len(ids), int(tfs.sum()), int(tfs.max()),
                     blob, last_ids.tolist(), max_tfs.tolist()))
    yield pd.DataFrame(rows, columns=[
        "term", "df", "total_tf", "max_tf", "postings",
        "block_last_ids", "block_max_tfs"])
