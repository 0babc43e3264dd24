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

Scale notes: union ordinals come from the build's distributed bucket-offset
scheme (index_build.assign_ordinals — 64 bucket counts on the driver, never
the doc table). Under BROADCAST_DOC_LIMIT the remap arrays (per-input
external ids + union ids) ride to executors as closure captures (Spark
broadcast); past it postings decode to rows and JOIN the partitioned
ordinal maps (index_build.posting_rows_to_index) — no driver array
anywhere, test-enforced byte-identical either way. Inputs must have
disjoint doc_id sets (rejected — the same repo/path/commit in two segments
is an ingest error); duplicate CONTENT under distinct doc_ids is handled:
the same sha-window aliases stage as the batch build runs over the union
metadata, so cross-segment duplicates collapse exactly as a monolithic
build would collapse them.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import index_build as ib
from .checkpoint import BuildManifest
from .index_build import INDEX_SCHEMA
from .streaming import RUN_SCHEMA, _merge_sorting

DEFAULT_N_SALTS = 8


def _decode_to_runs_factory(ext_of_old_bc, union_sorted_bc,
                            n_docs: int, n_salts: int):
    """index rows (term, postings) of ONE input -> remapped packed runs.
    The remap arrays arrive as Spark Broadcasts (or bare arrays in tests)
    — one copy per executor, not one per task closure (they reach 40 MB
    each at the broadcast doc limit). union_sorted holds the DEDUPED
    union doc set: external ids absent from it (duplicate-content docs
    aliased out cross-segment) drop from the run — their canonical twin
    in another segment carries the identical postings, keeping the merge
    byte-identical to a monolithic build."""
    from .codec import decode_postings
    salt_div = max(1, (n_docs + n_salts - 1) // n_salts)

    def run(batches):
        ext_of_old = (ext_of_old_bc.value
                      if hasattr(ext_of_old_bc, "value") else ext_of_old_bc)
        union_sorted = (union_sorted_bc.value
                        if hasattr(union_sorted_bc, "value")
                        else union_sorted_bc)
        for rb in batches:
            terms, salts, ns, ids_col, tfs_col = [], [], [], [], []
            for term, blob in zip(rb.column("term").to_pylist(),
                                  rb.column("postings").to_pylist()):
                old_ords, tfs = decode_postings(bytes(blob))
                ext = ext_of_old[old_ords]
                idx, keep = ib.remap_keep(union_sorted, ext)
                if not keep.any():
                    continue
                new_ords = idx[keep].astype(np.int64)
                tfs = tfs[keep]
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


def _decode_to_rows(batches):
    """index rows (term, postings) -> (term, old_ordinal, tf) posting rows,
    for the beyond-broadcast-limit merge path."""
    from .codec import decode_postings
    for pdf in batches:
        outs = []
        for term, blob in zip(pdf["term"], pdf["postings"]):
            old_ords, tfs = decode_postings(bytes(blob))
            outs.append(pd.DataFrame({
                "term": term, "old_ordinal": old_ords,
                "tf": tfs.astype(np.int32)}))
        if outs:
            yield pd.concat(outs, ignore_index=True)


def _decode_pos_to_runs_factory(ext_of_old_bc, union_sorted_bc,
                                n_docs: int, n_salts: int):
    """positional-store rows (term, ords, counts, pos) of ONE input ->
    remapped packed position runs (POS_RUN_SCHEMA); remap arrays as
    Broadcasts like _decode_to_runs_factory. Aliased-out docs
    (cross-segment duplicate content) drop segment-wise; both ordinal maps
    are monotone so runs stay sorted."""
    from .positions import _reorder_segments, decode_position_row

    def run(batches):
        ext_of_old = (ext_of_old_bc.value
                      if hasattr(ext_of_old_bc, "value") else ext_of_old_bc)
        union_sorted = (union_sorted_bc.value
                        if hasattr(union_sorted_bc, "value")
                        else union_sorted_bc)
        for pdf in batches:
            rows = []
            for term, ords_b, cnt_b, pos_b in zip(
                    pdf["term"], pdf["ords"], pdf["counts"], pdf["pos"]):
                old_ords, counts, pos = decode_position_row(
                    bytes(ords_b), bytes(cnt_b), bytes(pos_b))
                ext = ext_of_old[old_ords]
                idx, keep = ib.remap_keep(union_sorted, ext)
                if not keep.any():
                    continue
                if not keep.all():
                    starts = np.concatenate(
                        ([0], np.cumsum(counts[:-1], dtype=np.int64)))
                    kept = np.flatnonzero(keep)
                    pos = _reorder_segments(pos, starts, counts, kept)
                    idx, counts = idx[keep], counts[keep]
                new_ords = idx.astype(np.int64)
                rows.append((
                    term,
                    int(new_ords[0] * n_salts // max(n_docs, 1)),
                    new_ords.tobytes(),
                    counts.astype(np.int32).tobytes(),
                    pos.astype(np.int32).tobytes()))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "term", "salt", "ids", "counts", "pos"])
    return run


def _decode_pos_to_rows(batches):
    """positional rows -> (term, old_ordinal, position) occurrence rows,
    for the beyond-broadcast-limit merge path."""
    from .positions import decode_position_row
    for pdf in batches:
        outs = []
        for term, ords_b, cnt_b, pos_b in zip(
                pdf["term"], pdf["ords"], pdf["counts"], pdf["pos"]):
            old_ords, counts, pos = decode_position_row(
                bytes(ords_b), bytes(cnt_b), bytes(pos_b))
            outs.append(pd.DataFrame({
                "term": term,
                "old_ordinal": np.repeat(old_ords, counts),
                "position": pos.astype(np.int32)}))
        if outs:
            yield pd.concat(outs, ignore_index=True)


def merge_positions(spark: SparkSession, index_dirs: list[str],
                    out_dir: str, *, n_salts: int = DEFAULT_N_SALTS,
                    partitions: int = 16) -> None:
    """Merge the inputs' positional stores into the merged index's —
    byte-identical to batch build_positions over the union corpus
    (test-enforced, incl. cross-segment duplicate content and the
    beyond-broadcast regime). Runs automatically from merge_indexes when
    EVERY input carries a complete positions stage."""
    from . import index_build as ib
    from .positions import (
        POS_RUN_SCHEMA,
        POS_SCHEMA,
        _merge_pos_runs_sorting,
        _pos_rows_to_index,
        _reduce_pos_runs,
    )
    man = BuildManifest(out_dir)
    if man.is_complete("positions"):
        return
    n_docs = int(man.state["completed"]["stats"]["metrics"]["n_docs"])
    docs = spark.read.parquet(man.stage_path("docs"))
    t0 = man.begin("positions")
    if n_docs <= ib.BROADCAST_DOC_LIMIT:
        union_bc = spark.sparkContext.broadcast(
            ib._doc_ids_sorted(docs, man.stage_path("docs")))
        runs = None
        for d in index_dirs:
            # ordinals are monotone in doc_id, so ordinal order == sorted
            # doc_id order — the pyarrow driver-side read applies
            ext_bc = spark.sparkContext.broadcast(ib._doc_ids_sorted(
                spark.read.parquet(os.path.join(d, "docs")),
                os.path.join(d, "docs")))
            r = (spark.read.parquet(os.path.join(d, "positions"))
                 .select("term", "ords", "counts", "pos")
                 .mapInPandas(_decode_pos_to_runs_factory(
                     ext_bc, union_bc, n_docs, n_salts),
                     schema=POS_RUN_SCHEMA))
            runs = r if runs is None else runs.unionByName(r)
        partials = (runs.repartition(partitions, "term", "salt")
                    .mapInPandas(_reduce_pos_runs, schema=POS_RUN_SCHEMA))
        posidx = (partials.repartition(partitions, "term")
                  .sortWithinPartitions("term", "salt")
                  .mapInPandas(_merge_pos_runs_sorting, schema=POS_SCHEMA))
    else:
        rows = None
        for d in index_dirs:
            old_docs = (spark.read.parquet(os.path.join(d, "docs"))
                        .select(F.col("ordinal").alias("old_ordinal"),
                                "doc_id"))
            r = (spark.read.parquet(os.path.join(d, "positions"))
                 .select("term", "ords", "counts", "pos")
                 .mapInPandas(_decode_pos_to_rows,
                              schema="term string, old_ordinal long, "
                                     "position int")
                 .join(old_docs, "old_ordinal")
                 .select("term", "doc_id", "position"))
            rows = r if rows is None else rows.unionByName(r)
        rows = (rows.join(docs.select("doc_id", "ordinal"), "doc_id")
                .select("term", "ordinal", "position"))
        posidx = _pos_rows_to_index(rows, n_docs, n_salts, partitions)
    from pyspark.sql import Observation
    obs = Observation("merge_pos_stats")
    posidx = posidx.observe(obs, F.count(F.lit(1)).alias("n_terms"),
                            F.sum("df").alias("postings"))
    posidx.write.mode("overwrite").parquet(man.stage_path("positions"))
    got = obs.get
    man.commit("positions", t0, int(got["n_terms"] or 0),
               {"postings_emitted": int(got["postings"] or 0),
                "n_salts": n_salts, "partitions": partitions})


def merge_indexes(spark: SparkSession, index_dirs: list[str], out_dir: str,
                  *, n_salts: int = DEFAULT_N_SALTS,
                  partitions: int = 16,
                  dedup_content: bool = True,
                  tombstones=None) -> BuildManifest:
    """Merge built indexes (each an index_build/compact output dir) into a
    new index dir with the same layout, loadable by SearchEngine.

    Content dedup ACROSS segments runs the same aliases stage as the batch
    build (index_build.alias_map_of over the union doc metadata): when the
    same content appears in two segments, the higher-doc_id copy aliases
    the global min-doc_id canonical, is excluded from ordinals, and its
    postings drop at remap — so the merge stays byte-identical to a
    monolithic build over the union corpus even with cross-segment
    duplicates (test-enforced). The inputs' own alias maps are re-pointed
    at the global canonicals and unioned into the output's aliases stage,
    so serving resolves every historical alias.

    tombstones (a doc_id DataFrame, deletes.tombstones_frame) applies
    PHYSICAL deletes in the same pass: the dead docs' content classes
    (deletes.filter_dead) leave the union metadata before ordinals are
    assigned, so their postings and positions drop at the ordinal remap —
    remap_keep masks ids absent from the union doc set, the identical
    mechanism that drops duplicate-content docs — and every statistic
    (N, avgdl, df, block maxes) is recomputed. The result is
    byte-identical to a monolithic batch build over the surviving corpus
    (test-enforced, positions included). A single-input merge with
    tombstones is the standalone delete-compaction."""
    from . import index_build as ib
    man = BuildManifest(out_dir)

    # ---- docs stage: union snapshots, re-assign dense ordinals (the
    # distributed bucket-offset scheme; duplicate ids across inputs fail) --
    from pyspark.sql import Observation
    docs_parts = [spark.read.parquet(os.path.join(d, "docs"))
                  .drop("ordinal") for d in index_dirs]
    union = docs_parts[0]
    for p in docs_parts[1:]:
        union = union.unionByName(p, allowMissingColumns=True)

    if dedup_content and "content_sha256" not in union.columns:
        raise ValueError(
            "merge_indexes(dedup_content=True) needs content_sha256 in the "
            "input docs snapshots; pass dedup_content=False for legacy "
            "indexes")

    # inputs' own alias maps (lazy — also resolve tombstoned aliases)
    parts = []
    for d in index_dirs:
        if BuildManifest(d).is_complete("aliases"):
            parts.append(spark.read.parquet(os.path.join(d, "aliases"))
                         .select("doc_id", "canonical_doc_id"))
    ia_all = None
    for p in parts:
        ia_all = p if ia_all is None else ia_all.unionByName(p)

    dead = None
    if tombstones is not None:
        from .deletes import filter_dead
        union, dead = filter_dead(union, ia_all, tombstones)

    if dedup_content:
        t0 = man.begin("aliases")
        cross = ib.alias_map_of(union)
        # inputs' own alias maps, re-pointed: an input canonical that is
        # itself aliased cross-segment chains to the global canonical
        # (chains have length <= 2 because inputs are internally deduped)
        if parts:
            ia = ia_all
            if dead is not None:
                # alias rows of tombstoned classes die with their class
                # (dead is sha-closed: an alias's canonical is dead iff
                # the alias's own content is)
                ia = ia.join(
                    dead.withColumnRenamed("doc_id", "canonical_doc_id"),
                    "canonical_doc_id", "left_anti")
            repoint = cross.select(
                F.col("doc_id").alias("canonical_doc_id"),
                F.col("canonical_doc_id").alias("_global"))
            ia = (ia.join(F.broadcast(repoint), "canonical_doc_id", "left")
                  .select("doc_id",
                          F.coalesce("_global", "canonical_doc_id")
                          .alias("canonical_doc_id")))
            combined = ia.unionByName(
                cross.select("doc_id", "canonical_doc_id"))
        else:
            combined = cross
        aobs = Observation("merge_alias_rows")
        combined = combined.observe(
            aobs, F.count(F.lit(1)).alias("n_aliases"))
        combined.write.mode("overwrite").parquet(man.stage_path("aliases"))
        n_al = int(aobs.get["n_aliases"] or 0)
        man.commit("aliases", t0, n_al, {"n_aliases": n_al})
        drop = (spark.read.parquet(man.stage_path("aliases"))
                .select("doc_id"))
        union = union.join(F.broadcast(drop), "doc_id", "left_anti")

    t0 = man.begin("docs")
    docs_df = ib.assign_ordinals(
        spark, union,
        on_duplicate="merge inputs must have disjoint doc_id sets "
                     "(dedup upstream)")
    obs = Observation("merge_doc_stats")
    docs_df = docs_df.observe(obs, F.count(F.lit(1)).alias("n_docs"),
                              F.sum("doc_len").alias("total_len"))
    docs_df.write.mode("overwrite").parquet(man.stage_path("docs"))
    got = obs.get
    n_union = int(got["n_docs"])
    total_len = int(got["total_len"] or 0)
    man.commit("docs", t0, n_union,
               {"n_docs": n_union, "total_len": total_len,
                "merged_from": len(index_dirs)})
    t0 = man.begin("stats")
    man.commit("stats", t0, 1, {"n_docs": n_union, "total_len": total_len},
               has_output=False)

    # ---- index stage: remap each input's postings, merge per term ----
    t0 = man.begin("index")
    docs = spark.read.parquet(man.stage_path("docs"))
    if n_union <= ib.BROADCAST_DOC_LIMIT:
        union_bc = spark.sparkContext.broadcast(
            ib._doc_ids_sorted(docs, man.stage_path("docs")))
        runs = None
        for d in index_dirs:
            # ordinal order == sorted doc_id order (monotone assignment)
            ext_bc = spark.sparkContext.broadcast(ib._doc_ids_sorted(
                spark.read.parquet(os.path.join(d, "docs")),
                os.path.join(d, "docs")))
            r = (spark.read.parquet(os.path.join(d, "index"))
                 .select("term", "postings")
                 .mapInArrow(_decode_to_runs_factory(
                     ext_bc, union_bc, n_union, n_salts),
                     schema=RUN_SCHEMA))
            runs = r if runs is None else runs.unionByName(r)
        index = (runs.repartition(partitions, "term")
                 .sortWithinPartitions("term", "salt")
                 .mapInPandas(_merge_sorting, schema=INDEX_SCHEMA))
    else:
        rows = None
        for d in index_dirs:
            old_docs = (spark.read.parquet(os.path.join(d, "docs"))
                        .select(F.col("ordinal").alias("old_ordinal"),
                                "doc_id"))
            r = (spark.read.parquet(os.path.join(d, "index"))
                 .select("term", "postings")
                 .mapInPandas(_decode_to_rows,
                              schema="term string, old_ordinal long, tf int")
                 .join(old_docs, "old_ordinal")
                 .select("term", "doc_id", "tf"))
            rows = r if rows is None else rows.unionByName(r)
        rows = (rows.join(docs.select("doc_id", "ordinal"), "doc_id")
                .select("term", "ordinal", "tf"))
        index = ib.posting_rows_to_index(rows, n_union, n_salts, partitions)
    # index metrics ride the write job's Observation — no read-back agg
    # action (each extra Spark action costs ~0.3-0.9 s fixed latency)
    iobs = Observation("merge_index_stats")
    index = index.observe(
        iobs, F.count(F.lit(1)).alias("n"), F.sum("df").alias("p"),
        F.sum(F.length("postings")).alias("b"))
    index.write.mode("overwrite").parquet(man.stage_path("index"))
    igot = iobs.get
    man.commit("index", t0, int(igot["n"] or 0),
               {"postings_emitted": int(igot["p"] or 0),
                "bytes_compressed": int(igot["b"] or 0),
                "n_salts": n_salts, "partitions": partitions})

    # ---- lineage (row count rides the write via Observation) ----
    t0 = man.begin("_lineage")
    idx = spark.read.parquet(man.stage_path("index"))
    lin = (idx.groupBy(F.spark_partition_id().alias("partition_id"))
           .agg(F.count(F.lit(1)).alias("docs_processed"),
                F.sum("df").alias("postings_emitted"),
                F.sum(F.length("postings")).alias("bytes_compressed"))
           .withColumn("stage", F.lit("index"))
           .select("stage", "partition_id", "docs_processed",
                   "postings_emitted", "bytes_compressed"))
    lobs = Observation("merge_lineage_rows")
    lin = lin.observe(lobs, F.count(F.lit(1)).alias("rows"))
    lin.write.mode("overwrite").parquet(man.stage_path("_lineage"))
    man.commit("_lineage", t0, int(lobs.get["rows"] or 0))

    # ---- positional stores (merged iff EVERY input carries one) ----
    if all(BuildManifest(d).is_complete("positions") for d in index_dirs):
        merge_positions(spark, index_dirs, out_dir,
                        n_salts=n_salts, partitions=partitions)
    return man
