"""Distributed index-integrity verifier.

At 100 TB an index is the product of batch builds, streaming compactions,
incremental generations, segment merges and physical deletes; a corrupted
artifact (a truncated parquet write surviving a task retry, a bad node's
flaky memory, a bug in a new merge path) must be detectable WITHOUT
rebuilding. The reference has no equivalent — its KV store trusts whatever
the last put wrote (kvs/Worker.java persists rows with no checksum pass);
this module is the fsck the 10^12-file deployment needs after every
compaction or before promoting a merged generation to serving.

Every structural invariant of the on-disk artifacts is re-derived
distributed, one pass per artifact:

- ``index/``:   postings blobs decode cleanly; decoded run length == df;
                sum(tf) == total_tf; max(tf) == max_tf; ordinals strictly
                ascending and inside [0, n_docs); tf >= 1; the stored
                block-max skip metadata equals a recompute (a wrong block
                max silently breaks WAND pruning exactness — the worst kind
                of corruption because results look plausible); terms unique.
- ``docs/``:    doc_id unique; ordinals dense 0..N-1; doc_len >= 0; N and
                total_len match the manifest stats the scorer uses.
- ``aliases/``: no self-aliases; every canonical exists in docs; no aliased
                doc_id leaked into docs.
- ``positions/`` (when present): per-(term, block) row internally
                consistent (df == #ordinals, n == sum counts, ordinals
                ascending and inside their block, per-doc positions
                strictly ascending, counts/positions >= minimums) and the
                per-term totals reconcile with the tf index (sum df ==
                index df, sum n == index total_tf, same term set).
- ``--deep``:   per-ORDINAL tf mass (every doc's postings across all terms
                sum to its doc_len) — one unpack + groupBy(ordinal) +
                full-outer join against docs; O(postings) shuffle of two
                longs per posting, the strongest cross-artifact invariant.

All decode work runs inside mapInPandas over Arrow batches (NumPy per
posting row, no per-row Python over postings); per-batch violation COUNTS
are what leaves the executors, so the driver sees a handful of (check, n)
rows however large the index is. Checks never trust one artifact to verify
itself: the tf index is checked against docs, positions against the tf
index, both against the manifest.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.checkpoint import BuildManifest
from engine.codec import BLOCK_SIZE, block_maxes, decode_postings
from engine.positions import POS_BLOCK_BITS, decode_position_row

_VIOL_SCHEMA = "check string, n long"

#: every check the report carries, zero-filled when clean. Keeping the full
#: list in the report (rather than only nonzero rows) makes "which checks
#: ran" auditable from the JSON alone.
INDEX_CHECKS = [
    "index_decode_error", "index_df_mismatch", "index_total_tf_mismatch",
    "index_max_tf_mismatch", "index_unsorted_ordinals",
    "index_ordinal_out_of_range", "index_tf_nonpositive",
    "index_block_meta_mismatch", "index_duplicate_term",
]
DOCS_CHECKS = [
    "docs_duplicate_doc_id", "docs_ordinal_not_dense",
    "docs_negative_doc_len", "docs_count_vs_manifest",
    "docs_total_len_vs_manifest",
]
ALIAS_CHECKS = [
    "alias_self_reference", "alias_canonical_missing", "alias_leaked_into_docs",
]
POS_CHECKS = [
    "pos_decode_error", "pos_df_mismatch", "pos_n_mismatch",
    "pos_unsorted_ordinals", "pos_ordinal_outside_block",
    "pos_count_nonpositive", "pos_positions_not_ascending",
    "pos_negative_position", "pos_term_totals_mismatch",
]
DEEP_CHECKS = ["deep_tf_mass_mismatch"]


def _index_check_factory(n_docs: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = dict.fromkeys(INDEX_CHECKS[:-1], 0)
        for pdf in batches:
            for df_, ttf, mtf, blob, bl, bm in zip(
                    pdf["df"], pdf["total_tf"], pdf["max_tf"],
                    pdf["postings"], pdf["block_last_ids"],
                    pdf["block_max_tfs"]):
                try:
                    ords, tfs = decode_postings(bytes(blob))
                except Exception:
                    counts["index_decode_error"] += 1
                    continue
                if ords.size != df_:
                    counts["index_df_mismatch"] += 1
                if int(tfs.sum()) != ttf:
                    counts["index_total_tf_mismatch"] += 1
                if (int(tfs.max()) if tfs.size else 0) != mtf:
                    counts["index_max_tf_mismatch"] += 1
                # decode_postings cumsums uint64 deltas: a zero delta shows
                # up as a repeated ordinal, so >= catches both unsorted and
                # duplicate postings
                if ords.size > 1 and not (ords[1:] > ords[:-1]).all():
                    counts["index_unsorted_ordinals"] += 1
                if ords.size and (ords[0] < 0 or ords[-1] >= n_docs):
                    counts["index_ordinal_out_of_range"] += 1
                if tfs.size and int(tfs.min()) < 1:
                    counts["index_tf_nonpositive"] += 1
                want_l, want_m = block_maxes(ords, tfs, BLOCK_SIZE)
                if (not np.array_equal(want_l, np.asarray(bl, dtype=np.int64))
                        or not np.array_equal(
                            want_m, np.asarray(bm, dtype=np.int64))):
                    counts["index_block_meta_mismatch"] += 1
        yield pd.DataFrame({"check": list(counts), "n": list(counts.values())})
    return run


def _pos_check_factory(n_docs: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = dict.fromkeys(POS_CHECKS[:-1], 0)
        for pdf in batches:
            for block, df_, n, ob, cb, pb in zip(
                    pdf["block"], pdf["df"], pdf["n"], pdf["ords"],
                    pdf["counts"], pdf["pos"]):
                try:
                    ords, cnts, pos = decode_position_row(
                        bytes(ob), bytes(cb), bytes(pb))
                except Exception:
                    counts["pos_decode_error"] += 1
                    continue
                if ords.size != df_ or cnts.size != df_:
                    counts["pos_df_mismatch"] += 1
                if int(cnts.sum()) != n or pos.size != n:
                    counts["pos_n_mismatch"] += 1
                    continue  # segment boundaries unreliable below
                if ords.size > 1 and not (ords[1:] > ords[:-1]).all():
                    counts["pos_unsorted_ordinals"] += 1
                if ords.size and not (
                        (ords >> POS_BLOCK_BITS) == block).all():
                    counts["pos_ordinal_outside_block"] += 1
                if cnts.size and int(cnts.min()) < 1:
                    counts["pos_count_nonpositive"] += 1
                    continue  # segment starts below assume counts >= 1
                if pos.size and int(pos.min()) < 0:
                    counts["pos_negative_position"] += 1
                if pos.size > 1:
                    starts = np.zeros(pos.size, dtype=bool)
                    starts[np.cumsum(cnts[:-1])] = True
                    if not (np.diff(pos) > 0)[~starts[1:]].all():
                        counts["pos_positions_not_ascending"] += 1
        yield pd.DataFrame({"check": list(counts), "n": list(counts.values())})
    return run


def _unpack_tf_mass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(term, postings) -> (ordinal, tf) rows for the deep tf-mass check."""
    for pdf in batches:
        outs = []
        for blob in pdf["postings"]:
            try:
                ords, tfs = decode_postings(bytes(blob))
            except Exception:
                continue  # counted by index_decode_error already
            outs.append(pd.DataFrame({"ordinal": ords, "tf": tfs}))
        yield (pd.concat(outs, ignore_index=True) if outs
               else pd.DataFrame({"ordinal": np.empty(0, np.int64),
                                  "tf": np.empty(0, np.int64)}))


def _sum_violations(df: DataFrame) -> dict[str, int]:
    rows = df.groupBy("check").agg(F.sum("n").alias("n")).collect()
    return {r["check"]: int(r["n"]) for r in rows}


def verify_index(spark: SparkSession, index_dir: str, *,
                 deep: bool = False,
                 check_positions: bool = True) -> dict:
    """fsck the index at ``index_dir``. Returns the report dict
    ``{"ok": bool, "n_docs": N, "n_terms": T, "checks": {name: count}}``
    with every applicable check listed (0 == clean). Never raises on
    corruption — callers branch on ``ok`` (the CLI exits nonzero)."""
    man = BuildManifest(index_dir)
    for stage in ("docs", "index", "stats"):
        if not man.is_complete(stage):
            raise ValueError(f"{index_dir}: stage '{stage}' incomplete — "
                             "not a finished index")
    docs = spark.read.parquet(man.stage_path("docs"))
    index = spark.read.parquet(man.stage_path("index"))
    checks: dict[str, int] = {}

    # ---- docs: one aggregate pass + one dup-count shuffle ----
    agg = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("doc_id").alias("n_ids"),
        F.count_distinct("ordinal").alias("n_ords"),
        F.min("ordinal").alias("o_min"), F.max("ordinal").alias("o_max"),
        F.sum("doc_len").alias("total_len"),
        F.sum((F.col("doc_len") < 0).cast("long")).alias("neg_len"),
    ).collect()[0]
    n_docs = int(agg["n"])
    checks["docs_duplicate_doc_id"] = n_docs - int(agg["n_ids"])
    dense = (int(agg["n_ords"]) == n_docs
             and (n_docs == 0 or (int(agg["o_min"]) == 0
                                  and int(agg["o_max"]) == n_docs - 1)))
    checks["docs_ordinal_not_dense"] = 0 if dense else 1
    checks["docs_negative_doc_len"] = int(agg["neg_len"] or 0)
    sm = man.state["completed"]["stats"]["metrics"]
    checks["docs_count_vs_manifest"] = int(n_docs != int(sm["n_docs"]))
    checks["docs_total_len_vs_manifest"] = int(
        int(agg["total_len"] or 0) != int(sm["total_len"]))

    # ---- index: one decode pass; violation counts leave the executors ----
    viol = index.mapInPandas(_index_check_factory(n_docs),
                             schema=_VIOL_SCHEMA)
    checks.update(dict.fromkeys(INDEX_CHECKS, 0) | _sum_violations(viol))
    n_terms_total = index.count()
    n_terms = index.select("term").distinct().count()
    checks["index_duplicate_term"] = n_terms_total - n_terms

    # ---- aliases (optional stage) ----
    if man.is_complete("aliases"):
        al = spark.read.parquet(man.stage_path("aliases"))
        ids = docs.select(F.col("doc_id"))
        checks["alias_self_reference"] = al.where(
            F.col("doc_id") == F.col("canonical_doc_id")).count()
        checks["alias_canonical_missing"] = (
            al.select(F.col("canonical_doc_id").alias("doc_id"))
            .join(ids, "doc_id", "left_anti").count())
        checks["alias_leaked_into_docs"] = (
            al.select("doc_id").join(ids, "doc_id", "left_semi").count())

    # ---- positions (optional stage): internal + reconcile vs tf index ----
    if check_positions and man.is_complete("positions"):
        pos = spark.read.parquet(man.stage_path("positions"))
        pviol = pos.mapInPandas(_pos_check_factory(n_docs),
                                schema=_VIOL_SCHEMA)
        checks.update(dict.fromkeys(POS_CHECKS, 0) | _sum_violations(pviol))
        ptot = pos.groupBy("term").agg(F.sum("df").alias("p_df"),
                                       F.sum("n").alias("p_n"))
        itot = index.select("term", "df", "total_tf")
        j = itot.join(ptot, "term", "full_outer")
        checks["pos_term_totals_mismatch"] = j.where(
            (F.coalesce("p_df", F.lit(-1)) != F.coalesce("df", F.lit(-2)))
            | (F.coalesce("p_n", F.lit(-1))
               != F.coalesce("total_tf", F.lit(-2)))).count()

    # ---- deep: per-ordinal tf mass == doc_len, full-outer vs docs ----
    if deep:
        mass = (index.select("postings")
                .mapInPandas(_unpack_tf_mass, schema="ordinal long, tf long")
                .groupBy("ordinal").agg(F.sum("tf").alias("tf_mass")))
        j = docs.select("ordinal", "doc_len").join(mass, "ordinal",
                                                   "full_outer")
        checks["deep_tf_mass_mismatch"] = j.where(
            F.coalesce("tf_mass", F.lit(0))
            != F.coalesce("doc_len", F.lit(-1))).count()

    return {"ok": all(v == 0 for v in checks.values()),
            "n_docs": n_docs, "n_terms": n_terms, "checks": checks}


def main_verify(spark: SparkSession, index_dir: str, *, deep: bool,
                check_positions: bool) -> int:
    report = verify_index(spark, index_dir, deep=deep,
                          check_positions=check_positions)
    print(json.dumps(report))
    return 0 if report["ok"] else 1
