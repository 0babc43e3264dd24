"""Distributed inverted-index build: the Spark-first replacement for the
reference's (missing) Indexer job, whose contract is fixed by its consumers
(SURVEY.md §2.3; searchEngine/src/cis5550/search/Searcher.java:44-57,78-101).

Pipeline (all lazy DataFrame ops; shuffles marked):

  corpus(repo,path,commit,lang,content)   <- immutable source, never copied
    ├── stage "docs_raw": THE one map-only content scan -> a union parquet
    │     of (a) per-doc metadata rows (doc_id + content_sha256 via JVM
    │     sha2/conv, doc_len via the Arrow RE2 tokenizer, serving
    │     title/snippet — ~300 B/doc, the reference `urls` table analog)
    │     and (b) doc_id-keyed MAP-SIDE-COMBINED packed posting runs from
    │     the same tokenization. Content is read and tokenized exactly
    │     ONCE per build; the index stage consumes the persisted runs.
    │                                                          [no shuffle]
    ├── stage "aliases": content dedup (reference contentSeen analog) — a
    │     window on content_sha256 over docs_raw; duplicate-content rows
    │     alias the min-doc_id canonical and are excluded downstream.
    │                                     [metadata-only shuffle on sha]
    ├── stage "docs": DENSE ORDINALS over the deduped metadata. Postings
    │     that store raw 63-bit hash doc_ids are incompressible (avg delta
    │     ~2^63/df → 8-9 varint bytes); dense ordinals 0..N-1 assigned in
    │     doc_id order give avg delta N/df → 1-2 bytes. Assignment is a
    │     deterministic bucket-offset scheme, NOT a global sort: bucket =
    │     high bits of the hash-uniform doc_id (fixed ranges, balanced),
    │     per-bucket counts -> cumulative offsets (tiny driver array),
    │     ordinal = offset[bucket] + rank within bucket. All on metadata:
    │     CONTENT NEVER SHUFFLES at any corpus size. Ordinals are monotone
    │     in doc_id, so doc_id order == ordinal order downstream.
    │                              [SHUFFLE 0: ~300 B/row metadata only]
    ├── stage "index": the scan's persisted doc_id-keyed runs shuffle on
    │     their (term, ext-salt) keys; the reduce merges runs AND remaps
    │     doc_id -> dense ordinal in one vectorized pass (broadcast
    │     searchsorted under the doc limit, partitioned ordinal join past
    │     it). Ordinals are monotone in doc_id, so ext-salt buckets are
    │     contiguous ordinal intervals — salt-order concat stays sorted.
    │     → repartition(P, term, salt)                        [SHUFFLE 1, salted]
    │     → mapInPandas: merge map-partition runs per (term,salt) (argsort)
    │     → repartition(P, term) + sortWithinPartitions       [SHUFFLE 2, small:
    │                                                moves packed runs only]
    │     → mapInPandas: concat salt-ordered runs (salts are ordinal RANGES,
    │       so concatenation is already globally sorted — no k-way merge),
    │       delta+varint encode, block maxes, df
    └── stage "stats": n_docs, total_len, avgdl (single aggregate)

Skew story (north_rule: explicit salted repartition): a hot term ("def",
"return" — the code-stopword analog) would otherwise send its entire posting
list through one reducer. SHUFFLE 1 keys on (term, salt) so a hot term fans
out over `n_salts` reducers, each producing a bounded sorted run; SHUFFLE 2
moves only packed partial runs (~10 bytes/posting) instead of shuffled rows.
At 10^12 files, SHUFFLE 1 volume ~ total postings — unavoidable (it IS the
index); partial runs keep per-task state bounded; AQE handles residual skew.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

import pyarrow as pa
import pyarrow.compute as pc

from .checkpoint import BuildManifest
from .codec import block_maxes, encode_postings
from .tokenizer import tokenize_arrow

DEFAULT_N_SALTS = 8
ORDINAL_BUCKET_BITS = 6  # 64 fixed doc_id range buckets for ordinal assignment
BROADCAST_DOC_LIMIT = 5_000_000  # (doc_id -> ordinal) map broadcast budget
SNIPPET_LEN = 200  # leading-content chars kept in the docs snapshot (serving)


# ---------------------------------------------------------------- doc identity

def with_doc_identity(corpus: DataFrame) -> DataFrame:
    """Add doc_id + content_sha256 with JVM built-ins (no Python).

    doc_id = first 8 bytes of sha256(repo||'/'||path||'@'||commit), top bit
    cleared — bit-exact with engine.corpus.doc_id_of (tests enforce).
    """
    out = corpus
    if "content_sha256" not in out.columns:
        out = out.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    if "doc_id" not in out.columns:
        key_hex = F.sha2(
            F.concat(F.col("repo"), F.lit("/"), F.col("path"),
                     F.lit("@"), F.col("commit")), 256)
        hi = F.conv(F.substring(key_hex, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(key_hex, 9, 8), 16, 10).cast("long")
        out = out.withColumn(
            "doc_id",
            F.shiftleft(hi.bitwiseAND(F.lit(0x7FFFFFFF)), 32)
            .bitwiseOR(lo))
    return out


# ------------------------------------------------------------ pandas UDF bodies

def partition_token_arrays(batches: Iterator[pa.RecordBatch],
                           with_positions: bool = False):
    """Consume an (ordinal, content) partition's record batches into flat
    token arrays: (codes, ordinals[, positions], vocab), or None when the
    partition holds no tokens. Arrow-native: tokens live only in Arrow
    buffers (tokenize_arrow) and are dictionary-encoded to int codes in
    C++; batch-local codes remap to partition-global via one more
    dictionary_encode. No Python object is ever created per token —
    per-token Python allocation was the dominant cost and destroyed
    multi-worker scaling. Shared by the tf-index map kernel and the
    positional-index map kernel (engine/positions.py) so the two can
    never diverge on tokenization/encoding."""
    code_parts, ord_parts, pos_parts, dict_parts, bases = [], [], [], [], []
    base = 0
    for rb in batches:
        content = rb.column("content")
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        toks = tokenize_arrow(content)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        total = int(lens.sum())
        if total == 0:
            continue
        enc = pc.list_flatten(toks).dictionary_encode()
        code_parts.append(enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64))
        dict_parts.append(enc.dictionary)
        bases.append(base)
        base += len(enc.dictionary)
        ord_parts.append(np.repeat(
            rb.column("ordinal").to_numpy(zero_copy_only=False)
            .astype(np.int64), lens))
        if with_positions:
            doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos_parts.append(np.arange(total, dtype=np.int64)
                             - np.repeat(doc_starts, lens))
    if not code_parts:
        return None
    gdict = pa.concat_arrays([d.cast(pa.string()) for d in dict_parts])
    genc = gdict.dictionary_encode()
    gidx = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    codes = np.concatenate(
        [gidx[b + c] for b, c in zip(bases, code_parts)])
    ordinals = np.concatenate(ord_parts)
    if with_positions:
        return codes, ordinals, np.concatenate(pos_parts), genc.dictionary
    return codes, ordinals, genc.dictionary


def _pack_runs(codes: np.ndarray, ordinals: np.ndarray, vocab_arr,
               nd: int, n_salts: int) -> pa.RecordBatch | None:
    """Flat (term_code, ordinal) token arrays -> one packed run row per
    (term, range-salt): sorted id run + tfs as raw little-endian bytes.
    The shared map-side-combine tail of every posting map kernel."""
    nd = max(nd, 1)
    # composite key (term_code, ordinal) -> tf via one sorted unique
    if len(vocab_arr) * nd < 2**62:
        key = codes * np.int64(nd) + ordinals
        uk, tfs = np.unique(key, return_counts=True)
        t_code = uk // nd
        t_ord = uk % nd
    else:  # overflow-safe path for astronomically large id spaces
        order = np.lexsort((ordinals, codes))
        sc, so = codes[order], ordinals[order]
        newgrp = np.empty(sc.size, dtype=bool)
        newgrp[0] = True
        newgrp[1:] = (np.diff(sc) != 0) | (np.diff(so) != 0)
        starts_ = np.flatnonzero(newgrp)
        tfs = np.diff(np.concatenate((starts_, [sc.size])))
        t_code, t_ord = sc[starts_], so[starts_]
    # overflow-safe range salt: ceil-div keeps <= n_salts buckets and
    # works for arbitrarily large id spaces (doc_id-keyed runs pass
    # nd = 1<<62 here; t_ord * n_salts would overflow int64)
    salt_div = max(1, (nd + n_salts - 1) // n_salts)
    salt = (t_ord // salt_div).astype(np.int32)
    # uk order == (term_code, ordinal) == (term_code, salt, ordinal)
    change = np.flatnonzero(
        (np.diff(t_code) != 0) | (np.diff(salt) != 0)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [t_code.size]))
    tfs32 = tfs.astype(np.int32)
    run_terms = vocab_arr.take(
        pa.array(t_code[starts], pa.int64())).cast(pa.string())
    ids_col = pa.array([t_ord[s:e].tobytes()
                        for s, e in zip(starts, ends)], pa.binary())
    tfs_col = pa.array([tfs32[s:e].tobytes()
                        for s, e in zip(starts, ends)], pa.binary())
    return pa.RecordBatch.from_arrays(
        [run_terms,
         pa.array(salt[starts], pa.int32()),
         pa.array((ends - starts).astype(np.int64), pa.int64()),
         ids_col, tfs_col],
        names=["term", "salt", "n", "ids", "tfs"])


def _map_partial_runs_factory(n_docs: int, n_salts: int):
    """MAP-SIDE COMBINE: (ordinal, content) partition -> one packed row per
    (term, salt) seen in this partition: sorted ordinal run + tfs as raw
    little-endian bytes. Shuffling #terms×salts×map_partitions packed rows
    instead of one row per (term, doc) posting cuts shuffle row count ~30-50×
    — the per-row JVM/Arrow serialization was the scalability bottleneck."""
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        got = partition_token_arrays(batches)
        if got is None:
            return
        codes, ordinals, vocab_arr = got
        rb = _pack_runs(codes, ordinals, vocab_arr, n_docs, n_salts)
        if rb is not None:
            yield rb
    return run


_RUN_FIELDS = [("term", pa.string()), ("salt", pa.int32()),
               ("n", pa.int64()), ("ids", pa.binary()),
               ("tfs", pa.binary())]
# positional run columns, always present in the union schema for schema
# stability; populated only when the scan runs with_positions
_POS_FIELDS = [("counts", pa.binary()), ("pos", pa.binary())]


def _map_scan_factory(meta_names: list[str], n_salts: int,
                      with_positions: bool = False):
    """THE single content scan (VERDICT r4: the old build tokenized all
    content TWICE — once for docs_raw doc_len, once for the posting map;
    THREE times with a positional build). Input partition:
    (meta..., content). Emits UNION rows in one pass over one tokenization:

    - doc rows (term null): meta pass-through + doc_len (token count) —
      streamed out per input batch;
    - tf run rows (tfs non-null): packed (term, salt, n, ids, tfs) posting
      runs keyed by EXTERNAL doc_id (exactly the streaming-ingest
      convention; ordinals do not exist yet) — emitted once per partition
      after the map-side combine;
    - position run rows (counts non-null, only with_positions): packed
      (term, salt, ids, counts, pos) runs from the SAME token arrays
      (positions._pack_pos_runs).

    The caller persists the union frame and filter-projects it into the
    docs_raw / runs / position-runs artifacts, so content is read and
    tokenized exactly ONCE per build at any corpus size."""
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        code_parts, ord_parts, pos_parts, dict_parts, bases = \
            [], [], [], [], []
        base = 0
        names = (meta_names + ["doc_len"] + [n for n, _ in _RUN_FIELDS]
                 + [n for n, _ in _POS_FIELDS])
        meta_types: dict[str, pa.DataType] = {}
        for rb in batches:
            for nm in meta_names:
                meta_types[nm] = rb.schema.field(nm).type
            content = rb.column("content")
            if isinstance(content, pa.ChunkedArray):
                content = content.combine_chunks()
            toks = tokenize_arrow(content)
            lens_a = pc.coalesce(
                pc.list_value_length(toks).cast(pa.int64()),
                pa.scalar(0, pa.int64()))
            if isinstance(lens_a, pa.ChunkedArray):
                lens_a = lens_a.combine_chunks()
            n = rb.num_rows
            doc_cols = []
            for nm in meta_names:
                col = rb.column(nm)
                doc_cols.append(col.combine_chunks()
                                if isinstance(col, pa.ChunkedArray) else col)
            doc_cols.append(lens_a)
            doc_cols += [pa.nulls(n, t)
                         for _, t in _RUN_FIELDS + _POS_FIELDS]
            yield pa.RecordBatch.from_arrays(doc_cols, names=names)
            lens = lens_a.to_numpy(zero_copy_only=False).astype(np.int64)
            total = int(lens.sum())
            if total == 0:
                continue
            enc = pc.list_flatten(toks).dictionary_encode()
            code_parts.append(enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64))
            dict_parts.append(enc.dictionary)
            bases.append(base)
            base += len(enc.dictionary)
            ord_parts.append(np.repeat(
                rb.column("doc_id").to_numpy(zero_copy_only=False)
                .astype(np.int64), lens))
            if with_positions:
                doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                pos_parts.append(np.arange(total, dtype=np.int64)
                                 - np.repeat(doc_starts, lens))
        if not code_parts:
            return
        gdict = pa.concat_arrays([d.cast(pa.string()) for d in dict_parts])
        genc = gdict.dictionary_encode()
        gidx = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.concatenate(
            [gidx[b + c] for b, c in zip(bases, code_parts)])
        ordinals = np.concatenate(ord_parts)

        def pad_union(rb_runs: pa.RecordBatch, run_names: list[str]):
            """Run batch -> union batch: null-pad every column the run
            kind does not carry, in union column order."""
            nr = rb_runs.num_rows
            have = {rb_runs.schema.names[i]: rb_runs.column(i)
                    for i in range(rb_runs.num_columns)}
            cols = [pa.nulls(nr, meta_types[nm]) for nm in meta_names]
            cols.append(pa.nulls(nr, pa.int64()))  # doc_len
            for nm, t in _RUN_FIELDS + _POS_FIELDS:
                cols.append(have[nm] if nm in run_names
                            else pa.nulls(nr, t))
            return pa.RecordBatch.from_arrays(cols, names=names)

        runs = _pack_runs(codes, ordinals, genc.dictionary, 1 << 62, n_salts)
        if runs is not None:
            yield pad_union(runs, ["term", "salt", "n", "ids", "tfs"])
        if with_positions:
            from .positions import _pack_pos_runs
            prb = _pack_pos_runs(codes, ordinals,
                                 np.concatenate(pos_parts),
                                 genc.dictionary, 1 << 62, n_salts)
            if prb is not None:
                yield pad_union(prb, ["term", "salt", "ids",
                                      "counts", "pos"])
    return run


def _reduce_partial_runs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per (term, salt): merge the map-partition runs (overlapping ordinal
    ranges across map partitions -> one argsort) into a single sorted run."""
    parts = [p for p in batches if len(p)]
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
    rows = []
    for (term, salt), g in pdf.groupby(["term", "salt"], sort=False):
        ids = np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in g["ids"]])
        tfs = np.concatenate(
            [np.frombuffer(b, dtype=np.int32) for b in g["tfs"]])
        order = np.argsort(ids, kind="stable")
        ids, tfs = ids[order], tfs[order]
        rows.append((term, int(salt), len(ids), ids.tobytes(), tfs.tobytes()))
    yield pd.DataFrame(rows, columns=["term", "salt", "n", "ids", "tfs"])


def _merge_term_runs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Partition-level: salt-partial runs -> final index rows. Salt buckets
    are ordinal ranges, so concatenation in salt order is already globally
    sorted per term."""
    parts = [p for p in batches if len(p)]
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
    rows = []
    for term, g in pdf.groupby("term", sort=True):
        g = g.sort_values("salt", kind="stable")
        ids = np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in g["ids"]])
        tfs = np.concatenate(
            [np.frombuffer(b, dtype=np.int32) for b in g["tfs"]])
        blob = encode_postings(ids.astype(np.uint64), tfs.astype(np.uint64))
        last_ids, max_tfs = block_maxes(ids, tfs.astype(np.int64))
        rows.append((term, len(ids), int(tfs.sum()), int(tfs.max()),
                     blob, last_ids.tolist(), max_tfs.tolist()))
    yield pd.DataFrame(rows, columns=[
        "term", "df", "total_tf", "max_tf", "postings",
        "block_last_ids", "block_max_tfs"])


RUN_SCHEMA = "term string, salt int, n long, ids binary, tfs binary"


def _merge_runs_sorting(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Runs -> final index rows with a full per-term argsort (for callers
    whose runs overlap in ordinal range: streamed micro-batches, segment
    merges, rebuilt fallback runs). The batch build's _merge_term_runs is
    the concat-only fast path; this one is the general one."""
    parts = [p for p in batches if len(p)]
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
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


def _pack_posting_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(term, salt, ordinal, tf) rows of one shuffle partition -> one packed
    sorted run per (term, salt)."""
    parts = [p for p in batches if len(p)]
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
    rows = []
    for (term, salt), g in pdf.groupby(["term", "salt"], sort=False):
        ids = g["ordinal"].to_numpy(np.int64)
        tfs = g["tf"].to_numpy(np.int32)
        order = np.argsort(ids, kind="stable")
        ids, tfs = ids[order], tfs[order]
        if ids.size > 1:
            first = np.empty(ids.size, dtype=bool)
            first[0] = True
            np.not_equal(ids[1:], ids[:-1], out=first[1:])
            if not first.all():  # re-delivered docs (see reduce remap)
                ids, tfs = ids[first], tfs[first]
        rows.append((term, int(salt), len(ids),
                     ids.tobytes(), tfs.tobytes()))
    yield pd.DataFrame(rows, columns=["term", "salt", "n", "ids", "tfs"])


def posting_rows_to_index(rows: DataFrame, n_docs: int, n_salts: int,
                          partitions: int) -> DataFrame:
    """(term, ordinal, tf) rows -> final index DataFrame via the same
    salted two-phase shape as the batch build: salt = ordinal range bucket,
    shuffle on (term, salt) -> packed runs, shuffle packed runs on term ->
    merged+encoded postings. This is the beyond-broadcast-limit path for
    compaction/merge: posting rows join the partitioned ordinal map instead
    of closure-capturing a driver array, so nothing here needs the whole
    doc set on one machine."""
    salt_div = max(1, (n_docs + n_salts - 1) // n_salts)
    salted = rows.withColumn(
        "salt", F.floor(F.col("ordinal") / F.lit(salt_div)).cast("int"))
    packed = (salted.repartition(partitions, "term", "salt")
              .mapInPandas(_pack_posting_rows, schema=RUN_SCHEMA))
    return (packed.repartition(partitions, "term")
            .sortWithinPartitions("term", "salt")
            .mapInPandas(_merge_runs_sorting, schema=INDEX_SCHEMA))


def _reduce_remap_runs_factory(ext_bc):
    """Per (term, ext-salt): merge doc_id-keyed map runs into one sorted
    run AND remap external doc_ids to dense ordinals in the same pass.
    ext_bc is a Spark Broadcast of (or, in tests, a bare) sorted
    external-id array (ordinal == index) of the DEDUPED doc set — a
    broadcast ships ONE copy per executor instead of re-serializing the
    array (40 MB at the 5M-doc limit) into every task closure: external ids absent from it (duplicate-content docs
    aliased out) drop here — their canonical twin carries the identical
    postings, so the result stays byte-identical to an un-deduped
    equivalent (test-enforced).

    Why remap INSIDE the reduce, not as a separate pass: ordinals are
    monotone in doc_id, so each doc_id-range salt bucket maps to a
    CONTIGUOUS ordinal interval, ordered by salt — the downstream
    salt-order concat (_merge_term_runs) stays globally sorted with the
    runs' ORIGINAL ext-salt keys, no re-salting or run splitting needed.
    A prior design remapped runs in a dedicated per-run pass; with
    map-partition-fragmented runs (~terms x salts x partitions rows) the
    per-run Python loop cost more than re-tokenizing the corpus. Here the
    Python loop runs once per (term, salt) GROUP — the same loop the
    reduce already does — and the searchsorted is one vectorized call per
    group."""
    def reduce(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        ext_sorted = ext_bc.value if hasattr(ext_bc, "value") else ext_bc
        pdf = (pd.concat(parts, ignore_index=True)
               if len(parts) > 1 else parts[0])
        rows = []
        for (term, salt), g in pdf.groupby(["term", "salt"], sort=False):
            ids = np.concatenate(
                [np.frombuffer(b, dtype=np.int64) for b in g["ids"]])
            tfs = np.concatenate(
                [np.frombuffer(b, dtype=np.int32) for b in g["tfs"]])
            order = np.argsort(ids, kind="stable")
            ids, tfs = ids[order], tfs[order]
            if ids.size > 1:
                first = np.empty(ids.size, dtype=bool)
                first[0] = True
                np.not_equal(ids[1:], ids[:-1], out=first[1:])
                if not first.all():
                    # same doc_id twice = identical content RE-DELIVERED
                    # as a new file (at-least-once producer); the doc rows
                    # collapse via dropDuplicates, so collapse the runs
                    # too — keep one copy (tfs are identical)
                    ids, tfs = ids[first], tfs[first]
            idx, keep = remap_keep(ext_sorted, ids)
            if not keep.any():
                continue
            ords = idx[keep].astype(np.int64)
            tfs = tfs[keep]
            rows.append((term, int(salt), len(ords),
                         ords.tobytes(), tfs.tobytes()))
        if rows:
            yield pd.DataFrame(
                rows, columns=["term", "salt", "n", "ids", "tfs"])
    return reduce


def _unpack_runs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Packed external-id runs -> (term, doc_id, tf) posting rows, for the
    beyond-broadcast-limit path (the rows JOIN the partitioned ordinal
    map; no driver array anywhere)."""
    for pdf in batches:
        outs = []
        for term, ids_b, tfs_b in zip(pdf["term"], pdf["ids"], pdf["tfs"]):
            outs.append(pd.DataFrame({
                "term": term,
                "doc_id": np.frombuffer(ids_b, dtype=np.int64),
                "tf": np.frombuffer(tfs_b, dtype=np.int32)}))
        if outs:
            yield pd.concat(outs, ignore_index=True)


def _doc_ids_sorted(docs: DataFrame, docs_path: str | None) -> np.ndarray:
    """Sorted doc_id array of the docs snapshot (ordinal == index). When
    the caller passes the snapshot's parquet path, read the one column
    driver-side with pyarrow — no Spark action, no cluster round-trip (the
    array is ≤ BROADCAST_DOC_LIMIT rows by contract, and per-action fixed
    driver latency is the dominant small-build scaling cost). Falls back
    to a Spark collect for non-local/virtual frames."""
    if docs_path is not None:
        try:
            import pyarrow.dataset as pads
            tbl = pads.dataset(docs_path, format="parquet").to_table(
                columns=["doc_id"])
            return np.sort(tbl["doc_id"].to_numpy(zero_copy_only=False)
                           .astype(np.int64))
        except Exception:
            pass
    return np.sort(docs.select("doc_id").toPandas()["doc_id"]
                   .to_numpy(np.int64))


def runs_to_index(spark: SparkSession, runs: DataFrame, docs: DataFrame,
                  n_docs: int, n_salts: int, partitions: int,
                  docs_path: str | None = None) -> DataFrame:
    """doc_id-keyed packed runs + docs snapshot (ordinal map) -> final
    index rows. THE shared index tail: the batch build (runs_raw stage),
    the streaming compactor, and the incremental compactor all feed it, so
    every ingestion mode is byte-identical by construction (tests enforce
    it against golden fixtures and across modes). Two regimes, like the
    ordinal join everywhere else:

    - under BROADCAST_DOC_LIMIT: the raw runs shuffle on their (term,
      ext-salt) keys and the sorted doc_id array ships to the REDUCE as a
      Spark broadcast (one copy per executor, not per task closure), which
      merges + remaps in one vectorized pass per group (hot
      terms fan out over the ext-salt buckets; ext-salt order == ordinal
      order because ordinals are monotone in doc_id);
    - past it: runs unpack to posting rows and JOIN the partitioned
      ordinal map — no driver array anywhere."""
    if n_docs <= BROADCAST_DOC_LIMIT:
        ext_bc = spark.sparkContext.broadcast(
            _doc_ids_sorted(docs, docs_path))
        partials = (runs.repartition(partitions, "term", "salt")
                    .mapInPandas(_reduce_remap_runs_factory(ext_bc),
                                 schema=RUN_SCHEMA))
        return (partials.repartition(partitions, "term")
                .sortWithinPartitions("term", "salt")
                .mapInPandas(_merge_term_runs, schema=INDEX_SCHEMA))
    rows = (runs.mapInPandas(
                _unpack_runs, schema="term string, doc_id long, tf int")
            .join(docs.select("doc_id", "ordinal"), "doc_id")
            .select("term", "ordinal", "tf"))
    return posting_rows_to_index(rows, n_docs, n_salts, partitions)


def assign_ordinals(spark: SparkSession, df: DataFrame,
                    id_col: str = "doc_id", *,
                    on_duplicate: str | None = None) -> DataFrame:
    """Dense ordinals 0..N-1, monotone in id_col, for a metadata table —
    the same bucket-offset scheme as the build's docs stage, shared by
    streaming compaction and segment merge (which used to toPandas() the
    whole table onto the driver — an OOM at 10^9+ docs). Only the
    2^ORDINAL_BUCKET_BITS bucket counts ever hit the driver; the table
    itself shuffles once on bucket (callers pass ~16-50 B/row metadata,
    never content). Duplicate ids fail fast (they would corrupt every
    downstream ordinal)."""
    from pyspark.sql import Window
    shift = 63 - ORDINAL_BUCKET_BITS
    b = df.withColumn("_bkt", F.shiftright(F.col(id_col), shift).cast("int"))
    brows = (b.groupBy("_bkt")
             .agg(F.count("*").alias("cnt"),
                  F.countDistinct(id_col).alias("dcnt")).collect())
    dups = sum(int(r["cnt"]) - int(r["dcnt"]) for r in brows)
    if dups:
        raise ValueError(
            on_duplicate or
            f"{dups} duplicate {id_col} row(s); ids must be unique")
    offsets, acc = {}, 0
    for r in sorted(brows, key=lambda r: r["_bkt"]):
        offsets[int(r["_bkt"])] = acc
        acc += int(r["cnt"])
    off_df = F.broadcast(spark.createDataFrame(
        [(k, v) for k, v in offsets.items()], "_bkt int, _boff long"))
    w = Window.partitionBy("_bkt").orderBy(id_col)
    return (b.join(off_df, "_bkt")
            .withColumn("ordinal",
                        (F.col("_boff") + F.row_number().over(w) - 1)
                        .cast("long"))
            .drop("_bkt", "_boff"))


def remap_keep(sorted_ids: np.ndarray, ext: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray]:
    """Membership remap against a sorted id array -> (idx, keep): idx are
    searchsorted insertion positions (== dense ordinals for members), keep
    marks values actually present. THE single masking idiom behind every
    dedup-aware run remap (tf + positional, streaming compaction + segment
    merge) — those paths are byte-identity-tested against the batch build,
    so they must all mask identically; keep the logic here, next to
    alias_map_of, not copy-pasted per caller."""
    idx = np.searchsorted(sorted_ids, ext)
    if not sorted_ids.size:
        return idx, np.zeros(ext.size, dtype=bool)
    idxc = np.minimum(idx, sorted_ids.size - 1)
    return idx, (idx < sorted_ids.size) & (sorted_ids[idxc] == ext)


def alias_map_of(doc_meta: DataFrame) -> DataFrame:
    """Duplicate-content rows -> (doc_id, canonical_doc_id) where canonical
    = min doc_id per content_sha256 — the reference contentSeen analog
    (crawler/Crawler.java:177-190) as one metadata-only window on the sha
    key. Shared by the batch build's aliases stage, streaming compaction,
    and segment merge so the three paths can never diverge on dedup
    semantics (they are byte-identity-tested against each other)."""
    from pyspark.sql import Window
    wsha = Window.partitionBy("content_sha256")
    return (doc_meta.select("doc_id", "content_sha256")
            .withColumn("canonical_doc_id", F.min("doc_id").over(wsha))
            .where(F.col("doc_id") != F.col("canonical_doc_id"))
            .select("doc_id", "canonical_doc_id"))


INDEX_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("total_tf", T.LongType(), False),
    T.StructField("max_tf", T.IntegerType(), False),
    T.StructField("postings", T.BinaryType(), False),
    T.StructField("block_last_ids", T.ArrayType(T.LongType()), False),
    T.StructField("block_max_tfs", T.ArrayType(T.IntegerType()), False),
])


def _with_doclen_arrow(df: DataFrame, meta_cols: list[str]) -> DataFrame:
    """(meta..., content) -> (meta..., doc_len) via tokenize_arrow — the
    RE2/Arrow twin of tokenizer.spark_token_count_expr (parity
    test-enforced). Pass-through columns ride the same Arrow batch, so this
    stays one map-only stage with no join on the content side."""
    out_schema = T.StructType(
        [df.schema[name] for name in meta_cols]
        + [T.StructField("doc_len", T.LongType(), False)])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            toks = tokenize_arrow(rb.column("content"))
            lens = pc.list_value_length(toks).cast(pa.int64())
            lens = pc.coalesce(lens, pa.scalar(0, pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [rb.column(name).combine_chunks()
                 if isinstance(rb.column(name), pa.ChunkedArray)
                 else rb.column(name) for name in meta_cols]
                + [lens if isinstance(lens, pa.Array)
                   else lens.combine_chunks()],
                names=meta_cols + ["doc_len"])

    return df.mapInArrow(run, schema=out_schema)


def ordinal_content_pairs(corpus: DataFrame, docs: DataFrame,
                          n_docs: int) -> DataFrame:
    """(ordinal, content) input to the posting map stage: content comes
    straight from the immutable source; only the tiny (doc_id -> ordinal)
    map from the docs snapshot joins in (broadcast below the limit; at
    10^12 files a doc_id-co-partitioned join). The content side must stay
    map-only — tests assert the plan has a BroadcastHashJoin here."""
    ordmap = docs.select("doc_id", "ordinal")
    if n_docs <= BROADCAST_DOC_LIMIT:
        ordmap = F.broadcast(ordmap)
    return (with_doc_identity(corpus).select("doc_id", "content")
            .join(ordmap, "doc_id").select("ordinal", "content"))


# ----------------------------------------------------------------- build stages

def scan_union_frame(corpus: DataFrame, n_salts: int,
                     with_positions: bool = False) -> DataFrame:
    """THE single content scan as a lazy frame: per-doc metadata rows
    (identity sha + doc_len + serving title/snippet) UNION doc_id-keyed
    packed posting runs (and, with_positions, packed position runs), all
    from one tokenization (_map_scan_factory). build_index persists this
    as stage docs_raw; bench.py times it bare as the dominant distributed
    stage of the build."""
    c = with_doc_identity(corpus.where(F.col("content").isNotNull()))
    c = (c.withColumn("title", F.element_at(F.split("path", "/"), -1))
         .withColumn("snippet", F.substring("content", 1, SNIPPET_LEN)))
    meta_cols = [col for col in c.columns if col != "content"]
    scan_schema = T.StructType(
        [T.StructField(name, c.schema[name].dataType, True)
         for name in meta_cols]
        + [T.StructField("doc_len", T.LongType(), True),
           T.StructField("term", T.StringType(), True),
           T.StructField("salt", T.IntegerType(), True),
           T.StructField("n", T.LongType(), True),
           T.StructField("ids", T.BinaryType(), True),
           T.StructField("tfs", T.BinaryType(), True),
           T.StructField("counts", T.BinaryType(), True),
           T.StructField("pos", T.BinaryType(), True)])
    return (c.select(*meta_cols, "content")
            .mapInArrow(_map_scan_factory(meta_cols, n_salts,
                                          with_positions=with_positions),
                        schema=scan_schema))


def build_index(spark: SparkSession, corpus: DataFrame, out_dir: str, *,
                n_salts: int | None = None, partitions: int | None = None,
                resume: bool = True,
                dedup_content: bool = True,
                with_positions: bool = False) -> BuildManifest:
    """Run (or resume) the full build into
    out_dir/{aliases,docs,index,stats,_lineage} + manifest.json.
    with_positions also builds the phrase-search positional store
    (out_dir/positions) from the SAME single content scan — one
    tokenization feeds doc metadata, tf postings AND positions (the
    post-hoc alternative, positions.build_positions, re-scans content)."""
    man = BuildManifest(out_dir)
    if not resume:
        # a FRESH build must also physically clear every stage output a
        # previous build left behind (incl. optional ones this invocation
        # will not rewrite, like positions/ or aliases/): serving checks
        # stage markers, so a stale survivor would silently serve data from
        # a different corpus
        import shutil
        man.state = {"snapshots": [], "completed": {}}
        for stage in ("docs_raw", "aliases", "docs", "index",
                      "_lineage", "positions", "fuzzy", "doc_terms"):
            shutil.rmtree(man.stage_path(stage), ignore_errors=True)
        # persist the cleared manifest (atomic), so a crash mid-rebuild
        # cannot resurrect the old stage entries
        import json
        tmp = man.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man.state, f)
        os.replace(tmp, man.path)
    partitions = partitions or max(8, spark.sparkContext.defaultParallelism)
    n_salts = n_salts or DEFAULT_N_SALTS
    # null rows are dropped, like the reference's fromTable lambda-null
    # convention (flame/FlameContextImpl.java:62-67); empty strings stay
    # (doc_len 0, no postings)
    corpus = corpus.where(F.col("content").isNotNull())

    # ---- stage: docs_raw (ONE content scan -> the full per-doc metadata
    # snapshot, no ordinals yet). Iceberg mindset: the source table is
    # already durable and immutable, so checkpoints store ONLY metadata
    # (~300 B/doc with display fields) — never a copy of content. Identity
    # (doc_id, content_sha256) is JVM sha2/conv; display fields (title =
    # last path component, snippet = bounded leading content — what the
    # HTTP shim serves as title/body, Searcher.java:186-207) are JVM
    # expressions; doc_len comes from the Arrow RE2 tokenizer in the same
    # map-only pass (pass-through mapInArrow; parity with the Python
    # tokenizer is test-enforced). Everything downstream (dedup, ordinals,
    # stats) reads THIS tiny table — content is never scanned again except
    # by the index stage's posting map. ----
    shift = 63 - ORDINAL_BUCKET_BITS
    n_buckets = 1 << ORDINAL_BUCKET_BITS

    def _bucket_metrics(idcol):
        # 64 conditional sums that ride a write job's Observation — this is
        # how per-bucket counts reach the driver WITHOUT a dedicated count
        # job (each extra Spark action costs ~0.3-0.9 s of fixed latency,
        # the dominant term in small-build scaling efficiency)
        b = F.shiftright(idcol, shift).cast("int")
        return [F.sum(F.when(b == i, 1).otherwise(0)).alias(f"b{i}")
                for i in range(n_buckets)]

    # docs_raw/aliases feed ONLY the docs stage; when docs is already
    # complete (resume, incl. dirs created by older layouts that never had
    # a docs_raw stage) they must not run — a freshly computed alias map
    # over an already-built index would disagree with its postings
    need_docs = not man.is_complete("docs")
    if need_docs and not man.is_complete("docs_raw"):
        from pyspark.sql import Observation
        t0 = man.begin("docs_raw")
        # THE single content scan: one tokenization emits BOTH the per-doc
        # metadata rows (doc_len) AND the doc_id-keyed packed posting runs
        # as a union frame (run rows have null meta; doc rows null run
        # cols). The index stage consumes the persisted runs, so content
        # is read+tokenized exactly ONCE per build (was twice: docs_raw
        # doc_len + the index posting map — the measured non-scaling
        # stage).
        raw = scan_union_frame(corpus, n_salts,
                               with_positions=with_positions)
        robs = Observation("raw_rows")
        # run rows have null doc_id -> every observation term skips them
        raw = raw.observe(
            robs,
            F.sum(F.when(F.col("term").isNull(), 1).otherwise(0))
            .alias("rows"),
            *_bucket_metrics(F.col("doc_id")))
        raw.write.mode("overwrite").parquet(man.stage_path("docs_raw"))
        rgot = robs.get
        man.commit("docs_raw", t0, int(rgot["rows"] or 0),
                   {"bucket_counts": [int(rgot[f"b{i}"] or 0)
                                      for i in range(n_buckets)],
                    "with_positions": bool(with_positions)})
    docs_raw = None
    if need_docs:
        docs_raw = spark.read.parquet(man.stage_path("docs_raw"))
        # single-scan layout: project the doc rows out of the union
        # (legacy layouts wrote metadata-only docs_raw — no run columns)
        if "term" in docs_raw.columns:
            drop = ["term", "salt", "n", "ids", "tfs"] + \
                [c for c in ("counts", "pos") if c in docs_raw.columns]
            docs_raw = (docs_raw.where(F.col("doc_id").isNotNull())
                        .drop(*drop))

    # ---- stage: aliases (content dedup — the reference contentSeen analog,
    # crawler/Crawler.java:177-190: pages with identical content share one
    # canonical row). One metadata-only window on the sha key over the
    # docs_raw snapshot — content never moves. Duplicate-content docs alias
    # the min-doc_id canonical and are EXCLUDED from ordinals/postings; the
    # alias map persists so serving can resolve an aliased doc_id. ----
    if need_docs and dedup_content and not man.is_complete("aliases"):
        from pyspark.sql import Observation
        t0 = man.begin("aliases")
        alias_map = alias_map_of(docs_raw)
        aobs = Observation("alias_rows")
        alias_map = alias_map.observe(
            aobs, F.count(F.lit(1)).alias("n_aliases"),
            *_bucket_metrics(F.col("doc_id")))
        alias_map.write.mode("overwrite").parquet(man.stage_path("aliases"))
        agot = aobs.get
        n_al = int(agot["n_aliases"])
        man.commit("aliases", t0, n_al,
                   {"n_aliases": n_al,
                    "bucket_counts": [int(agot[f"b{i}"] or 0)
                                      for i in range(n_buckets)]})

    # ---- stage: docs (dense ordinals + doc stats over metadata ONLY) ----
    # ordinal = bucket offset (64 bucket counts on the driver) + row_number
    # within bucket ordered by doc_id — computed on the metadata snapshot,
    # so content NEVER shuffles at ANY corpus size and no broadcast budget
    # applies here (the old design needed a content-avoiding broadcast
    # branch; this one shuffles ~300 B/doc metadata once on bucket).
    # Corpus-wide stats (N, total_len -> avgdl) ride the write via the
    # Observation API.
    if not man.is_complete("docs"):
        from pyspark.sql import Observation, Window
        t0 = man.begin("docs")
        cm = docs_raw
        if dedup_content:
            aliases = (spark.read.parquet(man.stage_path("aliases"))
                       .select("doc_id"))
            cm = cm.join(F.broadcast(aliases), "doc_id", "left_anti")
        cm = cm.withColumn("bucket",
                           F.shiftright("doc_id", shift).cast("int"))
        # canonical per-bucket counts = raw - alias counts, both observed on
        # the writes above — ZERO extra jobs. (Older manifests resumed here
        # without bucket metrics fall back to one count job.)
        raw_m = man.state["completed"]["docs_raw"]["metrics"]
        al_m = (man.state["completed"]["aliases"]["metrics"]
                if dedup_content else {})
        rc = raw_m.get("bucket_counts")
        ac = al_m.get("bucket_counts") if dedup_content else [0] * n_buckets
        if rc is None or ac is None:
            counts = {int(r["bucket"]): int(r["cnt"]) for r in
                      cm.groupBy("bucket").agg(F.count("*").alias("cnt"))
                      .collect()}
        else:
            counts = {i: rc[i] - ac[i] for i in range(n_buckets)
                      if rc[i] - ac[i] > 0}
        offsets, acc = {}, 0
        for b in sorted(counts):
            offsets[b] = acc
            acc += counts[b]
        off_df = F.broadcast(spark.createDataFrame(
            [(b, o) for b, o in offsets.items()] or [(0, 0)],
            "bucket int, _boff long"))
        w = Window.partitionBy("bucket").orderBy("doc_id")
        # duplicate doc_ids (same repo/path/commit twice, or a hash
        # collision) would k^2-fan-out through the index stage's ordinal
        # join and silently corrupt postings — fail fast. Duplicates are
        # adjacent in the ordinal window, so a lag comparison observed on
        # the SAME write job detects them with zero extra jobs.
        dup_flag = (F.col("doc_id") == F.lag("doc_id").over(w)).cast("long")
        docs_df = (cm.join(off_df, "bucket")
                   .withColumn("ordinal",
                               (F.col("_boff") + F.row_number().over(w) - 1)
                               .cast("long"))
                   .withColumn("_dup", dup_flag)
                   .drop("bucket", "_boff"))
        obs = Observation("doc_stats")
        docs_df = docs_df.observe(
            obs, F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_len").alias("total_len"),
            F.sum("_dup").alias("n_dups"))
        docs_df = docs_df.drop("_dup")
        docs_df.write.mode("overwrite").parquet(man.stage_path("docs"))
        got = obs.get
        if int(got["n_dups"] or 0):
            raise ValueError(
                f"corpus has {int(got['n_dups'])} duplicate doc_id row(s) "
                "(repo/path/commit must be unique); dedup the corpus layer "
                "first — see merge.py for the same contract")
        man.commit("docs", t0, int(got["n_docs"]),
                   {"n_docs": int(got["n_docs"]),
                    "total_len": int(got["total_len"] or 0),
                    "buckets": len(counts)})
    docs = spark.read.parquet(man.stage_path("docs"))

    # ---- stage: stats (N, avgdl — broadcast-side scalars, manifest-only) ----
    if not man.is_complete("stats"):
        t0 = man.begin("stats")
        dm = man.state["completed"]["docs"]["metrics"]
        man.commit("stats", t0, 1, {"n_docs": dm["n_docs"],
                                    "total_len": dm["total_len"]},
                   has_output=False)
    n_docs = int(man.state["completed"]["stats"]["metrics"]["n_docs"])

    # ---- stage: index (salted two-phase posting build) ----
    if not man.is_complete("index"):
        t0 = man.begin("index")
        # the single-scan layout already persisted map-side-combined
        # doc_id-keyed runs in the docs_raw union — consume those (zero
        # further content reads). Legacy layouts (metadata-only docs_raw,
        # or docs complete with no docs_raw at all) fall back to the
        # original second content scan.
        runs = None
        if man.is_complete("docs_raw") and os.path.exists(
                man.stage_path("docs_raw")):
            scan = spark.read.parquet(man.stage_path("docs_raw"))
            if "term" in scan.columns:
                # tfs non-null distinguishes tf runs from position runs
                runs = (scan.where(F.col("tfs").isNotNull())
                        .select("term", "salt", "n", "ids", "tfs"))
        if runs is not None:
            index = runs_to_index(spark, runs, docs, n_docs,
                                  n_salts, partitions,
                                  docs_path=man.stage_path("docs"))
        else:
            pair = ordinal_content_pairs(corpus, docs, n_docs)
            map_runs = pair.mapInArrow(
                _map_partial_runs_factory(n_docs, n_salts),
                schema=RUN_SCHEMA)
            partials = (
                map_runs.repartition(partitions, "term", "salt")
                .mapInPandas(_reduce_partial_runs, schema=RUN_SCHEMA)
            )
            index = (
                partials.repartition(partitions, "term")
                .sortWithinPartitions("term", "salt")
                .mapInPandas(_merge_term_runs, schema=INDEX_SCHEMA)
            )
        from pyspark.sql import Observation
        iobs = Observation("index_stats")
        index = index.observe(
            iobs, F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").alias("postings"),
            F.sum(F.length("postings")).alias("bytes"))
        index.write.mode("overwrite").parquet(man.stage_path("index"))
        got = iobs.get
        man.commit("index", t0, int(got["n_terms"]), {
            "postings_emitted": int(got["postings"]),
            "bytes_compressed": int(got["bytes"]),
            "n_salts": n_salts,
            "partitions": partitions,
        })

    # ---- stage: positions (optional): the scan already persisted packed
    # position runs when docs_raw ran with_positions — feed them to the
    # shared positional tail, zero further content reads. A resume over a
    # scan that carried no position rows (or a legacy layout) falls back
    # to the post-hoc build_positions content scan. ----
    if with_positions and not man.is_complete("positions"):
        from .positions import build_positions, write_positions_stage
        scan_has_pos = bool(
            man.state["completed"].get("docs_raw", {})
            .get("metrics", {}).get("with_positions"))
        if scan_has_pos:
            scan = spark.read.parquet(man.stage_path("docs_raw"))
            pos_runs = (scan.where(F.col("counts").isNotNull())
                        .select("term", "salt", "ids", "counts", "pos"))
            write_positions_stage(spark, man, pos_runs, docs, n_docs,
                                  n_salts, partitions)
        else:
            build_positions(spark, corpus, out_dir,
                            n_salts=n_salts, partitions=partitions)

    # ---- stage: lineage (per-partition metrics rows; north-rule field set) ----
    if not man.is_complete("_lineage"):
        t0 = man.begin("_lineage")
        docs_lin = (
            docs.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("docs_processed"),
                 F.sum("doc_len").alias("postings_emitted"),
                 F.lit(0).cast("long").alias("bytes_compressed"))
            .withColumn("stage", F.lit("docs")))
        idx_df = spark.read.parquet(man.stage_path("index"))
        idx_lin = (
            idx_df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("docs_processed"),
                 F.sum("df").alias("postings_emitted"),
                 F.sum(F.length("postings")).alias("bytes_compressed"))
            .withColumn("stage", F.lit("index")))
        lineage = docs_lin.unionByName(idx_lin).select(
            "stage", "partition_id", "docs_processed",
            "postings_emitted", "bytes_compressed")
        from pyspark.sql import Observation
        lobs = Observation("lineage_rows")
        lineage = lineage.observe(lobs, F.count(F.lit(1)).alias("rows"))
        lineage.write.mode("overwrite").parquet(man.stage_path("_lineage"))
        man.commit("_lineage", t0, int(lobs.get["rows"]))

    return man


def load_stats(spark: SparkSession, out_dir: str) -> tuple[int, float]:
    n_docs, total_len = load_stats_totals(out_dir)
    return n_docs, (total_len / n_docs) if n_docs else 0.0


def load_stats_totals(out_dir: str) -> tuple[int, int]:
    """(n_docs, total_len) as the INTEGERS the stats stage recorded — the
    federated path sums these across segments so its avgdl division is
    bit-identical to the merged index's (a float avgdl re-weighted by
    n_docs would drift in the last ulp and break rank-identity)."""
    man = BuildManifest(out_dir)
    m = man.state["completed"]["stats"]["metrics"]
    return int(m["n_docs"]), int(m["total_len"])
