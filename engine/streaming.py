"""Incremental index ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §1.4: no streaming surface), but a
production 10^12-file corpus arrives continuously. This module adds an
incremental path with the same final semantics as the batch build:

  readStream(file source, exactly-once tracking via checkpoint)
    -> ONE union-scan stream (the batch build's scan_union_frame kernel:
       one tokenization emits doc-metadata rows + packed per-(term, salt)
       posting runs keyed by EXTERNAL doc_id + optional position runs)
    -> append-mode parquet of union scan partials

  compact(spark, work_dir, out_dir)
    -> filter-projects the row kinds, assigns dense ordinals over ALL
       docs seen so far, and feeds the runs to the SAME index tails as
       the batch build (runs_to_index / pos_runs_to_store: reduce-side
       merge+remap per (term, ext-salt) group), byte-identical to a batch
       build over the same corpus (test-enforced). Legacy multi-stream
       work dirs (doc_stats + run_partials [+ pos_partials]) still
       compact through the identical tails.

Streaming partials store raw sorted doc_id runs (not ordinals): ordinals are
corpus-global and can't be assigned until compaction. The remap at compaction
is a sorted-array searchsorted — O(n log n) NumPy, no Python per element.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_build import (
    RUN_SCHEMA,
    _map_partial_runs_factory,
    _merge_runs_sorting,
    with_doc_identity,
)

# backwards-compat alias (merge.py and older callers import it from here)
_merge_sorting = _merge_runs_sorting


def _ingest_meta_path(work_dir: str) -> str:
    return os.path.join(work_dir, "_ingest_meta.json")


def _load_ingest_meta(work_dir: str) -> dict | None:
    import json
    p = _ingest_meta_path(work_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def start_ingest(spark: SparkSession, source_dir: str, work_dir: str,
                 corpus_schema, n_salts: int = 8,
                 trigger_available_now: bool = True,
                 with_positions: bool = False):
    """Start the streaming ingest of corpus parquet files landing in
    source_dir: ONE stream, ONE tokenization per document — the same
    union-scan kernel as the batch build (index_build.scan_union_frame)
    emits doc-metadata rows + doc_id-keyed packed posting runs (+ position
    runs when with_positions) into work_dir/scan_partials. compact()
    filter-projects the row kinds. (The previous layout ran 2-3 separate
    streams over the source — content was read and tokenized up to three
    times per micro-batch, and a positional stream could silently lag the
    tf stream; one atomic stream makes that divergence impossible.)
    Returns a 1-tuple of the StreamingQuery handle.

    with_positions is a WORK-DIR-LEVEL setting: the first ingest fixes it
    (recorded in _ingest_meta.json) and later calls must match — a mix
    would leave docs the tf index serves but the positional store misses,
    the exact silent gap the old layout's coverage guard existed for.
    Legacy (multi-stream) work dirs must finish with compact(); new
    ingests into them are refused."""
    import json

    if os.path.isdir(os.path.join(work_dir, "_ckpt_runs")):
        raise ValueError(
            f"{work_dir} holds a legacy multi-stream ingest; compact() it "
            "with this version (still supported) and start new ingests in "
            "a fresh work_dir")
    os.makedirs(work_dir, exist_ok=True)
    meta = _load_ingest_meta(work_dir)
    if meta is not None:
        if bool(meta.get("with_positions")) != bool(with_positions):
            raise ValueError(
                "with_positions is fixed per work_dir at the first ingest "
                f"(recorded: {meta.get('with_positions')}); a mixed ingest "
                "would leave docs missing from the positional store — use "
                "a fresh work_dir to change it")
    else:
        tmp = _ingest_meta_path(work_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"layout": "scan",
                       "with_positions": bool(with_positions),
                       "n_salts": int(n_salts)}, f)
        os.replace(tmp, _ingest_meta_path(work_dir))

    from .index_build import scan_union_frame
    stream = (spark.readStream.schema(corpus_schema)
              .parquet(source_dir))
    scan = scan_union_frame(stream, n_salts, with_positions=with_positions)
    trigger = {"availableNow": True} if trigger_available_now else \
        {"processingTime": "10 seconds"}
    q = (scan.writeStream.format("parquet")
         .option("path", os.path.join(work_dir, "scan_partials"))
         .option("checkpointLocation", os.path.join(work_dir, "_ckpt_scan"))
         .outputMode("append").trigger(**trigger).start())
    return (q,)


def compact(spark: SparkSession, work_dir: str, out_dir: str,
            n_salts: int = 8, partitions: int = 16,
            dedup_content: bool = True,
            run_files: list[str] | None = None,
            doc_files: list[str] | None = None,
            pos_files: list[str] | None = None,
            scan_files: list[str] | None = None,
            exclude_docs: DataFrame | None = None) -> None:
    """Merge all streamed partial runs into a final index + docs + stats —
    same layout as engine.index_build.build_index output, loadable by
    SearchEngine. Byte-identical postings vs a batch build of the same
    corpus (tests enforce, including the beyond-broadcast-limit path AND
    corpora with duplicate content across micro-batches).

    Content dedup (reference contentSeen analog) runs the SAME aliases
    stage as the batch build (index_build.alias_map_of over the compacted
    doc metadata — a metadata-only sha window): duplicate-content docs
    alias the min-doc_id canonical, are excluded from ordinals, and their
    postings drop out of the runs at remap (the canonical's identical
    postings survive), so a streamed+compacted corpus matches the batch
    build byte-for-byte even when content repeats. The alias map persists
    so serving resolves aliases exactly like a batch index.

    Ordinals come from the build's distributed bucket-offset scheme
    (assign_ordinals) — only 64 bucket counts touch the driver, vs the old
    toPandas() of the whole doc table (driver OOM at 10^9+ docs). The run
    remap has two regimes like the build's ordinal join: under
    BROADCAST_DOC_LIMIT a driver doc_id array closure-captures into the
    packed-run remap (fast path); past it the runs unpack to posting rows
    and JOIN the partitioned ordinal map — no driver array anywhere.

    Two work-dir layouts are accepted: the unified scan layout (ONE
    stream wrote union rows into scan_partials — doc metadata, tf runs and
    position runs split here by row-kind filters, which push down to the
    parquet scan) and the legacy multi-stream layout (doc_stats +
    run_partials [+ pos_partials] dirs). scan_files — or, for the legacy
    layout, run_files/doc_files/pos_files — restricts the compaction to an
    EXPLICIT subset of partial files (the incremental path:
    compact_incremental builds a segment from only the not-yet-compacted
    files). exclude_docs (a doc_id DataFrame) drops docs already owned by
    a previous generation; their postings fall out of the runs at remap
    since the canonical ordinal set no longer contains them."""
    from . import index_build as ib
    from .checkpoint import BuildManifest

    man = BuildManifest(out_dir)
    scan = None
    scan_dir = os.path.join(work_dir, "scan_partials") if work_dir else None
    if scan_files or (not doc_files and not run_files and scan_dir
                      and os.path.isdir(scan_dir)):
        scan = spark.read.parquet(*(scan_files or [scan_dir]))
        run_cols = ["term", "salt", "n", "ids", "tfs"] + \
            [c for c in ("counts", "pos") if c in scan.columns]
        doc_src = (scan.where(F.col("doc_id").isNotNull())
                   .drop(*run_cols))
    elif doc_files:
        doc_src = spark.read.parquet(*doc_files)
    else:
        doc_src = spark.read.parquet(os.path.join(work_dir, "doc_stats"))
    doc_stats = doc_src.dropDuplicates(["doc_id"])
    if exclude_docs is not None:
        doc_stats = doc_stats.join(exclude_docs.select("doc_id"),
                                   "doc_id", "left_anti")

    from pyspark.sql import Observation
    if dedup_content and "content_sha256" not in doc_stats.columns:
        raise ValueError(
            "compact(dedup_content=True) needs content_sha256 in the "
            "streamed doc_stats (present since start_ingest emits full "
            "metadata); pass dedup_content=False for legacy partials")
    if dedup_content:
        t0 = man.begin("aliases")
        alias_map = ib.alias_map_of(doc_stats)
        aobs = Observation("compact_alias_rows")
        alias_map = alias_map.observe(
            aobs, F.count(F.lit(1)).alias("n_aliases"))
        alias_map.write.mode("overwrite").parquet(man.stage_path("aliases"))
        n_al = int(aobs.get["n_aliases"] or 0)
        man.commit("aliases", t0, n_al, {"n_aliases": n_al})
        aliases = (spark.read.parquet(man.stage_path("aliases"))
                   .select("doc_id"))
        doc_stats = doc_stats.join(F.broadcast(aliases), "doc_id",
                                   "left_anti")

    t0 = man.begin("docs")
    docs_df = ib.assign_ordinals(spark, doc_stats)
    obs = Observation("compact_doc_stats")
    docs_df = docs_df.observe(obs, F.count(F.lit(1)).alias("n_docs"),
                              F.sum("doc_len").alias("total_len"))
    docs_df.write.mode("overwrite").parquet(man.stage_path("docs"))
    got = obs.get
    n_docs = int(got["n_docs"])
    total_len = int(got["total_len"] or 0)
    man.commit("docs", t0, n_docs,
               {"n_docs": n_docs, "total_len": total_len})
    t0 = man.begin("stats")
    man.commit("stats", t0, 1,
               {"n_docs": n_docs, "total_len": total_len},
               has_output=False)

    t0 = man.begin("index")
    if scan is not None:
        # tfs non-null distinguishes tf runs from position runs
        runs = (scan.where(F.col("tfs").isNotNull())
                .select("term", "salt", "n", "ids", "tfs"))
    elif run_files:
        runs = spark.read.parquet(*run_files)
    else:
        runs = spark.read.parquet(os.path.join(work_dir, "run_partials"))
    docs = spark.read.parquet(man.stage_path("docs"))
    # THE shared index tail (index_build.runs_to_index) — the same code the
    # batch build runs on its persisted scan runs, so batch and streamed
    # corpora are byte-identical by construction. Streamed runs carry
    # doc_id-range salts from ingest; ordinals are monotone in doc_id, so
    # those buckets are contiguous ordinal intervals and the salted
    # two-phase reduce/merge applies as-is (hot terms fan out over the
    # ext-salt buckets instead of one per-term argsort reducer).
    index = ib.runs_to_index(spark, runs, docs, n_docs, n_salts, partitions,
                             docs_path=man.stage_path("docs"))
    # index metrics + lineage counts ride their write jobs' Observations —
    # no read-back agg or count actions (fixed driver latency per action
    # is the dominant small-build scaling-efficiency cost)
    iobs = Observation("compact_index_stats")
    index = index.observe(
        iobs, F.count(F.lit(1)).alias("n"), F.sum("df").alias("p"),
        F.sum(F.length("postings")).alias("b"))
    index.write.mode("overwrite").parquet(man.stage_path("index"))
    igot = iobs.get
    man.commit("index", t0, int(igot["n"] or 0),
               {"postings_emitted": int(igot["p"] or 0),
                "bytes_compressed": int(igot["b"] or 0),
                "n_salts": n_salts, "partitions": partitions})

    t0 = man.begin("_lineage")
    idx = spark.read.parquet(man.stage_path("index"))
    lin = (idx.groupBy(F.spark_partition_id().alias("partition_id"))
           .agg(F.count(F.lit(1)).alias("docs_processed"),
                F.sum("df").alias("postings_emitted"),
                F.sum(F.length("postings")).alias("bytes_compressed"))
           .withColumn("stage", F.lit("index"))
           .select("stage", "partition_id", "docs_processed",
                   "postings_emitted", "bytes_compressed"))
    lobs = Observation("compact_lineage_rows")
    lin = lin.observe(lobs, F.count(F.lit(1)).alias("rows"))
    lin.write.mode("overwrite").parquet(man.stage_path("_lineage"))
    man.commit("_lineage", t0, int(lobs.get["rows"] or 0))

    # ---- positional store (present iff the ingest ran with_positions) ----
    if scan is not None:
        meta = _load_ingest_meta(work_dir) if work_dir else None
        if ((meta or {}).get("with_positions")
                and not man.is_complete("positions")):
            from .positions import write_positions_stage
            pos_runs = (scan.where(F.col("counts").isNotNull())
                        .select("term", "salt", "ids", "counts", "pos"))
            write_positions_stage(spark, man, pos_runs, docs, n_docs,
                                  n_salts, partitions)
    elif pos_files or os.path.exists(os.path.join(work_dir,
                                                  "pos_partials")):
        _check_pos_coverage(work_dir)
        from .positions import compact_positions
        compact_positions(spark, work_dir, out_dir,
                          n_salts=n_salts, partitions=partitions,
                          pos_files=pos_files)


def _committed_batches(work_dir: str, ckpt: str) -> int:
    """Highest committed micro-batch ID (+1) for a stream checkpoint.

    Uses the MAX numeric commit filename, not the file count: Spark purges
    commit logs down to spark.sql.streaming.minBatchesToRetain (default
    100) entries, so on a long-lived work dir both streams' counts plateau
    at the retention window and a lagging stream would pass a count-based
    guard. Batch IDs are monotone and survive retention purges."""
    d = os.path.join(work_dir, ckpt, "commits")
    if not os.path.isdir(d):
        return 0
    ids = [int(f) for f in os.listdir(d)
           if not f.startswith(".") and f.isdigit()]
    return (max(ids) + 1) if ids else 0


def _check_pos_coverage(work_dir: str) -> None:
    """Mixed ingest guard: if some start_ingest runs dropped
    with_positions, the position stream's checkpoint lags the tf stream's
    and the compacted positional store would silently MISS those docs
    (phrase search returns no hits for docs BM25 serves). The streams
    share the exactly-once file source, so equal committed-batch counts
    mean equal file coverage; on mismatch, re-running ingest with
    --positions drains exactly the missed files from the positional
    checkpoint."""
    n_runs = _committed_batches(work_dir, "_ckpt_runs")
    n_pos = _committed_batches(work_dir, "_ckpt_pos")
    if n_pos < n_runs:
        raise ValueError(
            f"positional ingest lags the tf ingest ({n_pos} vs {n_runs} "
            "committed micro-batches) — some files were ingested without "
            "--positions; re-run ingest with --positions to catch up "
            "before compacting")


# ---------------------------------------------------------------------------
# Incremental compaction: compact only NEW partials into a segment, merge
# with the previous compacted generation — O(new data + prior index), not
# O(all raw partials ever) (the reference re-indexes the whole crawl table
# per run, README.md:19-21 — the anti-pattern this replaces).
# ---------------------------------------------------------------------------

def _sink_log_files(log_path: str) -> list[str]:
    """Parse one streaming file-sink metadata log (v1: header line then one
    JSON SinkFileStatus per line) -> local data-file paths."""
    import json
    out = []
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            ent = json.loads(line)
            p = ent.get("path", "")
            if ent.get("action", "add") != "add" or not p:
                continue
            if p.startswith("file:"):
                p = p[5:]
                while p.startswith("//"):
                    p = p[1:]
            out.append(p)
    return out


def _committed_sink_files(sink_dir: str) -> list[str]:
    """Data files the streaming parquet sink has COMMITTED — read from the
    sink's _spark_metadata log (the exactly-once visible set; stray
    uncommitted task files are excluded, exactly as spark.read.parquet on
    the directory would exclude them). A `N.compact` log supersedes all
    logs <= N; later numeric logs append. Falls back to listing part files
    when the directory has no metadata log (batch-written partials)."""
    meta = os.path.join(sink_dir, "_spark_metadata")
    if not os.path.isdir(meta):
        if not os.path.isdir(sink_dir):
            return []
        return sorted(
            os.path.join(sink_dir, f) for f in os.listdir(sink_dir)
            if f.startswith("part-") and not f.endswith(".crc"))
    names = [n for n in os.listdir(meta) if not n.startswith(".")]
    compacts = sorted((n for n in names if n.endswith(".compact")),
                      key=lambda n: int(n.split(".")[0]))
    files: list[str] = []
    start = -1
    if compacts:
        start = int(compacts[-1].split(".")[0])
        files += _sink_log_files(os.path.join(meta, compacts[-1]))
    for n in sorted((n for n in names if n.isdigit()), key=int):
        if int(n) > start:
            files += _sink_log_files(os.path.join(meta, n))
    return files


def _compaction_state_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_compaction", "state.json")


def _load_compaction_state(out_dir: str) -> dict:
    import json
    p = _compaction_state_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"generations": []}


def current_index_dir(out_dir: str) -> str:
    """Resolve the CURRENT generation of an incrementally compacted index
    (the dir to hand to SearchEngine). A plain compact()/build output dir
    resolves to itself."""
    cur = os.path.join(out_dir, "CURRENT")
    if os.path.exists(cur):
        with open(cur) as f:
            return os.path.join(out_dir, f.read().strip())
    return out_dir


def _discover_new_partials(work_dir: str, state: dict,
                           caller: str) -> tuple[str | None, dict | None]:
    """Committed partial files under work_dir that no generation in
    `state` has consumed yet. Returns (prev_gen_name, new) where new is a
    dict {scan_files, run_files, doc_files, pos_files} — or None when
    nothing new exists (the caller no-ops on the previous generation).
    Raises when the work dir holds no committed partials at all AND no
    generation exists (nothing was ever ingested). Shared by
    compact_incremental (which consumes the files) and serving_view
    (which reads them without consuming)."""
    prev = (state["generations"][-1]["dir"]
            if state["generations"] else None)
    empty = {"scan_files": [], "run_files": [], "doc_files": [],
             "pos_files": []}
    if os.path.isdir(os.path.join(work_dir, "scan_partials")):
        # unified scan layout: ONE partial-file set carries every row kind
        seen_scan = {f for g in state["generations"]
                     for f in g.get("scan_files", [])}
        scan_all = _committed_sink_files(
            os.path.join(work_dir, "scan_partials"))
        new_scan = [f for f in scan_all if f not in seen_scan]
        if not new_scan:
            if prev is None:
                raise ValueError(
                    f"{caller}: no committed scan partials found under "
                    f"{work_dir} — run the ingest first")
            return prev, None
        return prev, {**empty, "scan_files": new_scan}
    seen_runs = {f for g in state["generations"] for f in g["run_files"]}
    seen_docs = {f for g in state["generations"] for f in g["doc_files"]}
    seen_pos = {f for g in state["generations"] for f in g["pos_files"]}
    runs_all = _committed_sink_files(os.path.join(work_dir, "run_partials"))
    docs_all = _committed_sink_files(os.path.join(work_dir, "doc_stats"))
    pos_dir = os.path.join(work_dir, "pos_partials")
    has_pos = os.path.isdir(pos_dir)
    pos_all = _committed_sink_files(pos_dir) if has_pos else []
    new_runs = [f for f in runs_all if f not in seen_runs]
    new_docs = [f for f in docs_all if f not in seen_docs]
    new_pos = [f for f in pos_all if f not in seen_pos]
    if not new_docs and not new_runs:
        if prev is None:
            raise ValueError(
                f"{caller}: no committed doc_stats partials found under "
                f"{work_dir} — run the ingest first")
        return prev, None
    if not new_docs:
        raise ValueError(
            f"{caller}: no committed doc_stats partials found under "
            f"{work_dir} — run the ingest first")
    if has_pos:
        _check_pos_coverage(work_dir)
    return prev, {"scan_files": [], "run_files": new_runs,
                  "doc_files": new_docs, "pos_files": new_pos}


def _owned_doc_ids(spark: SparkSession, prev_dir: str) -> DataFrame:
    """doc_ids a previous generation already owns (canonicals AND
    aliased-out ids) — excluded from a new segment so the segment set
    stays doc-disjoint (a re-delivered file mirrors the batch build's
    dropDuplicates)."""
    from .checkpoint import BuildManifest
    owned = spark.read.parquet(
        os.path.join(prev_dir, "docs")).select("doc_id")
    if BuildManifest(prev_dir).is_complete("aliases"):
        owned = owned.unionByName(spark.read.parquet(
            os.path.join(prev_dir, "aliases")).select("doc_id"))
    return owned


def compact_incremental(spark: SparkSession, work_dir: str, out_dir: str,
                        *, n_salts: int = 8, partitions: int = 16,
                        dedup_content: bool = True,
                        keep_history: bool = False) -> str:
    """Incremental compaction: each call consumes only the partial files
    the PREVIOUS calls did not, builds them into a segment, and merges the
    segment with the previous generation via merge_indexes — so the Nth
    compaction costs O(new data + prior index size), never O(all partials
    ever). Output layout under out_dir:

      gen-00001/ ... gen-0000N/   full index dirs (SearchEngine-loadable)
      CURRENT                     name of the live generation
      _compaction/state.json      files consumed per generation

    Returns the live generation dir (== current_index_dir(out_dir)).
    Byte-identity: gen-N equals a monolithic batch build over every doc
    ingested so far (test-enforced, positions included) because segment
    compaction and merge_indexes are each byte-identity-preserving, and
    cross-generation duplicate content collapses in the merge's aliases
    stage exactly as a monolithic build would collapse it. Docs whose
    doc_id already lives in the previous generation (a re-delivered file)
    are excluded from the segment, mirroring the batch build's
    dropDuplicates.

    Old generations and the intermediate segment are pruned after the
    CURRENT pointer swap unless keep_history=True.

    Pending tombstones (deletes.delete_docs) are consumed here too: the
    merge masks the dead classes' postings at the remap (PHYSICAL delete),
    so gen-N is byte-identical to a monolithic batch build over the
    surviving docs. Deletes with no new ingested data produce a
    delete-only generation (a single-input merge of the previous one)."""
    import json
    import shutil

    from .deletes import pending_delete_files, tombstones_frame
    from .merge import merge_indexes

    state = _load_compaction_state(out_dir)
    prev, new = _discover_new_partials(work_dir, state,
                                       "compact_incremental")
    new_dels = pending_delete_files(work_dir, state)
    if new is None and not new_dels:
        return os.path.join(out_dir, prev)
    tomb = tombstones_frame(spark, new_dels)
    new = new or {"scan_files": [], "run_files": [], "doc_files": [],
                  "pos_files": []}
    new_scan, new_runs = new["scan_files"], new["run_files"]
    new_docs, new_pos = new["doc_files"], new["pos_files"]
    has_new_docs = bool(new_scan or new_docs)

    gen_id = len(state["generations"]) + 1
    gen_name = f"gen-{gen_id:05d}"
    gen_dir = os.path.join(out_dir, gen_name)
    seg_dir = os.path.join(out_dir, "_compaction", f"seg-{gen_id:05d}")

    if prev is None and tomb is None:
        # first generation: the segment IS the index
        compact(spark, work_dir, gen_dir, n_salts=n_salts,
                partitions=partitions, dedup_content=dedup_content,
                run_files=new_runs or None, doc_files=new_docs or None,
                pos_files=new_pos or None, scan_files=new_scan or None)
    else:
        merge_inputs = []
        if prev is not None:
            prev_dir = os.path.join(out_dir, prev)
            merge_inputs.append(prev_dir)
        if has_new_docs:
            owned = (_owned_doc_ids(spark, prev_dir)
                     if prev is not None else None)
            compact(spark, work_dir, seg_dir, n_salts=n_salts,
                    partitions=partitions, dedup_content=dedup_content,
                    run_files=new_runs or None, doc_files=new_docs or None,
                    pos_files=new_pos or None, scan_files=new_scan or None,
                    exclude_docs=owned)
            merge_inputs.append(seg_dir)
        merge_indexes(spark, merge_inputs, gen_dir,
                      n_salts=n_salts, partitions=partitions,
                      dedup_content=dedup_content, tombstones=tomb)

    state["generations"].append({
        "gen": gen_id, "dir": gen_name, "run_files": new_runs,
        "doc_files": new_docs, "pos_files": new_pos,
        "scan_files": new_scan, "delete_files": new_dels})
    sp = _compaction_state_path(out_dir)
    os.makedirs(os.path.dirname(sp), exist_ok=True)
    tmp = sp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, sp)
    cur_tmp = os.path.join(out_dir, "CURRENT.tmp")
    with open(cur_tmp, "w") as f:
        f.write(gen_name)
    os.replace(cur_tmp, os.path.join(out_dir, "CURRENT"))

    if not keep_history:
        if os.path.isdir(seg_dir):
            shutil.rmtree(seg_dir)
        for g in state["generations"][:-1]:
            d = os.path.join(out_dir, g["dir"])
            if os.path.isdir(d):
                shutil.rmtree(d)
    return gen_dir




def serving_view(spark: SparkSession, work_dir: str, out_dir: str,
                 *, n_salts: int = 8, partitions: int = 16,
                 dedup_content: bool = True) -> list[str]:
    """Near-real-time serving view: the index dirs that together cover
    EVERY doc ingested so far — the CURRENT compacted generation plus,
    when uncompacted partials exist, a fresh UNMERGED segment built from
    exactly those files — WITHOUT running a merge. Hand the list to
    query.search_big_federated: per-segment top-k under GLOBAL BM25 stats
    is exact vs the physically merged index because generations and
    segments are doc-disjoint (every doc scores fully inside the one
    segment that owns it), so queries see freshly ingested docs at
    segment-build cost, not merge cost — the Lucene NRT-reader shape.

    The segment caches under out_dir/_serving keyed by the fingerprint of
    its input file set: repeated calls between ingests reuse it; a call
    after new ingests builds the superseding segment and prunes the old
    one; a call after compact_incremental (which consumes the files)
    returns just the new generation and drops the stale segment.

    Freshness trade-off (dedup): content duplicated ACROSS the view's
    members is served as distinct docs until the next compact_incremental
    collapses it in the merge's aliases stage; re-delivered doc_ids are
    excluded from the segment (doc-disjointness holds regardless).
    Within each member, content dedup applies as usual."""
    import hashlib
    import shutil

    state = _load_compaction_state(out_dir)
    prev, new = _discover_new_partials(work_dir, state, "serving_view")
    dirs = [os.path.join(out_dir, prev)] if prev else []
    serv_root = os.path.join(out_dir, "_serving")
    if new is None:
        shutil.rmtree(serv_root, ignore_errors=True)  # consumed -> stale
        return dirs
    all_new = sorted(new["scan_files"] + new["run_files"]
                     + new["doc_files"] + new["pos_files"])
    fp = hashlib.sha256("\n".join(all_new).encode()).hexdigest()[:16]
    seg = os.path.join(serv_root, f"seg-{fp}")
    done = os.path.join(seg, "_SERVING_COMPLETE")
    if not os.path.exists(done):
        shutil.rmtree(seg, ignore_errors=True)
        if os.path.isdir(serv_root):    # prune superseded segments
            for n in os.listdir(serv_root):
                if n != f"seg-{fp}":
                    shutil.rmtree(os.path.join(serv_root, n),
                                  ignore_errors=True)
        owned = (_owned_doc_ids(spark, os.path.join(out_dir, prev))
                 if prev else None)
        compact(spark, work_dir, seg, n_salts=n_salts,
                partitions=partitions, dedup_content=dedup_content,
                scan_files=new["scan_files"] or None,
                run_files=new["run_files"] or None,
                doc_files=new["doc_files"] or None,
                pos_files=new["pos_files"] or None,
                exclude_docs=owned)
        with open(done, "w") as f:
            f.write("\n".join(all_new))
    dirs.append(seg)
    return dirs
