"""Incremental compaction (VERDICT r3 #1): each compact_incremental call
must consume ONLY the partial files previous calls did not (O(new data),
not O(all partials ever) — the reference re-indexes the whole crawl table
per run, README.md:19-21), and every generation must be BYTE-IDENTICAL to
a monolithic batch build over all docs ingested so far, positions and
cross-generation duplicate content included."""

import os

from engine.corpus import corpus_spark_schema, corpus_to_spark, make_corpus
from engine.index_build import build_index
from engine.oracle import Bm25Oracle
from engine.query import SearchEngine
from engine.streaming import (
    _committed_sink_files,
    _load_compaction_state,
    compact_incremental,
    current_index_dir,
    start_ingest,
)
from tests.test_streaming import _fingerprint, _pos_fingerprint


def _ingest_wave(spark, wave, src, work, with_positions=False):
    corpus_to_spark(spark, wave).coalesce(2).write.mode("append").parquet(src)
    qs = start_ingest(spark, src, work, corpus_spark_schema(),
                      with_positions=with_positions)
    for q in qs:
        q.awaitTermination(300)


def test_incremental_compaction_consumes_only_new(spark, tmp_path):
    """Two ingest+compact rounds; round 2's input partials exclude round
    1's; each generation matches the monolithic build, incl. positions and
    a duplicate-content doc that spans the generation boundary."""
    from tests.test_dedup import _with_duplicates

    from engine.positions import PhraseEngine, build_positions

    pdf = make_corpus(260, seed=91)
    big, expected_alias = _with_duplicates(pdf, 15)
    # originals in wave 1; wave 2 carries new docs AND the 15 duplicates of
    # wave-1 content (cross-GENERATION dups must collapse in the merge)
    wave1, wave2 = big.iloc[:150], big.iloc[150:]
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # ---- round 1 ----
    _ingest_wave(spark, wave1, src, work, with_positions=True)
    gen1 = compact_incremental(spark, work, out, partitions=4,
                               keep_history=True)
    assert gen1 == current_index_dir(out)

    batch1 = str(tmp_path / "batch1")
    c1 = corpus_to_spark(spark, wave1)
    build_index(spark, c1, batch1, n_salts=8, partitions=4)
    build_positions(spark, c1, batch1, n_salts=8, partitions=4)
    assert _fingerprint(spark, gen1) == _fingerprint(spark, batch1)
    assert _pos_fingerprint(spark, gen1) == _pos_fingerprint(spark, batch1)

    state1 = _load_compaction_state(out)
    scans_after_1 = set(_committed_sink_files(
        os.path.join(work, "scan_partials")))
    assert set(state1["generations"][0]["scan_files"]) == scans_after_1

    # ---- round 2 ----
    _ingest_wave(spark, wave2, src, work, with_positions=True)
    gen2 = compact_incremental(spark, work, out, partitions=4,
                               keep_history=True)
    assert gen2 != gen1
    assert gen2 == current_index_dir(out)

    # THE O(new) property: generation 2 consumed exactly the partial files
    # generation 1 did not — none of round 1's inputs were re-read
    state2 = _load_compaction_state(out)
    g1, g2 = state2["generations"]
    assert not (set(g1["scan_files"]) & set(g2["scan_files"]))
    all_now = set(_committed_sink_files(
        os.path.join(work, "scan_partials")))
    assert set(g1["scan_files"]) | set(g2["scan_files"]) == all_now

    # byte-identity with the monolithic build over EVERYTHING ingested
    batch_all = str(tmp_path / "batch_all")
    call = corpus_to_spark(spark, big)
    build_index(spark, call, batch_all, n_salts=8, partitions=4)
    build_positions(spark, call, batch_all, n_salts=8, partitions=4)
    assert _fingerprint(spark, gen2) == _fingerprint(spark, batch_all)
    assert _pos_fingerprint(spark, gen2) == _pos_fingerprint(spark, batch_all)

    # cross-generation duplicates collapsed exactly like the batch build
    got = {r["doc_id"]: r["canonical_doc_id"] for r in
           spark.read.parquet(f"{gen2}/aliases").collect()}
    assert got == {int(k): int(v) for k, v in expected_alias.items()}
    assert spark.read.parquet(f"{gen2}/docs").count() == len(pdf)

    # query parity: BM25 + phrase over the live generation
    eng = SearchEngine(spark, current_index_dir(out))
    oracle = Bm25Oracle(dict(zip(pdf["doc_id"], pdf["content"])))
    for q in ["def return", "identifier_10"]:
        assert eng.search(q, k=10, mode="ranked") == oracle.topk(q, 10,
                                                                 "ranked")
    pe_inc = PhraseEngine(spark, gen2)
    pe_bat = PhraseEngine(spark, batch_all)
    assert pe_inc.search_phrase("def return", k=10) == \
        pe_bat.search_phrase("def return", k=10)

    # ---- round 3: nothing new -> no-op, same generation ----
    gen3 = compact_incremental(spark, work, out, partitions=4,
                               keep_history=True)
    assert gen3 == gen2
    assert len(_load_compaction_state(out)["generations"]) == 2


def test_incremental_pruning_and_redelivery(spark, tmp_path):
    """Default keep_history=False prunes superseded generations and the
    intermediate segment; a doc_id re-delivered in a later wave (same
    repo/path/commit landing twice) is excluded from the new segment, so
    the merge's disjointness invariant holds and the result still matches
    the monolithic build (whose dropDuplicates keeps one copy)."""
    import pandas as pd

    pdf = make_corpus(180, seed=57)
    wave1 = pdf.iloc[:100]
    # wave 2 = 80 new docs + 10 verbatim re-deliveries of wave-1 docs
    wave2 = pd.concat([pdf.iloc[100:], pdf.iloc[:10]], ignore_index=True)
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    out = str(tmp_path / "out")
    os.makedirs(src)

    _ingest_wave(spark, wave1, src, work)
    gen1 = compact_incremental(spark, work, out, partitions=4)
    _ingest_wave(spark, wave2, src, work)
    gen2 = compact_incremental(spark, work, out, partitions=4)

    assert not os.path.isdir(gen1)            # pruned
    assert os.path.isdir(gen2)
    seg = os.path.join(out, "_compaction", "seg-00002")
    assert not os.path.isdir(seg)             # segment pruned after merge

    batch = str(tmp_path / "batch")
    build_index(spark, corpus_to_spark(spark, pdf), batch,
                n_salts=8, partitions=4)
    assert _fingerprint(spark, gen2) == _fingerprint(spark, batch)
    assert spark.read.parquet(f"{gen2}/docs").count() == len(pdf)


def test_pos_coverage_guard_survives_commit_log_retention(tmp_path):
    """ADVICE r3 (medium): Spark purges stream commit logs down to
    minBatchesToRetain entries, so on a long-lived work dir a lagging
    positional stream can have the SAME commit-file COUNT as the tf
    stream. The guard must compare max batch IDs, not counts."""
    import pytest

    from engine.streaming import _check_pos_coverage, _committed_batches

    work = str(tmp_path)
    # tf stream committed batches 5..7 (0..4 purged by retention);
    # pos stream committed 3..5 — equal FILE COUNTS, pos lags by 2
    for ckpt, ids in (("_ckpt_runs", [5, 6, 7]), ("_ckpt_pos", [3, 4, 5])):
        d = os.path.join(work, ckpt, "commits")
        os.makedirs(d)
        for i in ids:
            with open(os.path.join(d, str(i)), "w") as f:
                f.write('v1\n{"nextBatchWatermarkMs":0}')
    assert _committed_batches(work, "_ckpt_runs") == 8
    assert _committed_batches(work, "_ckpt_pos") == 6
    with pytest.raises(ValueError, match="lags the tf ingest"):
        _check_pos_coverage(work)
