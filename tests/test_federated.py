"""Near-real-time federated serving: streaming.serving_view hands back
[current generation, fresh UNMERGED segment] and query.search_big_federated
answers over the pair rank-identically to the physically merged index —
queries see newly ingested docs at segment-build cost, no merge on the
serve path (the Lucene NRT-reader shape; the reference re-indexes the whole
crawl table before anything new is searchable, README.md:19-21)."""

import os

import pandas as pd

from engine.corpus import corpus_to_spark, make_corpus
from engine.index_build import build_index
from engine.query import search_big, search_big_federated
from engine.streaming import (
    compact_incremental,
    current_index_dir,
    serving_view,
)
from tests.test_incremental_compact import _ingest_wave
from tests.test_streaming import _fingerprint

QUERIES = ["def return", "identifier_10 value", "import data result"]


def test_serving_view_federated_rank_identity(spark, tmp_path):
    """Ingest wave 1 + compact; ingest wave 2 WITHOUT compacting; the
    federated search over serving_view's [gen1, fresh segment] must equal
    search_big over a monolithic batch index of wave1 ∪ wave2 — ranks,
    doc_ids and float64 scores — in ranked, conjunctive and rounded
    modes. Wave 2 re-delivers some wave-1 files, so the view's
    doc-disjointness (exclude_docs) is exercised too."""
    pdf = make_corpus(220, seed=73)
    wave1 = pdf.iloc[:120]
    # 90 new docs + 10 verbatim re-deliveries of wave-1 files
    wave2 = pd.concat([pdf.iloc[120:210], pdf.iloc[:10]],
                      ignore_index=True)
    covered = pdf.iloc[:210]
    src, work, out = (str(tmp_path / d) for d in ("src", "work", "out"))
    os.makedirs(src)

    _ingest_wave(spark, wave1, src, work)
    gen1 = compact_incremental(spark, work, out, partitions=4)
    _ingest_wave(spark, wave2, src, work)

    view = serving_view(spark, work, out, partitions=4)
    assert view[0] == gen1 == current_index_dir(out)
    assert len(view) == 2 and "_serving" in view[1]

    batch = str(tmp_path / "batch")
    build_index(spark, corpus_to_spark(spark, covered), batch,
                n_salts=8, partitions=4)
    # the fresh segment is NOT merged: gen1 alone misses wave-2 docs
    assert _fingerprint(spark, gen1) != _fingerprint(spark, batch)

    for q in QUERIES:
        for mode in ("ranked", "conjunctive"):
            want = search_big(spark, batch, q, k=10, mode=mode)
            got = search_big_federated(spark, view, q, k=10, mode=mode)
            assert got == want, (q, mode)
        want = search_big(spark, batch, q, k=10, rounded=True)
        got = search_big_federated(spark, view, q, k=10, rounded=True)
        assert got == want, (q, "rounded")
    # a doc that only exists in wave 2 must be reachable through the view
    fresh_ids = set(pdf.iloc[120:210]["doc_id"].astype(int))
    hits = {doc_id for q in QUERIES
            for _, doc_id, _ in search_big_federated(spark, view, q, k=50)}
    assert hits & fresh_ids, "no wave-2 doc surfaced through the view"


def test_serving_view_lifecycle(spark, tmp_path):
    """The segment caches by input-file fingerprint (repeat calls between
    ingests rebuild nothing); a new ingest supersedes it; a compaction
    consumes the files and the view collapses to [new generation] with the
    stale segment pruned."""
    pdf = make_corpus(140, seed=41)
    src, work, out = (str(tmp_path / d) for d in ("src", "work", "out"))
    os.makedirs(src)

    _ingest_wave(spark, pdf.iloc[:80], src, work)
    compact_incremental(spark, work, out, partitions=4)

    # nothing uncompacted -> just the generation, no _serving dir
    view0 = serving_view(spark, work, out, partitions=4)
    assert view0 == [current_index_dir(out)]

    _ingest_wave(spark, pdf.iloc[80:], src, work)
    view1 = serving_view(spark, work, out, partitions=4)
    assert len(view1) == 2
    seg = view1[1]
    marker = os.path.join(seg, "_SERVING_COMPLETE")
    mtime = os.path.getmtime(marker)

    # second call: same fingerprint -> same segment, no rebuild
    assert serving_view(spark, work, out, partitions=4) == view1
    assert os.path.getmtime(marker) == mtime

    # compaction consumes the partials -> the view is the new generation
    # only and the stale serving segment is gone
    gen2 = compact_incremental(spark, work, out, partitions=4)
    view2 = serving_view(spark, work, out, partitions=4)
    assert view2 == [gen2]
    assert not os.path.isdir(seg)

    # federated over a single dir == plain search_big over it
    q = "def return"
    assert search_big_federated(spark, view2, q, k=10) == \
        search_big(spark, gen2, q, k=10)


def test_serving_view_before_any_ingest(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="run the ingest first"):
        serving_view(spark, str(tmp_path / "work"), str(tmp_path / "out"))


def test_federated_service_payload_parity_and_refresh(spark, tmp_path):
    """FederatedSearchService over the NRT view serves EVERY mode (bm25
    ranked/conjunctive, tfidf, wildcard, phrase, near) field-for-field
    equal to the big-regime service on a monolithic batch index of the
    same docs; /refresh semantics: after a compaction consumes the
    partials the view collapses to the new generation and answers are
    unchanged."""
    from engine.positions import build_positions
    from engine.server import FederatedSearchService, SearchService

    pdf = make_corpus(200, seed=29)
    # plant a term that exists ONLY in wave2 (the fresh, uncompacted
    # segment): /explain of a compacted-gen doc for this term must show
    # the federation-global idf even though the doc's OWNING segment has
    # no posting row for it (r5 review fix — idf keys off df_rank)
    from engine.corpus import content_sha256
    pdf.loc[pdf.index[150], "content"] += "\nfreshsegmentonly"
    pdf.loc[pdf.index[150], "content_sha256"] = content_sha256(
        pdf.iloc[150]["content"])
    wave1, wave2 = pdf.iloc[:120], pdf.iloc[120:]
    src, work, out = (str(tmp_path / d) for d in ("src", "work", "out"))
    os.makedirs(src)

    _ingest_wave(spark, wave1, src, work, with_positions=True)
    compact_incremental(spark, work, out, partitions=4)
    _ingest_wave(spark, wave2, src, work, with_positions=True)

    batch = str(tmp_path / "batch")
    c = corpus_to_spark(spark, pdf)
    build_index(spark, c, batch, n_salts=8, partitions=4)
    build_positions(spark, c, batch, n_salts=8, partitions=4)
    ref = SearchService(spark, batch, big=True)
    fed = FederatedSearchService(spark, work_dir=work, out_dir=out,
                                 partitions=4)
    assert len(fed.index_dirs) == 2

    checks = [
        {"query": "def return", "mode": "ranked"},
        {"query": "def return import", "mode": "conjunctive"},
        {"query": "def return", "scoring": "tfidf", "k": 20},
        {"query": "identifier_1*", "mode": "ranked"},
        {"query": "def return", "mode": "phrase"},
        {"query": "def import", "mode": "near", "slop": 3},
        # field-boosted ranking over the NRT view (VERDICT r4 #1): the
        # path boost serves federated, filters/NOT composed
        {"query": "pkg5 def", "scoring": "bm25f"},
        {"query": "lang:python pkg5 def -import", "scoring": "bm25f"},
    ]
    for cargs in checks:
        assert fed.search_payload(**cargs) == ref.search_payload(**cargs), \
            cargs

    # federated /mlt (VERDICT r4 #8): owning-segment vector + federation
    # interestingness weights == merged-index MLT — for a compacted-gen
    # doc AND a doc that only exists in the fresh uncompacted segment
    from engine.mlt import ensure_doc_terms
    ensure_doc_terms(spark, batch)
    for did in (int(pdf.iloc[5]["doc_id"]), int(pdf.iloc[150]["doc_id"])):
        assert fed.mlt_payload(did, k=8) == ref.mlt_payload(did, k=8), did

    # federated /explain (r5): owning-segment tf under federation
    # weights == the merged-index explain, bitwise — for a compacted-gen
    # doc AND a fresh-segment doc
    for did in (int(pdf.iloc[5]["doc_id"]), int(pdf.iloc[150]["doc_id"])):
        assert fed.explain_payload("def return", did) == \
            ref.explain_payload("def return", did), did
    # a term the owning (compacted) segment lacks but the fresh segment
    # knows: merged parity requires df = federation df with its idf set,
    # tf = 0, contribution 0 — not idf: null
    exp_fed = fed.explain_payload("def freshsegmentonly",
                                  int(pdf.iloc[5]["doc_id"]))
    assert exp_fed == ref.explain_payload("def freshsegmentonly",
                                          int(pdf.iloc[5]["doc_id"]))
    fresh_ent = [e for e in exp_fed["terms"]
                 if e["term"] == "freshsegmentonly"][0]
    assert fresh_ent["df"] == 1 and fresh_ent["idf"] is not None
    assert fresh_ent["tf"] == 0 and fresh_ent["contribution"] == 0.0

    # NRT reopen: compaction consumes the partials, refresh swaps the view
    gen2 = compact_incremental(spark, work, out, partitions=4)
    assert fed.refresh() == [gen2]
    for cargs in checks:
        assert fed.search_payload(**cargs) == ref.search_payload(**cargs), \
            ("post-refresh", cargs)
    fed.close()
    ref.close()
