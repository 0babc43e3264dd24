"""Training-pair mining (engine/bulk.py mine_training_pairs): positives =
BM25 top-k, hard negatives = next-n ranks (both bitwise vs the engine
loop), random negatives = deterministic md5 pool recomputed here with
hashlib as the independent oracle."""

import hashlib
import os

import pytest

from engine.bulk import PAIR_HASH_OVERSAMPLE, mine_training_pairs
from engine.query import SearchEngine


QUERIES = [(0, "def return"), (1, "identifier_40"), (2, "class import")]
K_POS, N_HARD, N_RAND = 5, 5, 4


@pytest.fixture(scope="module")
def mined(spark, built_index):
    idx, _ = built_index
    df = mine_training_pairs(spark, idx, QUERIES, k_pos=K_POS,
                             n_hard=N_HARD, n_rand=N_RAND)
    return idx, df.collect()


def _group(rows, kind):
    out = {}
    for r in rows:
        if r["kind"] == kind:
            out.setdefault(int(r["qid"]), []).append(r)
    return out


def test_pos_and_hard_match_engine_loop(spark, mined):
    idx, rows = mined
    eng = SearchEngine(spark, idx)
    pos, hard = _group(rows, "pos"), _group(rows, "hard")
    for qid, q in QUERIES:
        want = eng.search(q, k=K_POS + N_HARD)
        wpos = {(d, s) for r, d, s in want if r <= K_POS}
        whard = {(d, s) for r, d, s in want if r > K_POS}
        assert {(r["doc_id"], r["score"]) for r in pos[qid]} == wpos
        assert {(r["doc_id"], r["score"]) for r in hard[qid]} == whard
        assert all(r["label"] == 1 for r in pos[qid])
        assert all(r["label"] == 0 for r in hard[qid])


def test_random_negatives_match_hashlib_oracle(spark, mined, built_index):
    idx, rows = mined
    docs = spark.read.parquet(os.path.join(idx, "docs"))
    n_docs = docs.count()
    all_ids = [int(r["doc_id"]) for r in docs.select("doc_id").collect()]
    p = min(1.0, (PAIR_HASH_OVERSAMPLE * N_RAND) / n_docs)
    thresh = format(min(0xFFFFFFFF, int(p * 16 ** 8)), "08x")
    pool = sorted(
        ((hashlib.md5(str(d).encode()).hexdigest(), d) for d in all_ids
         if hashlib.md5(str(d).encode()).hexdigest()[:8] < thresh))
    mined_pairs = {(int(r["qid"]), int(r["doc_id"]))
                   for r in rows if r["kind"] != "rand"}
    rand = _group(rows, "rand")
    for qid, _q in QUERIES:
        want = [d for h, d in pool if (qid, d) not in mined_pairs][:N_RAND]
        got = sorted((int(r["doc_id"]) for r in rand[qid]),
                     key=lambda d: hashlib.md5(str(d).encode()).hexdigest())
        assert got == want, f"qid={qid}"
        assert all(r["label"] == 0 and r["score"] is None
                   for r in rand[qid])


def test_rand_disjoint_from_mined(mined):
    _idx, rows = mined
    mined_pairs = {(int(r["qid"]), int(r["doc_id"]))
                   for r in rows if r["kind"] != "rand"}
    rand_pairs = {(int(r["qid"]), int(r["doc_id"]))
                  for r in rows if r["kind"] == "rand"}
    assert not (mined_pairs & rand_pairs)
    assert len(rand_pairs) == N_RAND * len(QUERIES)


def test_deterministic_across_invocations(spark, mined):
    idx, rows = mined
    again = mine_training_pairs(spark, idx, QUERIES, k_pos=K_POS,
                                n_hard=N_HARD, n_rand=N_RAND).collect()
    key = lambda r: (r["qid"], r["kind"], r["doc_id"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))
