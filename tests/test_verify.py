"""Index-integrity verifier (engine/verify_index.py).

Strategy: build one clean index+positions, assert the verifier reports all
zeros; then for each corruption class, copy the index, surgically damage ONE
artifact with pyarrow (the way a bad node / truncated write / buggy merge
would), and assert exactly the matching check fires."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.codec import varint_encode
from engine.verify_index import verify_index


@pytest.fixture(scope="module")
def clean_index(spark, fixture_corpus_pdf, tmp_path_factory):
    from engine.corpus import corpus_to_spark
    from engine.index_build import build_index
    from engine.positions import build_positions
    out = str(tmp_path_factory.mktemp("verify") / "idx")
    corpus_df = corpus_to_spark(spark, fixture_corpus_pdf)
    build_index(spark, corpus_df, out, n_salts=4, partitions=8)
    build_positions(spark, corpus_df, out, n_salts=4, partitions=8)
    return out


def _copy(base: str, tmp_path, name: str) -> str:
    dst = str(tmp_path / name)
    shutil.copytree(base, dst)
    return dst


def _mutate_stage(index_dir: str, stage: str, fn) -> None:
    """Read a stage's parquet rows, apply fn(rows) in place, rewrite as one
    file with the ORIGINAL schema (so Spark sees identical types)."""
    d = os.path.join(index_dir, stage)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    tbl = pa.concat_tables([pq.read_table(os.path.join(d, f))
                            for f in files])
    rows = tbl.to_pylist()
    fn(rows)
    for f in files:
        os.remove(os.path.join(d, f))
    pq.write_table(pa.Table.from_pylist(rows, schema=tbl.schema),
                   os.path.join(d, "part-00000-mutated.parquet"))


def _fat_row(rows, min_df=2):
    """Index of a posting row with >= min_df postings."""
    for i, r in enumerate(rows):
        if r["df"] >= min_df:
            return i
    raise AssertionError("fixture index has no multi-posting term")


def test_clean_index_verifies(spark, clean_index):
    rep = verify_index(spark, clean_index, deep=True)
    assert rep["ok"], rep
    assert rep["n_docs"] > 0 and rep["n_terms"] > 0
    bad = {k: v for k, v in rep["checks"].items() if v}
    assert bad == {}
    # every family ran: index, docs, aliases, positions, deep
    for probe in ("index_df_mismatch", "docs_ordinal_not_dense",
                  "alias_canonical_missing", "pos_term_totals_mismatch",
                  "deep_tf_mass_mismatch"):
        assert probe in rep["checks"]


def test_df_and_stats_mismatch(spark, clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "df")

    def corrupt(rows):
        rows[0]["df"] += 1
        rows[1]["total_tf"] += 2
        rows[2]["max_tf"] += 1

    _mutate_stage(idx, "index", corrupt)
    rep = verify_index(spark, idx)
    assert not rep["ok"]
    assert rep["checks"]["index_df_mismatch"] == 1
    assert rep["checks"]["index_total_tf_mismatch"] == 1
    assert rep["checks"]["index_max_tf_mismatch"] == 1


def test_unsorted_and_truncated_blob(spark, clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "blob")

    def corrupt(rows):
        # deltas (3, then 0) -> ordinals [3, 3]: duplicate/unsorted
        rows[0]["postings"] = varint_encode(
            np.array([3, 1, 0, 2], dtype=np.uint64))
        i = _fat_row(rows[1:]) + 1
        rows[i]["postings"] = rows[i]["postings"][:-1]  # truncated write

    _mutate_stage(idx, "index", corrupt)
    rep = verify_index(spark, idx)
    assert not rep["ok"]
    assert rep["checks"]["index_unsorted_ordinals"] >= 1
    assert rep["checks"]["index_decode_error"] == 1


def test_block_meta_and_duplicate_term(spark, clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "blk")

    def corrupt(rows):
        rows[0]["block_max_tfs"] = [t + 1 for t in rows[0]["block_max_tfs"]]
        rows.append(dict(rows[1]))  # a term emitted twice by a buggy merge

    _mutate_stage(idx, "index", corrupt)
    rep = verify_index(spark, idx)
    assert not rep["ok"]
    assert rep["checks"]["index_block_meta_mismatch"] == 1
    assert rep["checks"]["index_duplicate_term"] == 1


def test_docs_dense_ordinals_and_manifest(spark, clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "docs")

    def corrupt(rows):
        rows[1]["ordinal"] = rows[0]["ordinal"]  # collision -> not dense
        rows[2]["doc_len"] += 5                  # drifts from manifest

    _mutate_stage(idx, "docs", corrupt)
    rep = verify_index(spark, idx, deep=True)
    assert not rep["ok"]
    assert rep["checks"]["docs_ordinal_not_dense"] == 1
    assert rep["checks"]["docs_total_len_vs_manifest"] == 1
    assert rep["checks"]["deep_tf_mass_mismatch"] >= 1


def test_alias_integrity(spark, clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "alias")
    docs = pq.read_table(os.path.join(idx, "docs")).to_pylist()

    def corrupt(rows):
        # an alias whose canonical vanished AND whose doc_id leaked into docs
        rows.append({"doc_id": docs[0]["doc_id"],
                     "canonical_doc_id": 999_999_999_999})

    _mutate_stage(idx, "aliases", corrupt)
    rep = verify_index(spark, idx)
    assert not rep["ok"]
    assert rep["checks"]["alias_canonical_missing"] == 1
    assert rep["checks"]["alias_leaked_into_docs"] == 1


def test_positions_reconcile_vs_index(spark, clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "pos")

    def corrupt(rows):
        rows[0]["n"] += 1                       # internal inconsistency
        dropped = rows.pop(1)                   # a lost block
        assert dropped["term"] != rows[0]["term"]

    _mutate_stage(idx, "positions", corrupt)
    rep = verify_index(spark, idx)
    assert not rep["ok"]
    assert rep["checks"]["pos_n_mismatch"] == 1
    # both the inflated term and the dropped block disagree with the tf index
    assert rep["checks"]["pos_term_totals_mismatch"] >= 2


def test_cli_verify_exit_codes(spark, clean_index, tmp_path, capsys):
    from engine import cli
    with pytest.raises(SystemExit) as e:
        cli.main(["verify", "--index", clean_index, "--deep"])
    assert e.value.code == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"]

    idx = _copy(clean_index, tmp_path, "cli")
    _mutate_stage(idx, "index", lambda rows: rows[0].update(
        df=rows[0]["df"] + 1))
    with pytest.raises(SystemExit) as e:
        cli.main(["verify", "--index", idx, "--skip-positions"])
    assert e.value.code == 1
