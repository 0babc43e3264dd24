"""North-rule requirement: the pipeline runs via `spark-submit --py-files`.
Builds a tiny synthetic index and queries it through the real CLI in a
separate spark-submit process."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_build_and_query(tmp_path):
    zpath = tmp_path / "engine.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "engine")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    idx = str(tmp_path / "idx")
    common = ["spark-submit", "--master", "local[2]",
              "--conf", "spark.ui.enabled=false",
              "--conf", "spark.sql.shuffle.partitions=4",
              "--py-files", str(zpath),
              os.path.join(REPO, "engine", "cli.py")]
    out = subprocess.run(
        common + ["build", "--input", "synthetic:200", "--out", idx],
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(os.path.join(idx, "index", "_SUCCESS"))

    out = subprocess.run(
        common + ["query", "--index", idx, "--query", "def return", "--k", "3"],
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(res) == 3 and res[0]["rank"] == 1

    # rank-identity of the spark-submit result vs the in-process oracle
    from engine.corpus import make_corpus
    from engine.oracle import Bm25Oracle
    pdf = make_corpus(200)
    oracle = Bm25Oracle(dict(zip(pdf["doc_id"], pdf["content"])))
    want = oracle.topk("def return", 3, "ranked")
    assert [(r["rank"], r["doc_id"], r["score"]) for r in res] == want
