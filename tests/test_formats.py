"""Source formats: a corpus arriving as JSONL or CSV must build an index
byte-identical to the parquet path (the CLI reads all three)."""

import os

from engine import cli
from engine.corpus import corpus_to_spark, make_corpus


def _fingerprint(spark, out):
    rows = (spark.read.parquet(f"{out}/index")
            .select("term", "df", "postings").collect())
    return sorted((r["term"], r["df"], bytes(r["postings"])) for r in rows)


def test_json_and_csv_sources_build_identical(spark, tmp_path):
    pdf = make_corpus(120, seed=41)
    base = corpus_to_spark(spark, pdf).select(
        "repo", "path", "commit", "lang", "content")
    src_pq = str(tmp_path / "src_pq")
    src_js = str(tmp_path / "src_js")
    src_csv = str(tmp_path / "src_csv")
    base.write.parquet(src_pq)
    base.write.json(src_js)
    base.write.option("header", True).option("escape", '"').csv(src_csv)

    outs = {}
    for fmt, src in [("parquet", src_pq), ("json", src_js),
                     ("csv", src_csv)]:
        out = str(tmp_path / f"idx_{fmt}")
        cli.main(["build", "--input", src, "--format", fmt, "--out", out,
                  "--salts", "4", "--partitions", "4"])
        outs[fmt] = _fingerprint(spark, out)
        assert os.path.exists(os.path.join(out, "index", "_SUCCESS"))
    assert outs["json"] == outs["parquet"]
    assert outs["csv"] == outs["parquet"]
