"""Physical-plan regression guards: the properties that make the engine
scale must be visible in the plan, not just fast today.

- posting fetch pushes the term predicate into the parquet scan
  (PushedFilters) and prunes to the needed columns;
- the index map-stage input joins content with the ordinal map via
  BroadcastHashJoin — the content side is map-only (no Exchange/Sort
  between the source scan and the join);
- the docs-stage heavy branch broadcast-joins ranks back (content never
  shuffles).
"""

from pyspark.sql import functions as F

from engine.index_build import ordinal_content_pairs
from engine.query import SearchEngine


def _formatted(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_posting_fetch_pushdown(spark, built_index):
    out, _ = built_index
    eng = SearchEngine(spark, out)
    scan = eng.index_df.where(F.col("term").isin(["def", "return"]))
    plan = _formatted(scan)
    assert "PushedFilters: [In(term" in plan, plan
    # column pruning: a df-only projection must not read the postings blob
    slim = _formatted(eng.index_df.select("term", "df")
                      .where(F.col("term") == "def"))
    rs = [ln for ln in slim.splitlines() if "ReadSchema" in ln]
    assert rs and "postings" not in rs[0], slim


def test_index_stage_join_is_broadcast(spark, built_index, fixture_corpus_pdf):
    from engine.corpus import corpus_to_spark
    out, _ = built_index
    docs = spark.read.parquet(f"{out}/docs")
    corpus = corpus_to_spark(spark, fixture_corpus_pdf)
    pair = ordinal_content_pairs(corpus, docs, docs.count())
    plan = _formatted(pair)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the content column must not pass through any Exchange: exchanges in
    # this plan may only carry the ordinal-map side (doc_id/ordinal)
    for block in plan.split("\n\n"):
        if block.strip().startswith("(") and "Exchange" in block.split(")")[1][:20]:
            assert "content" not in block, block
