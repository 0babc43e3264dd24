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


def test_langid_single_scan_no_shuffle(spark):
    """langid_ngram must be ONE whole-stage-codegen scan: no Exchange, no
    Window, one parquet read."""
    from engine import contract_queries as cq
    plan = _formatted(cq.q_langid_ngram(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("InMemoryFileIndex") == 1, plan


def test_rank_topk_has_no_global_window(spark):
    """bm25_rank's distributed part must contain no partition-less Window
    (the single-partition sort was a 100x-scale killer); top-k arrives via
    TakeOrderedAndProject."""
    from engine import contract_queries as cq
    cq._t(spark, "/root/testdata/sf0.001", "documents") \
        .createOrReplaceTempView("documents")
    scored = spark.sql(cq._bm25_spark_scored_sql(cq.BM25_TERMS))
    topk = scored.orderBy(F.col("score_r").desc(), "doc_id").limit(cq.TOPK)
    plan = _formatted(topk)
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_ivf_assignment_is_partial_agg_not_window(spark):
    """Cell assignment must be a partial-aggregating max_by (map-side
    combine before the exchange), not an NxK window sort."""
    from engine import similarity as sim
    emb = sim._emb(spark, "/root/testdata/sf0.001")
    emb_n = emb.withColumn("nrm", F.sqrt(sim._dot("e", "e")))
    samp = sim.training_sample(emb_n)
    plan = _formatted(sim._assign(emb_n, sim._init_centroids(samp)))
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan or "partial" in plan.lower(), plan


def test_phrase_twins_single_scan_no_shuffle(spark):
    """Both phrase contract twins must stay one scan, zero shuffles —
    single aggregate-fold passes (the filter-over-index-sequence form was
    O(tokens^2)/doc after projection collapse)."""
    from engine import contract_queries as cq
    for fn in (cq.q_phrase_docs, cq.q_phrase_slop_docs):
        plan = _formatted(fn(spark, "/root/testdata/sf0.001"))
        assert "Exchange" not in plan, plan
        assert plan.count("InMemoryFileIndex") == 1, plan


def test_ivf_training_inputs_are_sample_gated(spark):
    """Every input of a Lloyd training step (both the assignment side and
    the centroid side) must sit behind the FIXED-SIZE hash sample —
    training volume is O(sample_size x K), independent of N (VERDICT r3
    #4: the r3 fraction-of-N sample still touched N/2 vectors)."""
    from engine import similarity as sim
    emb = sim._emb(spark, "/root/testdata/sf0.001")
    emb_n = emb.withColumn("nrm", F.sqrt(sim._dot("e", "e")))
    samp = sim.training_sample(emb_n)
    plan = _formatted(sim._lloyd_step(samp, sim._init_centroids(samp)))
    # the md5-hv sample ordering guards BOTH join branches (assignment
    # input and init-centroid input), and each is capped by the FIXED
    # sample_size limit — a top-S, not a fraction of N
    assert plan.count("md5") >= 2, plan
    # TakeOrderedAndProject with Arguments: <sample_size>, [hv ASC, ...]
    assert plan.count(f"Arguments: {sim.IVF_SAMPLE_SIZE}, [hv") >= 2, plan
    # the sample row count is the cap, not a function of N
    assert samp.count() == min(sim.IVF_SAMPLE_SIZE, emb.count())


def test_ngram_shingle_df_cutoff_before_candidate_join(spark):
    """The hot-shingle document-frequency filter must sit BELOW the
    candidate self-join in the plan (the join never sees hot shingles)."""
    from engine import contract_queries as cq
    plan = _formatted(cq.q_ngram_jaccard_pairs(spark, "/root/testdata/sf0.001"))
    assert f"(sdf#" in plan or f"<= {cq.SHINGLE_MAX_DF}" in plan, plan


def test_prefix_expansion_pushes_down(spark, built_index):
    """The wildcard expansion scan must push StringStartsWith into the
    parquet source and read only the term column."""
    from engine.query import SearchEngine
    out, _ = built_index
    eng = SearchEngine(spark, out)
    scan = eng.index_df.where(F.col("term").startswith("de")).select("term")
    plan = _formatted(scan)
    assert "StringStartsWith(term,de)" in plan.replace(" ", "").replace(
        "'", "") or "StartsWith" in plan, plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "postings" not in rs[0], plan


def test_scan_union_pushdown(spark, built_index):
    """The single-scan union parquet must serve its three consumers with
    pushed-down row-kind filters and pruned columns: the docs/aliases
    stages read doc rows without the run blobs, and the index stage reads
    tf-run rows without the metadata columns."""
    out, _ = built_index
    scan = spark.read.parquet(f"{out}/docs_raw")

    docs_view = (scan.where(F.col("doc_id").isNotNull())
                 .select("doc_id", "content_sha256", "doc_len"))
    plan = _formatted(docs_view)
    assert "PushedFilters: [IsNotNull(doc_id)]" in plan, plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for blob in ("ids", "tfs", "pos"):
        assert blob not in rs, rs

    runs_view = (scan.where(F.col("tfs").isNotNull())
                 .select("term", "salt", "n", "ids", "tfs"))
    plan = _formatted(runs_view)
    assert "PushedFilters: [IsNotNull(tfs)]" in plan, plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for meta in ("content_sha256", "snippet", "title"):
        assert meta not in rs, rs


def test_metadata_filter_pushes_to_docs_scan(spark, built_index):
    """The filtered-search doc predicate (query._filters_col) must reach
    the docs parquet scan as PushedFilters and prune the read schema to
    the filter + join columns — a full-metadata read for a lang filter
    would be wrong at 10^12 docs."""
    import os

    from engine.query import _filters_col
    out, _ = built_index
    docs = spark.read.parquet(os.path.join(out, "docs"))
    dl = (docs.where(_filters_col({"lang": "python", "path": "src/pkg3/"},
                                  docs.columns))
          .select("ordinal", F.col("doc_len").cast("double").alias("dl")))
    plan = _formatted(dl)
    assert "EqualTo(lang,python)" in plan, plan
    assert "StringStartsWith(path,src/pkg3/)" in plan, plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "snippet" not in rs[0] and "title" not in rs[0], plan
