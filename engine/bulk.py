"""Bulk (batch) query evaluation — a whole query SET answered as ONE
distributed dataflow.

The reference serves exactly one query per HTTP request (Searcher.java:29
handles a single `?q=`), so an offline consumer — relevance evaluation,
query-log replay, mining (query, doc) training pairs for a ranker — must
loop requests: O(Q) engine round-trips, O(Q) Spark jobs here. This module
evaluates the set in one plan:

  queries (qid, query)
    -> tokenize with the SAME vectorized kernel as the index build
       (tokenizer.tokenize_series — one term-space authority)
    -> (qid, term) rows, per-query set semantics (matches
       tokenizer.query_terms' HashSet dedup)
    -> posting blobs decoded ONCE per matched term (not once per query),
       then fanned out to queries by a SALTED (term, ordinal%%S) join so a
       hot term shared by many queries spreads across S reducers instead
       of serializing on one (the stopword-skew defusal of the index
       build, applied to the read path)
    -> per-(qid, ordinal) BM25 with the exact sorted-term float64 op
       order of SearchEngine/search_big — scores are BITWISE equal to
       looping SearchEngine.search (tests assert it)
    -> two-phase top-k: an Arrow-batch partial top-k keeps <= k rows per
       (qid, batch), then a per-qid window ranks the few survivors — no
       global single-partition window, no driver-side re-rank
    -> ordinal -> external doc_id via the docs snapshot (inner join; the
       top-k side is tiny and AQE broadcasts it).

Scale: the only data-sized shuffles are the postings fan-out (inherent —
its output volume is Σ_q matched postings) and the doc-length join; the
top-k reduction moves at most k rows per (qid, upstream partition).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .codec import decode_postings
from .index_build import load_stats
from .query import _bm25_contrib_col, _filters_col
from .tokenizer import tokenize_series

#: salt fan-out of the postings->queries join (bounds the per-reducer row
#: count of a hot term shared by a hot query batch to df/S); results are
#: salt-count invariant (test-enforced)
BULK_SALTS = 8


def _tokenize_queries(queries: DataFrame) -> DataFrame:
    """(qid, query) -> (qid, term), per-query SET semantics (each term once
    per qid — tokenizer.query_terms parity). qids must be unique (one row
    per query), so the dedup is row-local: no shuffle."""

    def tok(batches):
        for pdf in batches:
            lists = tokenize_series(pdf["query"].astype("string"))
            ex = (pd.DataFrame({"qid": pdf["qid"].to_numpy(np.int64),
                                "term": lists.to_numpy()})
                  .explode("term")            # vectorized flatten
                  .dropna(subset=["term"])    # empty-token queries
                  .drop_duplicates())         # per-query set semantics
            if len(ex):
                yield pd.DataFrame(
                    {"qid": ex["qid"].to_numpy(np.int64),
                     "term": ex["term"].astype(str)})

    return queries.mapInPandas(tok, schema="qid long, term string")


def _decode_matched(index_df: DataFrame, terms_df: DataFrame) -> DataFrame:
    """Posting blobs of exactly the terms present in the query batch,
    decoded once per term -> (term, ordinal, tf). The semi-join keeps the
    scan term-pruned; blobs never fan out to queries undecoded."""
    matched = (index_df.join(terms_df, "term", "leftsemi")
               .select("term", "postings"))

    def dec(batches):
        for pdf in batches:
            outs = []
            for term, blob in zip(pdf["term"], pdf["postings"]):
                ids, tfs = decode_postings(bytes(blob))
                if ids.size:
                    outs.append(pd.DataFrame(
                        {"term": term, "ordinal": ids,
                         "tf": tfs.astype(np.float64)}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return matched.mapInPandas(
        dec, schema="term string, ordinal long, tf double")


def _partial_topk_factory(k: int, score_col: str):
    """Arrow-batch partial top-k per qid: every global top-k row lives in
    some batch and survives that batch's local head(k), so the union of
    per-batch heads is a superset of the global top-k — an exact partial
    reduction (the classic two-phase top-k, batch-local phase)."""

    cols = ["qid", score_col, "ordinal"]

    def partial(batches):
        for pdf in batches:
            if len(pdf):
                yield (pdf.sort_values(["qid", score_col, "ordinal"],
                                       ascending=[True, False, True])
                       .groupby("qid", sort=False).head(k)[cols])

    return partial


def bulk_topk(spark: SparkSession, index_dir: str, queries,
              k: int = 10, mode: str = "ranked", rounded: bool = False,
              index_df: DataFrame | None = None,
              docs_df: DataFrame | None = None,
              filters: dict[str, str] | None = None,
              salts: int = BULK_SALTS) -> DataFrame:
    """Top-k BM25 results for every query in `queries` as one job.

    queries: DataFrame (qid long, query string) with unique qids, or a
    list of (qid, query) tuples. Returns a DataFrame
    (qid, doc_id, rank, score|score_r) — per query identical (bitwise,
    raw mode) to SearchEngine.search(query, k, mode): same BM25 weights,
    same sorted-term accumulation order, same (score DESC, ordinal ASC)
    tie-break, same drop-the-query semantics when a conjunctive term is
    missing from the dictionary. rounded=True ranks by round(score, 6)
    (F.round HALF_UP — identical ordering to the DuckDB oracle's round()
    for positive scores, see query.py rounded notes).

    filters: metadata restriction (lang:/repo:/path: — tokenizer.FILTER
    fields) applied to ALL queries in the batch; stats stay as built
    (Lucene filter-query semantics, same as search_big).
    """
    if isinstance(queries, (list, tuple)):
        queries = spark.createDataFrame(list(queries),
                                        "qid long, query string")
    n_docs, avgdl = load_stats(spark, index_dir)
    if index_df is None:
        index_df = spark.read.parquet(os.path.join(index_dir, "index"))
    if docs_df is None:
        docs_df = spark.read.parquet(os.path.join(index_dir, "docs"))
    if k <= 0:
        return spark.createDataFrame(
            [], "qid long, doc_id long, rank long, "
                + ("score_r double" if rounded else "score double"))

    qterms = _tokenize_queries(queries)
    terms_df = qterms.select("term").distinct()

    # per-term idf under THIS index's stats (engine op order:
    # ln((N - df + 0.5) / (df + 0.5) + 1.0), float64 throughout)
    matched_meta = (index_df.join(terms_df, "term", "leftsemi")
                    .select("term", "df"))
    idf_df = matched_meta.select(
        "term",
        F.log((F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
              / (F.col("df") + F.lit(0.5)) + F.lit(1.0)).alias("idf"))

    # decode once per term, decorate with doc_len BEFORE the query fan-out
    # (one dl join per posting, not per (posting, query))
    posts = _decode_matched(index_df, terms_df)
    dl_src = docs_df
    if filters:
        dl_src = docs_df.where(_filters_col(filters, docs_df.columns))
    dl = dl_src.select("ordinal", F.col("doc_len").cast("double").alias("dl"))
    posts = posts.join(dl, "ordinal")  # inner: filtered docs drop here

    # salted fan-out join to queries: posting rows split by ordinal%%S,
    # query-term rows replicated S ways -> a hot (term x query-batch)
    # pair occupies S reducers, not one
    salts = max(1, int(salts))
    posts_s = posts.withColumn(
        "salt", F.pmod(F.col("ordinal"), F.lit(salts)).cast("int"))
    qts = qterms.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(salts)])))
    fan = (posts_s.join(qts, ["term", "salt"])
           .join(idf_df, "term")
           .withColumn("contrib", _bm25_contrib_col(avgdl)))

    # per-(qid, doc) score: fold in sorted-term order (bitwise parity with
    # SearchEngine._score / search_big's sorted term_idx accumulation)
    scored = (fan.groupBy("qid", "ordinal")
              .agg(F.count(F.lit(1)).alias("nt"),
                   F.aggregate(
                       F.sort_array(F.collect_list(
                           F.struct("term", "contrib"))),
                       F.lit(0.0),
                       lambda acc, x: acc + x["contrib"]).alias("score")))
    if mode == "conjunctive":
        # required = the query's FULL distinct term count (missing
        # dictionary terms included, so any missing term empties the qid —
        # SearchEngine returns [] when len(meta) < len(terms))
        need = qterms.groupBy("qid").agg(F.count(F.lit(1)).alias("need"))
        scored = (scored.join(need, "qid")
                  .where(F.col("nt") == F.col("need"))
                  .drop("need"))
    elif mode != "ranked":
        raise ValueError(f"unknown mode: {mode}")

    score_col = "score"
    if rounded:
        score_col = "score_r"
        scored = (scored.withColumn("score_r", F.round("score", 6))
                  .drop("score"))
    scored = scored.select("qid", score_col, "ordinal")

    part = scored.mapInPandas(
        _partial_topk_factory(k, score_col),
        schema=f"qid long, {score_col} double, ordinal long")
    w = (Window.partitionBy("qid")
         .orderBy(F.col(score_col).desc(), F.col("ordinal").asc()))
    topk = (part.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))

    # ordinal -> external doc_id; topk is <= k x Q rows (AQE broadcasts it)
    return (topk.join(docs_df.select("ordinal", "doc_id"), "ordinal")
            .select("qid", "doc_id", F.col("rank").cast("long").alias("rank"),
                    score_col))


# ------------------------------------------------------ training-pair mining

#: oversampling factor of the random-negative hash pool: expected pool size
#: is OVERSAMPLE x n_rand, so the chance the pool underfills after the
#: positive-pair exclusion is negligible while the per-qid sort stays O(n)
PAIR_HASH_OVERSAMPLE = 8


def mine_training_pairs(spark: SparkSession, index_dir: str, queries,
                        k_pos: int = 10, n_hard: int = 10, n_rand: int = 0,
                        rounded: bool = False,
                        index_df: DataFrame | None = None,
                        docs_df: DataFrame | None = None,
                        salts: int = BULK_SALTS) -> DataFrame:
    """(query, doc) training pairs for retriever/ranker training — the
    standard BM25-mining recipe (DPR-style) as one distributed job:

    - positives: the BM25 top-k_pos per query (label 1, kind 'pos');
    - hard negatives: ranks k_pos+1 .. k_pos+n_hard — high-scoring
      non-positives, the negatives that actually teach a ranker a
      decision boundary (label 0, kind 'hard');
    - random negatives: n_rand docs per query drawn from a DETERMINISTIC
      md5(doc_id) hash pool (label 0, kind 'rand', score null). The pool
      filter (hash-prefix < threshold sized for OVERSAMPLE x n_rand
      expected rows) pushes to the docs scan, so the candidate set is
      ~8 x n_rand rows, not N; per query the n_rand smallest hashes
      outside that query's mined prefix win (hash ASC, doc_id ASC) —
      reproducible across engines/retries like every sampler here
      (md5, never df.sample).

    Returns (qid, doc_id, label int, kind string, score double|null).
    Scores are the engine's exact BM25 (bitwise equal to
    SearchEngine.search — the bulk_topk guarantee).
    """
    if isinstance(queries, (list, tuple)):
        queries = spark.createDataFrame(list(queries),
                                        "qid long, query string")
    if docs_df is None:
        docs_df = spark.read.parquet(os.path.join(index_dir, "docs"))
    mined = bulk_topk(spark, index_dir, queries, k=k_pos + n_hard,
                      rounded=rounded, index_df=index_df, docs_df=docs_df,
                      salts=salts)
    score_col = "score_r" if rounded else "score"
    pairs = mined.select(
        "qid", "doc_id",
        F.when(F.col("rank") <= k_pos, F.lit(1)).otherwise(F.lit(0))
         .alias("label"),
        F.when(F.col("rank") <= k_pos, F.lit("pos")).otherwise(F.lit("hard"))
         .alias("kind"),
        score_col)
    if n_rand <= 0:
        return pairs

    n_docs, _avgdl = load_stats(spark, index_dir)
    p = min(1.0, (PAIR_HASH_OVERSAMPLE * n_rand) / max(1, n_docs))
    thresh = format(min(0xFFFFFFFF, int(p * 16 ** 8)), "08x")
    pool = (docs_df
            .select("doc_id",
                    F.md5(F.col("doc_id").cast("string")).alias("h"))
            .where(F.substring("h", 1, 8) < F.lit(thresh)))
    # pool is ~OVERSAMPLE x n_rand rows -> broadcast against the query ids
    cand = queries.select("qid").join(F.broadcast(pool))
    cand = cand.join(pairs.select("qid", "doc_id"), ["qid", "doc_id"],
                     "left_anti")
    w = (Window.partitionBy("qid")
         .orderBy(F.col("h").asc(), F.col("doc_id").asc()))
    rand = (cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= n_rand)
            .select("qid", "doc_id", F.lit(0).alias("label"),
                    F.lit("rand").alias("kind"),
                    F.lit(None).cast("double").alias(score_col)))
    return pairs.unionByName(rand)
