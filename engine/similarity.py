"""Similarity search over embedding columns — the scale paths.

Brute-force cosine top-k (contract_queries.q_ann_cosine_topk) is the
baseline: an O(Q x N) crossJoin that is exact but unusable at 100 TB. This
module adds the two standard scale paths, both as pure DataFrame plans
(JVM-side dot products via zip_with/aggregate, broadcast dim tables, bucket
equi-joins instead of cross joins):

- **LSH (random hyperplanes)**: 8 sign bits -> 256 buckets; candidates =
  same-bucket equi-join (a shuffle-on-bucket hash join; at scale the bucket
  key is the partitioner, so each candidate set is partition-local).
  Also powers embedding-cosine near-dup pair mining.
- **IVF**: K deterministic centroids (broadcast), one assignment pass
  (argmax cosine), probe the nprobe nearest cells at query time; exact
  re-rank inside probed cells only.

Everything is deterministic (hyperplanes from a fixed seed, centroids = a
fixed vec_id stride) and arithmetic is double-precision with a fixed fold
order, so the DuckDB oracles replicate results bit-for-bit (sims rounded to
6 dp, ranks ordered by the rounded value, ties by vec_id).

Recall note (documented, by design): LSH/IVF are approximate — they return
the exact top-k *within the probed candidate set*. Tests quantify recall
against the brute-force baseline; the contract oracles verify the plumbing
exactly by replicating the same candidate generation in SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_PLANES = 8
DIM = 64
LSH_SEED = 42
IVF_STRIDE = 50          # centroids = vec_id % IVF_STRIDE == 0
IVF_NPROBE = 2
NEARDUP_MIN_SIM = 0.3    # corpus max pairwise cosine is ~0.48


def hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes, rounded so the SQL literal and the
    Spark literal are the same numbers."""
    rng = np.random.default_rng(LSH_SEED)
    return [[round(float(x), 6) for x in rng.standard_normal(DIM)]
            for _ in range(N_PLANES)]


def _dot(a, b):
    """JVM-side dot product with left-to-right fold order (matches DuckDB's
    list_dot_product order, so sign decisions agree bitwise)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    return (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .select("vec_id",
                    F.col("embedding").cast("array<double>").alias("e")))


def with_lsh_bucket(emb: DataFrame) -> DataFrame:
    """Add norm + LSH bucket id (0..2^N_PLANES-1) from hyperplane signs."""
    planes = hyperplanes()
    bucket = F.lit(0)
    for j, h in enumerate(planes):
        harr = F.array(*[F.lit(v) for v in h])
        bit = (_dot(F.col("e"), harr) >= 0).cast("int")
        bucket = bucket + bit * F.lit(1 << j)
    return emb.withColumn("nrm", F.sqrt(_dot("e", "e"))) \
              .withColumn("bucket", bucket)


def lsh_bucket_counts(spark, sf_dir) -> DataFrame:
    return (with_lsh_bucket(_emb(spark, sf_dir))
            .groupBy("bucket").agg(F.count("*").alias("n_vecs")))


def ann_lsh_topk(spark, sf_dir, query_ids: list[int], k: int) -> DataFrame:
    """Top-k within the query's LSH bucket: bucket equi-join (no crossJoin)
    + exact cosine + windowed rank. The bucket join is the scale path — at
    10^9 vectors only same-bucket pairs shuffle."""
    from pyspark.sql import Window
    sig = with_lsh_bucket(_emb(spark, sf_dir))
    q = (sig.where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
                 F.col("nrm").alias("qn"), "bucket"))
    cand = (F.broadcast(q).join(sig, "bucket")
            .where(F.col("vec_id") != F.col("qid"))
            .withColumn("sim", F.round(
                _dot("qe", "e") / (F.col("qn") * F.col("nrm")), 6)))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(),
                                          F.col("vec_id"))
    return (cand.withColumn("rank",
                            F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("qid", "rank", "vec_id", "sim"))


def neardup_pairs_lsh(spark, sf_dir, min_sim: float = NEARDUP_MIN_SIM
                      ) -> DataFrame:
    """Embedding-cosine near-dup mining: same-bucket pairs (ida < idb) with
    cosine >= min_sim. Candidate generation is the bucket self-join — the
    O(N^2) crossJoin never happens."""
    sig = with_lsh_bucket(_emb(spark, sf_dir))
    a = sig.select("bucket", F.col("vec_id").alias("ida"),
                   F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = sig.select("bucket", F.col("vec_id").alias("idb"),
                   F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    return (a.join(b, "bucket").where(F.col("ida") < F.col("idb"))
            .withColumn("sim", F.round(
                _dot("ea", "eb") / (F.col("na") * F.col("nb")), 6))
            .where(F.col("sim") >= min_sim)
            .select("ida", "idb", "sim"))


def _centroids0(emb: DataFrame) -> DataFrame:
    """Deterministic k-means INIT: every IVF_STRIDE-th vector. Small ->
    broadcast."""
    return (emb.where(F.col("vec_id") % IVF_STRIDE == 0)
            .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
            .withColumn("cn", F.sqrt(_dot("ce", "ce"))))


def _assign(emb_n: DataFrame, cents: DataFrame) -> DataFrame:
    """One assignment pass: broadcast the centroid table, argmax rounded
    cosine (ties -> lowest cid) via groupBy + max_by — a partial-aggregating
    sort-free plan. The previous Window.partitionBy(vec_id) + row_number
    shuffled AND sorted all N x K scored rows; max_by map-side-combines
    them down to one row per vector before the exchange."""
    scored = (emb_n.crossJoin(F.broadcast(cents))
              .withColumn("csim", F.round(
                  _dot("e", "ce") / (F.col("nrm") * F.col("cn")), 6)))
    best = (scored.groupBy("vec_id")
            .agg(F.max_by(
                F.struct("e", "nrm", "cid"),
                F.struct(F.col("csim"), (-F.col("cid")).alias("nc")))
                .alias("x")))
    return best.select("vec_id", "x.e", "x.nrm",
                       F.col("x.cid").alias("cell"))


def trained_centroids(emb: DataFrame) -> DataFrame:
    """One Lloyd refinement over the init centroids, expressed relationally
    so the DuckDB oracle replicates it bit-for-bit: assign every vector to
    its nearest init centroid, then the trained centroid of each cell is
    the element-wise mean of its members (each component rounded to 6 dp —
    the literal the two engines agree on). At 10^12 scale this pass runs
    over a sample; the plan shape (broadcast cents, explode -> (cell, pos)
    partial-agg mean) is the scale shape either way."""
    emb_n = emb.withColumn("nrm", F.sqrt(_dot("e", "e")))
    a0 = _assign(emb_n, _centroids0(emb))
    means = (a0.select("cell", F.posexplode("e").alias("pos", "v"))
             .groupBy("cell", "pos")
             .agg(F.round(F.avg("v"), 6).alias("m")))
    return (means.groupBy("cell")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("ce"))
            .select(F.col("cell").alias("cid"), "ce")
            .withColumn("cn", F.sqrt(_dot("ce", "ce"))))


def with_ivf_cell(emb: DataFrame) -> DataFrame:
    """Final assignment against the TRAINED centroids."""
    emb_n = emb.withColumn("nrm", F.sqrt(_dot("e", "e")))
    return _assign(emb_n, trained_centroids(emb))


def ivf_cells(spark, sf_dir) -> DataFrame:
    assigned, _cents = ivf_index(spark, sf_dir)
    return assigned.groupBy("cell").agg(F.count("*").alias("n_vecs"))


def materialized_centroids(spark, emb: DataFrame) -> DataFrame:
    """Collect the (tiny, deterministic) trained centroid table to the
    driver and re-create it as a literal DataFrame. Every consumer of the
    centroids (assignment, query probes, candidate joins) would otherwise
    re-execute the whole training lineage — init crossJoin + Lloyd mean —
    once PER reuse; K rows of literals cost one job total. This is exactly
    how a trained model table ships on a real cluster (train once, persist,
    broadcast)."""
    rows = trained_centroids(emb).collect()
    return F.broadcast(spark.createDataFrame(
        [(int(r["cid"]), list(r["ce"]), float(r["cn"])) for r in rows],
        "cid long, ce array<double>, cn double"))


_IVF_INDEX: dict[str, tuple] = {}  # sf_dir -> (spark, assigned, cents)


def ivf_index(spark, sf_dir) -> tuple:
    """Build (once per process per sf_dir) the IVF index: trained centroid
    literals + the PERSISTED cell-assignment table. An IVF index is a
    built artifact exactly like the inverted index — train/assign once,
    query many times; without the cache boundary every query's plan
    re-contains (and Catalyst re-compiles, and Spark re-executes) the whole
    training+assignment lineage. persist() here is the cluster-memory
    analog of writing the index to storage (MEMORY_AND_DISK by default)."""
    ent = _IVF_INDEX.get(sf_dir)
    if ent is None or ent[0] is not spark:
        # cache entries are bound to the SparkSession that persisted them;
        # a new session (e.g. after spark.stop()) must rebuild, not hand
        # out DataFrames referencing a dead JVM gateway
        emb = _emb(spark, sf_dir)
        emb_n = emb.withColumn("nrm", F.sqrt(_dot("e", "e")))
        cents = materialized_centroids(spark, emb)
        assigned = _assign(emb_n, cents).persist()
        assigned.count()  # materialize the index
        _IVF_INDEX[sf_dir] = (spark, assigned, cents)
    return _IVF_INDEX[sf_dir][1:]


def ann_ivf_topk(spark, sf_dir, query_ids: list[int], k: int,
                 nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF query: rank centroids per query, probe the top-nprobe cells,
    exact cosine re-rank within probed cells only."""
    from pyspark.sql import Window
    emb = _emb(spark, sf_dir)
    emb_n = emb.withColumn("nrm", F.sqrt(_dot("e", "e")))
    assigned, cents = ivf_index(spark, sf_dir)
    # query vectors come straight from the source (their OWN cell is
    # irrelevant to probing) so the NxK assignment pass runs exactly once —
    # for the candidate join below — instead of three times
    q = (emb_n.where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
                 F.col("nrm").alias("qn")))
    wq = Window.partitionBy("qid").orderBy(F.col("csim").desc(),
                                           F.col("cid"))
    probes = (q.crossJoin(F.broadcast(cents))
              .withColumn("csim", F.round(
                  _dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6))
              .withColumn("prn", F.row_number().over(wq))
              .where(F.col("prn") <= nprobe)
              .select("qid", "qe", "qn", F.col("cid").alias("cell")))
    cand = (F.broadcast(probes).join(assigned, "cell")
            .where(F.col("vec_id") != F.col("qid"))
            .withColumn("sim", F.round(
                _dot("qe", "e") / (F.col("qn") * F.col("nrm")), 6)))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(),
                                          F.col("vec_id"))
    return (cand.withColumn("rank",
                            F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("qid", "rank", "vec_id", "sim"))


# ----------------------------------------------------------------- SQL mirrors

def _sql_lit(vec: list[float]) -> str:
    return "[" + ", ".join(f"{v!r}" for v in vec) + "]"


def lsh_signature_sql() -> str:
    """DuckDB CTE `sig`: vec_id, emb, nrm, bucket — same planes, same fold
    order (list_dot_product), same sign rule."""
    planes = hyperplanes()
    bits = " + ".join(
        f"(case when list_dot_product(emb, {_sql_lit(h)}) >= 0 "
        f"then {1 << j} else 0 end)" for j, h in enumerate(planes))
    return f"""
    sig as (
      select vec_id, embedding::DOUBLE[] as emb,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) as nrm,
             ({bits}) as bucket
      from embeddings)"""


def ivf_assign_sql() -> str:
    """DuckDB CTEs `emb`, `cents` (TRAINED), `assigned` mirroring
    trained_centroids + with_ivf_cell: stride init -> assign -> per-cell
    element-wise mean rounded to 6 dp -> final assignment."""
    return f"""
    emb as (select vec_id, embedding::DOUBLE[] as e,
                   sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])) as nrm
            from embeddings),
    cents0 as (select vec_id as cid, e as ce, nrm as cn from emb
               where vec_id % {IVF_STRIDE} = 0),
    a0 as (
      select vec_id, e, nrm, cid as cell from (
        select emb.vec_id, emb.e, emb.nrm, cents0.cid,
               row_number() over (partition by emb.vec_id
                 order by round(list_dot_product(emb.e, cents0.ce)
                                / (emb.nrm * cents0.cn), 6) desc,
                          cents0.cid) as rn
        from emb cross join cents0) where rn = 1),
    cm as (select cell, p.i as pos,
                  round(avg(e[cast(p.i as int)]), 6) as m
           from a0, unnest(range(1, len(e) + 1)) as p(i)
           group by cell, p.i),
    cl as (select cell as cid, list(m order by pos) as ce
           from cm group by cell),
    cents as (select cid, ce, sqrt(list_dot_product(ce, ce)) as cn
              from cl),
    assigned as (
      select vec_id, e, nrm, cid as cell from (
        select emb.vec_id, emb.e, emb.nrm, cents.cid,
               row_number() over (partition by emb.vec_id
                 order by round(list_dot_product(emb.e, cents.ce)
                                / (emb.nrm * cents.cn), 6) desc,
                          cents.cid) as rn
        from emb cross join cents) where rn = 1)"""


def ann_lsh_multiprobe_topk(spark, sf_dir, query_ids: list[int], k: int
                            ) -> DataFrame:
    """Multi-probe LSH: probe the query's own bucket plus every 1-bit-flip
    neighbor (N_PLANES+1 buckets). The standard recall fix for sign-LSH —
    vectors near a hyperplane land on either side, and flipping one bit
    reaches them — at (P+1)x the candidate cost of single-probe, still a
    bucket equi-join (never a crossJoin). Deterministic, SQL-mirrored."""
    from pyspark.sql import Window
    sig = with_lsh_bucket(_emb(spark, sf_dir))
    probes = F.array(*([F.col("bucket")]
                       + [F.col("bucket").bitwiseXOR(F.lit(1 << j))
                          for j in range(N_PLANES)]))
    q = (sig.where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
                 F.col("nrm").alias("qn"),
                 F.explode(probes).alias("bucket")))
    cand = (F.broadcast(q).join(sig, "bucket")
            .where(F.col("vec_id") != F.col("qid"))
            .withColumn("sim", F.round(
                _dot("qe", "e") / (F.col("qn") * F.col("nrm")), 6)))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(),
                                          F.col("vec_id"))
    return (cand.withColumn("rank",
                            F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("qid", "rank", "vec_id", "sim"))
LSH_N_TABLES = 3


def hyperplanes_table(t: int) -> list[list[float]]:
    """Per-table deterministic hyperplanes; table 0 == hyperplanes()."""
    rng = np.random.default_rng(LSH_SEED + 101 * t)
    return [[round(float(x), 6) for x in rng.standard_normal(DIM)]
            for _ in range(N_PLANES)]


def _bucket_expr(planes) -> "F.Column":
    bucket = F.lit(0)
    for j, h in enumerate(planes):
        harr = F.array(*[F.lit(v) for v in h])
        bit = (_dot(F.col("e"), harr) >= 0).cast("int")
        bucket = bucket + bit * F.lit(1 << j)
    return bucket


def with_lsh_buckets_multi(emb: DataFrame,
                           n_tables: int = LSH_N_TABLES) -> DataFrame:
    """(vec_id, e, nrm, tbl, bucket): one row per (vector, table) — L
    independent hyperplane tables in ONE scan (the standard recall lever:
    P(candidate found) = 1-(1-p^P)^L instead of p^P). Candidates still
    come from bucket equi-joins keyed (tbl, bucket); cost is L x the
    single-table join, never a crossJoin."""
    emb = emb.withColumn("nrm", F.sqrt(_dot("e", "e")))
    entries = F.array(*[
        F.struct(F.lit(t).alias("tbl"),
                 _bucket_expr(hyperplanes_table(t)).alias("bucket"))
        for t in range(n_tables)])
    return (emb.select("vec_id", "e", "nrm",
                       F.explode(entries).alias("p"))
            .select("vec_id", "e", "nrm", "p.tbl", "p.bucket"))


def ann_lsh_multitable_topk(spark, sf_dir, query_ids: list[int], k: int,
                            n_tables: int = LSH_N_TABLES) -> DataFrame:
    """Multi-table LSH ANN: union of same-bucket candidates over L
    independent tables (deduped), exact cosine re-rank. Table 0 uses the
    single-table planes, so the candidate set is a strict superset of
    ann_lsh_topk's — recall can only go up (test-enforced)."""
    from pyspark.sql import Window
    sig = with_lsh_buckets_multi(_emb(spark, sf_dir), n_tables)
    q = (sig.where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
                 F.col("nrm").alias("qn"), "tbl", "bucket"))
    cand = (F.broadcast(q).join(sig, ["tbl", "bucket"])
            .where(F.col("vec_id") != F.col("qid"))
            .groupBy("qid", "vec_id")   # dedup across tables
            .agg(F.round(F.max(_dot("qe", "e") / (F.col("qn") * F.col("nrm"))),
                         6).alias("sim")))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(),
                                          F.col("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("qid", "rank", "vec_id", "sim"))


def lsh_multitable_sql(n_tables: int = LSH_N_TABLES) -> str:
    """DuckDB CTE `msig`: vec_id, emb, nrm, tbl, bucket — union over tables."""
    parts = []
    for t in range(n_tables):
        bits = " + ".join(
            f"(case when list_dot_product(emb, {_sql_lit(h)}) >= 0 "
            f"then {1 << j} else 0 end)"
            for j, h in enumerate(hyperplanes_table(t)))
        parts.append(
            f"select vec_id, embedding::DOUBLE[] as emb, "
            f"sqrt(list_dot_product(embedding::DOUBLE[], "
            f"embedding::DOUBLE[])) as nrm, {t} as tbl, ({bits}) as bucket "
            f"from embeddings")
    return "msig as (" + " union all ".join(parts) + ")"
