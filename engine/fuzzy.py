"""Fuzzy term matching (edit distance <= 1) — `term~` queries.

The reference has no fuzzy surface (Searcher.java matches exact terms
only); Lucene's FuzzyQuery walks a Levenshtein automaton over its FST
dictionary. The Spark-native equivalent of "don't scan the whole
dictionary per query" is the SymSpell deletion-neighborhood table, built
ONCE from the dictionary and probed with equi-lookups:

- build: every dictionary term explodes to itself plus its |term|
  one-character deletions -> ``fuzzy/`` parquet ``(del_key, term, df)``,
  written sorted by del_key so a lookup prunes to the key's row groups.
  ~(avg_len+1) rows per dictionary term — dictionary-sized metadata,
  nothing like the postings.
- query: ED(q, t) <= 1 implies keys(q) ∩ keys(t) != ∅ (delete the
  edited position from whichever side has it; equality trivially shares
  the identity key), so the |q|+1 keys of q fetch a complete candidate
  set via parquet-pushdown IN, and one JVM ``levenshtein`` verify on
  that small slice removes the few ED=2 false candidates (e.g.
  transpositions share deletion keys). Expansion then ranks df DESC,
  term ASC and caps at FUZZY_EXPANSION_CAP — the same deterministic
  overflow rule as wildcard expansion (query.expand_prefix).

Indexes without the artifact fall back to one length-banded dictionary
scan with the same verify + rank rule (``expand_fuzzy`` is semantically
identical either way — test-enforced); ``ensure_fuzzy`` materializes the
stage for any existing index.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .checkpoint import BuildManifest

#: expansion cap — same value and overflow rule as wildcard expansion
FUZZY_EXPANSION_CAP = 64

#: SQL for a term column's deletion neighborhood: the term itself plus
#: every one-character deletion (array_distinct collapses repeats like
#: 'aa' -> 'a' twice)
_KEYS_SQL = ("array_distinct(concat(array(term), "
             "transform(sequence(1, length(term)), "
             "i -> concat(substring(term, 1, i-1), substring(term, i+1)))))")


def deletion_keys(term: str) -> list[str]:
    """Python mirror of _KEYS_SQL (query side + oracles): the term and its
    one-character deletions, deduped, sorted."""
    return sorted({term} | {term[:i] + term[i + 1:]
                            for i in range(len(term))})


def ensure_fuzzy(spark: SparkSession, index_dir: str) -> str:
    """Materialize (once) the deletion-neighborhood table for an index:
    ``index_dir/fuzzy`` = (del_key, term, df), sorted by del_key, stage
    'fuzzy' committed in the manifest. Derived purely from the dictionary,
    so it can be (re)built for any index at dictionary-scan cost."""
    man = BuildManifest(index_dir)
    if man.is_complete("fuzzy"):
        return man.stage_path("fuzzy")
    t0 = man.begin("fuzzy")
    idx = spark.read.parquet(os.path.join(index_dir, "index"))
    from pyspark.sql import Observation
    obs = Observation("fuzzy_rows")
    tbl = (idx.select("term", "df")
           .select(F.explode(F.expr(_KEYS_SQL)).alias("del_key"),
                   "term", "df")
           # global sort by del_key: lookups prune to the key's row groups
           .sort("del_key")
           .observe(obs, F.count(F.lit(1)).alias("rows")))
    tbl.write.mode("overwrite").parquet(man.stage_path("fuzzy"))
    man.commit("fuzzy", t0, int(obs.get["rows"] or 0))
    return man.stage_path("fuzzy")


def _rank_cap(df, cap: int) -> list[str]:
    rows = (df.orderBy(F.col("df").desc(), F.col("term"))
            .select("term").limit(cap).collect())
    return sorted(r["term"] for r in rows)


def expand_fuzzy(spark: SparkSession, index_dir: str, term: str,
                 index_df=None, cap: int = FUZZY_EXPANSION_CAP
                 ) -> list[str]:
    """Dictionary terms within edit distance 1 of ``term`` (itself
    included when present), df-ranked and capped like wildcard expansion.
    Uses the fuzzy stage when built (pushdown IN over |term|+1 deletion
    keys + JVM levenshtein verify on the candidate slice); otherwise one
    length-banded dictionary scan with the identical verify + rank rule."""
    if not term:
        raise ValueError("empty fuzzy term")
    man = BuildManifest(index_dir)
    if man.is_complete("fuzzy"):
        cand = (spark.read.parquet(man.stage_path("fuzzy"))
                .where(F.col("del_key").isin(deletion_keys(term)))
                .where(F.levenshtein(F.col("term"), F.lit(term)) <= 1)
                .select("term", "df").distinct())
        return _rank_cap(cand, cap)
    if index_df is None:
        index_df = spark.read.parquet(os.path.join(index_dir, "index"))
    return expand_fuzzy_scan(index_df, term, cap=cap)


def expand_fuzzy_scan(index_df, term: str,
                      cap: int = FUZZY_EXPANSION_CAP) -> list[str]:
    """The artifact-free expansion: one dictionary scan, length-banded
    (|len(t) - len(q)| <= 1 is necessary for ED <= 1) then JVM
    levenshtein — correct for any index, linear in dictionary size
    (the fuzzy stage is the scale path; this is the fallback and the
    federation default, where segments are ephemeral)."""
    if not term:
        raise ValueError("empty fuzzy term")
    n = len(term)
    cand = (index_df
            .where(F.length("term").between(n - 1, n + 1))
            .where(F.levenshtein(F.col("term"), F.lit(term)) <= 1)
            .select("term", "df"))
    return _rank_cap(cand, cap)


def expand_fuzzy_federated(idx_dfs: list, term: str,
                           cap: int = FUZZY_EXPANSION_CAP) -> list[str]:
    """Fuzzy expansion over a federation's UNION dictionary — per-segment
    dfs integer-sum to the federation-wide df before the shared rank+cap
    rule (same summation as wildcard/suggest federation)."""
    if not term:
        raise ValueError("empty fuzzy term")
    from functools import reduce
    n = len(term)
    u = reduce(lambda a, b: a.unionByName(b),
               [idx.where(F.length("term").between(n - 1, n + 1))
                .where(F.levenshtein(F.col("term"), F.lit(term)) <= 1)
                .select("term", "df") for idx in idx_dfs])
    return _rank_cap(u.groupBy("term").agg(F.sum("df").alias("df")), cap)


# ------------------------------------------------------------- did-you-mean

def _best_per_qterm(cand) -> dict[str, str]:
    """Deterministic best suggestion per query term: df DESC, term ASC —
    the same overflow/rank rule as wildcard and fuzzy expansion. The
    window partitions a tiny post-join candidate frame (<= a few dozen
    rows per typo), never corpus data."""
    from pyspark.sql import Window
    w = (Window.partitionBy("qterm")
         .orderBy(F.col("df").desc(), F.col("term").asc()))
    rows = (cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).select("qterm", "term").collect())
    return {r["qterm"]: r["term"] for r in rows}


def _correct_scan(dic_df, missing: list[str]) -> dict[str, str]:
    """Artifact-free correction: one length-banded dictionary scan
    broadcast-joined to ALL missing terms at once (|len| difference <= 1
    is necessary for ED <= 1, so the band prunes the scan)."""
    spark = dic_df.sparkSession
    qdf = spark.createDataFrame([(t,) for t in missing], "qterm string")
    lo = min(len(t) for t in missing) - 1
    hi = max(len(t) for t in missing) + 1
    cand = (dic_df.where(F.length("term").between(lo, hi))
            .select("term", "df")
            .join(F.broadcast(qdf),
                  F.levenshtein(F.col("term"), F.col("qterm")) <= 1)
            .select("qterm", "term", "df"))
    return _best_per_qterm(cand)


def correct_terms(spark: SparkSession, index_dir: str, terms: list[str],
                  index_df=None) -> dict[str, str]:
    """Spell correction for a query's term list: every term MISSING from
    the dictionary maps to its best ED<=1 dictionary replacement
    (df DESC, term ASC); terms the index knows are never second-guessed
    (the conservative missing-terms-only mode, like Lucene's spellchecker
    default). One batched job for the whole query: with the fuzzy stage,
    a pushdown IN over the union of all missing terms' deletion keys +
    one broadcast join; without it, one length-banded dictionary scan
    (_correct_scan). Terms with no candidate are absent from the map."""
    uniq = sorted(set(terms))
    if not uniq:
        return {}
    if index_df is None:
        index_df = spark.read.parquet(os.path.join(index_dir, "index"))
    present = {r["term"] for r in (index_df.where(F.col("term").isin(uniq))
                                   .select("term").collect())}
    missing = sorted(set(uniq) - present)
    if not missing:
        return {}
    man = BuildManifest(index_dir)
    if man.is_complete("fuzzy"):
        keys = [(t, kk) for t in missing for kk in deletion_keys(t)]
        qdf = spark.createDataFrame(keys, "qterm string, del_key string")
        cand = (spark.read.parquet(man.stage_path("fuzzy"))
                .where(F.col("del_key").isin(sorted({k for _, k in keys})))
                .join(F.broadcast(qdf), "del_key")
                .where(F.levenshtein(F.col("term"), F.col("qterm")) <= 1)
                .select("qterm", "term", "df").distinct())
        return _best_per_qterm(cand)
    return _correct_scan(index_df, missing)


def correct_terms_federated(idx_dfs: list, terms: list[str]
                            ) -> dict[str, str]:
    """correct_terms over a federation's union dictionary: per-segment
    dfs integer-sum to federation-wide dfs BEFORE the rank rule, and a
    term is 'present' if ANY segment knows it (exactly the federated
    suggest/fuzzy df semantics)."""
    from functools import reduce
    uniq = sorted(set(terms))
    if not uniq:
        return {}
    dic = (reduce(lambda a, b: a.unionByName(b),
                  [idx.select("term", "df") for idx in idx_dfs])
           .groupBy("term").agg(F.sum("df").alias("df")))
    present = {r["term"] for r in (dic.where(F.col("term").isin(uniq))
                                   .select("term").collect())}
    missing = sorted(set(uniq) - present)
    if not missing:
        return {}
    return _correct_scan(dic, missing)


def apply_corrections(query_text: str, corrections: dict[str, str]
                      ) -> str | None:
    """Rewrite the (already filter-stripped) query text with the
    correction map, preserving token order and multiplicity; returns the
    NORMALIZED corrected query (tokenizer output joined by spaces), or
    None when nothing changed."""
    from .tokenizer import tokenize
    toks = tokenize(query_text)
    out = [corrections.get(t, t) for t in toks]
    return " ".join(out) if out != toks else None
