"""Field-boosted ranking — BM25 over (content, path) with a path weight.

The reference scores content only (Searcher.java's TF-IDF reads one
`index` table); every production code-search ranks a filename/path hit
above a body hit (Lucene multi-field query, GitHub code search's path
boost). This module adds that as a SECOND tiny index over the path
tokens the docs snapshot already carries — metadata-sized (a handful of
tokens per doc), so at 10^12 files it is ~1% of the content index and
builds from the ~50 B/doc snapshot without touching content.

Scoring (documented, oracle-mirrored):

    score(d) = bm25_body(d) + w_path * bm25_path(d)

where bm25_path uses the PATH field's own statistics (df over path
tokens, average path token count) and the same K1/B — the query-time
field-boost formulation (Lucene's MultiFieldQueryParser), not full BM25F
tf-blending; the simpler rule keeps each field's statistics honest and
is what the DuckDB oracle can mirror exactly. Accumulation order is
fixed (body sum in sorted-term order, then path contributions in
sorted-term order), so scores are reproducible float64 like the body
engine's.

Stage layout (ensure-style, like fuzzy/doc_terms — (re)buildable for any
index whose docs snapshot carries `path`):

    path_index/  (term, ordinal, tf)   sorted by term (pushdown)
    path_lens/   (ordinal, plen)
    manifest metrics: total_plen (avgdl_path = total_plen / n_docs)

Plain rows, not packed blobs: path-token postings are dictionary-scale
(df bounded by files-per-directory patterns), and term-sorted parquet
gives the same pushdown the blob index gets.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import B, K1
from .checkpoint import BuildManifest
from .query import SearchEngine
from .tokenizer import query_terms, tokenize_series

#: default path-field weight (a path hit outranks ~2 body hits)
PATH_WEIGHT = 2.0


def ensure_path_index(spark: SparkSession, index_dir: str) -> str:
    """Materialize (once) the path-token index for ``index_dir``:
    path_index/ (term, ordinal, tf) + path_lens/ (ordinal, plen);
    path_index's manifest metrics carry total_plen."""
    man = BuildManifest(index_dir)
    if man.is_complete("path_index") and man.is_complete("path_lens"):
        return man.stage_path("path_index")
    docs = spark.read.parquet(man.stage_path("docs"))
    if "path" not in docs.columns:
        raise ValueError(
            f"{index_dir}: docs snapshot has no 'path' column (stats-only "
            "snapshot) — field boosts need the build-time metadata")
    t0 = man.begin("path_index")

    def tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = tokenize_series(pdf["path"])
            n = int(toks.str.len().sum()) if len(pdf) else 0
            if not n:
                yield pd.DataFrame({"ordinal": np.empty(0, np.int64),
                                    "term": np.empty(0, object)})
                continue
            yield pd.DataFrame({
                "ordinal": pdf["ordinal"].repeat(
                    toks.str.len()).to_numpy(np.int64),
                "term": np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks])})

    pairs = (docs.select("ordinal", "path")
             .mapInPandas(tok, schema="ordinal long, term string"))
    base = man.stage_path("path_index")
    from pyspark.sql import Observation
    obs = Observation("plen_total")
    (pairs.groupBy("term", "ordinal").agg(F.count("*").alias("tf"))
     .sort("term")
     .observe(obs, F.sum("tf").alias("total"))
     .write.mode("overwrite").parquet(base))
    man.commit("path_index", t0, 0,
               metrics={"total_plen": int(obs.get["total"] or 0)})
    t1 = man.begin("path_lens")
    (pairs.groupBy("ordinal").agg(F.count("*").alias("plen"))
     .write.mode("overwrite").parquet(man.stage_path("path_lens")))
    man.commit("path_lens", t1, 0)
    return base


class FieldedEngine:
    """Driver-regime field-boosted scorer on top of a SearchEngine (the
    same regime as the display maps: per-doc path lengths live in one
    int64 array; per-query path postings arrive via a term-pushdown scan
    of the dictionary-scale path index)."""

    def __init__(self, engine: SearchEngine, w_path: float = PATH_WEIGHT):
        self.engine = engine
        self.w_path = float(w_path)
        base = ensure_path_index(engine.spark, engine.index_dir)
        man = BuildManifest(engine.index_dir)
        m = man.state["completed"]["path_index"]["metrics"]
        self.avg_pl = m["total_plen"] / max(engine.n_docs, 1)
        self._postings = engine.spark.read.parquet(base)
        lens = engine.spark.read.parquet(
            man.stage_path("path_lens")).toPandas()
        self._plens = np.zeros(engine.n_docs, dtype=np.int64)
        self._plens[lens["ordinal"].to_numpy(np.int64)] = \
            lens["plen"].to_numpy(np.int64)
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def _fetch_path(self, terms: list[str]
                    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        missing = [t for t in terms if t not in self._cache]
        if missing:
            pdf = (self._postings.where(F.col("term").isin(missing))
                   .toPandas())
            for t in missing:
                sub = pdf[pdf["term"] == t].sort_values("ordinal")
                self._cache[t] = (sub["ordinal"].to_numpy(np.int64),
                                  sub["tf"].to_numpy(np.int64))
        return {t: self._cache[t] for t in terms}

    def _path_scores(self, terms: list[str], cands: np.ndarray
                     ) -> np.ndarray:
        eng = self.engine
        path = self._fetch_path(terms)
        pl = self._plens[cands].astype(np.float64)
        out = np.zeros(cands.size, dtype=np.float64)
        for t in terms:  # sorted-term accumulation, like the body engine
            ords, tfs = path[t]
            if not ords.size:
                continue
            pos = np.searchsorted(ords, cands)
            pos_c = np.minimum(pos, ords.size - 1)
            mask = (pos < ords.size) & (ords[pos_c] == cands)
            if not mask.any():
                continue
            tf = tfs[pos_c[mask]].astype(np.float64)
            idf = eng._idf(int(ords.size))
            # _tfw with the PATH field's length stats
            tfw = (tf * (K1 + 1.0)) / (
                tf + K1 * ((1.0 - B) + B * (pl[mask] / self.avg_pl)))
            out[mask] += idf * tfw
        return out

    def search(self, query: str, k: int = 10, rounded: bool = False
               ) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] under score = bm25_body + w*bm25_path.
        Candidates = union of body and path matches (a pure path hit
        ranks — that is the point of a filename boost)."""
        eng = self.engine
        terms = query_terms(query)
        if not terms or k <= 0:
            return []
        body = eng._fetch(terms)
        path = self._fetch_path(terms)
        arrays = [tp.doc_ids for tp in body.values()] + \
                 [o for o, _tf in path.values() if o.size]
        if not arrays:
            return []
        cands = arrays[0] if len(arrays) == 1 else np.unique(
            np.concatenate(arrays))
        scores = eng._score(terms, body, cands)
        scores = scores + self.w_path * self._path_scores(terms, cands)
        return eng._topk(cands, scores, k, rounded)
