"""HTTP serving shim — the reference Searcher's query surface, rebuilt.

The reference serves ``GET /search?query=...`` from a tiny embedded
webserver and returns a JSON array of ``{url, rank_score, title, body}``
objects with a CORS header (searchEngine/src/cis5550/search/
Searcher.java:37-44,186-207; result-shape fixture
frontEnd/search_engine/src/fakeData.js:1-20, fetch path
frontEnd/search_engine/src/fetcher.js:3-9). This module is the Spark-side
twin: the same route, same JSON field names, same CORS behavior, backed by
the real BM25/TF-IDF engine instead of a KVS full scan.

Display fields come from the docs snapshot (title = last path component,
body = the bounded leading-content snippet the build materializes —
~200 B/doc, the serving-tier analog of the reference's per-URL
title/body columns in the `urls` table). The display map is a driver-side
dict keyed by doc_id — the same "broadcast lookup table" regime as
SearchEngine's doc-length arrays (fine to ~10^8 docs; past that the k-row
display join belongs in search_big's broadcast-join tail).

Scoring modes:
- ``scoring=bm25`` (default): the north-rule BM25 engine (ranked or
  conjunctive via ``mode=``);
- ``scoring=tfidf``: the reference's actual formula + threshold semantics
  (Searcher.java:108,113,139-159) via search_tfidf_reference, k<=300.
"""

from __future__ import annotations

import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

REFERENCE_MAX_RESULTS = 300  # Searcher.java:203 caps the result list


def _stage_complete(index_dir: str, stage: str) -> bool:
    """The manifest's word on a stage, not just a leftover _SUCCESS file."""
    from .checkpoint import BuildManifest
    return BuildManifest(index_dir).is_complete(stage)


def pd_series_empty(n: int):
    import pandas as pd
    return pd.Series([""] * n)


class SearchService:
    """Query engine + display-field resolution for one built index."""

    def __init__(self, spark: SparkSession, index_dir: str):
        from .query import SearchEngine
        self.spark = spark
        self.index_dir = index_dir
        self._phrase = None
        self.engine = SearchEngine(spark, index_dir)
        docs = spark.read.parquet(os.path.join(index_dir, "docs"))
        cols = set(docs.columns)
        want = [c for c in ("doc_id", "repo", "path", "commit",
                            "title", "snippet") if c in cols]
        pdf = docs.select(*want).toPandas()
        # vectorized display-map build (pandas C string ops + dict(zip)):
        # a per-row Python loop here would be minutes of driver CPU at the
        # upper end of the driver-map regime
        ids = pdf["doc_id"].astype("int64")
        if {"repo", "path", "commit"} <= cols:
            urls = (pdf["repo"].astype(str) + "/" + pdf["path"].astype(str)
                    + "@" + pdf["commit"].astype(str))
        else:  # compacted/merged snapshots carry stats only
            urls = ids.astype(str)
        titles = (pdf["title"].fillna("").astype(str)
                  if "title" in cols else pd_series_empty(len(pdf)))
        snippets = (pdf["snippet"].fillna("").astype(str)
                    if "snippet" in cols else pd_series_empty(len(pdf)))
        self._display: dict[int, tuple[str, str, str]] = dict(
            zip(ids.tolist(), zip(urls.tolist(), titles.tolist(),
                                  snippets.tolist())))
        # aliased doc_ids (content dedup) resolve to their canonical doc.
        # Gate on the MANIFEST, not a bare _SUCCESS marker: a stage dir left
        # behind by an older build of this directory must not be trusted.
        self._alias: dict[int, int] = {}
        if _stage_complete(index_dir, "aliases"):
            apdf = spark.read.parquet(
                os.path.join(index_dir, "aliases")).toPandas()
            self._alias = dict(zip(apdf["doc_id"].astype("int64").tolist(),
                                   apdf["canonical_doc_id"]
                                   .astype("int64").tolist()))

    def resolve(self, doc_id: int) -> tuple[str, str, str]:
        doc_id = self._alias.get(doc_id, doc_id)
        return self._display.get(doc_id, (str(doc_id), "", ""))

    def _phrase_engine(self):
        if self._phrase is None:
            if not _stage_complete(self.index_dir, "positions"):
                raise ValueError(
                    "this index has no positional store "
                    "(build with --positions for phrase search)")
            from .positions import PhraseEngine
            self._phrase = PhraseEngine(self.spark, self.index_dir)
        return self._phrase

    def search_payload(self, query: str, k: int = 10, mode: str = "ranked",
                       scoring: str = "bm25", slop: int = 1) -> list[dict]:
        """The reference's JSON result shape, field for field. Extensions
        beyond the reference: mode=phrase (positional store; rank_score is
        the occurrence count), mode=near (two terms within `slop`
        positions, ordered) and a trailing `*` wildcard (prefix
        expansion + ranked OR)."""
        q = query.strip()
        k = max(0, k)  # a negative k would negative-slice inside the
        # engines (ADVICE r2: tfidf's order[:k] returned ~every match)
        if mode == "phrase":
            rows = self._phrase_engine().search_phrase(query, k=k)
        elif mode == "near":
            parts = q.split()
            if len(parts) != 2:
                raise ValueError("mode=near needs exactly two terms")
            rows = self._phrase_engine().search_near(
                parts[0], parts[1], slop=slop, k=k)
        elif scoring == "tfidf":
            rows = self.engine.search_tfidf_reference(
                query, k=min(k, REFERENCE_MAX_RESULTS))
        elif (mode == "ranked" and q.endswith("*") and len(q) > 1
              and " " not in q):
            # single-token trailing-* wildcard only; a multi-term query
            # with a '*' falls through to normal search (the tokenizer
            # strips punctuation), and conjunctive mode is never hijacked
            rows = self.engine.search_prefix(q[:-1].lower(), k=k)
        else:
            rows = self.engine.search(query, k=k, mode=mode)
        out = []
        for _rank, doc_id, score in rows:
            url, title, body = self.resolve(int(doc_id))
            out.append({"url": url, "rank_score": score,
                        "title": title, "body": body})
        return out


def make_server(service: SearchService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Bind (port=0 -> ephemeral) and return the server; caller drives
    serve_forever (tests run it on a thread, the CLI blocks on it)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            u = urlparse(self.path)
            if u.path != "/search":
                self.send_error(404, "only /search is served")
                return
            qs = parse_qs(u.query)
            query = qs.get("query", [""])[0]
            try:
                k = int(qs.get("k", ["10"])[0])
            except ValueError:
                self.send_error(400, "k must be an integer")
                return
            mode = qs.get("mode", ["ranked"])[0]
            scoring = qs.get("scoring", ["bm25"])[0]
            try:
                slop = int(qs.get("slop", ["1"])[0])
            except ValueError:
                self.send_error(400, "slop must be an integer")
                return
            if mode not in ("ranked", "conjunctive", "phrase", "near") or \
                    scoring not in ("bm25", "tfidf") or slop < 1:
                self.send_error(400, "bad mode/scoring/slop")
                return
            try:
                body = json.dumps(service.search_payload(
                    query, k=k, mode=mode, scoring=scoring,
                    slop=slop)).encode()
            except ValueError as e:
                self.send_error(400, str(e))
                return
            self.send_response(200)
            # the reference pins its frontend origin (Searcher.java:201);
            # a library default can't know the deployment origin -> '*'
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet under pytest
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve(spark: SparkSession, index_dir: str, host: str = "127.0.0.1",
          port: int = 8080) -> None:
    srv = make_server(SearchService(spark, index_dir), host, port)
    print(json.dumps({"serving": f"http://{host}:{srv.server_address[1]}"
                      "/search?query=..."}))
    srv.serve_forever()
