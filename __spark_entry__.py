"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — the real inverted-index engine's BM25 top-k
over /root/testdata/sf0.001 documents.
queries()/oracle_sql(): see engine/contract_queries.py — one entry per
operator family from SURVEY.md §2, each with a DuckDB oracle (except the
documented rows-only ones).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from engine import contract_queries as cq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the salted inverted index over sf0.001 documents and
    answer the fixture BM25 query with the real engine."""
    return cq.q_bm25_engine_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return cq.queries()


def oracle_sql() -> dict[str, str]:
    return cq.oracle_sql()
