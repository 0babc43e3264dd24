"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables, compare
row count + order-insensitive values (sorted columns, rounded floats)."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')")
    return con


def _canon(df):
    """pandas DF -> sorted list of row tuples with floats rounded to 9sf."""
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return float(f"{v:.9g}")
        return v
    rows = [tuple(norm(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def _entries():
    import __spark_entry__ as se
    from engine import contract_queries as cq
    qs = dict(se.queries())
    oracles = dict(se.oracle_sql())
    # entries consolidated out of the <=50-slot driver registry keep the
    # exact same oracle compare here
    qs.update(cq.consolidated_queries())
    oracles.update(cq.consolidated_oracles())
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,sql", _entries(),
                         ids=[n for n, _, _ in _entries()])
def test_query_vs_oracle(spark, duck, name, fn, sql):
    got = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) > 0, f"{name}: rows-only check failed (0 rows)"
        return
    want = duck.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: column mismatch {got.columns} vs {want.columns}"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as se
    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "rank", "score_r"}
