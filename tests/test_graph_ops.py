"""Convergence-detected connected components (VERDICT r3 #2) + iterative-op
storage hygiene (ADVICE r3: checkpoint blocks must not accumulate across
invocations) + PageRank edge-list checkpoint (VERDICT r3 #6)."""

import pytest

from engine.contract_queries import (
    _free_local_checkpoint,
    connected_components,
    q_neardup_clusters,
    q_pagerank_dominant,
)

SF_DIR = "/root/testdata/sf0.001"


def _uf_clusters(pairs):
    """Union-find oracle: id -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_cc_converges_on_deep_chain(spark):
    """A duplicate chain of diameter 19 — the old fixed-6-round loop
    mislabels it (nodes >6 hops from the min keep split labels); the
    convergence-detected loop must cluster it fully."""
    chain = [(i, i + 1) for i in range(20)]          # 0-1-2-...-20
    other = [(100, 101), (101, 102)]                 # a second component
    pairs = spark.createDataFrame(chain + other, "ida long, idb long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert got == _uf_clusters(chain + other)
    assert set(got[i] for i in range(21)) == {0}     # ONE cluster, label 0
    assert set(got[i] for i in (100, 101, 102)) == {100}

    # old behavior check: 6 fixed rounds genuinely cannot close this chain
    # (documents why convergence detection is load-bearing)
    naive = {i: i for i in range(21)}
    adj = {}
    for a, b in chain:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for _ in range(6):
        naive = {v: min([naive[v]] + [naive[u] for u in adj.get(v, [])])
                 for v in naive}
    assert len(set(naive.values())) > 1


def test_cc_shuffled_ids_and_singleton_free(spark):
    """Labels must be min-of-component regardless of id order; ids not in
    any pair never appear (pair graph only covers clustered docs)."""
    pairs_py = [(9, 3), (3, 7), (50, 40), (40, 60), (60, 55)]
    pairs = spark.createDataFrame(pairs_py, "ida long, idb long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert got == _uf_clusters(pairs_py)
    assert got[9] == got[3] == got[7] == 3
    assert got[50] == got[40] == got[60] == got[55] == 40


def test_cc_max_rounds_guard(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(10)],
                                  "ida long, idb long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=2)


def test_iterative_ops_free_their_checkpoints(spark):
    """Repeated invocations must not accumulate checkpointed RDD blocks in
    executor storage (ADVICE r3): after consuming + freeing the returned
    frame, the persistent-RDD count returns to its baseline."""
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    for _ in range(2):
        res = q_neardup_clusters(spark, SF_DIR)
        assert res.count() > 0
        _free_local_checkpoint(res)
    for _ in range(2):
        res = q_pagerank_dominant(spark, SF_DIR)
        assert res.count() > 0
        _free_local_checkpoint(res)
    # <= not ==: Spark's ContextCleaner may concurrently GC unreachable
    # frames from EARLIER tests, dropping the count below the baseline;
    # our own frames are removed synchronously by the explicit frees
    assert jsc.getPersistentRDDs().size() <= base


def test_pagerank_plan_evaluates_dominant_subtree_once(spark):
    """The edge list is checkpointed, so the returned plan must contain NO
    copy of the window/dominant-term derivation (it ran exactly once,
    during edge materialization)."""
    res = q_pagerank_dominant(spark, SF_DIR)
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan and "row_number" not in plan
    _free_local_checkpoint(res)
