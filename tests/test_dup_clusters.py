"""dup_clusters (connected components over candidate pairs) and
neardup_corpus — verified against a driver-side union-find oracle, plus
the convergence/determinism properties the distributed algorithm claims.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sparkocr.pipeline.dedup import dup_clusters, neardup_corpus


def _uf_clusters(ids, edges):
    """Union-find oracle with min-root convention: the final root of a
    component is its minimum id, matching dup_clusters' cluster_id."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def _run(spark, ids, edges, **kw):
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id1 long, id2 long"
    )
    nodes = spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
    got = dup_clusters(pairs, nodes=nodes, **kw).collect()
    return {r["id"]: r["cluster_id"] for r in got}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    ids = list(range(120))
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, ids, edges) == _uf_clusters(ids, edges)


def test_chain_converges_logarithmically(spark):
    # a 128-node path is the diameter worst case: plain min-propagation
    # needs 127 rounds; pointer jumping must close it in O(log n)
    n = 128
    ids = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, ids, edges, max_iter=12)
    assert got == {i: 0 for i in ids}


def test_rounds_are_observable(spark):
    """The stats out-param surfaces rounds-used without log spelunking:
    a clique closes in a couple of rounds, a chain needs more (the
    rounds-spike signal), an edgeless graph runs zero, and the max_iter
    ValueError path still fills the dict before raising."""
    clique_stats: dict = {}
    ids = list(range(10))
    _run(spark, ids, [(a, b) for a in ids for b in ids if a < b],
         stats=clique_stats)
    assert clique_stats["n_edges"] == 90  # symmetrized
    assert 1 <= clique_stats["rounds"] <= 3
    assert clique_stats["n_changed_last"] == 0  # converged

    chain_stats: dict = {}
    _run(spark, list(range(64)), [(i, i + 1) for i in range(63)],
         stats=chain_stats)
    assert chain_stats["rounds"] > clique_stats["rounds"]
    assert chain_stats["n_changed_last"] == 0

    empty_stats: dict = {}
    _run(spark, ids, [], stats=empty_stats)
    assert empty_stats == {"n_edges": 0, "rounds": 0, "n_changed_last": 0}

    exhausted: dict = {}
    with pytest.raises(ValueError, match="not converged"):
        _run(spark, list(range(64)), [(i, i + 1) for i in range(63)],
             max_iter=2, stats=exhausted)
    assert exhausted["rounds"] == 2 and exhausted["n_changed_last"] > 0


def test_transitivity_without_direct_pair(spark):
    # A~B, B~C but never (A, C): all three must share one cluster
    got = _run(spark, [1, 2, 3, 9], [(2, 1), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_empty_pairs_all_singletons(spark):
    got = _run(spark, [5, 7, 11], [])
    assert got == {5: 5, 7: 7, 11: 11}


def test_duplicate_and_reversed_pairs_tolerated(spark):
    got = _run(spark, [1, 2], [(1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_null_endpoints_dropped(spark):
    pairs = spark.createDataFrame(
        [(1, None), (None, 2), (3, 4)], "id1 long, id2 long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id long")
    got = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs, nodes=nodes).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 3}


def test_partition_layout_invariance(spark):
    rng = random.Random(7)
    ids = list(range(80))
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    nodes = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    a = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs, nodes=nodes).collect()}
    b = {
        r["id"]: r["cluster_id"]
        for r in dup_clusters(
            pairs.repartition(7, "id2"), nodes=nodes.repartition(3)
        ).collect()
    }
    assert a == b == _uf_clusters(ids, edges)


def test_max_iter_exhaustion_raises(spark):
    # a 64-node chain cannot converge in 2 rounds; wrong labels must never
    # be returned silently
    ids = list(range(64))
    edges = [(i, i + 1) for i in range(63)]
    with pytest.raises(ValueError, match="not converged"):
        _run(spark, ids, edges, max_iter=2)


def test_no_lingering_operator_caches(spark):
    # the edges cache is scoped inside the operator (try/finally), not
    # delegated to the caller like the lazy operators' caches
    from sparkocr.pipeline import caching

    before = caching.live_count()
    _run(spark, [1, 2, 3], [(1, 2)])
    assert caching.live_count() == before


def test_neardup_corpus_keeps_cluster_minimum(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(2, 1), (2, 3)], "id1 long, id2 long")
    kept = sorted(r["doc_id"] for r in neardup_corpus(docs, pairs).collect())
    assert kept == [1, 9]


def test_generation_stats_do_not_snowball(spark):
    # Each round's localCheckpoint seeds the new LogicalRDD with the
    # origin plan's ESTIMATED stats, and a round's estimate multiplies
    # the previous generation's sizeInBytes in twice (message join x
    # pointer-jump join) — so without the per-generation persist() the
    # estimate SQUARES every round. By round ~20 the driver burned
    # minutes per round multiplying million-digit BigIntegers inside
    # Catalyst's stats visitor (observed: pinned driver core, idle
    # executors, 464 s CPU in one checkpoint call). The persist makes
    # the checkpoint job materialize the cache first, so the stats
    # rewrite reads the ACTUAL cached byte size. Pin that: after a
    # 14-round chain, the returned generation's sizeInBytes must be a
    # plausible byte count for 1k (id, label) rows, not a 2^14-factor
    # product (pre-fix this exceeded 10^80 even at this toy size).
    n = 1024
    ids = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id1 long, id2 long"
    )
    nodes = spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
    stats = {}
    labels = dup_clusters(pairs, nodes=nodes, stats=stats)
    assert stats["rounds"] >= 8  # enough rounds for the squaring to show
    size = int(
        labels._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert 0 < size < 100 * 1024 * 1024
