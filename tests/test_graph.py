"""Connected components (large-star/small-star) and survivor selection."""

import random

import pytest
from pyspark.sql import functions as F

from osm_pbf_convert_spark.operators.graph import (
    connected_components,
    dedup_survivors,
    near_dup_groups,
)


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a long, b long")
    rows = connected_components(df, **kw).collect()
    return {r["id"]: r["component"] for r in rows}


def _union_find(edges):
    """Reference labeling: plain union-find, component = min member."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for x in list(parent):
        roots.setdefault(find(x), []).append(x)
    out = {}
    for members in roots.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_two_components(spark):
    got = _labels(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_collapses(spark):
    # a 40-node path: diameter 39, but star rounds converge in O(log^2)
    edges = [(i, i + 1) for i in range(40)]
    got = _labels(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_duplicate_and_reversed_edges(spark):
    got = _labels(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (5, 5)])
    # (5,5) is a self-loop: contributes no node
    assert got == {1: 1, 2: 1, 3: 1}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _labels(spark, edges)
    assert got == _union_find(edges)


def test_broom_graph_rounds_follow_log_diameter(spark):
    """The adversarial shape (long chain + hot-minimum star + hubs) must
    converge in ~log2(diameter) rounds with every label == the hot min --
    the small-scale twin of tools/scale_rehearsal.py --cc-adversarial."""
    import math
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from tools.scale_rehearsal import broom_graph

    chain_n, leaf_n = 2000, 8000
    edges = broom_graph(spark, chain_n, leaf_n, hub_every=100, hub_leaves=5)
    n_edges = edges.count()
    stats = {}
    labels = connected_components(edges, stats=stats).toPandas()
    assert len(labels) == n_edges + 1  # a tree
    assert (labels["component"] == 0).all()
    assert stats["rounds"] <= math.ceil(math.log2(chain_n)) + 3


def test_max_iter_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "a long, b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=1)


def test_survivors_pick_longest_then_min_id(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaaaaa"), (3, "bb"), (7, "cc"), (8, "dd"), (9, "xyz")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a long, b long")
    labels = near_dup_groups(pairs)
    out = {
        r["component"]: (r["survivor_id"], r["n_docs"])
        for r in dedup_survivors(docs, labels).collect()
    }
    # component 1: doc 2 has the longest text; component 7: tie on length
    # 2 -> min id 7. doc 9 is a singleton: absent from the pair graph.
    assert out == {1: (2, 3), 7: (7, 2)}


def test_star_rounds_never_broadcast(spark):
    """The mins side of a star round is node-sized (fact-sized at scale):
    it must sort-merge/shuffled-hash join, never auto-broadcast. The
    per-round localCheckpoint makes input stats unknown (treated as huge),
    which guarantees this -- pin that property."""
    from osm_pbf_convert_spark.operators.graph import (
        _canonical_edges,
        _large_star,
        _small_star,
    )

    pairs = spark.createDataFrame([(i, i + 1) for i in range(100)], "a long, b long")
    edges = _canonical_edges(pairs, "a", "b").localCheckpoint(eager=True)
    for step in (_large_star, _small_star):
        plan = step(edges)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_catalog_entries_match_oracle_semantics(spark, sf_dir):
    """dedup_groups labels partition exactly the nodes of minhash pairs,
    and every pair's endpoints share a component."""
    from osm_pbf_convert_spark.operators import dedup
    from osm_pbf_convert_spark import queries as Q

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, shingle_k=5, hash_fn="md5"
    ).collect()
    labels = {
        r["doc_id"]: r["component"]
        for r in Q.QUERIES["dedup_groups"](spark, sf_dir).collect()
    }
    nodes = {p["a"] for p in pairs} | {p["b"] for p in pairs}
    assert set(labels) == nodes
    for p in pairs:
        assert labels[p["a"]] == labels[p["b"]]
    assert labels == _union_find([(p["a"], p["b"]) for p in pairs])
