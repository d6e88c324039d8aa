"""Integer-exact PageRank (operators/graph.py): bit-identical to a
pure-Python reference replay of the same integer update rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators import graph as G


def _reference(edges, iterations, q=G.Q, dnum=85, dden=100):
    """Pure-Python replay of the documented integer update rule."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    teleport = ((dden - dnum) * q) // (dden * n)
    rank = {v: q // n for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for u, v in e:
            s[v] += rank[u] // outdeg[u]
        rank = {v: teleport + (dnum * s[v]) // dden for v in nodes}
    return rank


def _run(spark, edges, iterations):
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    return {
        r["node"]: r["rank_q"]
        for r in G.pagerank(df, iterations=iterations).collect()
    }


def test_matches_reference_small_cycle(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    assert _run(spark, edges, 3) == _reference(edges, 3)


def test_matches_reference_star_with_dangler(spark):
    # 5 is a pure sink (dangling); 4 is a pure source
    edges = [(4, 1), (4, 2), (1, 5), (2, 5), (1, 2)]
    for it in (1, 4):
        assert _run(spark, edges, it) == _reference(edges, it)


def test_duplicate_edges_count_once(spark):
    edges = [(1, 2), (1, 2), (2, 1)]
    assert _run(spark, edges, 2) == _reference(edges, 2)


def test_rank_mass_bounded(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 1)]
    ranks = _run(spark, edges, 3)
    # integer floors + dangling leak only ever LOSE mass vs q
    assert 0 < sum(ranks.values()) <= G.Q
    assert all(v >= 0 for v in ranks.values())


# --- triangle_counts -------------------------------------------------------


def _tri_reference(edges):
    """Brute-force per-node triangle counts from an undirected edge set."""
    import itertools

    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _tri_run(spark, edges):
    df = spark.createDataFrame(edges, "a: bigint, b: bigint")
    return {
        r["node"]: r["n_triangles"]
        for r in G.triangle_counts(df).collect()
    }


def test_triangles_k4(spark):
    # K4: every node sits in C(3,2)=3 triangles
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    assert _tri_run(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_direction_and_dups_ignored(spark):
    # same triangle given with mixed orientations + duplicates + a self-loop
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 4)]
    assert _tri_run(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_triangles_matches_bruteforce_random(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(60)]
    assert _tri_run(spark, edges) == _tri_reference(edges)


def test_triangles_triangle_free_bipartite(spark):
    edges = [(u, 100 + v) for u in range(3) for v in range(3)]
    assert _tri_run(spark, edges) == {}
