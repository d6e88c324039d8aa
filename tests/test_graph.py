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
