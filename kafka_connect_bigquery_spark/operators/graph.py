"""Iterative graph analytics: integer-exact PageRank.

Companion to the min-label-propagation connected components
(operators/dedup.py:connected_components): a fixed-iteration PageRank
whose arithmetic is ENTIRELY integer — ranks live on a 1/q lattice,
per-edge shares use floor division, and the damping mix is a scaled
integer expression — so the result is bit-identical across engines,
partitionings, and summation orders (the property that lets a DuckDB
oracle hash-match a distributed run; float PageRank never can).

Update rule per iteration, all in BIGINT:

    share(u -> v)  = rank_q(u) // outdeg(u)
    rank_q'(v)     = ((dden-dnum) * q) // (dden * N)
                     + (dnum * SUM share(u->v)) // dden

(the simple non-redistributing dangling-mass variant: rank leaking
through sinks is not recycled — documented, and mirrored exactly by
the oracle).

Scale shape: one groupBy for out-degrees, then per iteration one
equi-join edges⨝ranks + one groupBy(dst) — the standard Pregel-style
message pass as plain DataFrame ops. Ranks are localCheckpoint'ed per
round (same discipline as connected_components) so the plan stays
O(1) deep; total work is O(iterations * |E|) with map-side combine on
the share sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 1_000_000  # rank lattice: 1e-6 quanta


def triangle_counts(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph,
    via degree-ordered edge orientation (the node-iterator++ / compact-
    forward algorithm): orient every edge from the endpoint that is
    smaller under the total order ``(degree, node)`` toward the larger,
    so each triangle {x,y,z} with x ≺ y ≺ z materializes exactly once
    as the oriented wedge (x→y)+(y→z) closed by (x→z).

    Returns ``(node, n_triangles)`` for nodes in ≥1 triangle (BIGINT,
    hash-exact).

    Scale shape: orientation bounds every node's oriented out-degree by
    O(sqrt(|E|)) on any graph (and by arboricity on sparse ones), so the
    wedge join e1.dst = e2.src — the only superlinear step — never
    explodes on high-degree hubs the way a naive edge³ self-join does;
    hubs become wedge *closers* (the cheap semi-join side), not wedge
    centers. Three equi-joins + one groupBy, all broadcast-free and
    AQE-skew-splittable.
    """
    # EAGER checkpoint: `e` feeds deg AND the orientation join (deg is
    # itself derived from e), so without a barrier the upstream
    # edge-dedup pipeline is re-executed per branch (ReuseExchange does
    # not dedup these subtrees) AND every downstream Dataset op
    # re-analyzes the full upstream plan — profiled 2.5 s of
    # driver-side construction per graph_triangles build (guide §5:
    # the driver should do almost no work; §3.3: materialise to
    # truncate the plan).
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oe = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        # eager for the same reason as `e`: three wedge-join consumers
        # would each re-analyze (and the corners union re-analyze again)
        # the full orientation plan
        .localCheckpoint(eager=True)
    )
    e1 = oe.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    e2 = oe.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    e3 = oe.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"])  # (x, y, z), each once
    corners = (
        tris.select(F.col("x").alias("node"))
        .unionByName(tris.select(F.col("y").alias("node")))
        .unionByName(tris.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    q: int = Q,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.
    Returns ``(node, rank_q)`` with rank_q on the 1/q lattice (BIGINT —
    exact, hash-comparable). Duplicate edges count once."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg): the message-passing edge list, reused every round
    ed = e.join(outdeg, "src").localCheckpoint(eager=False)

    teleport_q = ((damping_den - damping_num) * q) // (damping_den * n)
    ranks = nodes.withColumn("rank_q", F.lit(q // n).cast("bigint"))
    for _ in range(iterations):
        sums = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("rank_q div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        ranks = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .select(
                "node",
                (
                    F.lit(teleport_q)
                    + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
                ).cast("bigint").alias("rank_q"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
