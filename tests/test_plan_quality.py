"""Plan-quality regression tests: the physical plans of every registry
query must stay scale-safe. Catches accidental cartesian products,
row-at-a-time Python UDFs, and lost filter pushdown — the properties
that separate a 100 TB plan from a 60k-row plan.
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.001"

# Arrow-batched mapInPandas is the sanctioned Python seam for the
# multimodal codec stages — everything else must stay JVM-side.
PYTHON_OK = {
    "multimodal_image_meta",
    "multimodal_frame_features",
    "multimodal_audio_chunks",
    # Avro encode/decode round-trip: Arrow-batched pandas UDFs standing
    # in for the spark-avro JVM datasource the sandbox can't load
    "avro_wire_roundtrip",
}
# the ANN brute-force baseline broadcasts a tiny query side through an
# explicit crossJoin — bounded by design (queries << corpus)
CROSS_OK = {"ann_cosine_topk"}

# Queries allowed a single-partition (empty or literal-only partition
# spec) Window whose frame is NOT bounded by a limit below it in the
# plan. Every entry documents the bound that makes one partition safe;
# anything else tripping the fence is the r06-verdict scale-killer
# class (a global sort of a data-sized frame through one task).
WINDOW_NOPART_OK = {
    # (customer_ltv_deciles left this list in r08: its exact ntile is
    # now a range-partitioned rank + broadcast slice offsets + the
    # piecewise ntile split — no single-partition window remains)
    # cumulative counts over the DISTINCT 1e-4-quantized value grid
    # (the lattice), not over event rows
    "events_ks_test",
    "events_mannwhitney",
    # bucket-offset stage of the two-level prefix sum: the frame is
    # n_order_buckets rows (constant, default 64)
    "corpus_shard_plan",
}


def _df(spark, name):
    from kafka_connect_bigquery_spark import queries as q

    return q.queries()[name](spark, SF)


def _explain(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _plan(spark, name):
    return _explain(_df(spark, name))


def _registry_names():
    import sys

    sys.path.insert(0, "/root/repo")
    from kafka_connect_bigquery_spark import queries as q

    return sorted(q.queries())


@pytest.mark.parametrize("name", _registry_names())
def test_no_rowwise_python_or_unbounded_cartesian(spark, name):
    df = _df(spark, name)
    plan = _explain(df)
    # row-at-a-time Python (BatchEvalPython) is never acceptable;
    # ArrowEvalPython/mapInPandas only at the declared multimodal seam
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF in plan"
    if name not in PYTHON_OK:
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
            f"{name}: unexpected Python stage"
        )
    if name not in CROSS_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        # nested-loop joins are only safe when one side is broadcast
        if "BroadcastNestedLoopJoin" in plan:
            assert "BroadcastExchange" in plan
    # an un-ordered limit compiles to CollectLimit: a single-task pull
    # of its whole child to one executor/driver. Top-N must ride an
    # orderBy so it compiles to TakeOrderedAndProject (per-partition
    # top-N + merge); as of r05 no registry plan needs CollectLimit
    assert "CollectLimit" not in plan, (
        f"{name}: CollectLimit (unordered limit) — use orderBy+limit "
        "(TakeOrderedAndProject) or drop the limit"
    )
    # r06-verdict bug class, fenced: a Window with no real partition
    # spec (empty OR literal-only — the bounded_global helper is
    # treated identically, so it can never relax this fence) moves its
    # whole frame through ONE task. Fine only when the frame is bounded
    # by construction: a limit below it in the plan, or the documented
    # WINDOW_NOPART_OK bound.
    bad = _unbounded_global_windows(df)
    if bad and name not in WINDOW_NOPART_OK:
        raise AssertionError(
            f"{name}: {len(bad)} single-partition Window(s) over an "
            "unbounded frame — partition the window, rewrite top-k as "
            "orderBy+limit, or document the bound in WINDOW_NOPART_OK"
        )


def _walk_logical(node):
    yield node
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk_logical(it.next())


def _unbounded_global_windows(df):
    """Window nodes in the optimized logical plan whose partition spec
    is empty OR literal-only (the ``bounded_global`` helper — treated
    identically, so the helper can never relax this fence) and that do
    NOT sit above a limit (a limit below makes the frame constant-
    bounded, e.g. the ≤k survivors of an orderBy().limit(k) re-rank).
    """
    out = []
    for n in _walk_logical(df._jdf.queryExecution().optimizedPlan()):
        if n.getClass().getSimpleName() != "Window":
            continue
        spec = n.partitionSpec()
        lit_only = True
        it = spec.iterator()
        while it.hasNext():
            if it.next().getClass().getSimpleName() != "Literal":
                lit_only = False
        if not (spec.isEmpty() or lit_only):
            continue
        has_limit_below = any(
            c.getClass().getSimpleName() in ("GlobalLimit", "LocalLimit")
            for c in _walk_logical(n)
            if c is not n
        )
        if not has_limit_below:
            out.append(n.getClass().getSimpleName())
    return out


def test_warehouse_partition_pruning(spark, tmp_path):
    """L1/L2 payoff: a date filter on a partitioned warehouse table
    must prune at the partition level (PartitionFilters in the scan),
    not post-filter all files."""
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 5), 12, 0), float(i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    wh.append(df, "t", TableSpec(partition_grain="DAY", timestamp_field="ts"))
    q = wh.read("t").filter("p_date = '2024-01-03'")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(p_date" in plan
    assert q.count() == 10


def test_scan_pushdown_and_pruning(spark):
    """Spot-check the pushdown contract on the flagship scan+agg."""
    plan = _plan(spark, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 referenced columns reach the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_sequence_pack_window_is_sharded(spark):
    """The packing window must partition by shard — an unpartitioned
    running-sum window is a single-task global sort at corpus scale."""
    plan = _plan(spark, "docs_sequence_pack")
    assert "windowspecdefinition(shard" in plan, (
        "packing window lost its shard partitioning"
    )


def test_mixture_rebalance_broadcasts_rate_table(spark):
    """The per-stratum rate table must broadcast — shuffling the corpus
    to join a handful of rates would be the classic scale mistake."""
    plan = _plan(spark, "mixture_rebalance")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the documents side must not hash-exchange for this join
    assert "SortMergeJoin" not in plan


def test_ivfpq_join_is_equi_on_list(spark):
    """IVF-PQ candidates must flow through the list_id equi-join; a
    nested-loop/cartesian here would defeat the inverted index."""
    plan = _plan(spark, "ann_ivfpq_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "list_id" in plan


def test_ltv_distributed_ntile_matches_real_ntile_on_awkward_n(spark):
    """The r08 customer_ltv_deciles rewrite computes ntile(10) from
    (exact global rank, N) via the piecewise SQL-standard split. The
    parquet fixtures all have N % 10 == 0, so the remainder branch
    (first N mod 10 tiles take the extra row) never meets the oracle —
    pin it here against Spark's own ntile on awkward N, including
    N < 10 (every row its own tile) and N just past a multiple of 10."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for n in (1, 3, 7, 10, 12, 95, 101, 109):
        df = spark.range(n).select(
            F.col("id"), (F.col("id") * 7 % 97).alias("k")
        )
        w = Window.orderBy(F.desc("k"), F.asc("id"))
        truth = {
            r["id"]: r["t"]
            for r in df.select("id", F.ntile(10).over(w).alias("t")).collect()
        }
        ranked = df.select(
            "id",
            F.row_number().over(w).alias("__r"),
            F.lit(n).alias("__n"),
        )
        got = {
            r["id"]: r["t"]
            for r in ranked.select(
                "id",
                F.expr(
                    "CAST(CASE WHEN __r <= (__n % 10) * (__n DIV 10 + 1) "
                    "THEN (__r - 1) DIV (__n DIV 10 + 1) + 1 "
                    "ELSE (__n % 10) + (__r - (__n % 10) * (__n DIV 10 + 1) - 1) "
                    "DIV greatest(__n DIV 10, 1) + 1 END AS INT)"
                ).alias("t"),
            ).collect()
        }
        assert got == truth, f"N={n}"
