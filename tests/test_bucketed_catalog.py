"""Catalog-native bucketed tables: the planner must elide exchanges
(and sorts) for joins/aggregations on the bucket keys, and results
must equal the plain-join answers."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.sinks import bucketed_catalog as BC


@pytest.fixture()
def tables(spark, tmp_path):
    """Two co-bucketed tables (8 buckets on k) + the source frames.
    Auto-broadcast is disabled for the duration: at test size the
    planner would otherwise broadcast (and rightly skip the bucketed
    scan); the exchange-elision property under test is the 100 TB
    fact⨝fact regime where neither side broadcasts."""
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 17).alias("va")
    )
    b = spark.range(500, 1500).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("vb")
    )
    ta, tb = f"bca_{uuid.uuid4().hex[:8]}", f"bcb_{uuid.uuid4().hex[:8]}"
    BC.save_bucketed(a, ta, ["k"], 8, path=str(tmp_path / "ta"))
    BC.save_bucketed(b, tb, ["k"], 8, path=str(tmp_path / "tb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield ta, tb, a, b
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(f"DROP TABLE IF EXISTS {ta}")
    spark.sql(f"DROP TABLE IF EXISTS {tb}")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_no_exchange_no_sort(spark, tables):
    ta, tb, a, b = tables
    joined = BC.cobucketed_join(spark, ta, tb, ["k"])
    plan = _executed_plan(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan and "Bucketed: true" in plan, plan
    # (a per-partition Sort remains: Spark 3+ ignores bucket file sort
    # order unless spark.sql.legacy.bucketedTableScan.outputOrdering is
    # set — linear per-bucket work, unlike the eliminated Exchange)
    got = {(r["k"], r["va"], r["vb"]) for r in joined.collect()}
    want = {
        (r["k"], r["va"], r["vb"])
        for r in a.join(b, "k").collect()
    }
    assert got == want and len(got) == 500


def test_bucketed_aggregation_no_exchange(spark, tables):
    ta, _, a, _ = tables
    agg = BC.read_bucketed(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan
    got = {(r["k"], r["s"]) for r in agg.collect()}
    want = {(r["k"], r["s"]) for r in a.groupBy("k").agg(F.sum("va").alias("s")).collect()}
    assert got == want


def test_plain_join_has_exchange_control(spark, tables):
    """Control: the same join WITHOUT bucketing plans exchanges — the
    absence above is the bucketing, not a small-input artifact."""
    _, _, a, b = tables
    plan = _executed_plan(a.join(b, "k"))
    assert "Exchange" in plan, plan


def test_attach_bucketed_restores_exchange_free_join(spark, tables, tmp_path):
    """Dropping the catalog entry (what a restart does to the
    in-memory catalog) and re-attaching the surviving data directory
    restores the zero-Exchange join plan and identical data."""
    ta, tb, a, b = tables
    before = {(r["k"], r["va"]) for r in spark.table(ta).collect()}
    spark.sql(f"DROP TABLE {ta}")
    BC.attach_bucketed(spark, ta, str(tmp_path / "ta"), ["k"], 8)
    assert {(r["k"], r["va"]) for r in spark.table(ta).collect()} == before
    plan = _executed_plan(BC.cobucketed_join(spark, ta, tb, ["k"]))
    assert "Exchange" not in plan and "Bucketed: true" in plan, plan


def test_one_file_per_bucket(spark, tables, tmp_path):
    import glob

    files = glob.glob(str(tmp_path / "ta" / "*.parquet"))
    # pre-repartition keeps it to one file per bucket
    assert len(files) == 8
