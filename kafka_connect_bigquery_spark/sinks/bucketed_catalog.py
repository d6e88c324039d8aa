"""Catalog-native bucketed tables: shuffle-free co-located joins.

The warehouse's `_buckets/<b>/gen=<G>` layout co-locates MERGE work,
but Spark's *planner* doesn't know about it — a join between two such
tables still plans two exchanges. This module is the other half of the
bucketing story: write through the session catalog with
``bucketBy(n, keys).sortBy(keys)`` so the scan itself advertises hash
distribution, and a join or aggregation on the bucket keys plans with
NO Exchange on either side — the single biggest shuffle eliminator
for repeated fact⨝fact joins at 100 TB (the Hive/Spark bucketed-join
design; Spark SQL bucketing is public API: DataFrameWriter.bucketBy).

Rules for the planner to actually elide the exchange (asserted by
tests/test_bucketed_catalog.py):
- both sides bucketed by the SAME columns into the SAME bucket count
  (or a multiple, with spark.sql.bucketing.coalesceBucketsInJoin),
- the join keys are a superset-prefix of the bucket spec,
- bucketed scans stay enabled (spark.sql.sources.bucketing.enabled).

Data lands at an explicit external ``path`` (the caller's warehouse
root), so only table *metadata* lives in the session's in-memory
catalog — re-registering after a restart is one ``save_bucketed``-
shaped DDL away, like re-attaching an external table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    *,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog bucketed table (external when ``path``
    given). One shuffle on ``keys`` at write time buys every later
    join/aggregation on those keys its exchange back."""
    # pre-shuffle to one partition per bucket so each bucket is one
    # file per table (bucketBy otherwise writes one file per input
    # partition per bucket — a small-file explosion at high parallelism)
    out = df.repartition(n_buckets, *keys)
    writer = out.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def attach_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    keys: list[str],
    n_buckets: int,
    *,
    sort: bool = True,
) -> None:
    """Re-register an existing bucketed data directory as a catalog
    table (the after-restart / new-cluster path: the parquet files and
    their bucket-id file naming survive on storage; only the catalog
    entry is session-state). The declared spec must match how the data
    was written by ``save_bucketed`` — Spark trusts the catalog's
    bucket spec, so a wrong declaration silently mis-plans joins."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    key_list = ", ".join(f"`{k}`" for k in keys)
    sorted_clause = f" SORTED BY ({key_list})" if sort else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key_list}){sorted_clause} INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the scan carries the bucket spec into planning."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left: str,
    right: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys: plans
    as a sort-merge join with zero Exchange on either side. A cheap
    per-bucket Sort remains unless
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` is enabled
    (Spark 3+ ignores the written sortBy order by default)."""
    return spark.table(left).join(spark.table(right), keys, how)
