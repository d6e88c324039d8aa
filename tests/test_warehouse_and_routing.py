"""Warehouse sink, routing, and config validation tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.config import ConfigError, SinkConfig
from kafka_connect_bigquery_spark.operators.routing import (
    RoutingConfigError,
    TopicRouter,
    with_partition_decorator,
    with_routing,
)
from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse, WarehouseError


# -- routing (S7/S8) ---------------------------------------------------------

def test_topic_router_map_and_fallback(spark):
    # RegexRouter semantics: full-topic match with $N capture refs
    r = TopicRouter(topic_map={"t1": "table_one"}, smt_rules=[(r"kcbq-(.*)", "$1")])
    assert r.table_for("t1") == "table_one"
    assert r.table_for("kcbq-orders") == "orders"
    df = spark.createDataFrame([("t1",), ("kcbq-orders",), ("plain",)], "topic string")
    got = {r_["topic"]: r_["__table"] for r_ in with_routing(df, r).collect()}
    assert got == {"t1": "table_one", "kcbq-orders": "orders", "plain": "plain"}


def test_topic_router_sanitize_and_dup_validation():
    r = TopicRouter(sanitize_names=True)
    assert r.table_for("my-topic.v1") == "my_topic_v1"
    with pytest.raises(RoutingConfigError, match="duplicate"):
        TopicRouter(topic_map={"a": "t", "b": "t"})


def test_partition_decorator(spark):
    df = spark.createDataFrame([("2024-03-05 10:00:00",)], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    out = with_partition_decorator(df, ts_col="ts").first()
    assert str(out.p_date) == "2024-03-05"
    # wall-clock fallback for null record time
    out2 = with_partition_decorator(
        spark.createDataFrame([(None,)], "ts timestamp"), ts_col="ts"
    ).first()
    assert out2.p_date is not None


# -- warehouse (S2-S4, L1-L4) -----------------------------------------------

def test_append_create_and_read_back(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a", "2024-01-02 03:00:00")], "id long, v string, ts string")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    wh.append(df, "t", TableSpec(partition_grain="DAY", timestamp_field="ts"))
    back = wh.read("t")
    assert back.count() == 1
    assert "p_date" in back.columns
    # partition directory exists -> pruning-capable layout
    assert any(n.startswith("p_date=2024-01-02") for n in os.listdir(tmp_path / "t"))


def test_append_schema_evolution_new_nullable_field(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    spec = TableSpec(partition_grain="NONE")
    wh.append(spark.createDataFrame([(1, "a")], "id long, v string"), "t", spec)
    wh.append(spark.createDataFrame([(2, "b", 9.5)], "id long, v string, extra double"), "t", spec)
    back = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    rows = {r.id: r for r in back.collect()}
    assert rows[1].asDict().get("extra") is None
    assert rows[2].extra == 9.5


def test_merge_upsert_into_stored_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    spec = TableSpec(partition_grain="NONE")
    wh.overwrite(spark.createDataFrame([(1, "old"), (2, "keep")], "k long, v string"), "t", spec)
    batch = spark.createDataFrame([(1, "new", 10), (3, "ins", 11)], "k long, v string, i long")
    wh.merge(batch, "t", ["k"], mode="upsert", order_col="i", spec=spec)
    got = {r.k: r.v for r in wh.read("t").collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_merge_upsert_delete_into_stored_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    spec = TableSpec(partition_grain="NONE")
    wh.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), "t", spec)
    batch = spark.createDataFrame(
        [(1, None, 10, True), (3, "c", 11, False)], "k long, v string, i long, __tombstone boolean"
    )
    wh.merge(batch, "t", ["k"], mode="upsert_delete", order_col="i", spec=spec)
    got = {r.k: r.v for r in wh.read("t").collect()}
    assert got == {2: "b", 3: "c"}


def test_clustering_limit():
    with pytest.raises(WarehouseError, match="4 clustering"):
        TableSpec(clustering=("a", "b", "c", "d", "e"))


def test_partition_expiration(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
    df = spark.createDataFrame(
        [("2020-01-01 00:00:00", 1), ("2099-01-01 00:00:00", 2)], "ts string, id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    wh.append(df, "t", spec)
    dropped = wh.expire_partitions("t", spec, older_than_days=365)
    assert dropped == 1
    assert wh.read("t").count() == 1


# -- config validation (§2.10) ----------------------------------------------

def test_config_upsert_requires_key():
    with pytest.raises(ConfigError, match="kafkaKeyFieldName"):
        SinkConfig(topics=["t"], upsert_enabled=True).validate()


def test_config_partitioning_mode_exclusive():
    with pytest.raises(ConfigError, match="mutually exclusive"):
        SinkConfig(
            topics=["t"],
            use_partition_decorator=True,
            timestamp_partition_field_name="ts",
        ).validate()


def test_config_merge_both_disabled():
    with pytest.raises(ConfigError, match="cannot both be disabled"):
        SinkConfig(
            topics=["t"],
            upsert_enabled=True,
            kafka_key_field_name="k",
            merge_interval_ms=-1,
            merge_records_threshold=-1,
        ).validate()


def test_config_batch_load_needs_staging():
    with pytest.raises(ConfigError, match="staging"):
        SinkConfig(topics=["t"], enable_batch_load_topics=["t"]).validate()


def test_config_valid_passes():
    SinkConfig(
        topics=["t"],
        upsert_enabled=True,
        delete_enabled=True,
        errors_tolerance="none",
        kafka_key_field_name="k",
        clustering_field_names=("a", "b"),
    ).validate()


def test_append_policy_rejects_new_field(spark, tmp_path):
    """ADVICE r1: disallowed evolution must fail loudly, never silently
    drop incoming columns (SchemaManager.java:264-281 policy gate)."""
    from kafka_connect_bigquery_spark.schema.evolution import SchemaEvolutionError

    wh = Warehouse(spark, str(tmp_path))
    spec = TableSpec(partition_grain="NONE")
    wh.append(spark.createDataFrame([(1, "a")], "id long, v string"), "t", spec)
    with pytest.raises(SchemaEvolutionError, match="new fields"):
        wh.append(
            spark.createDataFrame([(2, "b", 9.5)], "id long, v string, extra double"),
            "t",
            spec,
            allow_new_fields=False,
        )
    # the permissive default still evolves
    wh.append(
        spark.createDataFrame([(3, "c", 1.5)], "id long, v string, extra double"),
        "t",
        spec,
    )


def test_append_policy_rejects_dropped_field_without_unionization(spark, tmp_path):
    from kafka_connect_bigquery_spark.schema.evolution import SchemaEvolutionError

    wh = Warehouse(spark, str(tmp_path))
    spec = TableSpec(partition_grain="NONE")
    wh.append(spark.createDataFrame([(1, "a")], "id long, v string"), "t", spec)
    with pytest.raises(SchemaEvolutionError, match="drops existing"):
        wh.append(
            spark.createDataFrame([(2,)], "id long"),
            "t",
            spec,
            allow_unionization=False,
        )


def test_table_compression_codec(spark, tmp_path):
    import glob as _glob

    import pyarrow.parquet as pq

    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    wh = Warehouse(spark, str(tmp_path / "whc"))
    df = spark.createDataFrame([(i, "x" * 50) for i in range(500)], "k: bigint, s: string")
    wh.append(df, "t", TableSpec(partition_grain="NONE", compression="zstd"))
    files = _glob.glob(f"{wh.path('t')}/**/*.parquet", recursive=True)
    assert files
    md = pq.ParquetFile(files[0]).metadata
    codecs = {md.row_group(0).column(i).compression for i in range(md.row_group(0).num_columns)}
    assert codecs == {"ZSTD"}
    # round-trips like any other table
    assert wh.read("t").count() == 500

    import pytest as _pytest

    from kafka_connect_bigquery_spark.sinks.warehouse import WarehouseError

    with _pytest.raises(WarehouseError, match="compression"):
        TableSpec(compression="brotli9000")
