"""Pluggable SchemaRetriever (X1) tests.

Mirrors the reference's public API package contract
(kcbq-api/.../SchemaRetriever.java:31-52), the reflective loading of the
configured class (BigQuerySinkConfig.java:936-982), and the identity
default (IdentitySchemaRetriever.java:32-46).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.config import SinkConfig
from kafka_connect_bigquery_spark.schema.retriever import (
    IdentitySchemaRetriever,
    SchemaRetriever,
    SchemaRetrieverError,
    StaticSchemaRetriever,
    load_retriever,
)
from kafka_connect_bigquery_spark.sinks.warehouse import (
    TableSpec,
    Warehouse,
    WarehouseError,
)
from kafka_connect_bigquery_spark.sources.kafka import KAFKA_SCHEMA, file_stream_source
from kafka_connect_bigquery_spark.streaming.pipeline import SinkPipeline


def test_identity_default_and_protocol():
    r = load_retriever(None)
    assert isinstance(r, IdentitySchemaRetriever)
    assert isinstance(r, SchemaRetriever)  # runtime-checkable protocol
    assert r.retrieve_value_schema("any") is None
    assert r.retrieve_key_schema("any") is None


def test_reflective_load_and_errors(spark):
    r = load_retriever(
        "kafka_connect_bigquery_spark.schema.retriever:StaticSchemaRetriever",
        {"orders": "id long, v string"},
    )
    assert isinstance(r, StaticSchemaRetriever)
    assert r.retrieve_value_schema("orders") == T.StructType.fromDDL(
        "id long, v string"
    )
    with pytest.raises(SchemaRetrieverError, match="module:ClassName"):
        load_retriever("not-a-spec")
    with pytest.raises(SchemaRetrieverError, match="cannot load"):
        load_retriever("kafka_connect_bigquery_spark.schema.retriever:Nope")
    with pytest.raises(SchemaRetrieverError, match="does not implement"):
        load_retriever("builtins:object")


def test_static_retriever_key_schema(spark):
    r = StaticSchemaRetriever()
    r.configure({"t": "id long", "t#key": "k string"})
    assert r.retrieve_key_schema("t") == T.StructType.fromDDL("k string")


def _pipe(spark, tmp_path, retriever, rows):
    src = str(tmp_path / "src")
    kafka_rows = [
        (None, json.dumps(v).encode(), topic, 0, i, None)
        for i, (topic, v) in enumerate(rows)
    ]
    spark.createDataFrame(kafka_rows, KAFKA_SCHEMA).write.mode("append").parquet(src)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    cfg = SinkConfig(topics=["orders"], time_partitioning_type="NONE")
    parser = lambda c: F.from_json(  # noqa: E731
        c.cast("string"), T.StructType.fromDDL("id long, v string")
    )
    pipe = SinkPipeline(
        warehouse=wh, config=cfg, value_parser=parser, schema_retriever=retriever
    )
    q = pipe.start(file_stream_source(spark, src), str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        exc = q.exception()
    finally:
        q.stop()
    return wh, exc


def test_retriever_schema_drives_table_creation(spark, tmp_path):
    """The retrieved schema (with an extra nullable field the batch does
    not carry) is authoritative for auto-create — SchemaManager trusts
    retrieveValueSchema over the record."""
    r = StaticSchemaRetriever()
    r.configure({"orders": "id long, v string, extra double"})
    wh, exc = _pipe(spark, tmp_path, r, [("orders", {"id": 1, "v": "a"})])
    assert exc is None
    back = wh.read("orders")
    assert set(back.columns) == {"id", "v", "extra"}
    row = back.first()
    assert (row.id, row.v, row.extra) == (1, "a", None)


def test_batch_column_missing_from_retrieved_schema_fails(spark, tmp_path):
    """A batch column the retriever doesn't know is the reference's
    per-row 'no such field' insert error — fail loudly, no silent drop."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    r = StaticSchemaRetriever()
    r.configure({"orders": "id long"})
    with pytest.raises(WarehouseError, match="absent from the retrieved schema"):
        wh.append(
            spark.createDataFrame([(1, "a")], "id long, v string"),
            "orders",
            TableSpec(partition_grain="NONE"),
            proposed_schema=r.retrieve_value_schema("orders"),
        )
