"""Schemaless ingestion tests: JSON schema inference + end-to-end
pipeline run with an inferred parser (BigQueryRecordConverter.java's
map-only best-effort conversion, Spark-idiomatic)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.config import SinkConfig
from kafka_connect_bigquery_spark.schema.converter import SchemaConversionError
from kafka_connect_bigquery_spark.schema.inference import (
    infer_json_schema,
    schemaless_parser,
)
from kafka_connect_bigquery_spark.sinks.warehouse import Warehouse
from kafka_connect_bigquery_spark.sources.kafka import KAFKA_SCHEMA, file_stream_source
from kafka_connect_bigquery_spark.streaming.pipeline import SinkPipeline


def _values_df(spark, objs):
    return spark.createDataFrame(
        [(json.dumps(o).encode() if o is not None else None,) for o in objs],
        T.StructType([T.StructField("value", T.BinaryType())]),
    )


def test_infer_unions_heterogeneous_objects(spark):
    df = _values_df(
        spark,
        [
            {"a": 1, "b": "x"},
            {"a": 2, "c": [1.5, 2.5]},
            {"b": "y", "d": {"e": True}},
            None,  # nulls ignored
        ],
    )
    schema = infer_json_schema(spark, df)
    by_name = {f.name: f.dataType for f in schema.fields}
    assert by_name["a"] == T.LongType()
    assert by_name["b"] == T.StringType()
    assert by_name["c"] == T.ArrayType(T.DoubleType())
    assert isinstance(by_name["d"], T.StructType)


def test_infer_rejects_top_level_scalars(spark):
    df = spark.createDataFrame(
        [(b"42",), (json.dumps({"a": 1}).encode(),)],
        T.StructType([T.StructField("value", T.BinaryType())]),
    )
    with pytest.raises(SchemaConversionError, match="JSON objects"):
        infer_json_schema(spark, df)


def test_infer_rejects_empty_sample(spark):
    df = _values_df(spark, [None])
    with pytest.raises(SchemaConversionError, match="no non-null records"):
        infer_json_schema(spark, df)


def test_schemaless_pipeline_end_to_end(spark, tmp_path):
    objs = [
        {"row": 1, "name": "a", "score": 0.5},
        {"row": 2, "name": "b"},
        {"row": 3, "score": 1.5, "extra": "late-field"},
    ]
    rows = [(None, json.dumps(o).encode(), "t", 0, i, None) for i, o in enumerate(objs)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, KAFKA_SCHEMA).write.parquet(src)

    batch_df = spark.read.parquet(src)
    parser = schemaless_parser(spark, batch_df)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    cfg = SinkConfig(topics=["t"], time_partitioning_type="NONE")
    pipe = SinkPipeline(warehouse=wh, config=cfg, value_parser=parser)
    q = pipe.start(file_stream_source(spark, src), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    got = wh.read("t").orderBy("row").collect()
    assert [(r["row"], r["name"], r["score"], r["extra"]) for r in got] == [
        (1, "a", 0.5, None),
        (2, "b", None, None),
        (3, None, 1.5, "late-field"),
    ]
