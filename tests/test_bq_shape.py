"""BigQuery-shape projection tests (BigQueryRecordConverterTest ports)."""

from __future__ import annotations

import base64

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.functions.bq_shape import (
    JAVA_DOUBLE_MAX,
    JAVA_DOUBLE_MIN,
    clamp_double_specials,
    flatten_struct,
    shape_upsert_rows,
    to_bq_shape,
    with_kafka_metadata,
)


def test_widening_and_base64(spark):
    df = spark.createDataFrame(
        [(1, 2, 3.5, b"hi", {"a": 1})],
        T.StructType(
            [
                T.StructField("i", T.IntegerType()),
                T.StructField("s", T.ShortType()),
                T.StructField("f", T.FloatType()),
                T.StructField("b", T.BinaryType()),
                T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
            ]
        ),
    )
    out = to_bq_shape(df)
    sch = {f.name: f.dataType for f in out.schema.fields}
    assert sch["i"] == T.LongType()
    assert sch["s"] == T.LongType()
    assert sch["f"] == T.DoubleType()
    assert sch["b"] == T.StringType()
    assert isinstance(sch["m"], T.ArrayType)
    assert sch["m"].elementType.fieldNames() == ["key", "value"]
    row = out.first()
    assert row.b == base64.b64encode(b"hi").decode()
    assert row.m == [("a", 1)]


def test_double_clamping(spark):
    df = spark.createDataFrame(
        [(float("inf"), float("-inf"), float("nan"), 1.5)], "a double, b double, c double, d double"
    )
    row = df.select(
        *[clamp_double_specials(F.col(c)).alias(c) for c in df.columns]
    ).first()
    assert row.a == JAVA_DOUBLE_MAX
    assert row.b == JAVA_DOUBLE_MIN
    assert row.c == JAVA_DOUBLE_MIN
    assert row.d == 1.5


def test_nested_struct_shaping(spark):
    df = spark.createDataFrame(
        [((1, b"x"),)],
        T.StructType(
            [
                T.StructField(
                    "s",
                    T.StructType(
                        [
                            T.StructField("n", T.IntegerType()),
                            T.StructField("raw", T.BinaryType()),
                        ]
                    ),
                )
            ]
        ),
    )
    out = to_bq_shape(df)
    inner = out.schema["s"].dataType
    assert inner["n"].dataType == T.LongType()
    assert inner["raw"].dataType == T.StringType()
    row = out.first()
    assert row.s.n == 1 and row.s.raw == base64.b64encode(b"x").decode()


def test_flatten_struct(spark):
    df = spark.createDataFrame([(1, (2, "z"))], "id int, s struct<a:int,b:string>")
    out = flatten_struct(df, "s")
    assert out.columns == ["id", "a", "b"]
    assert out.first().a == 2


def test_kafka_metadata_injection(spark):
    df = spark.createDataFrame([("t1", 0, 42, "v")], "topic string, partition int, offset long, v string")
    out = with_kafka_metadata(df)
    row = out.first()
    assert row.kafkaData.topic == "t1"
    assert row.kafkaData.partition == 0
    assert row.kafkaData.offset == 42
    assert row.kafkaData.insertTime is not None


def test_shape_upsert_rows_tombstone(spark):
    df = spark.createDataFrame([(1, "a", 10), (2, None, 11)], "k int, v string, off long")
    out = shape_upsert_rows(
        df, "k", ["v"], batch_number=3, order_col="off", tombstone=F.col("v").isNull()
    )
    rows = {r.key: r for r in out.collect()}
    assert rows[1].value.v == "a"
    assert rows[2].value is None  # tombstone
    assert rows[1].i == 10 and rows[1].batchNumber == 3
