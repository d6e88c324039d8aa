"""Ports of the reference's converter unit tests.

Mirrors kcbq-test/convert/BigQuerySchemaConverterTest.java (per-type
conversion, widening, nesting, maps, cycle rejection) and
KafkaLogicalConvertersTest / DebeziumLogicalConvertersTest.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.schema import (
    SchemaConversionError,
    connect_to_spark,
    sanitize_field_names,
    sanitize_name,
)
from kafka_connect_bigquery_spark.schema import logical_types


def f(fname, typ, optional=False, **kw):
    d = {"field": fname, "type": typ, "optional": optional}
    d.update(kw)
    return d


def test_primitive_widening():
    sch = connect_to_spark(
        {
            "type": "struct",
            "fields": [
                f("b", "boolean"),
                f("i8", "int8"),
                f("i16", "int16"),
                f("i32", "int32"),
                f("i64", "int64"),
                f("f32", "float32"),
                f("f64", "float64"),
                f("s", "string"),
                f("by", "bytes"),
            ],
        }
    )
    got = {fld.name: fld.dataType for fld in sch.fields}
    assert got["b"] == T.BooleanType()
    for k in ("i8", "i16", "i32", "i64"):
        assert got[k] == T.LongType(), k  # all ints -> INT64
    for k in ("f32", "f64"):
        assert got[k] == T.DoubleType(), k  # all floats -> FLOAT64
    assert got["s"] == T.StringType()
    assert got["by"] == T.BinaryType()


def test_nullability_modes():
    sch = connect_to_spark(
        {"type": "struct", "fields": [f("req", "string"), f("opt", "string", True)]}
    )
    assert not sch["req"].nullable
    assert sch["opt"].nullable
    all_null = connect_to_spark(
        {"type": "struct", "fields": [f("req", "string")]}, all_fields_nullable=True
    )
    assert all_null["req"].nullable


def test_nested_struct_and_empty_struct_dropped():
    sch = connect_to_spark(
        {
            "type": "struct",
            "fields": [
                {
                    "field": "inner",
                    "type": "struct",
                    "fields": [f("x", "int32")],
                },
                {"field": "empty", "type": "struct", "fields": []},
                f("y", "string"),
            ],
        }
    )
    assert [fld.name for fld in sch.fields] == ["inner", "y"]
    assert sch["inner"].dataType == T.StructType([T.StructField("x", T.LongType(), False)])


def test_array_and_map_shapes():
    sch = connect_to_spark(
        {
            "type": "struct",
            "fields": [
                {"field": "tags", "type": "array", "items": {"type": "string"}},
                {
                    "field": "attrs",
                    "type": "map",
                    "keys": {"type": "string"},
                    "values": {"type": "int32", "optional": True},
                },
            ],
        }
    )
    assert sch["tags"].dataType == T.ArrayType(T.StringType(), False)
    entry = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.LongType(), True),
        ]
    )
    assert sch["attrs"].dataType == T.ArrayType(entry, False)


def test_recursive_schema_rejected():
    inner = {"field": "self", "type": "struct", "fields": []}
    inner["fields"] = [inner]  # self-reference
    with pytest.raises(SchemaConversionError, match="recursive|cycle"):
        connect_to_spark({"type": "struct", "fields": [inner]})


def test_non_struct_top_level_rejected():
    with pytest.raises(SchemaConversionError):
        connect_to_spark({"type": "int64"})


def test_logical_types_schema_mapping():
    sch = connect_to_spark(
        {
            "type": "struct",
            "fields": [
                f("d", "int32", name="org.apache.kafka.connect.data.Date"),
                f("dec", "bytes", name="org.apache.kafka.connect.data.Decimal"),
                f("ts", "int64", name="org.apache.kafka.connect.data.Timestamp"),
                f("t", "int32", name="org.apache.kafka.connect.data.Time"),
                f("dbz_ts", "int64", name="io.debezium.time.MicroTimestamp"),
                f("dbz_z", "string", name="io.debezium.time.ZonedTimestamp"),
            ],
        }
    )
    got = {fld.name: fld.dataType for fld in sch.fields}
    assert got["d"] == T.DateType()
    assert got["dec"] == T.DoubleType()  # lossy Decimal->FLOAT
    assert got["ts"] == T.TimestampType()
    assert got["t"] == T.StringType()  # TIME as formatted string
    assert got["dbz_ts"] == T.TimestampType()
    assert got["dbz_z"] == T.TimestampType()


def test_logical_type_base_mismatch_rejected():
    with pytest.raises(SchemaConversionError, match="expects base"):
        connect_to_spark(
            {
                "type": "struct",
                "fields": [f("ts", "string", name="org.apache.kafka.connect.data.Timestamp")],
            }
        )


def test_logical_converters_values(spark):
    df = spark.createDataFrame(
        [(0, 86_399_999, 1_556_175_970_000, 1_556_175_970_000_000)],
        "days int, ms_of_day int, epoch_ms long, epoch_us long",
    )
    lt = logical_types
    out = df.select(
        lt.lookup("org.apache.kafka.connect.data.Date").convert(F.col("days")).alias("d"),
        lt.lookup("org.apache.kafka.connect.data.Time").convert(F.col("ms_of_day")).alias("t"),
        lt.lookup("org.apache.kafka.connect.data.Timestamp").convert(F.col("epoch_ms")).alias("ts"),
        lt.lookup("io.debezium.time.MicroTimestamp").convert(F.col("epoch_us")).alias("uts"),
    ).first()
    assert out.d == datetime.date(1970, 1, 1)
    assert out.t == "23:59:59.999"  # KafkaLogicalConvertersTest format
    assert out.ts == datetime.datetime(2019, 4, 25, 7, 6, 10)
    assert out.uts == datetime.datetime(2019, 4, 25, 7, 6, 10)


def test_sanitize_name():
    # FieldNameSanitizerTest cases
    assert sanitize_name("valid_name_1") == "valid_name_1"
    assert sanitize_name("invalid-name") == "invalid_name"
    assert sanitize_name("1starts_digit") == "_1starts_digit"
    assert sanitize_name("a b.c/d") == "a_b_c_d"


def test_sanitize_field_names_recursive(spark):
    df = spark.createDataFrame([(1, (2,))], "`my-id` int, `1nest` struct<`x y`:int>")
    out = sanitize_field_names(df)
    assert out.columns == ["my_id", "_1nest"]
    nested = out.schema["_1nest"].dataType
    assert nested.fieldNames() == ["x_y"]
    assert out.first()["_1nest"]["x_y"] == 2


def test_microtime_unpadded_remainder(spark):
    """DebeziumLogicalConverters.java:81-107 emits 'HH:mm:ss' + '.' +
    the UNPADDED micro remainder (a reference quirk that drops the
    remainder's leading zeros) — reproduced verbatim."""
    df = spark.createDataFrame(
        [(1_000_001,), (86_399_999_999,), (1_500_000,)], "us long"
    )
    conv = logical_types.lookup("io.debezium.time.MicroTime").convert
    got = [r.t for r in df.select(conv(F.col("us")).alias("t")).collect()]
    assert got == ["00:00:01.1", "23:59:59.999999", "00:00:01.500000"]


def test_decimal_decode_bytes(spark):
    """Connect Decimal wire format: big-endian two's-complement unscaled
    bytes + schema 'scale' (Decimal.toLogical) -> FLOAT64 like the
    reference's BigQuery FLOAT target (KafkaLogicalConverters.java:66-81)."""
    rows = [
        (bytearray((100).to_bytes(1, "big", signed=True)),),        # 100
        (bytearray((-100).to_bytes(2, "big", signed=True)),),       # -100
        (bytearray((1234567).to_bytes(4, "big", signed=True)),),    # 1234567
        (bytearray((-1).to_bytes(8, "big", signed=True)),),         # -1
    ]
    df = spark.createDataFrame(rows, "b binary")
    conv = logical_types.lookup("org.apache.kafka.connect.data.Decimal").convert
    got0 = [r.v for r in df.select(conv(F.col("b")).alias("v")).collect()]
    assert got0 == [100.0, -100.0, 1234567.0, -1.0]
    got2 = [r.v for r in df.select(conv(F.col("b"), scale=2).alias("v")).collect()]
    assert got2 == [1.0, -1.0, 12345.67, -0.01]
