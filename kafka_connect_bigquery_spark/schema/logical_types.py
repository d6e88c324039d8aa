"""Logical-type converter registry.

Reference: kcbq/convert/logicaltype/LogicalConverterRegistry.java:26-42
(name-keyed registry), KafkaLogicalConverters.java (Kafka built-ins) and
DebeziumLogicalConverters.java (Debezium variants). Registration happens
at import time, like the reference's static initializer blocks
(BigQuerySchemaConverter.java:61-63).

Each converter maps a Connect logical type (identified by schema
``name``) to (expected base type, Spark target type, Column transform).
The transforms reproduce the reference's *lossy* choices exactly —
Decimal -> FLOAT64, TIME -> "HH:mm:ss.SSS" string, etc. — so outputs
match what the reference would have written to BigQuery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Connect base type names
_INT32, _INT64, _STRING, _BYTES = "int32", "int64", "string", "bytes"


@dataclass(frozen=True)
class LogicalConverter:
    name: str
    expected_base: str
    spark_type: T.DataType
    convert: Callable[[Column], Column]


_REGISTRY: dict[str, LogicalConverter] = {}


def register(conv: LogicalConverter) -> None:
    """LogicalConverterRegistry.register (reference :26-31)."""
    _REGISTRY[conv.name] = conv


def lookup(name: str) -> LogicalConverter | None:
    return _REGISTRY.get(name)


def registered_names() -> list[str]:
    return sorted(_REGISTRY)


# --- Kafka built-in logical types (KafkaLogicalConverters.java) -----------

register(
    LogicalConverter(
        # DATE: int32 days since epoch -> DATE (":47-61")
        name="org.apache.kafka.connect.data.Date",
        expected_base=_INT32,
        spark_type=T.DateType(),
        convert=lambda c: F.date_add(F.lit("1970-01-01").cast("date"), c.cast("int")),
    )
)

register(
    LogicalConverter(
        # DECIMAL: bytes-encoded BigDecimal -> FLOAT (lossy!, ":66-81")
        name="org.apache.kafka.connect.data.Decimal",
        expected_base=_BYTES,
        spark_type=T.DoubleType(),
        convert=lambda c: c.cast("double"),
    )
)

register(
    LogicalConverter(
        # TIMESTAMP: int64 epoch-millis -> TIMESTAMP (":86-100")
        name="org.apache.kafka.connect.data.Timestamp",
        expected_base=_INT64,
        spark_type=T.TimestampType(),
        convert=lambda c: F.timestamp_millis(c.cast("long")),
    )
)

register(
    LogicalConverter(
        # TIME: int32 millis-of-day -> "HH:mm:ss.SSS" UTC string (":106-120",
        # format LogicalTypeConverter.java:85-89)
        name="org.apache.kafka.connect.data.Time",
        expected_base=_INT32,
        spark_type=T.StringType(),
        convert=lambda c: F.date_format(F.timestamp_millis(c.cast("long")), "HH:mm:ss.SSS"),
    )
)

# --- Debezium logical types (DebeziumLogicalConverters.java) --------------

register(
    LogicalConverter(
        # io.debezium.time.Date: int32 epoch-days -> DATE (":59-76")
        name="io.debezium.time.Date",
        expected_base=_INT32,
        spark_type=T.DateType(),
        convert=lambda c: F.date_add(F.lit("1970-01-01").cast("date"), c.cast("int")),
    )
)

register(
    LogicalConverter(
        # io.debezium.time.Time: int32 millis-of-day -> TIME string (":143-158")
        name="io.debezium.time.Time",
        expected_base=_INT32,
        spark_type=T.StringType(),
        convert=lambda c: F.date_format(F.timestamp_millis(c.cast("long")), "HH:mm:ss.SSS"),
    )
)

register(
    LogicalConverter(
        # io.debezium.time.MicroTime: int64 micros-of-day -> TIME string with
        # microsecond precision (":81-107": seconds + "." + micro remainder)
        name="io.debezium.time.MicroTime",
        expected_base=_INT64,
        spark_type=T.StringType(),
        convert=lambda c: F.date_format(F.timestamp_micros(c.cast("long")), "HH:mm:ss.SSSSSS"),
    )
)

register(
    LogicalConverter(
        # io.debezium.time.Timestamp: int64 epoch-millis -> TIMESTAMP (":163-178")
        name="io.debezium.time.Timestamp",
        expected_base=_INT64,
        spark_type=T.TimestampType(),
        convert=lambda c: F.timestamp_millis(c.cast("long")),
    )
)

register(
    LogicalConverter(
        # io.debezium.time.MicroTimestamp: int64 epoch-micros -> TIMESTAMP (":112-138")
        name="io.debezium.time.MicroTimestamp",
        expected_base=_INT64,
        spark_type=T.TimestampType(),
        convert=lambda c: F.timestamp_micros(c.cast("long")),
    )
)

register(
    LogicalConverter(
        # io.debezium.time.ZonedTimestamp: ISO-8601 string -> TIMESTAMP (":183-204")
        name="io.debezium.time.ZonedTimestamp",
        expected_base=_STRING,
        spark_type=T.TimestampType(),
        convert=lambda c: F.to_timestamp(c),
    )
)
