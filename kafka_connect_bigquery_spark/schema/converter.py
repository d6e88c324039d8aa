"""Connect-style schema descriptor -> Spark StructType.

Reference: kcbq/convert/BigQuerySchemaConverter.java. Descriptors are
plain dicts shaped like Kafka Connect's JSON schema representation:

    {"type": "struct", "fields": [
        {"field": "id", "type": "int64", "optional": False},
        {"field": "tags", "type": "array", "items": {"type": "string"}},
        {"field": "attrs", "type": "map",
         "keys": {"type": "string"}, "values": {"type": "int32"}},
        {"field": "when", "type": "int64",
         "name": "org.apache.kafka.connect.data.Timestamp"},
    ]}

Reproduced behaviors:
- primitive widening (:65-84): all ints -> INT64/LongType, all floats ->
  FLOAT64/DoubleType (BigQuery has single INTEGER/FLOAT types);
- STRUCT -> nested StructType; **empty structs dropped** (:223-224);
- ARRAY -> ArrayType (mode REPEATED, nullability untouched :199-202);
- MAP -> REPEATED RECORD of {key, value} pairs (:241-260);
- logical types via the registry (schema ``name`` key);
- recursive-schema rejection via cycle detection (:130-157);
- optionality -> nullable, with ``all_fields_nullable`` override
  (:197-210, config BigQuerySinkConfig.java:277-284);
- field-name sanitization hook (:163-165).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from kafka_connect_bigquery_spark.schema import logical_types
from kafka_connect_bigquery_spark.schema.sanitize import sanitize_name

MAP_KEY_FIELD_NAME = "key"  # BigQuerySchemaConverter.java:51-56
MAP_VALUE_FIELD_NAME = "value"


class SchemaConversionError(ValueError):
    """Mirrors the reference's ConversionConnectException."""


_PRIMITIVES: dict[str, T.DataType] = {
    # widening per BigQuerySchemaConverter.java:65-84
    "boolean": T.BooleanType(),
    "int8": T.LongType(),
    "int16": T.LongType(),
    "int32": T.LongType(),
    "int64": T.LongType(),
    "float32": T.DoubleType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def connect_to_spark(
    descriptor: dict[str, Any],
    *,
    all_fields_nullable: bool = False,
    sanitize: bool = False,
) -> T.StructType:
    """Convert a top-level struct descriptor to a StructType.

    Raises SchemaConversionError for non-struct top level, unknown
    types, or recursive schemas (cycle detection mirrors
    BigQuerySchemaConverter.java:130-157).
    """
    if descriptor.get("type") != "struct":
        raise SchemaConversionError(
            f"top-level schema must be a struct, got {descriptor.get('type')!r}"
        )
    dt = _convert(descriptor, all_fields_nullable, sanitize, seen=[])
    if not isinstance(dt, T.StructType) or not dt.fields:
        raise SchemaConversionError("top-level struct has no convertible fields")
    return dt


def _convert(
    desc: dict[str, Any],
    all_nullable: bool,
    sanitize: bool,
    seen: list[int],
) -> T.DataType | None:
    logical_name = desc.get("name")
    if logical_name:
        conv = logical_types.lookup(logical_name)
        if conv is not None:
            base = desc.get("type")
            if base != conv.expected_base:
                raise SchemaConversionError(
                    f"logical type {logical_name} expects base {conv.expected_base}, got {base}"
                )
            return conv.spark_type

    typ = desc.get("type")
    if typ in _PRIMITIVES:
        return _PRIMITIVES[typ]

    if typ == "struct":
        if id(desc) in seen:
            raise SchemaConversionError(
                "recursive schemas are not supported (cycle detected)"
            )
        seen = seen + [id(desc)]
        fields = []
        for f in desc.get("fields", []):
            name = f.get("field")
            if name is None:
                raise SchemaConversionError("struct field missing 'field' name")
            sub = _convert(f, all_nullable, sanitize, seen)
            if sub is None:  # empty nested struct -> dropped (:223-224)
                continue
            nullable = True if all_nullable else bool(f.get("optional", False))
            if sanitize:
                name = sanitize_name(name)
            fields.append(T.StructField(name, sub, nullable))
        if not fields:
            return None  # empty struct dropped
        return T.StructType(fields)

    if typ == "array":
        items = desc.get("items")
        if items is None:
            raise SchemaConversionError("array schema missing 'items'")
        elem = _convert(items, all_nullable, sanitize, seen)
        if elem is None:
            raise SchemaConversionError("array of empty struct is not representable")
        # arrays are REPEATED; element nullability follows item optionality
        return T.ArrayType(elem, containsNull=bool(items.get("optional", False)))

    if typ == "map":
        keys = desc.get("keys")
        values = desc.get("values")
        if keys is None or values is None:
            raise SchemaConversionError("map schema missing 'keys'/'values'")
        kt = _convert(keys, all_nullable, sanitize, seen)
        vt = _convert(values, all_nullable, sanitize, seen)
        if kt is None or vt is None:
            raise SchemaConversionError("map of empty struct is not representable")
        # BigQuery shape: REPEATED RECORD {key, value} (:241-260). We keep
        # the entry-array shape in the schema so written output matches the
        # reference; functions/bq_shape.py converts live MapType columns.
        return T.ArrayType(
            T.StructType(
                [
                    T.StructField(MAP_KEY_FIELD_NAME, kt, False),
                    T.StructField(MAP_VALUE_FIELD_NAME, vt, bool(values.get("optional", False))),
                ]
            ),
            containsNull=False,
        )

    raise SchemaConversionError(f"unsupported schema type: {typ!r}")
