"""Field-name sanitization to BigQuery-legal identifiers.

Reference: kcbq/utils/FieldNameSanitizer.java:29-54 — replace every
character outside ``[a-zA-Z0-9_]`` with ``_`` and prefix ``_`` when the
name starts with a digit; applied recursively to nested fields.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_ILLEGAL = re.compile(r"[^a-zA-Z0-9_]")


def sanitize_name(name: str) -> str:
    """Sanitize one field name (FieldNameSanitizer.java:29-35)."""
    out = _ILLEGAL.sub("_", name)
    if out and out[0].isdigit():
        out = "_" + out
    return out


def _sanitize_type(dt: T.DataType) -> T.DataType:
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    sanitize_name(f.name), _sanitize_type(f.dataType), f.nullable, f.metadata
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_sanitize_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _sanitize_type(dt.keyType), _sanitize_type(dt.valueType), dt.valueContainsNull
        )
    return dt


def sanitize_field_names(df):
    """Recursively sanitize all column names of a DataFrame (the Spark
    equivalent of FieldNameSanitizer.java:43-54 applied to row keys).

    Top-level renames are metadata-only; nested struct renames are a
    cast to the sanitized StructType (no shuffle, codegen'd projection).
    """
    out = df
    for f in df.schema.fields:
        clean_type = _sanitize_type(f.dataType)
        col = out[f.name]
        if clean_type != f.dataType:
            col = col.cast(clean_type)
            out = out.withColumn(f.name, col)
        clean = sanitize_name(f.name)
        if clean != f.name:
            out = out.withColumnRenamed(f.name, clean)
    return out
