"""Schemaless-record ingestion: JSON schema inference.

Reference: BigQueryRecordConverter.java:80-131 — records with no
attached schema are accepted only when the top level is a Map (JSON
object), keys are strings, and values convert best-effort (basic
types, lists, nested maps). The Spark-idiomatic equivalent: infer a
StructType from a bounded sample with the JSON reader (which already
implements recursive best-effort typing + field union), then parse the
full stream with ``from_json`` — inference cost is O(sample), the hot
path stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.schema.converter import SchemaConversionError


def infer_json_schema(
    spark: SparkSession,
    df: DataFrame,
    value_col: str = "value",
    *,
    sample: int = 1000,
) -> T.StructType:
    """Infer a StructType from a sample of JSON-encoded values.

    Mirrors the reference's schemaless constraints: the top level must
    be a JSON object on every sampled record (map-only,
    BigQueryRecordConverter.java:84-92) — scalars/arrays at top level
    raise SchemaConversionError, as does an unparseable record.
    """
    sample_df = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .limit(sample)
    )
    strings = [r["v"] for r in sample_df.collect()]
    if not strings:
        raise SchemaConversionError("no non-null records to infer a schema from")
    inferred = spark.read.json(
        spark.sparkContext.parallelize(strings, 1), multiLine=False
    )
    schema = inferred.schema
    bad = [f for f in schema.fields if f.name == "_corrupt_record"]
    if bad or not schema.fields:
        raise SchemaConversionError(
            "schemaless records must be JSON objects with string keys "
            "(top-level scalars/arrays/malformed records found in sample)"
        )
    return schema


def schemaless_parser(
    spark: SparkSession,
    df: DataFrame,
    value_col: str = "value",
    *,
    sample: int = 1000,
):
    """Build a value_parser for SinkPipeline from an inferred schema."""
    schema = infer_json_schema(spark, df, value_col, sample=sample)
    return lambda c: F.from_json(c.cast("string"), schema)
