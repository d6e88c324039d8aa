"""Kafka source builder (S1).

Reference: the Connect framework's consumer + topics/topics.regex config
(BigQuerySinkTask.java:248-297, BigQuerySinkConfig.java:54-75).

Spark-first: ``spark.readStream.format("kafka")`` exposes
key/value/topic/partition/offset/timestamp natively — the reference's
per-record SinkRecord plumbing collapses into DataFrame columns. The
kafka connector jar isn't bundled in this test image, so the builder is
gated and tests use ``file_stream_source`` (a parquet-dir stream with
the same column contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.config import SinkConfig

# The column contract every source presents to the pipeline — matching
# what spark's kafka source emits.
KAFKA_COLUMNS = ["key", "value", "topic", "partition", "offset", "timestamp"]

KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),  # null = tombstone
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)


def kafka_stream_source(
    spark: SparkSession,
    config: SinkConfig,
    bootstrap_servers: str,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream from Kafka with the reference's subscription options.

    ``max_offsets_per_trigger`` is the declarative backpressure knob
    replacing the reference's pause/resume dance (T3,
    BigQuerySinkTask.java:307-318): instead of pausing partitions when a
    queue overfills, Spark simply caps each micro-batch.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
    )
    if config.topics_regex:
        reader = reader.option("subscribePattern", config.topics_regex)
    else:
        reader = reader.option("subscribe", ",".join(config.topics))
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load().select(*KAFKA_COLUMNS)


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType = KAFKA_SCHEMA,
    max_files_per_trigger: int | None = 10,
) -> DataFrame:
    """Kafka stand-in for tests: a parquet-directory stream presenting
    the same column contract. ``maxFilesPerTrigger`` plays the
    backpressure role of maxOffsetsPerTrigger; ``None`` leaves it unset
    so a trigger drains the WHOLE available backlog in one micro-batch
    — the shape of an interval-amortized sink (the reference's 60 s
    mergeIntervalMs: accumulate, then merge once)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return (
        reader.parquet(path)
        .select(*[F.col(c) for c in schema.fieldNames()])
    )
