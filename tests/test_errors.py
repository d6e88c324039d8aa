"""Error-classification taxonomy tests.

Mirrors the probe scenarios of
kcbq-test/integration/BigQueryErrorResponsesIT.java:69-235 (write to a
nonexistent table, write with a mismatched schema, transient IO) against
this engine's failure surface, plus the retry policy wiring
(BigQueryWriter.java:98-149 via streaming/pipeline.py:retry_with_jitter).
"""

from __future__ import annotations

import pytest

from kafka_connect_bigquery_spark import errors as E
from kafka_connect_bigquery_spark.schema.evolution import SchemaEvolutionError
from kafka_connect_bigquery_spark.streaming.pipeline import retry_with_jitter


# -- classification ----------------------------------------------------------

def test_real_missing_table_is_retriable_after_create(spark, tmp_path):
    """IT scenario 'write to a nonexistent table' — the real exception
    Spark raises for a missing path classifies as needing creation."""
    exc = None
    try:
        spark.read.parquet(str(tmp_path / "no_such_table")).collect()
    except Exception as e:  # noqa: BLE001
        exc = e
    assert exc is not None
    assert E.is_nonexistent_table_error(exc)
    assert E.classify(exc) is E.ErrorClass.RETRIABLE_AFTER_TABLE_CREATE
    assert E.is_retriable(exc)


def test_schema_mismatch_is_fatal():
    """IT scenario 'write with a mismatched schema' — fail fast, a retry
    can never fix a disallowed evolution."""
    exc = SchemaEvolutionError("new fields ['extra'] not allowed")
    assert E.classify(exc) is E.ErrorClass.FATAL_SCHEMA
    assert not E.is_retriable(exc)
    spark_side = Exception(
        "[UNRESOLVED_COLUMN.WITH_SUGGESTION] A column `extra` cannot be resolved"
    )
    assert E.classify(spark_side) is E.ErrorClass.FATAL_SCHEMA


def test_transient_io_and_backend_are_retriable():
    assert E.classify(OSError("disk hiccup")) is E.ErrorClass.RETRIABLE
    assert E.classify(Exception("java.io.IOException: connection lost")) is (
        E.ErrorClass.RETRIABLE
    )
    assert E.classify(
        Exception("FetchFailed(BlockManagerId(...), shuffleId=3)")
    ) is E.ErrorClass.RETRIABLE
    assert E.classify(Exception("quota exceeded for requests")) is (
        E.ErrorClass.RETRIABLE
    )


def test_stopped_and_unknown_are_fatal():
    assert E.classify(Exception("SparkContext was shut down")) is E.ErrorClass.FATAL
    assert E.classify(ValueError("some application bug")) is E.ErrorClass.FATAL
    assert not E.is_retriable(ValueError("some application bug"))


def test_stopped_wins_over_retriable_text():
    # most-specific-first ordering: a cancelled job mentioning IO still fails
    exc = Exception("java.io.IOException after SparkContext was shut down")
    assert E.classify(exc) is E.ErrorClass.FATAL


# -- retry policy wiring -----------------------------------------------------

def test_retry_recovers_from_transient_io():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise OSError("transient")
        return "ok"

    out = retry_with_jitter(
        flaky, retries=5, wait_ms=0, classify=E.is_retriable, sleep=lambda s: None
    )
    assert out == "ok"
    assert len(attempts) == 3


def test_retry_fails_fast_on_schema_error():
    attempts = []

    def broken():
        attempts.append(1)
        raise SchemaEvolutionError("type mismatch for field 'x'")

    with pytest.raises(SchemaEvolutionError):
        retry_with_jitter(
            broken, retries=5, wait_ms=0, classify=E.is_retriable, sleep=lambda s: None
        )
    assert len(attempts) == 1  # no retries burned on a fatal error


def test_retry_exhaustion_reraises():
    def always_down():
        raise OSError("still down")

    with pytest.raises(OSError):
        retry_with_jitter(
            always_down, retries=2, wait_ms=0, classify=E.is_retriable,
            sleep=lambda s: None,
        )


def test_pipeline_append_fails_fast_on_disallowed_evolution(spark, tmp_path):
    """End-to-end: the streaming append path surfaces a schema-policy
    violation immediately (no retry loop) — reference behavior when
    allowNewBigQueryFields=false."""
    from kafka_connect_bigquery_spark.config import SinkConfig
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse
    from kafka_connect_bigquery_spark.streaming.pipeline import SinkPipeline

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        "t",
        TableSpec(partition_grain="NONE"),
    )
    cfg = SinkConfig(
        topics=["t"],
        time_partitioning_type="NONE",
        bigquery_retry=5,
        allow_new_bigquery_fields=False,
    )
    pipe = SinkPipeline(warehouse=wh, config=cfg)
    with pytest.raises(SchemaEvolutionError):
        pipe._retried(
            lambda: wh.append(
                spark.createDataFrame([(2, "b", 1.5)], "id long, v string, x double"),
                "t",
                TableSpec(partition_grain="NONE"),
                allow_new_fields=False,
            )
        )
