"""Error-classification taxonomy for the warehouse's failure modes.

Reference: kcbq/write/row/BigQueryErrorResponses.java:51-129 — the
reference inspects BigQuery HTTP codes/reasons/messages to decide
whether a failed write is retriable, needs the table created first, or
is fatal. This engine's warehouse fails with Spark/Python exceptions
instead of HTTP responses, so each reference predicate is re-expressed
against that surface (probed by the scenarios of
kcbq-test/integration/BigQueryErrorResponsesIT.java:69-235):

========================================  =====================================
reference predicate                       this engine's signal
========================================  =====================================
isNonExistentTableError (404 notFound)    AnalysisException PATH_NOT_FOUND /
                                          "Path does not exist" /
                                          java FileNotFoundException text
isTableMissingSchemaError,                SchemaEvolutionError, AnalysisException
isUnrecognizedFieldError,                 UNRESOLVED_COLUMN / CANNOT_MERGE /
isMissingRequiredFieldError (400)         "Failed to merge" schema texts
isBackendError (500/502/503)              transient Spark infra: FetchFailed,
                                          ExecutorLost, connection reset/refused,
                                          Py4J network failures
isIOError (IOException cause)             OSError and java.io.IOException text
isQuotaExceeded/isRateLimitExceeded(403)  "quota"/"rate limit"/"throttl" text
isRequestTooLargeError/isTooManyRows      (dropped with T9 batch-halving —
                                          parquet appends have no payload cap)
isStoppedError ("stopped")                cancelled job / stopped SparkContext
========================================  =====================================

``is_retriable`` is the policy the reference implements in
BigQueryWriter.java:98-149: backend + IO + rate-limit errors retry with
jitter; schema errors and stopped jobs fail fast; a missing table is
retriable *after* table creation (the append path auto-creates, so the
retry itself performs the fix — AdaptiveBigQueryWriter.java:85-148).
"""

from __future__ import annotations

import enum

from kafka_connect_bigquery_spark.schema.evolution import SchemaEvolutionError


class ConversionError(RuntimeError):
    """A record failed value conversion under errors_tolerance='none'
    (the Connect framework's strict mode) — a DATA error, never
    retriable: replaying the same malformed bytes cannot succeed."""


class ErrorClass(enum.Enum):
    RETRIABLE = "retriable"
    RETRIABLE_AFTER_TABLE_CREATE = "retriable_after_table_create"
    FATAL_SCHEMA = "fatal_schema"
    FATAL = "fatal"


def _text(exc: BaseException) -> str:
    parts = [type(exc).__name__, str(exc)]
    cause = getattr(exc, "__cause__", None)
    if cause is not None:
        parts.append(str(cause))
    return " ".join(parts)


# --- predicates (one per reference predicate family) -----------------------

_MISSING_TABLE_MARKS = (
    "PATH_NOT_FOUND",
    "Path does not exist",
    "FileNotFoundException",
    "TABLE_OR_VIEW_NOT_FOUND",
)

_SCHEMA_MARKS = (
    "UNRESOLVED_COLUMN",
    "CANNOT_MERGE",
    "Failed to merge",
    "INCOMPATIBLE_DATA_FOR_TABLE",
    "PARQUET_TYPE_ILLEGAL",
)

_BACKEND_MARKS = (
    "FetchFailed",
    "ExecutorLost",
    "Connection reset",
    "Connection refused",
    "Py4JNetworkError",
    "Broken pipe",
    "Answer from Java side is empty",
)

_RATE_MARKS = ("quota", "rate limit", "throttl", "Too many requests")

_STOPPED_MARKS = (
    "SparkContext was shut down",
    "cancelled",
    "Cancelled",
    "InterruptedException",
)


def is_nonexistent_table_error(exc: BaseException) -> bool:
    """BigQueryErrorResponses.isNonExistentTableError (:51-59)."""
    t = _text(exc)
    return any(m in t for m in _MISSING_TABLE_MARKS)


def is_schema_mismatch_error(exc: BaseException) -> bool:
    """isTableMissingSchemaError + the per-row invalid-field reasons
    (:61-67, :115-124)."""
    if isinstance(exc, SchemaEvolutionError):
        return True
    t = _text(exc)
    return any(m in t for m in _SCHEMA_MARKS)


def is_backend_error(exc: BaseException) -> bool:
    """isBackendError (:69-80): transient infra, retry verbatim."""
    t = _text(exc)
    return any(m in t for m in _BACKEND_MARKS)


def is_io_error(exc: BaseException) -> bool:
    """isIOError (:110-113)."""
    if isinstance(exc, OSError):
        return True
    return "java.io.IOException" in _text(exc)


def is_rate_limited_error(exc: BaseException) -> bool:
    """isQuotaExceededError + isRateLimitExceededError (:86-100)."""
    t = _text(exc).lower()
    return any(m.lower() in t for m in _RATE_MARKS)


def is_stopped_error(exc: BaseException) -> bool:
    """isStoppedError (:126-129): the job is going away, don't retry."""
    t = _text(exc)
    return any(m in t for m in _STOPPED_MARKS)


# --- policy -----------------------------------------------------------------

def classify(exc: BaseException) -> ErrorClass:
    """Full classification, most-specific first (the reference checks
    stopped/schema before generic retry in BigQueryWriter.java:98-149)."""
    if is_stopped_error(exc):
        return ErrorClass.FATAL
    if is_schema_mismatch_error(exc):
        return ErrorClass.FATAL_SCHEMA
    if is_nonexistent_table_error(exc):
        return ErrorClass.RETRIABLE_AFTER_TABLE_CREATE
    if is_backend_error(exc) or is_io_error(exc) or is_rate_limited_error(exc):
        return ErrorClass.RETRIABLE
    return ErrorClass.FATAL


def is_retriable(exc: BaseException) -> bool:
    """The ``classify`` callback shape retry_with_jitter expects."""
    return classify(exc) in (
        ErrorClass.RETRIABLE,
        ErrorClass.RETRIABLE_AFTER_TABLE_CREATE,
    )
