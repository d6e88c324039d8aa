"""Sink configuration + preflight validation.

Reference: kcbq/config/BigQuerySinkConfig.java (keys + defaults) and the
MultiPropertyValidator framework (:829-868, validators in config/*.java).
Validation runs *before* the stream starts, exactly like the
reference's preflight ``validate()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConfigError(ValueError):
    """Mirrors Kafka Connect's ConfigException."""


@dataclass
class SinkConfig:
    # S1 source
    topics: list[str] = field(default_factory=list)
    topics_regex: str | None = None  # BigQuerySinkConfig.java:54-75
    # S7 routing
    topic2table_map: dict[str, str] = field(default_factory=dict)
    sanitize_topics: bool = False
    default_dataset: str = "default"
    # SMT-style RegexRouter chain applied before routing, exactly like
    # Connect's transforms list (quickstart connector.properties:35-38):
    # [(java_regex, replacement_with_$N), ...]
    smt_regex_routers: list[tuple[str, str]] = field(default_factory=list)
    # schema policy (SchemaManager flags)
    allow_new_bigquery_fields: bool = False      # :301-306
    allow_required_field_relaxation: bool = False  # :308-313
    allow_schema_unionization: bool = False       # :315-321
    all_bq_fields_nullable: bool = False          # :277-284
    sanitize_field_names: bool = False
    convert_double_special_values: bool = False   # :268-275
    # upsert/delete (MergeQueries)
    upsert_enabled: bool = False                  # :333-339
    delete_enabled: bool = False                  # :341-347
    merge_interval_ms: int = 60_000               # :353-374
    merge_records_threshold: int = -1             # :376-397
    kafka_key_field_name: str | None = None       # :286-291
    kafka_data_field_name: str | None = None      # :293-298
    # partitioning (L1-L4)
    time_partitioning_type: str = "DAY"           # :496-508
    timestamp_partition_field_name: str | None = None  # L2
    partition_expiration_ms: int | None = None    # :510-523
    clustering_field_names: tuple[str, ...] = ()  # :480-490
    use_partition_decorator: bool = False          # bigQueryPartitionDecorator
    use_message_time_partitioning: bool = False
    # batch-load path (S5/S6)
    enable_batch_load_topics: list[str] = field(default_factory=list)
    batch_load_interval_sec: int = 120            # :84-91
    gcs_staging_dir: str | None = None            # stands in for gcsBucketName
    # record-conversion error handling — the Connect FRAMEWORK's
    # errors.tolerance / errors.deadletterqueue.topic.name contract
    # (framework-level in the reference deployment; the connector sees
    # only already-converted records). "permissive" keeps the engine's
    # historical behavior (unparsable values flow as NULLs — note that
    # in delete_enabled mode a NULL value is a tombstone, so strict or
    # DLQ is strongly recommended for upsert pipelines); "none" fails
    # the batch on the first conversion failure (the Connect default);
    # "all" routes failures to dead_letter_table and continues.
    errors_tolerance: str = "permissive"          # permissive | none | all
    dead_letter_table: str | None = None
    # ops (T2/T3/T8)
    thread_pool_size: int = 10                    # :399-407
    queue_size: int = -1                          # :409-419
    bigquery_retry: int = 0                       # :421-428
    bigquery_retry_wait_ms: int = 1000            # :430-440

    def validate(self) -> None:
        """Preflight validation: every rule mirrors a reference validator."""
        if not self.topics and not self.topics_regex:
            raise ConfigError("one of topics / topics_regex is required")
        if self.topics and self.topics_regex:
            raise ConfigError("topics and topics_regex are mutually exclusive")

        # UpsertDeleteValidator.java:48-101
        if (self.upsert_enabled or self.delete_enabled):
            if self.kafka_key_field_name is None:
                raise ConfigError(
                    "kafkaKeyFieldName must be specified when upsert/delete is enabled"
                )
            if self.merge_interval_ms == -1 and self.merge_records_threshold == -1:
                raise ConfigError(
                    "mergeIntervalMs and mergeRecordsThreshold cannot both be disabled"
                )
            if self.enable_batch_load_topics:
                raise ConfigError("upsert/delete is incompatible with GCS batch loading")
        # Delete mode + permissive tolerance is a data-loss hazard, not a
        # preference: a value that fails conversion flows as NULL, and in
        # delete mode a NULL value IS a tombstone, so one corrupt record
        # silently DELETEs the keyed row. The reference deployment
        # defaults to fail-fast (Connect's errors.tolerance=none), so a
        # delete-enabled sink must opt into 'none' (fail the batch) or
        # 'all' (route to dead_letter_table) explicitly.
        if self.delete_enabled and self.errors_tolerance == "permissive":
            raise ConfigError(
                "errors_tolerance='permissive' is unsafe with delete_enabled: "
                "a conversion failure becomes a NULL value, which delete mode "
                "treats as a tombstone (silent DELETE of the keyed row). "
                "Use errors_tolerance='none' or 'all'."
            )
        if self.merge_interval_ms == 0 or self.merge_records_threshold == 0:
            raise ConfigError("merge interval/threshold must be positive or -1")

        # errors.tolerance contract (Connect framework semantics)
        if self.errors_tolerance not in ("permissive", "none", "all"):
            raise ConfigError(
                f"invalid errors_tolerance {self.errors_tolerance!r} "
                "(permissive | none | all)"
            )
        if self.dead_letter_table and self.errors_tolerance != "all":
            raise ConfigError(
                "dead_letter_table requires errors_tolerance='all'"
            )

        # PartitioningModeValidator.java:45-59
        if self.use_partition_decorator and self.timestamp_partition_field_name:
            raise ConfigError(
                "decorator-based partitioning is mutually exclusive with "
                "timestampPartitionFieldName"
            )
        # PartitioningTypeValidator.java:48-64
        if self.time_partitioning_type not in ("HOUR", "DAY", "MONTH", "YEAR", "NONE"):
            raise ConfigError(f"invalid timePartitioningType {self.time_partitioning_type}")
        if self.use_partition_decorator and self.time_partitioning_type != "DAY":
            raise ConfigError("partition decorator requires DAY partitioning")
        # BigQuerySinkConfig.java:487-489
        if len(self.clustering_field_names) > 4:
            raise ConfigError("at most 4 clustering field names")
        # GcsBucketValidator.java:53-97
        if self.enable_batch_load_topics and not self.gcs_staging_dir:
            raise ConfigError("gcs_staging_dir required when batch loading is enabled")
        if self.queue_size != -1 and self.queue_size < 1:
            raise ConfigError("queue_size must be -1 or >= 1")
        if self.thread_pool_size < 1:
            raise ConfigError("thread_pool_size must be >= 1")
