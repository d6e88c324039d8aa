"""Topic -> table routing and time-partition decorator routing.

Reference:
- S7 topic->table map / dataset:table split: kcbq/BigQuerySinkTask.java:180-245,
  config parse+validate BigQuerySinkConfig.java:162-226,1039-1052.
- S8 partition decorator ($YYYYMMDD, DAY-only): kcbq/utils/PartitionedTableId.java:204-227,
  BigQuerySinkTask.java:223-245,327-349.

Spark-first design: routing is a *column*, not a per-record dispatch.
A micro-batch gets a ``__table`` column (pure expression, codegen'd) and
the sink writes each routed sub-frame — or, far better at scale, the
whole batch is written once to a table partitioned by the routing
column, which avoids N filtered passes over the batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RoutingConfigError(ValueError):
    """Mirrors ConfigException from topic2TableMap validation."""


@dataclass
class TopicRouter:
    """topic2TableMap semantics (BigQuerySinkConfig.java:162-226) with an
    SMT-style RegexRouter stage in front.

    ``smt_rules`` reproduces ``org.apache.kafka.connect.transforms
    .RegexRouter`` exactly (quickstart connector.properties:35-38,
    BigQuerySinkConnectorIT.java:314-317): each ``(regex, replacement)``
    rule rewrites the topic only when the regex matches the WHOLE topic
    (RegexRouter calls ``matcher.matches()``), using Java ``$N`` capture
    references; non-matching rules leave the topic unchanged; rules
    chain in order like Connect's ``transforms`` list. Because SMTs run
    *before* the sink task sees a record, the rewrite applies before the
    topic2TableMap lookup — a map entry matches the rewritten topic.

    Then, per the sink task (BigQuerySinkTask.java:180-245):
    - explicit map entry wins;
    - otherwise the (rewritten) topic is the table name, optionally
      sanitized (:210-214).
    """

    topic_map: dict[str, str] = field(default_factory=dict)
    smt_rules: list[tuple[str, str]] = field(default_factory=list)
    sanitize_names: bool = False
    default_dataset: str = "default"

    def __post_init__(self) -> None:
        seen: dict[str, str] = {}
        for topic, table in self.topic_map.items():
            if not topic or not table:
                raise RoutingConfigError("empty topic or table in topic2TableMap")
            if table in seen.values():
                raise RoutingConfigError(
                    f"duplicate destination table {table!r} in topic2TableMap"
                )
            seen[topic] = table
        for pat, _repl in self.smt_rules:
            try:
                re.compile(pat)
            except re.error as e:
                raise RoutingConfigError(f"invalid RegexRouter regex {pat!r}: {e}")

    def _rewrite(self, topic: str) -> str:
        """Apply the RegexRouter chain driver-side (full-match + $N)."""
        name = topic
        for pat, repl in self.smt_rules:
            m = re.fullmatch(pat, name)
            if m is not None:
                # Java replaceFirst uses $N refs; translate to \N for re
                name = m.expand(re.sub(r"\$(\d+)", r"\\\1", repl))
        return name

    def table_for(self, topic: str) -> str:
        """Driver-side resolution (used for table creation paths)."""
        name = self._rewrite(topic)
        if name in self.topic_map:
            return self.topic_map[name]
        if self.sanitize_names:
            from kafka_connect_bigquery_spark.schema.sanitize import sanitize_name

            name = sanitize_name(name)
        return name

    def routing_column(self, topic_col: Column) -> Column:
        """Executor-side resolution as a Column expression: the
        RegexRouter chain as conditional regexp_replace (Spark's
        replacement syntax is Java's ``$N``, matching RegexRouter), then
        a chained CASE over the explicit map. Purely declarative — no
        Python per row."""
        rewritten = topic_col
        for pat, repl in self.smt_rules:
            anchored = f"^(?:{pat})$"  # RegexRouter matches the whole topic
            rewritten = F.when(
                rewritten.rlike(anchored), F.regexp_replace(rewritten, anchored, repl)
            ).otherwise(rewritten)
        expr = None
        for topic, table in self.topic_map.items():
            cond = rewritten == F.lit(topic)
            expr = F.when(cond, F.lit(table)) if expr is None else expr.when(cond, F.lit(table))
        fallback = rewritten
        if self.sanitize_names:
            fallback = F.regexp_replace(fallback, "[^a-zA-Z0-9_]", "_")
        return fallback if expr is None else expr.otherwise(fallback)


def with_routing(
    df: DataFrame,
    router: TopicRouter,
    topic_col: str = "topic",
    out_col: str = "__table",
) -> DataFrame:
    return df.withColumn(out_col, router.routing_column(F.col(topic_col)))


def with_partition_decorator(
    df: DataFrame,
    ts_col: str | None = None,
    out_col: str = "p_date",
    use_record_time: bool = True,
) -> DataFrame:
    """S8: the ``table$YYYYMMDD`` decorator becomes a partition column.

    Reference semantics (PartitionedTableId.java:204-227): DAY grain
    only; partition chosen from the record timestamp when
    ``bigQueryPartitionDecorator`` + ``usePartitionDecorator`` say so,
    else wall clock. In Spark the decorator *is* the Hive-style
    partition value, giving partition pruning on reads for free.
    """
    if use_record_time and ts_col is not None:
        src = F.coalesce(F.col(ts_col), F.current_timestamp())
    else:
        src = F.current_timestamp()
    return df.withColumn(out_col, F.to_date(src))


def split_by_table(df: DataFrame, table_col: str = "__table") -> dict[str, DataFrame]:
    """Per-table sub-frames for sinks that need one writer per table
    (the reference's per-table TableWriter grouping,
    BigQuerySinkTask.java:254-293). Collects only the *distinct table
    names* (small), never the data."""
    tables = [r[0] for r in df.select(table_col).distinct().collect()]
    return {t: df.filter(F.col(table_col) == t).drop(table_col) for t in tables}
