"""kafka_connect_bigquery_spark — a PySpark-native streaming ETL engine.

Re-expresses the data-processing capabilities of the reference
``abhijeetdhariwal1/kafka-connect-bigquery`` (a Kafka Connect sink that
writes to BigQuery) as an idiomatic Spark engine:

- Connect-style schema conversion + evolution (``schema/``)
- record shaping / BigQuery-shape projection (``functions/``)
- routing, partition-decorator, upsert/delete MERGE (``operators/``)
- Kafka / file sources (``sources/``), partitioned warehouse sink (``sinks/``)
- Structured Streaming pipeline wiring (``streaming/``)

plus large-scale training-data-pipeline extensions (dedup, similarity
search, multimodal plumbing, text analysis) built on the same tables.

Everything is DataFrame/SQL-first so Catalyst+AQE pick physical plans;
Python UDFs appear only where semantics genuinely require them.
"""

__version__ = "0.1.0"

from kafka_connect_bigquery_spark.session import get_spark  # noqa: F401
