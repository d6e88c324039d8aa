"""Schema system: Connect-style descriptors -> Spark StructType,
logical types, field sanitization, and schema evolution/unionization."""

from kafka_connect_bigquery_spark.schema.converter import (  # noqa: F401
    SchemaConversionError,
    connect_to_spark,
)
from kafka_connect_bigquery_spark.schema.evolution import (  # noqa: F401
    SchemaEvolutionError,
    unionize,
)
from kafka_connect_bigquery_spark.schema.sanitize import (  # noqa: F401
    sanitize_field_names,
    sanitize_name,
)
