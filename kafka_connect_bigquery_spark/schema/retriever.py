"""Pluggable schema provider — the reference's only public API package.

Reference: kcbq-api/.../SchemaRetriever.java:31-52. The connector loads a
SchemaRetriever class reflectively from config
(BigQuerySinkConfig.java:936-982) and asks it for the authoritative
key/value schemas used during automatic table creation and schema
updates (SchemaManager.java:290-377 calls retrieveValueSchema per
record); the shipped default, IdentitySchemaRetriever.java:32-46, just
returns each record's own embedded schema.

Spark adaptation: a micro-batch is parsed with one schema expression per
topic, so the per-``SinkRecord`` argument becomes the topic name — the
only part of a record's identity the reference retrievers actually use.
``retrieve_value_schema`` returning ``None`` means "use the batch's own
schema" (the identity behavior); a concrete retriever returns a
``StructType`` that overrides the batch schema as the evolution
proposal, exactly like SchemaManager trusting the retriever over the
record.
"""

from __future__ import annotations

import importlib
from typing import Protocol, runtime_checkable

from pyspark.sql import types as T


class SchemaRetrieverError(ValueError):
    """Mirrors the reference's ConfigException on retriever loading."""


@runtime_checkable
class SchemaRetriever(Protocol):
    """SchemaRetriever.java:31-52 re-expressed per-topic."""

    def configure(self, properties: dict[str, str]) -> None:  # :36-40
        ...

    def retrieve_key_schema(self, topic: str) -> T.StructType | None:  # :42-47
        ...

    def retrieve_value_schema(self, topic: str) -> T.StructType | None:  # :49-52
        ...


class IdentitySchemaRetriever:
    """Default: the record's (batch's) own schema is authoritative
    (IdentitySchemaRetriever.java:32-46) — signalled by ``None``."""

    def configure(self, properties: dict[str, str]) -> None:
        pass

    def retrieve_key_schema(self, topic: str) -> T.StructType | None:
        return None

    def retrieve_value_schema(self, topic: str) -> T.StructType | None:
        return None


class StaticSchemaRetriever:
    """Registry-style retriever: a fixed topic -> StructType map supplied
    via ``configure`` (the shape external schema-registry providers
    take). Key schemas use the ``"<topic>#key"`` map entries."""

    def __init__(self) -> None:
        self._schemas: dict[str, T.StructType] = {}

    def configure(self, properties: dict[str, str]) -> None:
        for name, ddl_or_type in (properties or {}).items():
            sch = (
                ddl_or_type
                if isinstance(ddl_or_type, T.StructType)
                else T.StructType.fromDDL(str(ddl_or_type))
            )
            self._schemas[name] = sch

    def retrieve_key_schema(self, topic: str) -> T.StructType | None:
        return self._schemas.get(f"{topic}#key")

    def retrieve_value_schema(self, topic: str) -> T.StructType | None:
        return self._schemas.get(topic)


def load_retriever(
    spec: str | None, properties: dict | None = None
) -> SchemaRetriever:
    """Instantiate a retriever from a ``"module:ClassName"`` spec — the
    Python analog of the reference's reflective class loading
    (BigQuerySinkConfig.java:936-982, getSchemaRetriever). ``None``
    yields the identity default, like the reference's default config.
    """
    if spec is None:
        retriever: SchemaRetriever = IdentitySchemaRetriever()
    else:
        mod_name, _, cls_name = spec.partition(":")
        if not mod_name or not cls_name:
            raise SchemaRetrieverError(
                f"schema retriever spec must be 'module:ClassName', got {spec!r}"
            )
        try:
            cls = getattr(importlib.import_module(mod_name), cls_name)
        except (ImportError, AttributeError) as e:
            raise SchemaRetrieverError(f"cannot load schema retriever {spec!r}: {e}")
        retriever = cls()
        if not isinstance(retriever, SchemaRetriever):
            raise SchemaRetrieverError(
                f"{spec!r} does not implement the SchemaRetriever protocol"
            )
    retriever.configure(properties or {})
    return retriever
