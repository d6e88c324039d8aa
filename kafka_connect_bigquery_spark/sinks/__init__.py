"""Warehouse sinks: partitioned parquet tables with BigQuery-like
create/evolve/append/merge semantics."""
