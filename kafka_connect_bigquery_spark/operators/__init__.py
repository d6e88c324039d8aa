"""Relational operators: MERGE (upsert/delete), routing, dedup, ANN."""
