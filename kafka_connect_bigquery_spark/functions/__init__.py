"""Scalar-function surface: BigQuery-shape projection, text analysis,
similarity primitives."""
