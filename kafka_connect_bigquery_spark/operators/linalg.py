"""Distributed linear algebra over embedding columns: Gram matrix,
X^T y, and driver-side normal-equations solve.

The building block of linear models / PCA / whitening at 100 TB is
the d x d Gram matrix ``X^T X`` — an aggregation, not a join: each row
contributes its upper-triangle outer products, partials combine
map-side, and the only shuffle carries d(d+1)/2 groups no matter the
row count. The d x d result is driver-sized, so fitting a linear
model on a 100 TB design matrix is one distributed aggregate plus a
numpy solve of a 64 x 64 system — the classic normal-equations
pattern (and the same shape Spark MLlib's summarizers use).

Exactness: per-element products are quantized with the ANN family's
``QE`` lattice (operators/ann.py:quantized_dot — float→double widen,
multiply, floor) and summed as DECIMAL(38,0), so the matrix is
engine- and partitioning-exact; the SQL oracle hash-matches it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators.ann import QE


def _qprod(a: Column, b: Column) -> Column:
    """floor(a*b*QE + 0.5) as long — identical arithmetic to
    ann.quantized_dot's per-element term."""
    return F.floor(a.cast("double") * b.cast("double") * QE + F.lit(0.5)).cast(
        "long"
    )


def gram_matrix(
    df: DataFrame, vec_col: str, *, dim: int, q: int = QE
) -> DataFrame:
    """Upper-triangle Gram matrix: one row per (i, j), i <= j, with
    ``gram = sum over rows of x_i * x_j`` (quantized-exact, emitted as
    double). Per-row pair generation is a higher-order function — no
    self-join, no shuffle of the data; the aggregate's d(d+1)/2 groups
    combine map-side."""
    arr = F.col(vec_col)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.cast("long").alias("i"),
                    j.cast("long").alias("j"),
                    _qprod(
                        F.element_at(arr, (i + 1).cast("int")),
                        F.element_at(arr, (j + 1).cast("int")),
                    ).alias("p"),
                ),
            ),
        )
    )
    return (
        df.select(F.explode(pairs).alias("_e"))
        .select("_e.i", "_e.j", F.col("_e.p").cast("decimal(38,0)").alias("p"))
        .groupBy("i", "j")
        .agg((F.sum("p").cast("double") / F.lit(float(q))).alias("gram"))
    )


def xty(
    df: DataFrame, vec_col: str, y_col: str, *, dim: int, q: int = QE
) -> DataFrame:
    """X^T y: one row per component i with ``sum of x_i * y``
    (quantized-exact, double). Same aggregation shape as the Gram."""
    arr = F.col(vec_col)
    terms = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.struct(
            i.cast("long").alias("i"),
            _qprod(
                F.element_at(arr, (i + 1).cast("int")), F.col(y_col)
            ).alias("p"),
        ),
    )
    return (
        df.select(F.explode(terms).alias("_e"))
        .select("_e.i", F.col("_e.p").cast("decimal(38,0)").alias("p"))
        .groupBy("i")
        .agg((F.sum("p").cast("double") / F.lit(float(q))).alias("xty"))
    )


def solve_normal_equations(
    gram: DataFrame, xty_df: DataFrame, *, dim: int, ridge: float = 0.0
):
    """Driver-side solve of ``(X^T X + ridge*I) w = X^T y`` from the
    collected (d x d, d-sized — driver-scale by construction)
    aggregates. Returns the weight vector as a list of floats."""
    import numpy as np

    G = np.zeros((dim, dim))
    for r in gram.collect():
        G[r["i"], r["j"]] = r["gram"]
        G[r["j"], r["i"]] = r["gram"]
    b = np.zeros(dim)
    for r in xty_df.collect():
        b[r["i"]] = r["xty"]
    w = np.linalg.solve(G + ridge * np.eye(dim), b)
    return [float(x) for x in w]
