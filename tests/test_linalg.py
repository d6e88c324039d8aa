"""Distributed Gram matrix / X^T y / normal-equations solve
(operators/linalg.py) against numpy ground truth."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_connect_bigquery_spark.operators import linalg


def _vec_df(spark, X, y=None):
    if y is None:
        rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
        return spark.createDataFrame(rows, "id: bigint, embedding: array<float>")
    rows = [(i, [float(v) for v in X[i]], float(y[i])) for i in range(len(X))]
    return spark.createDataFrame(
        rows, "id: bigint, embedding: array<float>, y: double"
    )


def test_gram_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(50, 6)).astype(np.float32)
    df = _vec_df(spark, X)
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in linalg.gram_matrix(df, "embedding", dim=6).collect()
    }
    G = X.astype(np.float64).T @ X.astype(np.float64)
    assert len(got) == 6 * 7 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(G[i, j], abs=1e-3)  # QE lattice error


def test_xty_matches_numpy(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(40, 4)).astype(np.float32)
    y = rng.normal(size=40)
    df = _vec_df(spark, X, y)
    got = {r["i"]: r["xty"] for r in linalg.xty(df, "embedding", "y", dim=4).collect()}
    b = X.astype(np.float64).T @ y
    for i in range(4):
        assert got[i] == pytest.approx(b[i], abs=1e-3)


def test_normal_equations_recover_weights(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 5)).astype(np.float32)
    w_true = np.array([2.0, -1.0, 0.5, 0.0, 3.0])
    y = X.astype(np.float64) @ w_true  # noiseless
    df = _vec_df(spark, X, y)
    w = linalg.solve_normal_equations(
        linalg.gram_matrix(df, "embedding", dim=5),
        linalg.xty(df, "embedding", "y", dim=5),
        dim=5,
    )
    assert np.allclose(w, w_true, atol=1e-2)
