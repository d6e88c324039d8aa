"""Round-13 optimization pins: changed operator internals must be
bit-equivalent to the shapes they replaced.

- ann._dlit_array: the one-round-trip SQL literal path must produce
  exactly the values of the per-element F.lit path (repr(float) must
  round-trip through CAST AS DOUBLE).
- ann.assign_list string fast path: the single parsed expression
  (with centroid quantization pre-folded in Python) must assign every
  vector to the same list as the Column-input path it bypasses.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators import ann

# spark fixture: the shared session-scoped conftest fixture — a
# module-local get_spark(master=...) is a no-op under getOrCreate when
# another module's session is already running, and never stopped its
# session (ADVICE r13)


# awkward doubles: shortest-repr subtleties, negatives, exponents,
# halfway-quantization points, denormal-ish smalls
_VALUES = [
    0.1, -0.30000000000000004, 1e-17, -1e-17, 2.0, -1.9999999999999998,
    0.49999999999999994, 1.5000000000000002, 123456.789012345, -0.0,
    3.141592653589793, 1.7976931348623157e308 / 1e300, 5e-324 * 1e300,
]


def test_dlit_array_matches_per_element_lits(spark):
    a = spark.range(1).select(ann._dlit_array(_VALUES).alias("v")).collect()[0]["v"]
    b = (
        spark.range(1)
        .select(F.array(*[F.lit(float(x)) for x in _VALUES]).alias("v"))
        .collect()[0]["v"]
    )
    assert a == b
    # bit-exact, not just ==
    assert [math.copysign(1.0, x) for x in a] == [
        math.copysign(1.0, x) for x in b
    ]


def test_assign_list_string_path_equals_column_path(spark):
    import random

    rng = random.Random(13)
    dim, k, n = 16, 5, 200
    cents = [[rng.uniform(-2, 2) for _ in range(dim)] for _ in range(k)]
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(dim)]) for i in range(n)
    ]
    # include exact-centroid vectors (distance 0) and a tie candidate
    rows += [(n + j, list(c)) for j, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = (
        df.select(
            "vec_id",
            ann.assign_list("embedding", cents).alias("fast"),
            ann.assign_list(F.col("embedding"), cents).alias("ref"),
        )
        .filter(F.col("fast") != F.col("ref"))
        .count()
    )
    assert got == 0


def test_assign_list_string_path_quantization_prefold(spark):
    # the Python-side FLOOR(c*QD + 0.5) pre-fold must equal Spark's
    # double arithmetic on the same literals — probe the halfway points
    cents = [[0.0000005, -0.0000005], [0.49999999999999994, 1.5]]
    df = spark.createDataFrame(
        [(0, [0.0000005, -0.0000005]), (1, [0.49999999999999994, 1.5])],
        "vec_id long, embedding array<double>",
    )
    out = df.select(
        ann.assign_list("embedding", cents).alias("fast"),
        ann.assign_list(F.col("embedding"), cents).alias("ref"),
    ).collect()
    assert all(r["fast"] == r["ref"] for r in out)
