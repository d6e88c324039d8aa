"""Salted join / two-phase aggregation must be result-identical to the
plain operators — salting changes the physical plan, never the answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators.skew import (
    deterministic_salt,
    salted_aggregate,
    salted_join,
)


@pytest.fixture()
def skewed_df(spark):
    # key 0 is hot: 900 of 1000 rows
    rows = [(0, i, float(i % 7)) for i in range(900)] + [
        (k, 1000 + k, float(k)) for k in range(1, 101)
    ]
    return spark.createDataFrame(rows, ["key", "rid", "v"])


def test_salted_join_equals_plain_join(spark, skewed_df):
    dim = spark.createDataFrame([(k, f"name_{k}") for k in range(0, 101)], ["key", "name"])
    plain = skewed_df.join(dim, "key").select("key", "rid", "v", "name")
    salted = salted_join(skewed_df, dim, ["key"], salt_buckets=4).select(
        "key", "rid", "v", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, skewed_df):
    dim = spark.createDataFrame([(0, "zero")], ["key", "name"])
    plain = skewed_df.join(dim, "key", "left").select("key", "rid", "name")
    salted = salted_join(skewed_df, dim, ["key"], salt_buckets=4, how="left").select(
        "key", "rid", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_equals_plain(spark, skewed_df):
    plain = {
        tuple(r)
        for r in skewed_df.groupBy("key")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in salted_aggregate(
            skewed_df,
            ["key"],
            {
                "s": ("v", "sum"),
                "c": ("v", "count"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            salt_buckets=4,
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_rejects_non_decomposable(spark, skewed_df):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(skewed_df, ["key"], {"a": ("v", "avg")})


def test_salt_is_deterministic(spark, skewed_df):
    s1 = skewed_df.select(deterministic_salt(["rid"], 8).alias("s")).collect()
    s2 = skewed_df.select(deterministic_salt(["rid"], 8).alias("s")).collect()
    assert s1 == s2
    assert all(0 <= r["s"] < 8 for r in s1)


def test_fan_out_widens_narrow_and_noops_on_wide(spark):
    from kafka_connect_bigquery_spark.operators.skew import fan_out

    par = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "id long, text string"
    ).coalesce(1)
    widened = fan_out(narrow)
    assert widened.rdd.getNumPartitions() == par
    # identical rows, only the partitioning changes
    assert sorted(r["id"] for r in widened.collect()) == list(range(100))
    # already-wide input passes through UNTOUCHED (the 100 TB case:
    # no exchange may be added to a corpus already scanning wide)
    wide = narrow.repartition(par)
    assert fan_out(wide) is wide


def test_fan_out_when_bytes_gates_on_input_size(spark, tmp_path):
    """The allocation-bound form: below the byte threshold the frame
    passes through untouched (local-heap GC contention would eat the
    parallelism win); above it, widening engages."""
    from kafka_connect_bigquery_spark.operators.skew import fan_out

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, "x" * 100) for i in range(1000)], "id long, text string"
    ).coalesce(1).write.parquet(p)
    small = spark.read.parquet(p)
    assert fan_out(small, when_bytes=10 * 1024 * 1024) is small
    widened = fan_out(small, when_bytes=1)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
