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


def test_fan_out_when_bytes_decision_pinned_to_file_bytes(spark, tmp_path):
    """The when_bytes gate reads ACTUAL input file bytes, not Catalyst's
    session-dependent size estimate: the decision flips exactly at the
    on-disk parquet size and ignores spark.sql.sources.fileCompressionFactor
    (the conf that used to scale the estimate and could flip the widening
    decision between two harnesses' sessions running the same query)."""
    import glob
    import os

    from kafka_connect_bigquery_spark.operators.skew import (
        fan_out,
        scan_input_bytes,
    )

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, "x" * 100) for i in range(1000)], "id long, text string"
    ).coalesce(1).write.parquet(p)
    disk = sum(
        os.path.getsize(f) for f in glob.glob(p + "/*.parquet")
    )
    df = spark.read.parquet(p)
    assert scan_input_bytes(df) == disk
    old = spark.conf.get("spark.sql.sources.fileCompressionFactor", "1.0")
    try:
        for factor in ("1.0", "100.0"):
            spark.conf.set("spark.sql.sources.fileCompressionFactor", factor)
            frame = spark.read.parquet(p)
            # threshold one byte above the file size: never widens,
            # under ANY session conf
            assert fan_out(frame, when_bytes=disk + 1) is frame
            # threshold at the file size: always widens
            assert (
                fan_out(frame, when_bytes=disk).rdd.getNumPartitions()
                == spark.sparkContext.defaultParallelism
            )
    finally:
        spark.conf.set("spark.sql.sources.fileCompressionFactor", old)


def test_has_shuffle_lineage_routes_probe_correctly(spark, tmp_path):
    """fan_out must never probe a post-shuffle frame's partition count:
    under AQE the probe finalizes the plan, which EXECUTES the upstream
    shuffle stages (the r11 search_hybrid_rrf regression — a union+
    distinct ran once for the probe and again for the checkpoint).
    Narrow lineage (scan/project/filter/union) probes plan-only."""
    from kafka_connect_bigquery_spark.operators.skew import (
        fan_out,
        has_shuffle_lineage,
    )

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "id long, text string"
    ).coalesce(1).write.parquet(p)
    raw = spark.read.parquet(p)
    assert not has_shuffle_lineage(raw)
    assert not has_shuffle_lineage(raw.select("id"))
    assert not has_shuffle_lineage(raw.filter("id > 3").select("text"))
    assert not has_shuffle_lineage(raw.unionByName(raw))
    assert has_shuffle_lineage(raw.distinct())
    assert has_shuffle_lineage(raw.unionByName(raw).distinct())
    assert has_shuffle_lineage(raw.groupBy("id").count())
    assert has_shuffle_lineage(raw.join(raw.select("id"), "id"))
    assert has_shuffle_lineage(raw.orderBy("id"))
    assert has_shuffle_lineage(raw.repartition(4))
    # exchanged frames pass through fan_out UNTOUCHED — no probe, no
    # added exchange
    d = raw.unionByName(raw).distinct()
    assert fan_out(d) is d
    # narrow frames still widen
    assert (
        fan_out(raw).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_has_shuffle_lineage_physical_backstop(spark, tmp_path):
    """Shuffle-producing logical nodes NOT in the allowlist (e.g.
    FlatMapCoGroupsInPandas from cogroup().applyInPandas) must still be
    caught — by the compiled-physical-plan Exchange backstop — or
    fan_out re-introduces the AQE double-execution probe on them."""
    from kafka_connect_bigquery_spark.operators.skew import has_shuffle_lineage

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i % 5, float(i)) for i in range(100)], "k long, v double"
    ).coalesce(1).write.parquet(p)
    raw = spark.read.parquet(p)

    def merge(left, right):
        return left

    cg = (
        raw.groupBy("k")
        .cogroup(raw.groupBy("k"))
        .applyInPandas(merge, schema="k long, v double")
    )
    # the logical node is FlatMapCoGroupsInPandas — not in
    # _SHUFFLE_NODES — so only the physical backstop can flag it
    assert has_shuffle_lineage(cg)
    # and the backstop must not regress narrow frames into "exchanged"
    assert not has_shuffle_lineage(raw.filter("k > 1").select("v"))


def test_fan_out_when_bytes_skips_fileless_frames(spark):
    """Frames with no file source (in-memory, checkpointed) have no
    byte size to gate on — the conservative answer is NO widening (the
    old Catalyst-estimate gate defaulted to a huge sentinel here and
    silently always widened)."""
    from kafka_connect_bigquery_spark.operators.skew import (
        fan_out,
        scan_input_bytes,
    )

    mem = spark.createDataFrame(
        [(i, "x" * 100) for i in range(1000)], "id long, text string"
    ).coalesce(1)
    assert scan_input_bytes(mem) is None
    assert fan_out(mem, when_bytes=1) is mem
    ckpt = mem.localCheckpoint(eager=True)
    assert scan_input_bytes(ckpt) is None
    assert fan_out(ckpt, when_bytes=1) is ckpt
    # without the byte gate the narrow-input widening still applies
    assert (
        fan_out(mem).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
