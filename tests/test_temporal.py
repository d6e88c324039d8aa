"""Unit tests for the as-of and interval join operators on inputs with
hand-computable answers (the oracle gate covers them at sf0.01)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators.temporal import asof_join, interval_join


def _t(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 12, minute, second)


def test_asof_join_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [(1, _t(10), 100.0), (1, _t(30), 200.0), (2, _t(5), 50.0)],
        ["key", "ts", "px"],
    )
    quotes = spark.createDataFrame(
        [(1, _t(0), 9.0), (1, _t(10), 10.0), (1, _t(20), 11.0), (2, _t(6), 1.0)],
        ["key", "ts", "bid"],
    )
    out = {
        (r["key"], r["ts"]): (r["ts_r"], r["bid_r"])
        for r in asof_join(trades, quotes, ["key"], "ts").collect()
    }
    assert out[(1, _t(10))] == (_t(10), 10.0)  # equal ts visible (non-strict)
    assert out[(1, _t(30))] == (_t(20), 11.0)  # latest prior quote
    assert out[(2, _t(5))] == (None, None)     # no quote yet -> NULLs


def test_asof_join_strict_excludes_equal_ts(spark):
    trades = spark.createDataFrame([(1, _t(10), 1.0)], ["key", "ts", "px"])
    quotes = spark.createDataFrame(
        [(1, _t(0), 9.0), (1, _t(10), 10.0)], ["key", "ts", "bid"]
    )
    r = asof_join(trades, quotes, ["key"], "ts", strict=True).first()
    assert (r["ts_r"], r["bid_r"]) == (_t(0), 9.0)


def test_asof_join_respects_keys(spark):
    trades = spark.createDataFrame([(1, _t(10), 1.0)], ["key", "ts", "px"])
    quotes = spark.createDataFrame([(2, _t(0), 9.0)], ["key", "ts", "bid"])
    r = asof_join(trades, quotes, ["key"], "ts").first()
    assert r["bid_r"] is None  # other key's quote never leaks


def test_interval_join_banding_exactness(spark):
    # intervals spanning multiple buckets; points at boundaries
    points = spark.createDataFrame(
        [(1, _t(0)), (1, _t(15)), (1, _t(30)), (1, _t(45)), (2, _t(15))],
        ["key", "ts"],
    )
    intervals = spark.createDataFrame(
        [(1, _t(0), _t(30), "a"), (1, _t(40), _t(50), "b")],
        ["key", "s", "e", "label"],
    )
    out = interval_join(
        points, intervals, ["key"], "ts", "s", "e", bucket_seconds=600
    )
    got = sorted((r["ts"].minute, r["label"]) for r in out.collect())
    # interval a: 0,15,30 (end inclusive); interval b: 45; key 2: nothing
    assert got == [(0, "a"), (15, "a"), (30, "a"), (45, "b")]


def test_interval_join_end_exclusive(spark):
    points = spark.createDataFrame([(1, _t(30))], ["key", "ts"])
    intervals = spark.createDataFrame([(1, _t(0), _t(30), "a")], ["key", "s", "e", "label"])
    out = interval_join(
        points, intervals, ["key"], "ts", "s", "e", bucket_seconds=600, end_inclusive=False
    )
    assert out.count() == 0


def test_gap_fill_daily_dense_grid_and_ffill(spark):
    import datetime as dt

    from kafka_connect_bigquery_spark.operators import temporal

    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 10.0),
        (1, dt.datetime(2024, 1, 1, 18), 11.0),  # later same day wins
        (1, dt.datetime(2024, 1, 4, 12), 40.0),  # 3-day gap -> ffill 11.0
        (2, dt.datetime(2024, 2, 1, 0), 5.0),    # single-day key
    ]
    df = spark.createDataFrame(rows, "user_id: bigint, ts: timestamp, value: double")
    out = {
        (r["k"], r["day"]): (r["value"], r["is_observed"])
        for r in temporal.gap_fill_daily(df, "user_id", "ts", "value").collect()
    }
    assert out == {
        (1, "2024-01-01"): (11.0, True),
        (1, "2024-01-02"): (11.0, False),
        (1, "2024-01-03"): (11.0, False),
        (1, "2024-01-04"): (40.0, True),
        (2, "2024-02-01"): (5.0, True),
    }


def test_gap_fill_deterministic_tie_on_same_ts(spark):
    import datetime as dt

    from kafka_connect_bigquery_spark.operators import temporal

    ts = dt.datetime(2024, 3, 1, 12)
    df = spark.createDataFrame(
        [(1, ts, 3.0), (1, ts, 7.0)], "user_id: bigint, ts: timestamp, value: double"
    )
    for _ in range(2):
        out = temporal.gap_fill_daily(
            df.repartition(5), "user_id", "ts", "value"
        ).collect()
        assert [(r["value"], r["is_observed"]) for r in out] == [(7.0, True)]


def test_asof_tolerance_masks_stale_matches(spark):
    import datetime as dt

    from kafka_connect_bigquery_spark.operators import temporal

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0))], "k: bigint, ts: timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 11, 59), 10.0),  # 60 s old: fresh
            (2, dt.datetime(2024, 1, 1, 10, 0), 99.0),
        ],
        "k: bigint, ts: timestamp, v: double",
    )
    fresh = temporal.asof_join(left, right, ["k"], "ts", tolerance_s=120).collect()
    assert fresh[0]["v_r"] == 10.0 and fresh[0]["ts_r"] is not None
    tight = temporal.asof_join(left, right, ["k"], "ts", tolerance_s=30).collect()
    assert tight[0]["v_r"] is None and tight[0]["ts_r"] is None
