"""Streaming-mode tests for event-time windowing and custom state.

The batch twins of these plans are oracle-verified (queries_windows);
here the SAME operators run as incremental streaming queries: file
source -> windowed/stateful agg -> memory sink, with watermark-driven
emission and cross-micro-batch state retention.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.streaming.windows import (
    running_totals_stream,
    session_window_agg,
    tumbling_window_agg,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 10, minute, second)


def _write_batch(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("append").parquet(path)


def _stream(spark, path: str):
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def test_tumbling_window_complete_mode(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, _ts(0), "view", 1.0),
            (2, _ts(10), "view", 2.0),
            (1, _ts(20), "click", 4.0),
        ],
    )
    agg = tumbling_window_agg(
        _stream(spark, src),
        "ts",
        "15 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events")],
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"].minute, r["event_type"]): r["n_events"]
            for r in spark.sql("SELECT * FROM tumbling_sink").collect()
        }
    finally:
        q.stop()
    assert got == {(0, "view"): 2, (15, "click"): 1}


def test_tumbling_append_mode_watermark_emission(spark, tmp_path):
    """Append mode only emits a window once the watermark passes its
    end: nothing after batch 1, the 10:00 window after a later event
    arrives in batch 2."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, _ts(0), "view", 1.0), (1, _ts(5), "view", 1.0)])
    agg = tumbling_window_agg(
        _stream(spark, src),
        "ts",
        "15 minutes",
        [],
        [F.count(F.lit(1)).alias("n_events")],
        watermark="5 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("append_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM append_sink").count() == 0
        # event at 11:00 pushes watermark to 10:55 > 10:15 window end
        _write_batch(spark, src, [(9, datetime(2024, 1, 1, 11, 0), "view", 0.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM append_sink").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0]["n_events"] == 2
    assert rows[0]["window_start"] == _ts(0)


def test_session_window_streaming_merges_and_closes(spark, tmp_path):
    src = str(tmp_path / "src")
    # user 1: two events 10 min apart (one session, 30-min gap);
    # user 2: one event
    _write_batch(
        spark,
        src,
        [
            (1, _ts(0), "view", 1.0),
            (1, _ts(10), "view", 2.0),
            (2, _ts(3), "view", 5.0),
        ],
    )
    agg = session_window_agg(
        _stream(spark, src),
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count(F.lit(1)).alias("n_events")],
        watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("session_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # close all sessions by advancing the watermark far ahead
        _write_batch(spark, src, [(9, datetime(2024, 1, 1, 13, 0), "view", 0.0)])
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["n_events"], r["session_start"], r["session_end"])
            for r in spark.sql("SELECT * FROM session_sink").collect()
        }
    finally:
        q.stop()
    assert got[1][0] == 2  # merged into one session
    assert got[1][1] == _ts(0)
    assert got[1][2] == _ts(40)  # last event 10:10 + 30-min gap
    assert got[2][0] == 1


def test_dedup_within_watermark_cross_batch(spark, tmp_path):
    """A duplicate key arriving in a later micro-batch (inside the
    watermark horizon) is suppressed; batch mode degrades to plain
    dropDuplicates."""
    from kafka_connect_bigquery_spark.streaming.windows import dedup_within_watermark

    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, _ts(0), "view", 1.0), (2, _ts(1), "view", 2.0)])
    out = dedup_within_watermark(
        _stream(spark, src).withColumn("k", F.col("user_id")),
        ["k"],
        "ts",
        "1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # same key again in a second micro-batch -> suppressed
        _write_batch(spark, src, [(1, _ts(2), "view", 99.0), (3, _ts(3), "view", 3.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT k, value FROM dedup_sink").collect()
    finally:
        q.stop()
    got = {r["k"]: r["value"] for r in rows}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0}
    assert len(rows) == 3  # the duplicate never reached the sink

    # batch-mode degradation
    bdf = spark.createDataFrame(
        [(1, _ts(0), "view", 1.0), (1, _ts(2), "view", 9.0)], EVENT_SCHEMA
    ).withColumn("k", F.col("user_id"))
    assert dedup_within_watermark(bdf, ["k"], "ts", "1 hour").count() == 1


def test_incremental_rollup_matches_batch_recompute(spark, tmp_path):
    """Feeding N micro-batches through IncrementalRollup must equal one
    batch aggregation over the concatenated data — including late rows
    landing in already-materialized windows."""
    from kafka_connect_bigquery_spark.sinks.warehouse import Warehouse
    from kafka_connect_bigquery_spark.streaming.windows import IncrementalRollup

    wh = Warehouse(spark, str(tmp_path / "wh"))
    roll = IncrementalRollup(
        wh,
        "rollup",
        ts_col="ts",
        window_duration="15 minutes",
        group_cols=["event_type"],
        aggs={
            "n": ("value", "count"),
            "sv": ("value", "sum_q"),
            "mx": ("value", "max"),
        },
    )
    b1 = [
        (1, _ts(0), "view", 1.25),
        (2, _ts(5), "view", 2.5),
        (1, _ts(20), "click", 4.0),
    ]
    b2 = [
        (3, _ts(10), "view", 3.0),   # late row into the 10:00 window
        (4, _ts(35), "view", 0.5),   # new window
    ]
    spark_df = lambda rows: spark.createDataFrame(rows, EVENT_SCHEMA)  # noqa: E731
    roll.update(spark_df(b1), 0)
    roll.update(spark_df(b2), 1)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sv"], r["mx"])
        for r in roll.read().collect()
    }
    assert got == {
        (_ts(0), "view"): (3, 6.75, 3.0),
        (_ts(15), "click"): (1, 4.0, 4.0),
        (_ts(30), "view"): (1, 0.5, 0.5),
    }


def test_incremental_rollup_rejects_non_decomposable(spark, tmp_path):
    from kafka_connect_bigquery_spark.sinks.warehouse import Warehouse
    from kafka_connect_bigquery_spark.streaming.windows import IncrementalRollup

    with pytest.raises(ValueError, match="non-decomposable"):
        IncrementalRollup(
            Warehouse(spark, str(tmp_path / "wh")),
            "r",
            ts_col="ts",
            window_duration="1 hour",
            group_cols=[],
            aggs={"a": ("value", "avg")},
        )


def test_running_totals_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, _ts(0), "view", 10.0), (1, _ts(1), "view", 5.0), (2, _ts(2), "view", 1.0)])
    stream = _stream(spark, src).select("user_id", "value")
    out = running_totals_stream(stream.groupBy("user_id"))
    q = (
        out.writeStream.format("memory")
        .queryName("totals_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM totals_sink").collect()
        }
        _write_batch(spark, src, [(1, _ts(5), "view", 2.5)])
        q.processAllAvailable()
        # update sink appends one row per touched key per micro-batch;
        # the second batch must have emitted the accumulated state
        user1_rows = {
            (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM totals_sink WHERE user_id = 1").collect()
        }
    finally:
        q.stop()
    assert first == {1: (2, 15.0), 2: (1, 1.0)}
    assert (3, 17.5) in user1_rows


def test_stream_stream_join_attribution(spark, tmp_path):
    """Clicks joined to the purchase that follows within the bound;
    purchases outside the bound never match. Streaming two sides from
    files, asserting the watermarked join emits exactly the in-window
    attributions."""
    from kafka_connect_bigquery_spark.streaming.windows import stream_stream_join

    clicks_p = str(tmp_path / "clicks")
    buys_p = str(tmp_path / "buys")
    _write_batch(
        spark,
        clicks_p,
        [
            (1, _ts(0, 0), "click", 1.0),
            (2, _ts(0, 0), "click", 1.0),
            (3, _ts(5, 0), "click", 1.0),
        ],
    )
    _write_batch(
        spark,
        buys_p,
        [
            (1, _ts(0, 30), "purchase", 9.0),   # within 60 s -> attributed
            (2, _ts(3, 0), "purchase", 9.0),    # 180 s later -> outside bound
            (3, _ts(4, 0), "purchase", 9.0),    # before the click -> no match
        ],
    )
    clicks = _stream(spark, clicks_p).select(
        "user_id", F.col("ts").alias("click_ts")
    )
    buys = _stream(spark, buys_p).select(
        "user_id", F.col("ts").alias("buy_ts"), F.col("value").alias("amount")
    )
    joined = stream_stream_join(
        clicks, buys, ["user_id"], "click_ts", "buy_ts", within_seconds=60
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            (r["user_id"], r["amount"])
            for r in spark.sql("SELECT * FROM attrib").collect()
        ]
    finally:
        q.stop()
    assert got == [(1, 9.0)]


def test_stream_stream_join_batch_degrade_matches(spark):
    """Batch mode: same declarative join, no watermarks — the
    oracle-checkable twin of the streaming plan."""
    from kafka_connect_bigquery_spark.streaming.windows import stream_stream_join

    clicks = spark.createDataFrame(
        [(1, _ts(0, 0)), (1, _ts(10, 0))], ["user_id", "click_ts"]
    )
    buys = spark.createDataFrame(
        [(1, _ts(0, 45), 5.0), (1, _ts(10, 2), 7.0)],
        ["user_id", "buy_ts", "amount"],
    )
    out = stream_stream_join(
        clicks, buys, ["user_id"], "click_ts", "buy_ts", within_seconds=60
    )
    got = sorted((r["amount"],) for r in out.collect())
    assert got == [(5.0,), (7.0,)]


def test_heavy_hitters_bounded_state_and_guarantees(spark, tmp_path):
    """Space-saving heavy hitters (r08): state capped at k triples per
    group while keeping the three classic guarantees across
    micro-batches — frequent items present, count_est never under,
    count_est - error never over."""
    from collections import Counter

    from kafka_connect_bigquery_spark.streaming.windows import (
        heavy_hitters_stream,
    )

    src = str(tmp_path / "src")
    K = 4
    # skewed truth: u1 dominates, a long tail forces evictions
    batch1 = (
        [(1, _ts(0), "click", 1.0)] * 6
        + [(2, _ts(0), "click", 1.0)] * 4
        + [(i, _ts(0), "click", 1.0) for i in range(10, 16)]
    )
    batch2 = (
        [(1, _ts(1), "click", 1.0)] * 5
        + [(3, _ts(1), "click", 1.0)] * 4
        + [(i, _ts(1), "click", 1.0) for i in range(20, 25)]
    )
    truth = Counter(str(r[0]) for r in batch1 + batch2)
    n_total = len(batch1) + len(batch2)

    _write_batch(spark, src, batch1)
    stream = _stream(spark, src).select("event_type", "user_id")
    out = heavy_hitters_stream(
        stream.groupBy("event_type"), "user_id", k=K
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hh_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, batch2)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM hh_sink WHERE n_seen = %d" % n_total
        ).collect()
        all_rows = spark.sql("SELECT * FROM hh_sink").collect()
    finally:
        q.stop()

    # the final emission is the complete summary for the one group,
    # plus retracted=True rows for items evicted this batch (the
    # documented consumer contract: drop rows where retracted is true)
    retracted = {r["item"] for r in rows if r["retracted"]}
    # the explicit boolean and the NULL estimate columns must agree
    for r in rows:
        assert r["retracted"] == (r["count_est"] is None)
        assert r["retracted"] == (r["error"] is None)
    rows = [r for r in rows if not r["retracted"]]
    summary = {r["item"]: (r["count_est"], r["error"]) for r in rows}
    # retraction correctness, stated as the documented consumer
    # contract: the latest-row-per-(group,item) view holds exactly the
    # live summary. Asserted over ALL emissions rather than assuming
    # exactly two micro-batches: the running stream polls the source
    # directory while the test's second parquet append is committing
    # part files, so under host load a trigger can legally pick up a
    # PARTIAL batch — an item evicted in that intermediate trigger
    # carries its retraction row with an intermediate n_seen (the
    # final-batch-only set equality this replaces flaked exactly
    # there, ~1/20 loaded runs).
    latest: dict = {}
    for r in sorted(all_rows, key=lambda r: r["n_seen"]):
        latest[r["item"]] = r
    live_view = {i for i, r in latest.items() if not r["retracted"]}
    assert live_view == set(summary), (live_view, summary, retracted)
    # and every final-batch retraction names a previously-live item
    emitted_before = {
        r["item"]
        for r in all_rows
        if r["n_seen"] != n_total and not r["retracted"]
    }
    assert retracted <= emitted_before, (retracted, emitted_before)
    assert len(summary) <= K  # bounded state
    assert all(r["group"] == "click" for r in rows)
    # guarantee 1: every item with true count > n/k is present
    for item, true_c in truth.items():
        if true_c > n_total / K:
            assert item in summary, (item, true_c, summary)
    # guarantees 2+3: bounds hold for every summarized item
    for item, (est, err) in summary.items():
        assert est >= truth.get(item, 0)
        assert est - err <= truth.get(item, 0)
    # conservation: sum(counts) == n_seen (the invariant the
    # guarantees rest on)
    assert sum(est for est, _ in summary.values()) == n_total


def test_heavy_hitters_state_survives_restart(spark, tmp_path):
    """The space-saving summary lives in the state store: a new query
    on the SAME checkpoint must resume the counts, not restart them."""
    from collections import Counter

    from kafka_connect_bigquery_spark.streaming.windows import (
        heavy_hitters_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(1, _ts(0), "click", 1.0)] * 4 + [(2, _ts(0), "click", 1.0)] * 2
    b2 = [(1, _ts(1), "click", 1.0)] * 3 + [(3, _ts(1), "click", 1.0)] * 2

    seen: list = []

    def start():
        stream = _stream(spark, src).select("event_type", "user_id")
        out = heavy_hitters_stream(stream.groupBy("event_type"), "user_id", k=4)
        return (
            out.writeStream.foreachBatch(
                lambda df, _id: seen.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    _write_batch(spark, src, b1)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # process "restart"
    _write_batch(spark, src, b2)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_total = len(b1) + len(b2)
    rows = [r for r in seen if r["n_seen"] == n_total]
    assert rows, [tuple(r) for r in seen]
    truth = Counter(str(r[0]) for r in b1 + b2)
    summary = {r["item"]: r["count_est"] for r in rows}
    # resumed, not restarted: totals reflect BOTH batches exactly
    # (k=4 >= distinct items, so every estimate is the true count)
    assert summary == dict(truth)
