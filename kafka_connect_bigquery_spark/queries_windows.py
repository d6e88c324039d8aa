"""Event-time windowing queries: tumbling/sliding/session windows and
declarative sessionization over the events table.

Batch-mode twins of streaming/windows.py operators — ``F.window`` /
``F.session_window`` evaluate identically on static frames, so each
entry is oracle-checkable; the streaming tests drive the same plans
incrementally with watermarks.

Window-start arithmetic is done in integer microseconds on both sides
(Spark aligns windows to the epoch; the oracle reproduces that with
integer division), so boundaries are exact, never float-derived.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.functions.winutil import bounded_global
from kafka_connect_bigquery_spark.queries import _qsum, _qsum_sql, _qval, _ts_us
from kafka_connect_bigquery_spark.session import read_table
from kafka_connect_bigquery_spark.streaming.windows import (
    session_window_agg,
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)

_TS_US = _ts_us()
_US = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


def _win_start_sql(slide_s: int, offset_s: int = 0) -> str:
    """Epoch-aligned window start in DuckDB, integer µs arithmetic."""
    s_us = slide_s * _US
    off = f" - {offset_s * _US}" if offset_s else ""
    return f"make_timestamp(((epoch_ns(ts) // 1000{off}) // {s_us}) * {s_us}{' + ' + str(offset_s * _US) if offset_s else ''})"


# ---------------------------------------------------------------------------
# tumbling window
# ---------------------------------------------------------------------------

def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling event-time windows per event_type.

    Scale: one shuffle on (window, event_type) with map-side partial
    agg; in streaming mode state is bounded by the watermark horizon.
    """
    return tumbling_window_agg(
        _events(spark, sf_dir),
        "ts",
        "15 minutes",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            _qval(_qsum(F.col("value"))).alias("sum_value"),
        ],
    ).select("window_start", "window_end", "event_type", "n_events", "sum_value")


Q_TUMBLING_SQL = f"""
SELECT {_win_start_sql(900)} AS window_start,
       {_win_start_sql(900)} + INTERVAL 15 MINUTE AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {_qsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# sliding window
# ---------------------------------------------------------------------------

def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute windows sliding every 15 minutes: each event counts in
    exactly two windows.

    Scale: the window explode doubles rows before the shuffle — the
    duration/slide ratio is the replication factor, kept at 2 here.
    """
    return sliding_window_agg(
        _events(spark, sf_dir),
        "ts",
        "30 minutes",
        "15 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events")],
    ).select("window_start", "window_end", "event_type", "n_events")


Q_SLIDING_SQL = f"""
WITH w AS (
  SELECT e.*, make_timestamp(
           ((epoch_ns(ts) // 1000) // {900 * _US}) * {900 * _US} - k.k * {900 * _US}
         ) AS window_start
  FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
)
SELECT window_start, window_start + INTERVAL 30 MINUTE AS window_end,
       event_type, COUNT(*) AS n_events
FROM w
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# sessionization (lag + running-sum plan)
# ---------------------------------------------------------------------------

_GAP_S = 1800


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (30-min inactivity closes a session),
    via the declarative lag/running-sum plan."""
    out = sessionize(_events(spark, sf_dir), ["user_id"], "ts", _GAP_S)
    return out.select("user_id", "session_id", "session_start", "session_end", "n_events")


Q_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, {_TS_US} AS ts,
         CASE WHEN lag({_TS_US}) OVER w IS NULL
                OR epoch({_TS_US}) - epoch(lag({_TS_US}) OVER w) > {_GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {_TS_US})
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# built-in session_window
# ---------------------------------------------------------------------------

def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` sessions per user: window end is
    last_event + gap, sessions merge while consecutive gaps are < gap
    (strict — note the boundary differs from ``sessionize``'s > split)."""
    return session_window_agg(
        _events(spark, sf_dir),
        "ts",
        f"{_GAP_S} seconds",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n_events"),
            _qval(_qsum(F.col("value"))).alias("sum_value"),
        ],
    ).select("user_id", "session_start", "session_end", "n_events", "sum_value")


Q_SESSION_WINDOW_SQL = f"""
WITH flagged AS (
  SELECT user_id, value, {_TS_US} AS ts,
         CASE WHEN lag({_TS_US}) OVER w IS NULL
                OR epoch({_TS_US}) - epoch(lag({_TS_US}) OVER w) >= {_GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {_TS_US})
),
sess AS (
  SELECT user_id, value, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL {_GAP_S} SECOND AS session_end,
       COUNT(*) AS n_events,
       {_qsum_sql('value')} AS sum_value
FROM sess
GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# as-of join (point-in-time correctness)
# ---------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's latest view at-or-before it —
    the trade/quote (feature-store point-in-time) pattern, via the
    union+window as-of operator (one shuffle, no range explosion)."""
    from kafka_connect_bigquery_spark.operators.temporal import asof_join

    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(clicks, views, ["user_id"], "ts", right_value_cols=["value"])
    # Unmatched lefts keep NULLs; surface the flag and coalesce to
    # sentinels so the cross-engine value hash never compares NaNs.
    return out.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.col("ts_r").isNotNull().alias("matched"),
        F.coalesce(F.col("ts_r"), F.lit("1970-01-01").cast("timestamp")).alias("ts_r"),
        F.coalesce(F.col("value_r"), F.lit(0.0)).alias("value_r"),
    )


Q_ASOF_SQL = f"""
WITH clicks AS (
  SELECT user_id, event_id, {_TS_US} AS ts, value FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, {_TS_US} AS ts, value FROM events WHERE event_type = 'view'
)
SELECT c.user_id, c.event_id, c.ts, c.value,
       v.ts IS NOT NULL AS matched,
       coalesce(v.ts, TIMESTAMP '1970-01-01 00:00:00') AS ts_r,
       coalesce(v.value, 0.0) AS value_r
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""


_ASOF_TOL_S = 3600  # matches older than an hour are stale


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with bounded staleness (the kdb/pandas ``tolerance``
    knob): a prior view older than an hour is treated as no match — the
    point-in-time-correctness rule of feature serving. Same one-shuffle
    union+window plan; staleness is a post-projection."""
    from kafka_connect_bigquery_spark.operators.temporal import asof_join

    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(
        clicks, views, ["user_id"], "ts",
        right_value_cols=["value"], tolerance_s=_ASOF_TOL_S,
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.col("ts_r").isNotNull().alias("matched"),
        F.coalesce(F.col("ts_r"), F.lit("1970-01-01").cast("timestamp")).alias("ts_r"),
        F.coalesce(F.col("value_r"), F.lit(0.0)).alias("value_r"),
    )


Q_ASOF_TOLERANCE_SQL = f"""
WITH clicks AS (
  SELECT user_id, event_id, {_TS_US} AS ts, value FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, {_TS_US} AS ts, value FROM events WHERE event_type = 'view'
),
j AS (
  SELECT c.user_id, c.event_id, c.ts, c.value, v.ts AS vts, v.value AS vvalue
  FROM clicks c ASOF LEFT JOIN views v
    ON c.user_id = v.user_id AND v.ts <= c.ts
)
SELECT user_id, event_id, ts, value,
       (vts IS NOT NULL
        AND epoch_us(ts) - epoch_us(vts) <= {_ASOF_TOL_S * 1_000_000}) AS matched,
       CASE WHEN vts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(vts) <= {_ASOF_TOL_S * 1_000_000}
            THEN vts ELSE TIMESTAMP '1970-01-01 00:00:00' END AS ts_r,
       CASE WHEN vts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(vts) <= {_ASOF_TOL_S * 1_000_000}
            THEN vvalue ELSE 0.0 END AS value_r
FROM j
"""


def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest strictly-increasing run
    of values (ordered by ts, event_id) and how many maximal runs the
    stream breaks into — the MATCH_RECOGNIZE-lite pattern every
    sequence dashboard needs, as two windows + one groupBy (lag
    comparison → break flag → running sum island id → aggregate)."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = e.withColumn(
        "brk",
        F.when(
            F.lag("value").over(w).isNull()
            | (F.col("value") <= F.lag("value").over(w)),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = flagged.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_streaks_3plus"),
    )


Q_EVENTS_STREAKS_SQL = f"""
WITH flagged AS (
  SELECT user_id, value,
         CASE WHEN lag(value) OVER w IS NULL
                OR value <= lag(value) OVER w THEN 1 ELSE 0 END AS brk,
         {_TS_US} AS ts, event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {_TS_US} ASC, event_id ASC)
),
islands AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
runs AS (
  SELECT user_id, island, COUNT(*) AS run_len FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_streaks_3plus
FROM runs GROUP BY 1
"""


_PATH_TOP = 20


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type paths: each user session (30-min gap rule)
    becomes an ordered ``a>b>c`` path string, counted corpus-wide and
    ranked — the navigation-pattern report behind funnel design.
    Ordering inside a session is pinned by (ts, event_id), and the path
    string is built by sort_array over collected structs (collect_list
    alone has no order guarantee under parallel aggregation — the
    classic distributed-collect trap). Two shuffles: sessionize +
    path count."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    # (ts, event_id) order, not ts alone: equal-timestamp events per
    # user would make the lag/running-sum engine-nondeterministic
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > _GAP_S * 1_000_000
            ),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
    paths = (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("len"),
        )
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # top-N + merge), NOT a global row_number window — the frame here
    # is per-distinct-path counts, which grows with the data, and an
    # unpartitioned window would sort it all in one task (r06-verdict
    # scale-killer). rank is recomputed over the _PATH_TOP survivors.
    ranked = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_PATH_TOP)
        .withColumn(
            "rank",
            F.row_number().over(
                bounded_global(F.desc("n_sessions"), F.asc("path"))
            ),
        )
    )
    return ranked


Q_SESSION_PATHS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, {_TS_US} AS ts,
         CASE WHEN lag({_TS_US}) OVER w IS NULL
                OR epoch_us({_TS_US}) - epoch_us(lag({_TS_US}) OVER w)
                   > {_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {_TS_US}, event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM flagged
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY 1, 2
)
SELECT path, n_sessions, rank FROM (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(row_number() OVER (ORDER BY COUNT(*) DESC, path) AS INT) AS rank
  FROM paths GROUP BY 1
) WHERE rank <= {_PATH_TOP}
"""


_EWMA_ALPHA = 0.25
_EWMA_DEPTH = 8
_EWMA_Q = 1_000_000
# integer weight ladder floor(alpha*(1-alpha)^d * Q + 0.5), computed ONCE
# in Python so both engines consume identical literals
_EWMA_WQ = [
    int(_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** d * _EWMA_Q + 0.5)
    for d in range(_EWMA_DEPTH)
]


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's value
    stream, truncated to the last 8 observations — the bounded-depth
    EWMA every feature store materializes (a full-history recursive
    EWMA is not expressible as a window function in EITHER engine;
    truncation also caps staleness, which is usually what's wanted).

    Weights are a precomputed integer ladder and values are 1e-4
    quantized, so numerator and denominator are exact BIGINTs; the
    final ratio is one double division. Plan: ONE shuffle + sort per
    user — the 8 lags share a single window frame."""
    e = _events(spark, sf_dir)
    from pyspark.sql import Window

    vq = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    base = e.select("user_id", "event_id", "ts", vq.alias("vq"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for d, wq in enumerate(_EWMA_WQ):
        lagged = F.lag("vq", d).over(w)
        num = num + F.coalesce(lagged * wq, F.lit(0).cast("long"))
        den = den + F.when(lagged.isNotNull(), F.lit(wq)).otherwise(F.lit(0)).cast("long")
    return base.select(
        "user_id",
        "event_id",
        F.col("vq"),
        num.alias("ewma_num_q"),
        den.alias("ewma_den_q"),
        (num.cast("double") / den.cast("double") / 10000.0).alias("ewma"),
    )


def _ewma_sql() -> str:
    num = " + ".join(
        f"coalesce(lag(vq, {d}) OVER w * {wq}, 0)"
        for d, wq in enumerate(_EWMA_WQ)
    )
    den = " + ".join(
        f"CASE WHEN lag(vq, {d}) OVER w IS NOT NULL THEN {wq} ELSE 0 END"
        for d, wq in enumerate(_EWMA_WQ)
    )
    return f"""
WITH base AS (
  SELECT user_id, event_id, {_TS_US} AS ts,
         CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS vq
  FROM events
)
SELECT user_id, event_id, vq,
       CAST({num} AS BIGINT) AS ewma_num_q,
       CAST({den} AS BIGINT) AS ewma_den_q,
       CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) / 10000.0 AS ewma
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


Q_EVENTS_EWMA_SQL = _ewma_sql()


# ---------------------------------------------------------------------------
# interval (range) join
# ---------------------------------------------------------------------------

def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined back into their session intervals via the banded
    interval join (replicate intervals to time buckets, hash equi-join
    on (key, bucket), exact range filter last)."""
    from kafka_connect_bigquery_spark.operators.temporal import interval_join

    e = _events(spark, sf_dir)
    sessions = sessionize(e, ["user_id"], "ts", _GAP_S)
    joined = interval_join(
        e.select("user_id", "ts"),
        sessions,
        ["user_id"],
        "ts",
        "session_start",
        "session_end",
        bucket_seconds=_GAP_S,
    )
    return joined.groupBy("user_id", "session_id", "session_start", "session_end").agg(
        F.count(F.lit(1)).alias("n_points")
    )


Q_INTERVAL_SQL = f"""
WITH flagged AS (
  SELECT user_id, {_TS_US} AS ts,
         CASE WHEN lag({_TS_US}) OVER w IS NULL
                OR epoch({_TS_US}) - epoch(lag({_TS_US}) OVER w) > {_GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {_TS_US})
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM flagged
),
intervals AS (
  SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end
  FROM sess GROUP BY user_id, session_id
)
SELECT i.user_id, i.session_id, i.session_start, i.session_end,
       COUNT(*) AS n_points
FROM (SELECT user_id, {_TS_US} AS ts FROM events) e
JOIN intervals i
  ON e.user_id = i.user_id AND e.ts >= i.session_start AND e.ts <= i.session_end
GROUP BY 1, 2, 3, 4
"""


_ATTR_WITHIN_S = 7200


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credited to the latest
    view by the same user within the preceding 2 hours — the batch
    twin of streaming/windows.py::stream_stream_join (same declarative
    join + rank; the streaming variant adds watermarks for state
    eviction)."""
    from pyspark.sql import Window
    from kafka_connect_bigquery_spark.streaming.windows import stream_stream_join

    e = _events(spark, sf_dir)
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
        F.col("value").alias("amount"),
    )
    pairs = stream_stream_join(
        views, buys, ["user_id"], "view_ts", "buy_ts",
        within_seconds=_ATTR_WITHIN_S,
    )
    w = Window.partitionBy("buy_id").orderBy(F.desc("view_ts"), F.desc("view_id"))
    return (
        pairs.select(
            F.col("l.user_id").alias("user_id"),
            "view_id",
            F.col("l.view_ts").alias("view_ts"),
            "buy_id",
            "amount",
        )
        .withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") == 1)
        .select("user_id", "view_id", "buy_id", "amount")
    )


Q_ATTRIBUTION_SQL = f"""
WITH v AS (
  SELECT user_id, event_id AS view_id, {_TS_US} AS view_ts
  FROM events WHERE event_type = 'view'
),
b AS (
  SELECT user_id, event_id AS buy_id, {_TS_US} AS buy_ts, value AS amount
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT v.user_id, v.view_id, v.view_ts, b.buy_id, b.amount
  FROM v JOIN b ON v.user_id = b.user_id
   AND b.buy_ts >= v.view_ts
   AND b.buy_ts <= v.view_ts + INTERVAL {_ATTR_WITHIN_S} SECONDS
)
SELECT user_id, view_id, buy_id, amount FROM (
  SELECT pairs.*,
         row_number() OVER (PARTITION BY buy_id
              ORDER BY view_ts DESC, view_id DESC) AS pick
  FROM pairs
) WHERE pick = 1
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view -> click -> purchase): per user,
    each stage must occur at-or-after the previous stage's first
    occurrence; emits users-reaching-stage counts. The product-analytics
    staple, expressed as three per-user min aggregations chained by
    time-guarded joins — each is one shuffle on user_id, and AQE reuses
    the co-partitioning across the chain."""
    e = _events(spark, sf_dir)

    def stage(event_type: str, after=None):
        s = e.filter(F.col("event_type") == event_type)
        if after is not None:
            s = s.join(after, "user_id").filter(F.col("ts") >= F.col("_prev_ts"))
        return s.groupBy("user_id").agg(F.min("ts").alias("_prev_ts"))

    v = stage("view")
    c = stage("click", v)
    p = stage("purchase", c)
    rows = None
    for name, df_stage in (("1_view", v), ("2_click", c), ("3_purchase", p)):
        one = df_stage.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows


Q_FUNNEL_SQL = f"""
WITH v AS (
  SELECT user_id, min({_TS_US}) AS ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min({_ts_us('e.ts')}) AS ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND {_ts_us('e.ts')} >= v.ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min({_ts_us('e.ts')}) AS ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND {_ts_us('e.ts')} >= c.ts
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL SELECT '2_click', COUNT(*) FROM c
UNION ALL SELECT '3_purchase', COUNT(*) FROM p
"""


_RETENTION_OFFSETS = [0, 1, 2, 3, 7]


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: users grouped by first-seen day, counted
    again when active exactly N days later (N in 0,1,2,3,7). Two
    aggregations (first-seen, distinct active-days) plus one equi-join
    on user_id; day emitted as a string (cross-engine DATE comparison
    is unreliable in the comparator)."""
    e = _events(spark, sf_dir)
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = (
        e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    joined = active.join(first_seen, "user_id").withColumn(
        "offset", F.datediff(F.col("day"), F.col("cohort_day")).cast("long")
    )
    return (
        joined.filter(
            F.col("offset").isin([int(o) for o in _RETENTION_OFFSETS])
        )
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"), "offset"
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


Q_COHORT_RETENTION_SQL = f"""
WITH first_seen AS (
  SELECT user_id, date_trunc('day', min({_TS_US})) AS cohort_day
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('day', {_TS_US}) AS day FROM events
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS "offset",
       COUNT(DISTINCT a.user_id) AS n_active
FROM active a JOIN first_seen f USING (user_id)
WHERE date_diff('day', f.cohort_day, a.day) IN ({', '.join(str(o) for o in _RETENTION_OFFSETS)})
GROUP BY 1, 2
"""


_ANOM_K = 2  # flag days beyond k sigma


def q_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection per event type: days whose count
    deviates more than 2 sigma from that type's daily mean.

    The z-score test runs in EXACT integer arithmetic — cross-multiplied
    so no sqrt/float ever happens:
        (c_d - mu)^2 > k^2 sigma^2
        <=> (D*c_d - S)^2 > k^2 (D*Sum(c^2) - S^2)
    with S = sum of daily counts, D = day count. Engine- and
    partitioning-exact, so the anomaly set is reproducible anywhere.
    Scale: two groupBys (day counts, then per-type moments joined back
    on a tiny broadcast table)."""
    e = _events(spark, sf_dir)
    daily = (
        e.groupBy(
            "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    dev = F.col("d") * F.col("n_events") - F.col("s")
    var_term = F.lit(_ANOM_K * _ANOM_K) * (
        F.col("d") * F.col("s2") - F.col("s") * F.col("s")
    )
    return (
        daily.join(F.broadcast(moments), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            (dev * dev > var_term).alias("is_anomaly"),
            (dev > 0).alias("above_mean"),
        )
    )


_ANOM_DAY = f"strftime(date_trunc('day', {_TS_US}), '%Y-%m-%d')"

Q_DAILY_ANOMALIES_SQL = f"""
WITH daily AS (
  SELECT event_type, {_ANOM_DAY} AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, COUNT(*) AS d, SUM(n_events) AS s,
         SUM(n_events * n_events) AS s2
  FROM daily GROUP BY 1
)
SELECT daily.event_type, day, n_events,
       (d * n_events - s) * (d * n_events - s)
         > {_ANOM_K * _ANOM_K} * (d * s2 - s * s) AS is_anomaly,
       d * n_events - s > 0 AS above_mean
FROM daily JOIN m ON daily.event_type = m.event_type
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the behavioral Markov
    matrix): lag over (user, time) -> (prev_type, next_type) pair
    counts plus the integer-quantized transition probability. One
    shuffle on user_id for the lag window, one tiny aggregation on the
    (prev, next) key space. Ties at equal timestamps order by event_id
    so the chain is deterministic."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = Window.partitionBy("prev_type")
    # integer floor-div (never a double quotient: float floor can miss
    # integer boundaries by one ulp, breaking cross-engine exactness)
    return (
        pairs.withColumn("_total", F.sum("n").over(totals))
        .withColumn("p_q", F.expr("n * 1000000L div _total"))
        .drop("_total")
    )


Q_EVENT_TRANSITIONS_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
              ORDER BY {_TS_US}, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       CAST((n * 1000000) // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_q
FROM pairs
"""


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily resample + forward fill (operators/temporal.py:
    gap_fill_daily): each user's value stream lands on a dense daily
    grid spanning its own [first, last] day, gaps carrying the last
    observation forward — the regularization step before any same-grid
    time-series math. Grid fan-out is bounded per key (sequence +
    explode, no global-calendar cross join)."""
    from kafka_connect_bigquery_spark.operators import temporal

    e = read_table(spark, sf_dir, "events")
    return temporal.gap_fill_daily(e, "user_id", "ts", "value").withColumnRenamed(
        "k", "user_id"
    )


Q_GAP_FILL_SQL = f"""
WITH daily AS (
  SELECT k, day, v FROM (
    SELECT user_id AS k, CAST(date_trunc('day', {_TS_US}) AS DATE) AS day,
           {_TS_US} AS ts, value AS v,
           row_number() OVER (PARTITION BY user_id,
                              CAST(date_trunc('day', {_TS_US}) AS DATE)
                              ORDER BY {_TS_US} DESC, value DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
spans AS (SELECT k, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1),
grid AS (
  SELECT k, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
),
j AS (
  SELECT g.k, g.day, d.v FROM grid g
  LEFT JOIN daily d ON d.k = g.k AND d.day = g.day
)
SELECT k AS user_id, strftime(day, '%Y-%m-%d') AS day,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY k ORDER BY day ROWS UNBOUNDED PRECEDING) AS value,
       (v IS NOT NULL) AS is_observed
FROM j
"""


REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "events_gap_fill": (q_gap_fill, Q_GAP_FILL_SQL),
    "events_attribution": (q_attribution, Q_ATTRIBUTION_SQL),
    "events_funnel": (q_funnel, Q_FUNNEL_SQL),
    "events_cohort_retention": (q_cohort_retention, Q_COHORT_RETENTION_SQL),
    "events_daily_anomalies": (q_daily_anomalies, Q_DAILY_ANOMALIES_SQL),
    "events_transitions": (q_event_transitions, Q_EVENT_TRANSITIONS_SQL),
    "events_tumbling_window": (q_tumbling, Q_TUMBLING_SQL),
    "events_sliding_window": (q_sliding, Q_SLIDING_SQL),
    "events_sessionize": (q_sessionize, Q_SESSIONIZE_SQL),
    "events_session_window": (q_session_window, Q_SESSION_WINDOW_SQL),
    "events_asof_join": (q_asof_join, Q_ASOF_SQL),
    "events_asof_tolerance": (q_asof_tolerance, Q_ASOF_TOLERANCE_SQL),
    "events_ewma": (q_events_ewma, Q_EVENTS_EWMA_SQL),
    "session_paths": (q_session_paths, Q_SESSION_PATHS_SQL),
    "events_streaks": (q_events_streaks, Q_EVENTS_STREAKS_SQL),
    "events_interval_join": (q_interval_join, Q_INTERVAL_SQL),
}
