"""Temporal join operators Spark lacks natively: as-of join and
interval (range) join, built from shuffle-friendly primitives.

Both avoid the naive theta-join (which Spark executes as
BroadcastNestedLoop / cartesian at scale):

- ``asof_join``: union the two sides, one window pass per key ordered
  by time, forward-fill the right side's payload. Cost = one shuffle on
  the key + one sort — identical asymptotics to a sort-merge join, no
  pair blow-up. This is the classic "union trick" for point-in-time
  correctness (feature stores, trade/quote matching).
- ``interval_join``: band the time axis into fixed buckets, replicate
  each interval to the buckets it overlaps, equi-join on
  (key, bucket), then apply the exact range predicate. Replication
  factor = interval_span/bucket + 1, so the shuffle stays linear; the
  bucket is the join key Catalyst hashes on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    right_value_cols: list[str] | None = None,
    suffix: str = "_r",
    strict: bool = False,
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts (or < when ``strict``) within the same key.

    Left rows with no prior right row keep NULL payload columns
    (left-outer as-of semantics). Right's timestamp is exposed as
    ``{ts_col}{suffix}``. ``tolerance_s`` bounds staleness (the
    kdb/pandas ``tolerance`` knob): a match older than that many
    seconds is treated as no match — a feature store must not serve a
    week-old feature as "current".

    Scale: one shuffle on key_cols, one window sort — no range
    explosion; works unchanged on billions of rows per key group
    distributed across executors.

    Determinism contract: the right side must be UNIQUE per
    (key_cols, ts_col). With duplicate right timestamps the forward
    fill picks an engine-dependent row among the ties — the same
    ambiguity every as-of implementation has (DuckDB ASOF JOIN, pandas
    merge_asof) — so pre-aggregate the right side (e.g. last-by a
    unique sequence column) before calling when duplicates are
    possible.
    """
    rv = right_value_cols or [c for c in right.columns if c not in key_cols + [ts_col]]

    lm = left.withColumn("__side", F.lit(1))
    rm = right.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in rv],
    ).withColumn("__side", F.lit(0))

    rv_out = [f"{c}{suffix}" for c in rv]
    unioned = lm.unionByName(rm, allowMissingColumns=True)

    # Order so that at equal timestamps the right row sorts first
    # (non-strict: it is visible to the left row) or last (strict).
    side_order = F.asc("__side") if not strict else F.desc("__side")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    # forward-fill each right payload column + the right timestamp
    filled = unioned.withColumn(
        f"{ts_col}{suffix}",
        F.last(F.when(F.col("__side") == 0, F.col(ts_col)), ignorenulls=True).over(w),
    )
    for c in rv_out:
        filled = filled.withColumn(
            c, F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w)
        )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if tolerance_s is not None:
        fresh = (
            F.unix_micros(F.col(ts_col))
            - F.unix_micros(F.col(f"{ts_col}{suffix}"))
        ) <= tolerance_s * 1_000_000
        for c in rv_out:
            out = out.withColumn(c, F.when(fresh, F.col(c)))
        out = out.withColumn(
            f"{ts_col}{suffix}", F.when(fresh, F.col(f"{ts_col}{suffix}"))
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket_seconds: int = 3600,
    end_inclusive: bool = True,
) -> DataFrame:
    """Join point events to the intervals containing them:
    start <= ts <= end (or < end when ``end_inclusive=False``) within
    the same key.

    Scale: each interval is replicated to ceil(span/bucket)+1 time
    buckets and each point to exactly one, so the join is a hash
    equi-join on (key, bucket) — never a nested-loop range join. Pick
    ``bucket_seconds`` near the typical interval span to keep
    replication ~2x.
    """
    b = F.lit(bucket_seconds)
    pt = points.withColumn(
        "__bucket", F.floor(F.col(ts_col).cast("double") / b).cast("long")
    )
    iv = intervals.withColumn(
        "__b0", F.floor(F.col(start_col).cast("double") / b).cast("long")
    ).withColumn("__b1", F.floor(F.col(end_col).cast("double") / b).cast("long"))
    iv = iv.withColumn(
        "__bucket", F.explode(F.sequence(F.col("__b0"), F.col("__b1")))
    ).drop("__b0", "__b1")

    end_pred: Column = (
        F.col(ts_col) <= F.col(end_col)
        if end_inclusive
        else F.col(ts_col) < F.col(end_col)
    )
    return (
        pt.join(iv, key_cols + ["__bucket"])
        .filter((F.col(ts_col) >= F.col(start_col)) & end_pred)
        .drop("__bucket")
    )


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-series regularization: resample each key's event stream to
    a dense DAILY grid spanning its own [first, last] observation and
    forward-fill the last observed value across gaps — the
    shape feature stores and monitoring rollups need before any
    same-grid comparison (diff, correlation, anomaly z-score) is
    meaningful.

    Per day the carried observation is the LAST event by (ts, id-free
    tiebreak on the value column is avoided: ties break by ts only
    after a deterministic max on the value struct) — implemented as a
    max over (ts, value) pairs so the pick is total-order deterministic.

    Scale shape: one groupBy to the daily grain (map-side combinable),
    one tiny per-key span aggregate, grid fan-out bounded by the key's
    day span (explode of a sequence — no cross join against a global
    calendar), and one window per key ordered by day for the fill.
    Returns (key, day, value, is_observed); days carry as 'yyyy-MM-dd'
    strings (stable across engines and Arrow round-trips).
    """
    day = F.to_date(F.col(ts_col))
    daily = (
        df.select(F.col(key_col).alias("k"), day.alias("day"),
                  F.col(ts_col).alias("ts"), F.col(value_col).alias("v"))
        .groupBy("k", "day")
        .agg(F.max(F.struct("ts", "v")).alias("last"))
        .select("k", "day", F.col("last.v").alias("v"))
        .localCheckpoint(eager=False)  # feeds the span agg AND the grid join
    )
    spans = daily.groupBy("k").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = spans.select(
        "k", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    joined = grid.join(daily, ["k", "day"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col("k"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNotNull().alias("is_observed"),
    )
