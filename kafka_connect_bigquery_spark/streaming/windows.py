"""Event-time windowing operators: tumbling/sliding windows, gap-based
sessionization, and a custom stateful per-key operator.

The reference connector has no event-time features (SURVEY.md §2.9 —
time enters only through partition routing); these are the Structured
Streaming capabilities a Spark-native engine adds on top. Every
operator is declared once and runs in BOTH modes:

- batch: ``F.window`` / ``F.session_window`` work on static DataFrames,
  so the same plan is oracle-checkable against SQL.
- streaming: add ``with_watermark`` and the identical plan becomes an
  incremental stateful query with late-data eviction.

Scale: windowed aggregation shuffles once on (key, window); state per
key-window is bounded by the watermark horizon. Sessionization state is
merged per key as sessions close — the 100 TB concern is key skew, so
group keys should be high-cardinality (user_id), never a constant.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark for late-data bounds (no-op semantics in batch mode)."""
    return df.withWatermark(ts_col, delay)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed (tumbling) event-time windows with per-window aggregates.

    Output columns: window_start, window_end, *group_cols, *aggs.
    """
    if watermark is not None:
        df = with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping (sliding) windows: each event lands in
    duration/slide windows."""
    if watermark is not None:
        df = with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Built-in session windows (dynamic gap-merged); streaming-native.

    In streaming mode sessions close when the watermark passes
    last_event + gap. Batch mode gives the same merged sessions."""
    if watermark is not None:
        df = with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Gap-based sessionization as a declarative window-function plan
    (lag -> new-session flag -> running sum), the batch/SQL-expressible
    twin of ``session_window_agg``.

    Returns one row per (key, session): session_id (0-based per key),
    session_start, session_end, n_events. Scale: one shuffle on the key
    for the sort-window, one for the final groupBy — both on the same
    key, so AQE coalesces them into a single exchange.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    ts = F.col(ts_col)
    prev = F.lag(ts).over(w)
    is_new = (
        prev.isNull()
        | (ts.cast("double") - prev.cast("double") > float(gap_seconds))
    ).cast("long")
    with_sess = df.withColumn(
        "session_id", F.sum(is_new).over(w) - 1
    )
    return (
        with_sess.groupBy(*key_cols, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming dedup with bounded state
# ---------------------------------------------------------------------------

def dedup_within_watermark(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str,
) -> DataFrame:
    """Cross-micro-batch streaming dedup with bounded state: duplicates
    of a key are suppressed for as long as the watermark allows, then
    state is evicted.

    This upgrades the pipeline's within-batch offset dedup (S2) to
    cross-batch semantics while keeping state finite — the 100 TB
    requirement: unbounded dropDuplicates state would grow with every
    key ever seen. Batch mode degrades to plain dropDuplicates.
    """
    if not df.isStreaming:
        return df.dropDuplicates(key_cols)
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    *,
    within_seconds: int,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-bound condition
    (the attribution shape: right-side events joined to the left-side
    event they follow within ``within_seconds``).

    Both sides carry watermarks and the join condition bounds
    ``right_ts`` to [left_ts, left_ts + within_seconds], so Spark can
    size and evict join state — the precondition for running this
    indefinitely: an unconstrained stream-stream join buffers both
    streams forever. Outer variants emit unmatched rows only after the
    watermark closes the possibility of a match (late-data-correct).

    Batch mode degrades to the same declarative join without
    watermarks, which is how the oracle checks the semantics.
    """
    l = left
    r = right
    if left.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if right.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    l = l.alias("l")
    r = r.alias("r")
    cond = None
    for k in key_cols:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within_seconds} SECONDS")
        )
    )
    return l.join(r, cond, how)


# ---------------------------------------------------------------------------
# Incremental rollup materialization
# ---------------------------------------------------------------------------

class IncrementalRollup:
    """Materialized windowed rollup maintained incrementally across
    micro-batches: each batch is pre-aggregated to partials, combined
    additively with the stored aggregates, and merged back.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum_q, count, min, max}: decomposable aggregates whose partials
    recombine exactly. ``sum_q`` is the quantized integer sum (stored as
    decimal so re-summing stays exact across any number of batches).

    Scale: the stored table holds one row per (window, group) — the
    rollup cardinality, not the event count — and each batch touches
    only the windows it contains, which the bucketed/partitioned MERGE
    layout turns into bounded work (late data simply lands in its old
    window's group and recombines).
    """

    _PHASE1 = {
        "sum_q": lambda c: F.sum(F.floor(F.col(c) * 10_000 + F.lit(0.5)).cast("decimal(38,0)")),
        "count": lambda c: F.count(F.col(c)),
        "min": F.min,
        "max": F.max,
    }
    _COMBINE = {"sum_q": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    def __init__(
        self,
        warehouse,
        table: str,
        *,
        ts_col: str,
        window_duration: str,
        group_cols: list[str],
        aggs: dict[str, tuple[str, str]],
    ) -> None:
        for out_col, (_, fn) in aggs.items():
            if fn not in self._PHASE1:
                raise ValueError(f"non-decomposable aggregate {fn!r} for {out_col!r}")
        self.warehouse = warehouse
        self.table = table
        self.ts_col = ts_col
        self.window_duration = window_duration
        self.group_cols = group_cols
        self.aggs = aggs
        self.keys = ["window_start", *group_cols]

    def _partials(self, batch: DataFrame) -> DataFrame:
        return (
            batch.groupBy(
                F.window(F.col(self.ts_col), self.window_duration).alias("w"),
                *self.group_cols,
            )
            .agg(
                *[
                    self._PHASE1[fn](in_col).alias(out_col)
                    for out_col, (in_col, fn) in self.aggs.items()
                ]
            )
            .withColumn("window_start", F.col("w.start"))
            .drop("w")
        )

    def update(self, batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch handler: combine batch partials into the stored
        rollup (read current groups for the touched windows, re-combine,
        merge back)."""
        partials = self._partials(batch)
        if self.warehouse.exists(self.table):
            current = self.warehouse.read(self.table)
            partials = (
                current.unionByName(partials)
                .groupBy(*self.keys)
                .agg(
                    *[
                        self._COMBINE[fn](out_col).alias(out_col)
                        for out_col, (_, fn) in self.aggs.items()
                    ]
                )
            )
        combined = partials.withColumn("i", F.lit(batch_id)).withColumn(
            "__tombstone", F.lit(False)
        )
        from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

        self.warehouse.merge(
            combined,
            self.table,
            self.keys,
            mode="upsert",
            spec=TableSpec(partition_grain="NONE"),
        )

    def read(self) -> DataFrame:
        """The materialized rollup with quantized sums surfaced as
        doubles."""
        df = self.warehouse.read(self.table)
        for out_col, (_, fn) in self.aggs.items():
            if fn == "sum_q":
                df = df.withColumn(
                    out_col, F.col(out_col).cast("double") / F.lit(10_000.0)
                )
        return df


# ---------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_totals_stream(grouped_stream) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum(value))
    maintained across micro-batches via applyInPandasWithState.

    ``grouped_stream`` is ``df.groupBy("user_id")`` on a streaming frame
    with columns (user_id, value). Each micro-batch emits the updated
    totals for the keys it touched; state persists in the state store.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: Any, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return grouped_stream.applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (space-saving / Metwally et al. 2005)
# ---------------------------------------------------------------------------

HEAVY_HITTERS_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("count_est", T.LongType()),
        T.StructField("error", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("retracted", T.BooleanType()),
    ]
)

_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errors", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
    ]
)


def heavy_hitters_stream(grouped_stream, item_col: str, *, k: int = 16) -> DataFrame:
    """Per-group streaming heavy hitters with BOUNDED state: a
    space-saving summary (Metwally, Agrawal & El Abbadi 2005) of at
    most ``k`` (item, count, error) triples per group, maintained
    across micro-batches via ``applyInPandasWithState``. The exact
    streaming top-k needs per-item state — unbounded on a 100 TB
    stream; space-saving caps state at k rows per group while keeping
    the three classic guarantees, all pinned by tests:

    - every item whose true count exceeds n_seen/k is IN the summary;
    - ``count_est`` never under-estimates the true count;
    - ``count_est - error`` never over-estimates it.

    Batches fold in bulk (per-batch counts merge into the summary;
    eviction replaces the current minimum, inheriting its count as the
    new item's ``error``), which preserves sum(counts) == n_seen — the
    invariant the guarantees rest on. Each micro-batch emits the
    group's full current summary (update mode; downstream keeps the
    latest row per (group, item)) PLUS a retraction row
    (``retracted=True``; ``count_est`` and ``error`` NULL, ``n_seen``
    current) for every item evicted from the summary this batch —
    without it, a latest-row-per-(group, item) view would accumulate
    stale rows whose estimates froze at eviction time and could hold
    more than k items per group. Consumers drop rows where
    ``retracted`` is true (the item is no longer tracked; its true
    count may keep growing unobserved) — the explicit boolean IS the
    contract; the NULL estimate columns are a consequence, not the
    marker.

    ``grouped_stream`` is ``df.groupBy(<group col>)``; ``item_col``
    values are stringified into state — the caller casts back if the
    item is numeric. Use a high-cardinality group only if every group's
    top-k genuinely matters; for a global top-k, group by a literal and
    accept the single-task state (k rows — trivially small)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: Any, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        if state.exists:
            items, counts, errors, n = state.get
            summary = {
                it: [c, er] for it, c, er in zip(items, counts, errors)
            }
        else:
            summary, n = {}, 0
        pre_items = set(summary)  # emitted in a prior batch
        batch = pd.Series(dtype="int64")
        for pdf in pdfs:
            vals = pdf[item_col].dropna().astype(str)
            batch = batch.add(vals.value_counts(), fill_value=0)
        for it, c in sorted(batch.items()):  # deterministic fold order
            c = int(c)
            n += c
            if it in summary:
                summary[it][0] += c
            elif len(summary) < k:
                summary[it] = [c, 0]
            else:
                evict = min(summary, key=lambda x: (summary[x][0], x))
                m = summary.pop(evict)[0]
                summary[it] = [m + c, m]
        items = sorted(summary)
        state.update(
            (
                items,
                [summary[i][0] for i in items],
                [summary[i][1] for i in items],
                n,
            )
        )
        # retractions: items present (hence emitted) before this batch
        # but evicted during it. Items added AND evicted within the
        # batch were never emitted, so nothing to retract for them.
        evicted = sorted(pre_items - set(summary))
        yield pd.DataFrame(
            {
                "group": [str(key[0])] * (len(items) + len(evicted)),
                "item": items + evicted,
                # nullable Int64: mixing live counts with NULL retraction
                # markers must not decay to float64 on the Arrow path
                "count_est": pd.array(
                    [summary[i][0] for i in items] + [None] * len(evicted),
                    dtype="Int64",
                ),
                "error": pd.array(
                    [summary[i][1] for i in items] + [None] * len(evicted),
                    dtype="Int64",
                ),
                "n_seen": [n] * (len(items) + len(evicted)),
                "retracted": [False] * len(items) + [True] * len(evicted),
            }
        )

    return grouped_stream.applyInPandasWithState(
        update,
        outputStructType=HEAVY_HITTERS_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
