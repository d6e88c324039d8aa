"""Count-min sketch: sub-linear frequency estimation over a key column.

The streaming-analytics counterpart to the exact groupBy count — a
bounded ``depth x width`` integer table whose cells are additive, so
sketches built per partition / per micro-batch / per day MERGE by cell
addition (the property HLL gives distinct counts, CMS gives
frequencies). Estimate(key) = min over rows of the key's slot counts;
it never under-estimates, and over-estimates by at most ~2N/width with
probability 1 - 2^-depth (Cormode & Muthukrishnan 2005).

Spark-first shape: build is one explode(xdepth) + one map-side-
combinable groupBy — output is depth*width rows no matter the corpus
size; probe is an equi-join of the (tiny, broadcast) sketch. Hashing
is depth-salted md5 — deterministic across engines, so an external
system (or the DuckDB oracle) reproduces the sketch bit-for-bit.

Reference parity: the reference has no sketch surface (BigQuery runs
APPROX_* server-side); this is part of the engine's own analytics
layer alongside events_approx_stats (HLL/quantiles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 256


def _slot(key: Column, d: int, width: int) -> Column:
    """Depth-salted md5 slot: first 8 hex chars -> uint32 -> mod width.
    Same arithmetic as the SQL twin: CAST(concat('0x', substr(md5(..),
    1, 8)) AS BIGINT) % width."""
    h = F.md5(F.concat(F.lit(f"{d}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def _probe_rows(df: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    key = F.col(col)
    return (
        df.filter(key.isNotNull())
        .select(
            col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"), _slot(key, d, width).alias("slot")
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("_e"),
        )
        .select(col, "_e.d", "_e.slot")
    )


def count_min_build(
    df: DataFrame, col: str, *, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Build the sketch: ``(d, slot, cnt)`` rows, at most depth*width of
    them. NULL keys are skipped (count them separately if they matter).
    Two sketches over disjoint data union by summing cnt per (d, slot)
    — the merge path a per-day rollup uses."""
    return (
        _probe_rows(df, col, depth, width)
        .groupBy("d", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built over disjoint row sets (cell-wise add)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "slot").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Frequency estimates for ``keys[col]`` (deduplicated): min over
    depth of the key's slot counts; a slot the sketch never filled
    counts 0. The sketch side is depth*width rows — broadcast, so the
    probe is shuffle-free on the sketch side."""
    probes = _probe_rows(keys.select(col).distinct(), col, depth, width)
    return (
        probes.join(F.broadcast(sketch), ["d", "slot"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(col)
        .agg(F.min("cnt").alias("cm_estimate"))
    )
