"""ANALYZE-style table profiling: per-column stats in one aggregate job.

The warehouse-hygiene primitive a 100 TB pipeline runs after every
load: null rates, cardinalities, ranges, and string lengths per column
— the inputs to join planning (broadcast or not), skew detection, and
data-quality alerts. The reference delegates this to BigQuery's
catalog stats; an engine that owns storage computes its own.

Shape: ONE df.agg(...) computes every metric for every column, then
the single result row pivots into one output row per column via
explode — no per-column jobs, no collect. The exact ``countDistinct``
per column makes Catalyst plan an Expand (rows x #profiled columns)
feeding one shuffle; at extreme scale pass ``exact_distinct=False``
to swap in approx_count_distinct (HLL++, no Expand, one scan).

Numerics (and timestamps, as epoch micros) surface in min_num /
max_num; strings in min_str / max_str plus avg_len. All outputs are
either exact integers, stored values, or a single exact-int division —
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column:
    (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str, avg_len)."""
    fields = [
        f for f in df.schema.fields if columns is None or f.name in (columns or [])
    ]
    n_distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for f in fields:
        c = F.col(f.name)
        if isinstance(f.dataType, _NUMERIC):
            num = c.cast("double")
        elif isinstance(f.dataType, T.TimestampType):
            num = F.unix_micros(c).cast("double")
        else:
            num = F.lit(None).cast("double")
        is_str = isinstance(f.dataType, T.StringType)
        s = c if is_str else F.lit(None).cast("string")
        a = f.name
        aggs += [
            F.sum(c.isNull().cast("bigint")).alias(f"{a}__nulls"),
            n_distinct(c).alias(f"{a}__distinct"),
            F.min(num).alias(f"{a}__min_num"),
            F.max(num).alias(f"{a}__max_num"),
            F.min(s).alias(f"{a}__min_str"),
            F.max(s).alias(f"{a}__max_str"),
            (
                F.sum(F.length(s)).cast("double") / F.count(s)
                if is_str
                else F.lit(None).cast("double")
            ).alias(f"{a}__avg_len"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("col_name"),
                F.col("__rows").alias("n_rows"),
                F.col(f"{f.name}__nulls").alias("n_nulls"),
                F.col(f"{f.name}__distinct").alias("n_distinct"),
                F.col(f"{f.name}__min_num").alias("min_num"),
                F.col(f"{f.name}__max_num").alias("max_num"),
                F.col(f"{f.name}__min_str").alias("min_str"),
                F.col(f"{f.name}__max_str").alias("max_str"),
                F.col(f"{f.name}__avg_len").alias("avg_len"),
            )
            for f in fields
        ]
    )
    return one.select(F.explode(per_col).alias("_p")).select("_p.*")
