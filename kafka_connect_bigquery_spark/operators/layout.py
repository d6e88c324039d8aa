"""Multi-dimensional clustering: Z-order (Morton) sort keys.

The reference's clustering (SchemaManager.java:591-596, ≤4 fields) is a
lexicographic sort — great for the leading column, useless for the
rest. Z-ordering interleaves the bits of several columns so that rows
close in ANY clustered dimension land in the same files, giving
min/max data skipping on every clustered column (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` idea, here as a plain deterministic column
expression usable with ``sortWithinPartitions``/``repartitionByRange``).

The key is built from per-column quantile ranks (computed once from a
bounded sample) so arbitrary numeric distributions spread uniformly
across the curve; the rank lookup compiles to a chain of comparisons —
no UDF, no shuffle beyond the final sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_expr(col: Column, cuts: list) -> Column:
    """Map a value to its quantile bucket in [0, len(cuts)] via the
    precomputed cut points (len(cuts) == 2^bits - 1; raw values or
    pre-built literal Columns)."""
    expr = F.lit(0)
    for c in cuts:
        lit = c if isinstance(c, Column) else F.lit(c)
        expr = expr + (col > lit).cast("int")
    return expr


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each rank into one Morton key."""
    key = F.lit(0).cast("long")
    n = len(ranks)
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.floor(r / F.lit(2**b)).cast("long") % 2
            pos = b * n + i
            key = key + bit * F.lit(2**pos)
    return key


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 4,
    sample_rows: int = 100_000,
) -> Column:
    """Build a Z-order sort key over ``cols`` (numeric OR string),
    using per-column quantile cut points estimated from a bounded
    sample. String columns rank by lexicographic comparison against
    sample-sorted cut strings — the dictionary-rank trick that keeps
    range locality (a hash would destroy it, defeating min/max
    skipping on that dimension).

    ``bits`` bits per column → 2^(bits·len(cols)) curve cells. The cut
    points are collected once to the driver (2^bits-1 values per
    column); the returned Column is pure arithmetic/comparisons.
    """
    n_cuts = 2**bits - 1
    probs = [i / (n_cuts + 1) for i in range(1, n_cuts + 1)]
    sample = df.select(*cols).limit(sample_rows)
    dtypes = dict(sample.dtypes)
    ranks: list[Column] = []
    for c in cols:
        if dtypes[c] == "string":
            vals = sorted(
                r[0]
                for r in sample.select(c).filter(F.col(c).isNotNull()).collect()
            )
            if vals:
                cuts = [vals[min(int(p * len(vals)), len(vals) - 1)] for p in probs]
            else:
                cuts = []
            ranks.append(_rank_expr(F.col(c), [F.lit(x) for x in cuts]))
        else:
            cuts = sample.approxQuantile(c, probs, 0.001)
            ranks.append(_rank_expr(F.col(c).cast("double"), cuts))
    return _interleave(ranks, bits)


def zorder_write_sorted(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 4,
    n_files: int | None = None,
) -> DataFrame:
    """Range-partition + sort by the Z-key so each output file covers a
    compact curve segment (tight min/max on every clustered column)."""
    key = zorder_key(df, cols, bits=bits)
    out = df.withColumn("__zkey", key)
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
