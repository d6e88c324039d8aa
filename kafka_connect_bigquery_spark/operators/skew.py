"""Skew-mitigation operators: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but two cases need explicit
salting at 100 TB:

- joining a heavily-skewed fact key against a table too large to
  broadcast (AQE can split the fact side, but the matching dimension
  partition is still read by every split);
- high-cardinality aggregation where a handful of keys dominate
  (partial aggregation helps only when duplicates co-occur in a map
  task).

Salting is deterministic here (hash of stable columns, never rand()):
replayable micro-batches and retried tasks must salt identically or
exactly-once sinks break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(cols: list[str], buckets: int) -> Column:
    """Salt in [0, buckets) from a hash of stable row columns."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets))


def fan_out(
    df: DataFrame,
    min_partitions: int | None = None,
    when_bytes: int | None = None,
) -> DataFrame:
    """Raise SCAN parallelism before CPU-bound per-row work (regex
    canonicalization, tokenization, per-gram hashing).

    A parquet scan parallelizes at row-group granularity, so a corpus
    landing in one or two row groups pins the expensive narrow stage to
    as many cores while the rest idle — the shuffle stages downstream
    run wide, so the single-threaded scan becomes the whole query's
    critical path (measured: the token-bound document queries ran their
    explode stage on 1-2 of 32 cores at sf0.1/sf1). Round-robin
    repartition ONLY when the input arrives narrower than half the
    configured parallelism: at 100 TB a corpus scan is thousands of
    tasks and this is a no-op by construction; locally it moves a few
    MB of raw text once, before the tokenize/explode that a barrier
    typically checkpoints anyway. The condition also keeps it out of
    the plan for already-shuffled inputs, unlike a bare repartition(),
    which would force a pointless full exchange at scale.

    ``when_bytes``: ALLOCATION-bound narrow work (string-building
    explodes: bigrams, trigrams, shingles) behaves differently from
    hash-CPU-bound work — widening it in a shared local heap adds GC
    contention that only pays off once the narrow stage is long enough
    to amortize. Measured crossover on 32 local cores: plain wins at a
    5 MB corpus (sf1 documents, 1.1-1.2x), widening wins at 53 MB
    (sf10, 0.78x). Pass the threshold for allocation-bound seams; the
    widening then engages only when Catalyst's size estimate of the
    input exceeds it. Hash-bound seams (md5 per gram: decontaminate,
    DSIR) win from widening at every measured size — omit it there."""
    if when_bytes is not None:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if est < when_bytes:
            return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target)


# measured crossover band for allocation-bound text explodes (see
# fan_out docstring): plain still won at 5 MB, widening won at 53 MB
FAN_OUT_TEXT_BYTES = 24 * 1024 * 1024


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key_cols: list[str],
    *,
    salt_buckets: int = 8,
    salt_source_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys overwhelm single shuffle
    partitions: salt the skewed side into ``salt_buckets`` sub-keys and
    replicate ``other`` once per bucket, so each hot key spreads over
    ``salt_buckets`` partitions.

    Cost model: ``other`` is shuffled ``salt_buckets`` times — pick the
    smaller side as ``other`` and the bucket count ≈ (hot-key rows /
    target partition rows). Join keys + all columns of both frames are
    preserved; result equals the unsalted join exactly.
    """
    src = salt_source_cols or [c for c in skewed.columns if c not in key_cols]
    if not src:
        src = key_cols
    s = skewed.withColumn("__salt", deterministic_salt(src, salt_buckets))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return s.join(o, key_cols + ["__salt"], how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt_buckets: int = 8,
    salt_source_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}: the decomposable aggregates whose partial
    results re-combine exactly. Phase 1 aggregates on
    (key, salt) — hot keys split across ``salt_buckets`` partitions —
    phase 2 combines the per-salt partials (sum of counts/sums,
    min of mins, max of maxes).
    """
    _RECOMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PHASE1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out_col, (in_col, fn) in aggs.items():
        if fn not in _PHASE1:
            raise ValueError(f"non-decomposable aggregate {fn!r} for {out_col!r}")

    src = salt_source_cols or [c for c in df.columns if c not in key_cols]
    if not src:
        src = key_cols
    salted = df.withColumn("__salt", deterministic_salt(src, salt_buckets))
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[
            _PHASE1[fn](in_col).alias(out_col)
            for out_col, (in_col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            _RECOMBINE[fn](out_col).alias(out_col)
            for out_col, (in_col, fn) in aggs.items()
        ]
    )
