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

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(cols: list[str], buckets: int) -> Column:
    """Salt in [0, buckets) from a hash of stable row columns."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets))


def scan_input_bytes(df: DataFrame) -> int | None:
    """Actual on-disk bytes of the frame's input files, or ``None``
    when the frame has no file source (streams, checkpointed or
    in-memory frames) or a file cannot be stat'd.

    This is the size signal ``fan_out(when_bytes=)`` gates on: file
    bytes are a property of the DATA, where Catalyst's
    ``optimizedPlan().stats().sizeInBytes()`` is a property of the
    SESSION (compression-factor conf, CBO flags, column pruning above
    the scan) — the same query must make the same widening decision
    under any harness's session. Driver-side metadata only: the file
    list is what the scan already planned over, no job runs.

    Single-scan assumption: ``inputFiles()`` DEDUPES paths, so a
    self-union/self-join frame reports the bytes of ONE scan while the
    query reads the data N times. Every current ``when_bytes`` caller
    gates a single-table scan; a multi-scan caller must multiply by its
    scan multiplicity or the widening gate under-triggers."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme in ("", "file"):
            try:
                total += os.path.getsize(unquote(parsed.path))
                continue
            except OSError:
                return None
        try:
            # non-local FS (hdfs/s3a/...): stat through Hadoop's cached
            # FileSystem handles — still pure driver metadata
            sess = df.sparkSession
            jpath = sess._jvm.org.apache.hadoop.fs.Path(uri)
            fs = jpath.getFileSystem(sess._jsc.hadoopConfiguration())
            total += fs.getFileStatus(jpath).getLen()
        except Exception:
            return None
    return total


# logical operators that put an exchange in the frame's lineage: their
# output partitioning is runtime-decided (AQE), so a frame downstream of
# any of these is never the single-row-group narrow scan fan_out exists
# to widen
_SHUFFLE_NODES = frozenset(
    {
        "Aggregate",
        "Join",
        "Sort",
        "Window",
        "RepartitionByExpression",
        "RebalancePartitions",
        "Deduplicate",
        "Intersect",
        "Except",
        "GlobalLimit",
        "CoGroup",
        "FlatMapGroupsInPandas",
    }
)


def has_shuffle_lineage(df: DataFrame) -> bool:
    """True when the frame's optimized logical plan contains a
    shuffle-producing operator.

    Why this matters: under AQE, probing a post-shuffle frame's
    partition count (``df.rdd``) FINALIZES the adaptive plan, which
    EXECUTES the upstream shuffle stages — a whole extra run of the
    query up to that point (measured 2.5 s on a union+distinct at
    sf0.1, vs 0.09 s plan-only on a raw scan). Callers use this to
    route exchanged frames away from the probe. Unknown plans count as
    exchanged (the conservative answer: no probe, no widening).

    Two layers: the logical allowlist (_SHUFFLE_NODES) catches the
    operators repo code produces; the physical backstop below catches
    shuffle-producing logical nodes NOT in the set (e.g.
    FlatMapCoGroupsInPandas, [Flat]MapGroupsWithState, Offset) by
    scanning the COMPILED — never executed — physical plan string for
    Exchange nodes. It must be executedPlan() (sparkPlan() precedes
    EnsureRequirements, so exchanges aren't inserted yet); executedPlan
    is still lazy — under AQE its toString prints the INITIAL plan with
    its exchanges, and only .execute()/.rdd materializes stages — so
    the backstop stays a driver-side metadata read."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
    except Exception:
        return True
    stack = [plan]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name in _SHUFFLE_NODES:
            return True
        if name == "Repartition":
            # repartition(n) shuffles; coalesce(n) is the SAME logical
            # node with shuffle=false — and a coalesced narrow scan is
            # exactly what fan_out exists to widen
            try:
                if node.shuffle():
                    return True
            except Exception:
                return True
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    # physical backstop: compile (don't execute) the plan and look for
    # Exchange operators the logical allowlist missed. Anchored to the
    # tree-prefix (line start + non-word tree characters) so the word
    # "Exchange" inside a file path, column name, or filter literal —
    # all of which plan strings print mid-line — can't false-positive a
    # genuinely narrow frame out of widening.
    import re

    try:
        physical = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return True
    return (
        re.search(r"(?m)^[^\w]*(?:Broadcast|Reused)?Exchange[ (]", physical)
        is not None
    )


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
    6 MB corpus (sf1 documents, 1.1-1.2x), widening wins at 59 MB
    (sf10, 0.78x). Pass the threshold for allocation-bound seams; the
    widening then engages only when the input's actual file bytes
    (``scan_input_bytes`` — session-independent, unlike the Catalyst
    size estimate this gate used to read) exceed it. Frames with no
    file source (streams, checkpointed/in-memory) stay plain: unknown
    size must not silently force a full exchange. Hash-bound seams
    (md5 per gram: decontaminate, DSIR) win from widening at every
    measured size — omit it there.

    Cost note: the narrow-input probe compiles the physical plan once
    (JVM-side ``rdd().getNumPartitions()`` — no Python RDD conversion);
    fan_out sits once per query before a corpus scan, never inside a
    per-batch or per-row path."""
    if when_bytes is not None:
        size = scan_input_bytes(df)
        if size is None or size < when_bytes:
            return df
    if has_shuffle_lineage(df):
        # post-shuffle frames are wide by construction at scale, and
        # probing their partition count under AQE would execute the
        # upstream stages (the r11 search_hybrid_rrf regression) — the
        # settled behavior is hands-off; callers that need GUARANTEED
        # width on an exchanged frame repartition explicitly (see
        # dedup._shingle_postings)
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        parts = df._jdf.rdd().getNumPartitions()
    except Exception:
        parts = df.rdd.getNumPartitions()
    if parts * 2 >= target:
        return df
    return df.repartition(target)


# measured crossover band for allocation-bound text explodes (see
# fan_out docstring): plain still won at 6 MB of input parquet (sf1
# documents, 5.98 MB), widening won at 59 MB (sf10, 58.9 MB) — the
# threshold sits mid-band, so moving the gate from Catalyst estimates
# to actual file bytes changes no decision at the measured points
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
