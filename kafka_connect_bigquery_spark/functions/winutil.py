"""Window-shape helpers.

``bounded_global`` marks the handful of windows that legitimately run
in a single partition because their frame CANNOT grow with the corpus
— the ≤k survivors of an ``orderBy().limit(k)``, the
``n_order_buckets`` bucket-offset rows of a two-level prefix sum, a
distinct quantized-value grid. Every other single-partition window is
the scale-killer class the r06 verdict flagged (a data-sized frame
sorted through ONE task), and the plan fence
(``tests/test_plan_quality.py``) bans it.

Mechanically the helper partitions by a constant literal, which is
semantically identical to an empty partition spec — and Spark 4's
``EliminateWindowPartitions`` optimizer rule folds it straight back to
empty, so the executed plan (and Spark's blanket "WindowExec: No
Partition Defined" log warning) is unchanged. The value is purely
declarative: call sites are greppable, each one documents its bound,
and the plan fence treats literal-only partition specs EXACTLY like
empty ones, so using the helper never relaxes the fence — a
``bounded_global`` window must still either sit above a ``limit`` in
the plan or appear on the fence's per-query allowlist with its
documented bound. Any remaining WindowExec warnings in a bench log
therefore come only from fence-audited constant-bounded frames.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def bounded_global(*order_cols: Column | str) -> WindowSpec:
    """A total-order window over a frame that is BOUNDED BY
    CONSTRUCTION (post-``limit`` re-rank, fixed bucket-offset table,
    quantization-lattice grid — the caller documents the bound at the
    call site). Single-partition execution is intended; the plan fence
    verifies the bound claim per call site.
    """
    return Window.partitionBy(F.lit(0)).orderBy(*order_cols)
