"""Subprocess driver for the two-JVM FLAT-table commit race tests
(tests/test_flat_race.py) — the flat twin of race_writer_proc.py.

Modes (sys.argv[2]):

* ``appender:<lo>:<n>`` — append ``n`` one-row batches (keys lo,
  lo+1, ...) back to back. Two concurrent appenders exercise the
  commit-lock serialization of the move-files + op-log-record critical
  section: every version file must be unique, contiguous, and no
  writer's rows may be lost.

* ``compactor`` — run compact(), but hold just before its commit-lock
  acquisition until the peer's append has committed (barrier files) —
  forcing the exact stale-rewrite interleaving the flat OCC check
  exists for. The first attempt MUST abort loudly ("concurrent
  commit"); the retry must converge.

Sequencing uses barrier files only — every append, compact, conflict
check, and retry is the real code path in a real separate JVM.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _touch(sync: str, name: str) -> None:
    with open(os.path.join(sync, name), "w") as f:
        f.write(str(os.getpid()))


def _wait(sync: str, name: str, timeout: float = 180.0) -> None:
    deadline = time.monotonic() + timeout
    p = os.path.join(sync, name)
    while not os.path.exists(p):
        if time.monotonic() > deadline:
            raise TimeoutError(f"barrier {name} never appeared")
        time.sleep(0.05)


def main() -> None:
    root, mode, sync = sys.argv[1], sys.argv[2], sys.argv[3]
    from kafka_connect_bigquery_spark.session import get_spark
    from kafka_connect_bigquery_spark.sinks.warehouse import (
        TableSpec, Warehouse, WarehouseError,
    )

    spec = TableSpec(partition_grain="NONE")

    if mode.startswith("appender"):
        _, lo, n = mode.split(":")
        lo, n = int(lo), int(n)
        tag = f"ready_{lo}"
        spark = get_spark(
            f"race-app-{lo}", master="local[2]", shuffle_partitions=2
        )
        wh = Warehouse(spark, root)
        # line both appenders up so their commit sections overlap
        _touch(sync, tag)
        _wait(sync, "ready_0")
        _wait(sync, "ready_1000")
        for k in range(lo, lo + n):
            wh.append(
                spark.createDataFrame([(k, f"p{lo}")], "k: bigint, src: string"),
                "t",
                spec,
            )
        _touch(sync, f"done_{lo}")
    elif mode == "compactor":
        spark = get_spark("race-compact", master="local[2]", shuffle_partitions=2)
        held = {"first": True}

        class HoldingWarehouse(Warehouse):
            def _commit_lock(self, table):
                # first lock use inside compact() is its OCC commit
                # section: the rewrite is staged, the check not yet run
                if held["first"]:
                    held["first"] = False
                    _touch(sync, "compact_staged")
                    _wait(sync, "append_done")
                return super()._commit_lock(table)

        wh = HoldingWarehouse(spark, root)
        try:
            wh.compact("t", spec, target_file_rows=10_000, min_files=2)
            _touch(sync, "compact_no_conflict")  # test fails on this
        except WarehouseError as e:
            if "concurrent commit" not in str(e):
                raise
            _touch(sync, "compact_conflict")
            wh.compact("t", spec, target_file_rows=10_000, min_files=2)
        _touch(sync, "compact_done")
    elif mode == "cloner":
        # resolve the clone's file list, then HOLD while the peer
        # compacts (moving every live file into a _retained layer) —
        # forcing the stale-path link failure clone_table's re-resolve
        # fallback exists for
        spark = get_spark("race-clone", master="local[2]", shuffle_partitions=2)
        held = {"first": True}

        class HoldingWarehouse(Warehouse):
            def _resolve_version_file(self, table, rel):
                p = super()._resolve_version_file(table, rel)
                if held["first"]:
                    held["first"] = False
                    _touch(sync, "clone_resolving")
                    _wait(sync, "compact_done")
                return p

        wh = HoldingWarehouse(spark, root)
        out = wh.clone_table("t", "tc")
        assert out["n_files"] > 0, out
        got = {(r["k"], r["src"]) for r in wh.read("tc").collect()}
        want = {(k, "seed") for k in range(6)}
        assert got == want, got
        _touch(sync, "clone_done")
    elif mode == "compactor_for_clone":
        spark = get_spark("race-compact2", master="local[2]", shuffle_partitions=2)
        wh = Warehouse(spark, root)
        _wait(sync, "clone_resolving")
        wh.compact("t", spec, target_file_rows=10_000, min_files=2)
        _touch(sync, "compact_done")
    else:  # peer appender for the compactor scenario
        spark = get_spark("race-app-late", master="local[2]", shuffle_partitions=2)
        wh = Warehouse(spark, root)
        _wait(sync, "compact_staged")
        wh.append(
            spark.createDataFrame([(999, "late")], "k: bigint, src: string"),
            "t",
            spec,
        )
        _touch(sync, "append_done")
    spark.stop()


if __name__ == "__main__":
    main()
