"""Subprocess driver for the two-JVM MERGE race test
(tests/test_bucketed_merge.py::test_two_process_writer_race).

Role A: stages its merge from generation G, then *holds the commit*
until B has published G+1 — forcing the exact lost-update interleaving
the optimistic-concurrency check exists for. A must see the loud
conflict abort, then retry against the new state and succeed.

Role B: waits until A has read its destination state, then runs a
plain merge and publishes.

Sequencing uses barrier files only — every merge, commit, conflict
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
    root, role, sync = sys.argv[1], sys.argv[2], sys.argv[3]
    from kafka_connect_bigquery_spark.session import get_spark
    from kafka_connect_bigquery_spark.sinks.warehouse import (
        TableSpec, Warehouse, WarehouseError,
    )

    spark = get_spark(f"race-{role}", master="local[2]", shuffle_partitions=2)
    spec = TableSpec(partition_grain="NONE", key_bucket_count=4)

    if role == "A":
        held = {"first": True}

        class HoldingWarehouse(Warehouse):
            def _commit_bucket_generations(self, *a, **kw):
                if held["first"]:
                    held["first"] = False
                    # A has read its base generation and staged output;
                    # let B publish before A's commit check runs
                    _touch(sync, "a_staged")
                    _wait(sync, "b_done")
                return super()._commit_bucket_generations(*a, **kw)

        wh = HoldingWarehouse(spark, root, snapshot_retention=1)
        batch = spark.createDataFrame(
            [(k, "A", 100 + k, False) for k in range(10)],
            "k: bigint, v: string, i: bigint, __tombstone: boolean",
        )
        try:
            wh.merge(batch, "t", ["k"], mode="upsert", order_col="i", spec=spec)
            _touch(sync, "a_no_conflict")  # test will fail on this
        except WarehouseError as e:
            if "concurrent MERGE commit" not in str(e):
                raise
            _touch(sync, "a_conflict")
            wh.merge(batch, "t", ["k"], mode="upsert", order_col="i", spec=spec)
        _touch(sync, "a_done")
    else:
        _wait(sync, "a_staged")
        wh = Warehouse(spark, root, snapshot_retention=1)
        batch = spark.createDataFrame(
            [(k, "B", 100 + k, False) for k in range(10, 20)],
            "k: bigint, v: string, i: bigint, __tombstone: boolean",
        )
        wh.merge(batch, "t", ["k"], mode="upsert", order_col="i", spec=spec)
        _touch(sync, "b_done")
    spark.stop()


if __name__ == "__main__":
    main()
