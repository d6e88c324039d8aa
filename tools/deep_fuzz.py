"""Round-end extended stateful fuzz: run the warehouse state machines
at a much larger budget than the per-commit suite (which stays small to
keep `pytest tests/` fast). Results are recorded in BASELINE.md.

Usage: python tools/deep_fuzz.py <machine> <max_examples> <steps>
  machine ∈ {flat, bucketed, expiry, pretrain}
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    machine, examples, steps = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    from hypothesis import settings
    from hypothesis.stateful import run_state_machine_as_test

    if machine == "flat":
        from tests.test_flat_warehouse_stateful import FlatWarehouseMachine as M
    elif machine == "expiry":
        from tests.test_flat_warehouse_stateful import PartitionedExpiryMachine as M
    elif machine == "bucketed":
        from tests.test_warehouse_stateful import WarehouseMachine as M
    elif machine == "pretrain":
        from tests.test_pretrain_stateful import PretrainTickMachine as M
    else:
        raise SystemExit(f"unknown machine {machine}")
    t0 = time.time()
    run_state_machine_as_test(
        M,
        settings=settings(
            max_examples=examples, stateful_step_count=steps, deadline=None
        ),
    )
    print(
        f"PASS {machine} {examples}x{steps} in {time.time() - t0:.0f}s",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
