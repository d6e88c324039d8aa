"""Stateful fuzz of the bucketed warehouse: random interleavings of
upsert/delete MERGE batches, compaction, and vacuum, checked against a
dict model after every step. Hypothesis explores operation orders a
hand-written test never would (delete-then-reinsert across compaction,
vacuum mid-history, emptied buckets...)."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine, initialize, invariant, precondition, rule,
)

from kafka_connect_bigquery_spark.session import get_spark
from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

SPEC = TableSpec(partition_grain="NONE", key_bucket_count=4)
_batch = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=99),
        st.booleans(),
    ),
    min_size=1,
    max_size=6,
)


class WarehouseMachine(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
        self.tmp = tempfile.mkdtemp(prefix="wh_fuzz_")
        self.wh = Warehouse(self.spark, self.tmp, snapshot_retention=3)
        self.model: dict[int, int] = {}
        # version -> model snapshot at that commit (time-travel oracle);
        # compaction also commits a version, with the same logical state
        self.history: dict[int, dict[int, int]] = {}
        self.created = False

    def _committed(self):
        gen = int(self.wh.layout_meta("t")["generation"])
        self.history[gen] = dict(self.model)
        self.created = True

    @rule(batch=_batch)
    def merge(self, batch):
        rows = [(k, v, i, t) for i, (k, v, t) in enumerate(batch)]
        df = self.spark.createDataFrame(
            rows, "k: bigint, v: bigint, i: bigint, __tombstone: boolean"
        )
        self.wh.merge(df, "t", ["k"], mode="upsert_delete", order_col="i", spec=SPEC)
        newest = {}
        for k, v, t in batch:
            newest[k] = (v, t)  # later index wins
        for k, (v, t) in newest.items():
            if t:
                self.model.pop(k, None)
            else:
                self.model[k] = v
        self._committed()

    @precondition(lambda self: self.created)
    @rule()
    def compact(self):
        if self.wh.compact("t", SPEC, target_file_rows=4, min_files=1):
            self._committed()

    @precondition(lambda self: self.created)
    @rule()
    def vacuum(self):
        self.wh.vacuum("t")

    @invariant()
    def state_matches_model(self):
        if not self.created:
            return
        got = {
            r["k"]: r["v"]
            for r in self.wh.read_bucketed("t").select("k", "v").collect()
        }
        assert got == self.model

    @precondition(lambda self: self.created)
    @rule()
    def cdc_between_retained_versions_matches_model_diff(self):
        versions = [v for v in self.wh.snapshots("t") if v in self.history]
        if len(versions) < 2:
            return
        lo, hi = versions[0], versions[-1]
        a, b = self.history[lo], self.history[hi]
        want = set()
        for k in set(a) | set(b):
            if k not in a:
                want.add(("insert", k, b[k]))
            elif k not in b:
                want.add(("delete", k, a[k]))
            elif a[k] != b[k]:
                want.add(("update", k, b[k]))
        got = {
            (r["_change_type"], r["k"], r["v"])
            for r in self.wh.read_changes(
                "t", from_version=lo, to_version=hi
            ).collect()
        }
        assert got == want, f"CDC v{lo}->v{hi} diverged"

    @invariant()
    def retained_snapshots_match_history(self):
        if not self.created:
            return
        for v in self.wh.snapshots("t"):
            if v not in self.history:
                continue
            got = {
                r["k"]: r["v"]
                for r in self.wh.read("t", version=v).select("k", "v").collect()
            }
            assert got == self.history[v], f"time travel to v{v} diverged"

    def teardown(self):
        shutil.rmtree(self.tmp, ignore_errors=True)


TestWarehouseStateful = WarehouseMachine.TestCase
TestWarehouseStateful.settings = settings(
    max_examples=5, stateful_step_count=8, deadline=None
)
