"""Stateful fuzz of the FLAT (append-log) warehouse paths: random
append/overwrite/compact sequences — clustered and not, so the zone
map goes stale and gets refreshed — with three invariants: the full
read matches the model multiset, a zone-map-pruned read NEVER loses a
row relative to the plain filter (absence from the map must never be
treated as absence of matches), and once Bloom filters are recorded,
point-lookup reads through them stay exact across every subsequent
append (incremental refresh) / overwrite / compact (rebuild)."""

from __future__ import annotations

import shutil
import tempfile
from collections import Counter

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import RuleBasedStateMachine, invariant, precondition, rule

from kafka_connect_bigquery_spark.session import get_spark
from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

CATS = ["a", "b", "c"]
PLAIN = TableSpec(partition_grain="NONE")
CLUSTERED = TableSpec(partition_grain="NONE", clustering=("cat",))
_batch = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99),
        st.sampled_from(CATS),
        st.integers(min_value=0, max_value=999),
    ),
    min_size=1,
    max_size=8,
)


class FlatWarehouseMachine(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
        self.tmp = tempfile.mkdtemp(prefix="whf_fuzz_")
        self.wh = Warehouse(self.spark, self.tmp)
        # model rows are (k, cat, v, w) — w None for rows appended
        # without the evolved column
        self.model: Counter = Counter()
        self.created = False
        self.bloomed = False
        self.evolved = False

    def _df(self, batch, with_extra=False):
        if with_extra:
            rows = [(k, c, v, v * 10) for k, c, v in batch]
            return self.spark.createDataFrame(
                rows, "k: bigint, cat: string, v: bigint, w: bigint"
            )
        return self.spark.createDataFrame(
            batch, "k: bigint, cat: string, v: bigint"
        )

    @rule(batch=_batch, clustered=st.booleans())
    def append(self, batch, clustered):
        self.wh.append(self._df(batch), "t", CLUSTERED if clustered else PLAIN)
        self.model.update((k, c, v, None) for k, c, v in batch)
        self.created = True

    @rule(batch=_batch, clustered=st.booleans())
    def append_evolving(self, batch, clustered):
        """Append carrying a new column w — append-path schema evolution
        (probe-found round 5: the evolved column and its VALUES were
        silently dropped by footer-sampled reads) interleaved with
        overwrites (which re-narrow the schema), compaction, and the
        zone-map/bloom sidecars."""
        self.wh.append(
            self._df(batch, with_extra=True),
            "t",
            CLUSTERED if clustered else PLAIN,
        )
        self.model.update((k, c, v, v * 10) for k, c, v in batch)
        self.created = True
        self.evolved = True

    @rule(batch=_batch, clustered=st.booleans())
    def overwrite(self, batch, clustered):
        self.wh.overwrite(self._df(batch), "t", CLUSTERED if clustered else PLAIN)
        self.model = Counter((k, c, v, None) for k, c, v in batch)
        self.created = True
        self.evolved = False  # full re-statement narrows the schema back

    @precondition(lambda self: self.created)
    @rule()
    def compact(self):
        self.wh.compact("t", CLUSTERED, target_file_rows=4, min_files=1)

    @precondition(lambda self: self.created)
    @rule()
    def record_bloom(self):
        self.wh.record_bloom("t", ["k", "cat"])
        self.bloomed = True

    @invariant()
    def full_read_matches_model(self):
        if not self.created:
            return
        df = self.wh.read("t")
        if self.evolved:
            assert "w" in df.columns, "evolved column lost"
            got = Counter(
                (r["k"], r["cat"], r["v"], r["w"])
                for r in df.select("k", "cat", "v", "w").collect()
            )
            assert got == self.model
        else:
            assert "w" not in df.columns, "overwrite failed to narrow schema"
            got = Counter(
                (r["k"], r["cat"], r["v"], None)
                for r in df.select("k", "cat", "v").collect()
            )
            assert got == self.model

    @invariant()
    def pruned_read_equals_plain_filter(self):
        if not self.created:
            return
        for cat in CATS:
            got = Counter(
                (r["k"], r["v"])
                for r in self.wh.read_pruned("t", "cat", eq=cat)
                .select("k", "v")
                .collect()
            )
            want = Counter(
                (k, v) for k, c, v, _w in self.model.elements() if c == cat
            )
            assert got == want, f"zone-map pruning diverged for cat={cat}"

    @invariant()
    def bloom_point_lookups_stay_exact(self):
        if not self.bloomed:
            return
        for key in (0, 7, 99, 1234):  # 1234 never inserted
            got = Counter(
                (r["cat"], r["v"])
                for r in self.wh.read_pruned_where("t", {"k": key})
                .select("cat", "v")
                .collect()
            )
            want = Counter(
                (c, v) for k, c, v, _w in self.model.elements() if k == key
            )
            assert got == want, f"bloom point lookup diverged for k={key}"

    def teardown(self):
        shutil.rmtree(self.tmp, ignore_errors=True)


TestFlatWarehouseStateful = FlatWarehouseMachine.TestCase
TestFlatWarehouseStateful.settings = settings(
    max_examples=8, stateful_step_count=10, deadline=None
)
