"""Stateful fuzz of the FLAT (append-log) warehouse paths: random
append/overwrite/compact sequences — clustered and not, so the zone
map goes stale and gets refreshed — with three invariants: the full
read matches the model multiset, a zone-map-pruned read NEVER loses a
row relative to the plain filter (absence from the map must never be
treated as absence of matches), and once Bloom filters are recorded,
point-lookup reads through them stay exact across every subsequent
append (incremental refresh) / overwrite / compact (rebuild).

Schema-evolution surface (this bug class bit three times: the r04
merge-path manifest, the r05 flat-append footer sampling, and the r06
pruned-read nested narrowing): batches randomly carry

- the base columns (k, cat, v),
- an evolved flat column w,
- a nested STRUCT column s whose OWN fields evolve independently
  (struct<a> -> struct<a, b>), mirroring the reference's recursive
  RECORD unionization (kcbq/SchemaManager.java:443-460),

and overwrites come in both NARROW (re-statement drops the evolved
columns) and WIDE (the overwrite itself carries w) forms, interleaved
with compaction — so the stored-schema commit, the explicit-read-schema
path, and the pruned-read conform path all see every ordering."""

from __future__ import annotations

import shutil
import tempfile
from collections import Counter

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import RuleBasedStateMachine, invariant, precondition, rule

from kafka_connect_bigquery_spark.session import get_spark
from kafka_connect_bigquery_spark.sinks.warehouse import (
    TableSpec,
    Warehouse,
    WarehouseError,
)

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
        # model rows are (k, cat, v, w, sa, sb) — None for dimensions a
        # row's batch did not carry
        self.model: Counter = Counter()
        self.created = False
        self.bloomed = False
        self.sketched = False
        self.texted = False
        # physical (k, cat) rows on disk: deferred deletes do NOT
        # shrink this until compact/overwrite materializes them — the
        # file-physical view the HLL index sees
        self.phys: Counter = Counter()
        # one (model snapshot, schema flags) per committed version, in
        # op-log order; versions before the last rewrite (overwrite/
        # compact) are invalidated — their files were destroyed
        self.version_log: list = []
        self.first_readable = 0
        self.vacuumed = False
        # which evolved columns the CURRENT table schema carries (reset
        # by overwrite, which is a full re-statement)
        self.has_w = False
        self.has_s = False
        self.s_has_b = False
        self._clone_n = 0

    def _snap(self, rewrite=False):
        # rewrites no longer invalidate history: _swap_dir_retaining
        # parks the replaced era's files under _retained/, so EVERY
        # version stays readable (first_readable only moves when a
        # vacuum_retained policy runs — pinned deterministically in
        # test_deferred_deletes, not fuzzed, to keep the model simple)
        self.version_log.append(
            (Counter(self.model), (self.has_w, self.has_s, self.s_has_b))
        )

    # -- batch builders -------------------------------------------------
    def _df_base(self, batch):
        return self.spark.createDataFrame(batch, "k: bigint, cat: string, v: bigint")

    def _df_w(self, batch):
        rows = [(k, c, v, v * 10) for k, c, v in batch]
        return self.spark.createDataFrame(
            rows, "k: bigint, cat: string, v: bigint, w: bigint"
        )

    def _df_nested(self, batch, with_b):
        if with_b:
            rows = [(k, c, v, (v + 1, f"s{k}")) for k, c, v in batch]
            return self.spark.createDataFrame(
                rows, "k: bigint, cat: string, v: bigint, s: struct<a: bigint, b: string>"
            )
        rows = [(k, c, v, (v + 1,)) for k, c, v in batch]
        return self.spark.createDataFrame(
            rows, "k: bigint, cat: string, v: bigint, s: struct<a: bigint>"
        )

    # -- write rules ----------------------------------------------------
    @rule(batch=_batch, clustered=st.booleans())
    def append(self, batch, clustered):
        self.wh.append(self._df_base(batch), "t", CLUSTERED if clustered else PLAIN)
        self.model.update((k, c, v, None, None, None) for k, c, v in batch)
        self.phys.update((k, c) for k, c, v in batch)
        self.created = True
        self._snap()

    @rule(batch=_batch, clustered=st.booleans())
    def append_evolving(self, batch, clustered):
        """Append carrying a new flat column w — append-path schema
        evolution (probe-found round 5: the evolved column and its
        VALUES were silently dropped by footer-sampled reads)."""
        self.wh.append(self._df_w(batch), "t", CLUSTERED if clustered else PLAIN)
        self.model.update((k, c, v, v * 10, None, None) for k, c, v in batch)
        self.phys.update((k, c) for k, c, v in batch)
        self.created = True
        self.has_w = True
        self._snap()

    @rule(batch=_batch, clustered=st.booleans())
    def append_nested(self, batch, clustered):
        """Append carrying a nested struct s: struct<a> — files written
        by this rule predate the b subfield if append_nested_evolved
        runs later (or postdate its removal-by-overwrite)."""
        self.wh.append(
            self._df_nested(batch, with_b=False), "t",
            CLUSTERED if clustered else PLAIN,
        )
        self.model.update((k, c, v, None, v + 1, None) for k, c, v in batch)
        self.phys.update((k, c) for k, c, v in batch)
        self.created = True
        self.has_s = True
        self._snap()

    @rule(batch=_batch, clustered=st.booleans())
    def append_nested_evolved(self, batch, clustered):
        """Append where the nested struct itself evolved: s gains a b
        subfield — the recursive-unionization surface."""
        self.wh.append(
            self._df_nested(batch, with_b=True), "t",
            CLUSTERED if clustered else PLAIN,
        )
        self.model.update((k, c, v, None, v + 1, f"s{k}") for k, c, v in batch)
        self.phys.update((k, c) for k, c, v in batch)
        self.created = True
        self.has_s = True
        self.s_has_b = True
        self._snap()

    @rule(batch=_batch, clustered=st.booleans())
    def overwrite(self, batch, clustered):
        self.wh.overwrite(self._df_base(batch), "t", CLUSTERED if clustered else PLAIN)
        self.model = Counter((k, c, v, None, None, None) for k, c, v in batch)
        self.phys = Counter((k, c) for k, c, v in batch)
        self.created = True
        # full re-statement narrows the schema back
        self.has_w = self.has_s = self.s_has_b = False
        self._snap(rewrite=True)

    @rule(batch=_batch, clustered=st.booleans())
    def overwrite_evolving(self, batch, clustered):
        """Overwrite that itself carries the evolved column — the wide
        re-statement: stored schema must be REPLACED with the batch's
        (w kept because the batch has it, s dropped because it
        doesn't), never unioned with the stale prior."""
        self.wh.overwrite(self._df_w(batch), "t", CLUSTERED if clustered else PLAIN)
        self.model = Counter((k, c, v, v * 10, None, None) for k, c, v in batch)
        self.phys = Counter((k, c) for k, c, v in batch)
        self.created = True
        self.has_w = True
        self.has_s = self.s_has_b = False
        self._snap(rewrite=True)

    @precondition(lambda self: self.created)
    @rule()
    def compact(self):
        self.wh.compact("t", CLUSTERED, target_file_rows=4, min_files=1)
        # compaction materializes pending deletes: physical == logical
        self.phys = Counter((t[0], t[1]) for t in self.model.elements())
        self._snap(rewrite=True)

    # -- deferred (merge-on-read) deletes -------------------------------
    # Semantics under fuzz: a delete applies to rows PRESENT at delete
    # time (its file scope), so the model drops matching rows NOW and
    # later appends re-adding matching values must survive — the exact
    # property the scope set exists to protect. Interleaving with
    # evolution/overwrite/compact exercises: predicates over columns
    # some scoped files physically lack (NULL -> row survives),
    # overwrite clearing pending deletes, compact materializing them.
    @precondition(lambda self: self.created)
    @rule(threshold=st.integers(min_value=0, max_value=999))
    def delete_where_v(self, threshold):
        self.wh.delete_where("t", f"v >= {threshold}")
        self.model = Counter(
            {t: n for t, n in self.model.items() if not t[2] >= threshold}
        )
        self._snap()

    @precondition(lambda self: self.created)
    @rule(cat=st.sampled_from(CATS))
    def delete_where_cat(self, cat):
        self.wh.delete_where("t", f"cat = '{cat}'")
        self.model = Counter(
            {t: n for t, n in self.model.items() if t[1] != cat}
        )
        self._snap()

    @precondition(lambda self: self.created and self.has_w)
    @rule(threshold=st.integers(min_value=0, max_value=9990))
    def delete_where_w(self, threshold):
        """Predicate over the EVOLVED column: scoped files that predate
        w read it as NULL, so their rows survive (SQL DELETE semantics),
        matching the model's None handling."""
        self.wh.delete_where("t", f"w >= {threshold}")
        self.model = Counter(
            {
                t: n
                for t, n in self.model.items()
                if not (t[3] is not None and t[3] >= threshold)
            }
        )
        self._snap()

    @precondition(lambda self: self.created)
    @rule(keep=st.integers(min_value=0, max_value=3))
    def vacuum_retained(self, keep):
        """Retention policy: drop all but the newest ``keep`` retained
        layers. Versions whose files lived only in dropped layers must
        fail LOUDLY from now on (the exact-or-loud time-travel
        invariant below) — never return partial rows."""
        self.wh.vacuum_retained("t", keep_layers=keep)
        self.vacuumed = True

    @precondition(lambda self: self.created)
    @rule()
    def record_bloom(self):
        self.wh.record_bloom("t", ["k", "cat"])
        self.bloomed = True

    @precondition(lambda self: self.created)
    @rule()
    def record_sketch(self):
        self.wh.record_sketch("t", ["k", "cat"])
        self.sketched = True

    @precondition(lambda self: self.created)
    @rule()
    def record_text(self):
        self.wh.record_text_index("t", ["cat"])
        self.texted = True

    # -- invariants -----------------------------------------------------
    def _project(self, df, flags=None):
        """Model-shaped (k, cat, v, w, sa, sb) tuples from a read."""
        from pyspark.sql import functions as F

        has_w, has_s, s_has_b = flags or (self.has_w, self.has_s, self.s_has_b)
        cols = [F.col("k"), F.col("cat"), F.col("v")]
        cols.append(F.col("w") if has_w else F.lit(None).cast("bigint"))
        cols.append(F.col("s.a") if has_s else F.lit(None).cast("bigint"))
        cols.append(
            F.col("s.b") if s_has_b else F.lit(None).cast("string")
        )
        return Counter(tuple(r) for r in df.select(*cols).collect())

    @invariant()
    def full_read_matches_model(self):
        if not self.created:
            return
        df = self.wh.read("t")
        expect = {"k", "cat", "v"} | ({"w"} if self.has_w else set()) | (
            {"s"} if self.has_s else set()
        )
        assert set(df.columns) == expect, (
            f"schema drift: have {sorted(df.columns)}, want {sorted(expect)}"
        )
        if self.has_s:
            s_fields = {f.name for f in df.schema["s"].dataType.fields}
            want_s = {"a", "b"} if self.s_has_b else {"a"}
            assert s_fields == want_s, f"nested drift: {s_fields} != {want_s}"
        assert self._project(df) == self.model

    @invariant()
    def pruned_read_equals_plain_filter(self):
        if not self.created:
            return
        for cat in CATS:
            pruned = self.wh.read_pruned("t", "cat", eq=cat)
            # the pruned read's schema must equal the full read's even
            # when every surviving file predates an evolution (the r06
            # nested-narrowing fix in _conform_to_stored)
            assert set(pruned.columns) == set(self.wh.read("t").columns)
            got = self._project(pruned)
            want = Counter(t for t in self.model.elements() if t[1] == cat)
            assert got == want, f"zone-map pruning diverged for cat={cat}"

    @invariant()
    def bloom_point_lookups_stay_exact(self):
        if not self.bloomed:
            return
        for key in (0, 7, 99, 1234):  # 1234 never inserted
            got = self._project(self.wh.read_pruned_where("t", {"k": key}))
            want = Counter(t for t in self.model.elements() if t[0] == key)
            assert got == want, f"bloom point lookup diverged for k={key}"

    @invariant()
    def text_contains_reads_stay_exact(self):
        """Once the token index is recorded, CONTAINS reads through it
        must equal the model filter across every subsequent append
        (incremental refresh) / overwrite / compact (rebuild) /
        deferred delete — file skipping must never lose or resurrect
        rows."""
        if not self.texted:
            return
        for cat in CATS + ["zz"]:  # zz never inserted
            got = self._project(self.wh.read_containing("t", "cat", cat))
            want = Counter(t for t in self.model.elements() if t[1] == cat)
            assert got == want, f"text-index read diverged for cat={cat}"

    @invariant()
    def time_travel_reconstructs_readable_versions(self):
        """Every version ever committed must reconstruct its exact
        model snapshot — schema-as-of-then included, ACROSS rewrites
        (overwrite/compact park prior files in retained layers) — OR,
        once a vacuum_retained has run, fail LOUDLY with the documented
        retention error. A partial read (some rows, wrong snapshot) is
        the bug class this invariant exists to kill. The LATEST version
        must always reconstruct: its files are the live table, which no
        retention policy touches. Checks first/middle/latest each
        step."""
        if not self.version_log:
            return
        last = len(self.version_log) - 1
        for v in {0, last // 2, last}:
            want_model, flags = self.version_log[v]
            try:
                got = self._project(self.wh.read("t", version=v), flags=flags)
            except WarehouseError as e:
                assert self.vacuumed, (
                    f"version {v} unreadable with no vacuum ever run: {e}"
                )
                assert "no longer readable" in str(e), e
                assert v != last, f"latest version must always read: {e}"
                continue
            assert got == want_model, f"time travel diverged at version {v}"

    @precondition(lambda self: self.created and self.version_log)
    @rule(which=st.sampled_from(["first", "mid", "last"]))
    def clone_at_version(self, which):
        """Shallow clone (r08) composed against every other op the
        machine generates: a clone pinned at any readable version must
        read EXACTLY that version's model snapshot — schema-as-of-then
        included, deferred deletes applied, across rewrites (the clone
        links files out of retained layers) — or, when retention
        dropped the version's files, fail LOUDLY with the documented
        error. The clone is read immediately and dropped; its
        correctness is the invariant."""
        last = len(self.version_log) - 1
        v = {"first": 0, "mid": last // 2, "last": last}[which]
        dst = f"c{self._clone_n}"
        self._clone_n += 1
        want, flags = self.version_log[v]
        try:
            self.wh.clone_table("t", dst, version=v)
        except WarehouseError as e:
            assert self.vacuumed, (
                f"clone at v{v} refused with no vacuum ever run: {e}"
            )
            assert "no longer clonable" in str(e), e
            assert v != last, f"latest version must always clone: {e}"
            return
        got = self._project(self.wh.read(dst), flags=flags)
        self.wh.drop_table(dst)
        assert got == want, f"clone at version {v} diverged"

    @invariant()
    def sketch_index_matches_python_registers(self):
        """The per-file HLL index, merged, must equal a pure-Python
        replica of the register math over the PHYSICAL rows (deferred
        deletes are not subtracted until materialized — the documented
        file-physical semantics), across append-refresh / overwrite
        and compact rebuilds."""
        if not self.sketched:
            return
        from tests.test_sketch_index import py_hll_estimate

        for i, col in ((0, "k"), (1, "cat")):
            got = self.wh.approx_distinct("t", col).collect()[0].asDict()
            want = py_hll_estimate({t[i] for t in self.phys})
            assert got == want, f"sketch index diverged on {col}"

    def teardown(self):
        shutil.rmtree(self.tmp, ignore_errors=True)


TestFlatWarehouseStateful = FlatWarehouseMachine.TestCase
TestFlatWarehouseStateful.settings = settings(
    max_examples=8, stateful_step_count=10, deadline=None
)


class PartitionedExpiryMachine(RuleBasedStateMachine):
    """The retention ↔ time-travel ↔ partition-expiration interplay
    (r06 verdict ask 6 — the fourth strike zone of the
    silent-partial-read class): a DAY-partitioned flat table under
    random appends (rows spread across past days), overwrites,
    ``expire_partitions`` TTL drops, and ``vacuum_retained``.

    Invariants: the current read always equals the model; every op-log
    version reconstructs EXACTLY or fails LOUDLY with the documented
    retention error (never partial rows); the latest version always
    reconstructs (expire_partitions commits its own op-log delta, so
    post-expire state is a first-class version). The subtle case this
    machine exists for: an expired partition's files can STILL back an
    old version if a pre-rewrite copy survives in a ``_retained/``
    layer — old versions then stay exactly readable until
    vacuum_retained drops the layer, and only then flip to loud
    failure."""

    def __init__(self):
        super().__init__()
        self.spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
        self.tmp = tempfile.mkdtemp(prefix="whp_fuzz_")
        self.wh = Warehouse(self.spark, self.tmp)
        self.spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
        self.model: Counter = Counter()  # (k, day-string)
        self.created = False
        self.aged = False  # any expire/vacuum ever ran
        self.version_log: list = []

    @staticmethod
    def _now():
        import datetime as dt

        return dt.datetime.now(dt.timezone.utc)

    def _rows(self, batch):
        import datetime as dt

        now = self._now()
        return [
            (k, now - dt.timedelta(days=ago), (now - dt.timedelta(days=ago)).strftime("%Y-%m-%d"))
            for k, ago in batch
        ]

    _pbatch = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.sampled_from([0, 2, 5, 12, 28]),
        ),
        min_size=1,
        max_size=6,
    )

    @rule(batch=_pbatch)
    def append(self, batch):
        rows = self._rows(batch)
        df = self.spark.createDataFrame(
            [(k, ts) for k, ts, _ in rows], "k: bigint, ts: timestamp"
        )
        self.wh.append(df, "tp", self.spec)
        self.model.update((k, day) for k, _, day in rows)
        self.created = True
        self.version_log.append(Counter(self.model))

    @rule(batch=_pbatch)
    def overwrite(self, batch):
        rows = self._rows(batch)
        df = self.spark.createDataFrame(
            [(k, ts) for k, ts, _ in rows], "k: bigint, ts: timestamp"
        )
        self.wh.overwrite(df, "tp", self.spec)
        self.model = Counter((k, day) for k, _, day in rows)
        self.created = True
        self.version_log.append(Counter(self.model))

    @precondition(lambda self: self.created)
    @rule(older=st.sampled_from([1, 4, 10, 60]))
    def expire(self, older):
        import datetime as dt

        n = self.wh.expire_partitions("tp", self.spec, older_than_days=older)
        cutoff = self._now() - dt.timedelta(days=older)
        kept = Counter(
            {
                t: c
                for t, c in self.model.items()
                if not dt.datetime.strptime(t[1], "%Y-%m-%d").replace(
                    tzinfo=dt.timezone.utc
                )
                < cutoff
            }
        )
        dropped_days = {t[1] for t in self.model} - {t[1] for t in kept}
        self.model = kept
        if n:
            # a real drop commits an op-log delta -> a new version
            self.version_log.append(Counter(self.model))
            self.aged = True
        assert bool(n) == bool(dropped_days), (
            f"expire dropped {n} partitions, model dropped days {dropped_days}"
        )

    @precondition(lambda self: self.created)
    @rule(keep=st.integers(min_value=0, max_value=2))
    def vacuum_retained(self, keep):
        self.wh.vacuum_retained("tp", keep_layers=keep)
        self.aged = True

    @precondition(lambda self: self.created)
    @rule(ago=st.sampled_from([0, 2, 5, 12, 28]))
    def compact_partition(self, ago):
        """Partition-scoped rewrite (r08) interleaved with appends,
        overwrites, TTL drops and retention vacuums: rows must be
        byte-preserved (model unchanged), the commit is a first-class
        version, and parked old files keep every earlier version
        exactly readable until a vacuum drops the layer (the existing
        exact-or-loud invariant covers both fates)."""
        import datetime as dt

        day = (self._now() - dt.timedelta(days=ago)).strftime("%Y-%m-%d")
        if not any(t[1] == day for t in self.model):
            return
        n = self.wh.compact_partition("tp", self.spec, day, min_files=1)
        if n:
            self.version_log.append(Counter(self.model))

    @invariant()
    def current_read_matches_model(self):
        if not self.created:
            return
        got = Counter(
            (r["k"], r["p_date"])
            for r in self.wh.read("tp").select("k", "p_date").collect()
        )
        assert got == self.model

    @invariant()
    def versions_exact_or_loud(self):
        if not self.version_log:
            return
        last = len(self.version_log) - 1
        for v in {0, last // 2, last}:
            want = self.version_log[v]
            try:
                df = self.wh.read("tp", version=v)
                got = Counter(
                    (r["k"], r["p_date"]) for r in df.select("k", "p_date").collect()
                )
            except WarehouseError as e:
                assert self.aged, f"version {v} unreadable, nothing aged: {e}"
                assert "no longer readable" in str(e), e
                assert v != last, f"latest version must always read: {e}"
                continue
            assert got == want, f"time travel diverged at version {v}"

    def teardown(self):
        shutil.rmtree(self.tmp, ignore_errors=True)


TestPartitionedExpiry = PartitionedExpiryMachine.TestCase
TestPartitionedExpiry.settings = settings(
    max_examples=6, stateful_step_count=8, deadline=None
)
