"""Stateful fuzz of the incremental pretrain tick vs the batch
rebuild: random monotonic-id ingest batches mixing fresh docs, exact
duplicates, LSH near-duplicate mutations, and semantic vector twins —
under BOTH survivor policies ("min_id" / "best"), with and without the
embeddings stage, interleaved with ``materialize_survivors`` compaction
and torn-tick crash injection at random append depths. This machine
generalizes the hand-built equality tests in test_pretrain_pipeline.py
over the state space where the r13 self-review found its defects
(eviction-log growth, sem-probe population drift, compaction vs
torn-tick recovery interplay).

Invariant after every step: the accumulated tick survivors equal
``build_corpus`` run from scratch on the unioned corpus (id-set
equality, no duplicated rows), the evicted log holds each id at most
once, and no evicted id is ever readable as a survivor.

Documented preconditions (pipelines/pretrain.py) the generator
RESPECTS rather than tests:

- ingest-monotonic doc ids — every batch's ids exceed all earlier ids;
- the sem quantizer's seed rows land in tick 1 and are never evicted —
  tick 1 opens with ``SEM_K`` anchor docs holding the corpus-max token
  count (mutations are word-capped below it; keep-best quality ties,
  the exact stage, and the sem stage all break to MIN id, so no later
  doc can outrank an anchor in any stage) and mutually-orthogonal
  planted vectors.
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest
from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
)

from kafka_connect_bigquery_spark.pipelines.pretrain import (
    TICK_COL,
    CorpusConfig,
    PretrainTickTables,
    build_corpus,
    incremental_tick,
    materialize_survivors,
)
from kafka_connect_bigquery_spark.session import get_spark
from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

from tests.test_pretrain_pipeline import _crash_after_n_state_appends

SEM_K = 3          # sem_clusters; also the anchor count
ANCHOR_WORDS = 30  # corpus-max token count: mutations cap below this
DIM = 4

_ops = st.lists(
    st.tuples(
        st.sampled_from(["fresh", "exact", "near", "twin"]),
        st.integers(min_value=0, max_value=10**6),
    ),
    min_size=0,
    max_size=5,
)


def _vec_of(i: int) -> list[float]:
    r = random.Random(1000 + i)
    return [r.uniform(-1.0, 1.0) for _ in range(DIM)]


class PretrainTickMachine(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
        self.tmp = tempfile.mkdtemp(prefix="pretrain_fuzz_")
        self.wh = Warehouse(self.spark, self.tmp)
        self.tables = PretrainTickTables()
        self.spec = TableSpec(partition_grain="NONE")
        self.docs: list[tuple[int, str]] = []   # everything ever appended
        self.embs: dict[int, list[float]] = {}
        self.next_id = 0
        self.cursor = None
        self.art = None
        self._w = 0  # deterministic word-soup counter

    # -- generators --------------------------------------------------

    def _words(self, n: int) -> str:
        out = []
        for _ in range(n):
            self._w += 1
            out.append(f"w{self._w}")
        return " ".join(out)

    def _rows_for(self, ops) -> list[tuple[int, str]]:
        rows = []
        for kind, seed in ops:
            did = self.next_id
            self.next_id += 1 + seed % 7  # id gaps exercise the cursor
            pool = self.docs + rows
            if kind == "exact" and pool:
                text = pool[seed % len(pool)][1]
            elif kind == "near" and pool:
                base = pool[seed % len(pool)][1].split()[:22]
                text = " ".join(base) + " " + self._words(1 + seed % 5)
            else:  # fresh (and the degenerate exact/near/twin on an
                # empty pool)
                text = self._words(8 + seed % 12)
            rows.append((did, text))
            if self.with_emb:
                if kind == "twin" and self.embs:
                    src = sorted(self.embs)[seed % len(self.embs)]
                    self.embs[did] = [x * 1.01 for x in self.embs[src]]
                elif seed % 10 < 8:  # most (not all) docs carry a vector
                    self.embs[did] = _vec_of(did)
        return rows

    def _docs_df(self, rows=None):
        return self.spark.createDataFrame(
            rows if rows is not None else self.docs, "doc_id: long, text: string"
        )

    def _emb_df(self):
        if not self.with_emb:
            return None
        return self.spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in sorted(self.embs.items())],
            "vec_id: long, embedding: array<double>",
        )

    def _tick(self, rows):
        self.wh.append(self._docs_df(rows), "corpus", self.spec)
        self.docs += rows
        self.art = incremental_tick(
            self.wh,
            "corpus",
            self.cursor,
            tables=self.tables,
            cfg=self.cfg,
            embeddings=self._emb_df(),
        )
        self.cursor = self.art["cursor"]

    # -- rules ---------------------------------------------------------

    @initialize(
        policy=st.sampled_from(["min_id", "best"]),
        with_emb=st.booleans(),
        ops=_ops,
    )
    def first_tick(self, policy, with_emb, ops):
        self.with_emb = with_emb
        self.cfg = CorpusConfig(
            min_quality=0.0,
            sem_clusters=SEM_K,
            sem_min_cosine=0.95,
            survivor=policy,
        )
        anchors = []
        for i in range(SEM_K):
            anchors.append((self.next_id, self._words(ANCHOR_WORDS)))
            if with_emb:  # planted orthogonal one-hots: mutually far
                v = [0.0] * DIM
                v[i] = 1.0
                self.embs[self.next_id] = v
            self.next_id += 1
        self._tick(anchors + self._rows_for(ops))

    @rule(ops=_ops)
    def ingest_tick(self, ops):
        self._tick(self._rows_for(ops))

    def _corpus_view(self):
        surv = self.wh.read(self.tables.survivors).drop(TICK_COL)
        if self.wh.exists(self.tables.evicted):
            ev = self.wh.read(self.tables.evicted).select("doc_id")
            surv = surv.join(ev, "doc_id", "left_anti")
        return surv

    @rule()
    def compact(self):
        # folds evicted ids into survivors (and sem_vectors when the
        # sem stage is live); a no-op under min_id / before evictions.
        # The overwrites destroy the files behind earlier table
        # versions, so the held tick artifact — pinned to them — must
        # be re-read (the documented materialize_survivors contract).
        materialize_survivors(self.wh, tables=self.tables)
        if self.art is not None:
            self.art = dict(self.art)
            self.art["survivors"] = self._corpus_view()

    @rule(ops=_ops, fail_after=st.integers(min_value=1, max_value=3))
    def torn_tick(self, ops, fail_after):
        """Crash the tick after the n-th durable state append (the
        commit marker never lands), then rerun it with the SAME cursor:
        recovery must excise the torn writes and converge."""
        rows = self._rows_for(ops)
        self.wh.append(self._docs_df(rows), "corpus", self.spec)
        self.docs += rows
        restore = _crash_after_n_state_appends(self.wh, fail_after)
        try:
            with pytest.raises(RuntimeError, match="injected crash"):
                incremental_tick(
                    self.wh,
                    "corpus",
                    self.cursor,
                    tables=self.tables,
                    cfg=self.cfg,
                    embeddings=self._emb_df(),
                )
        finally:
            restore()
        self.art = incremental_tick(
            self.wh,
            "corpus",
            self.cursor,
            tables=self.tables,
            cfg=self.cfg,
            embeddings=self._emb_df(),
        )
        self.cursor = self.art["cursor"]

    # -- invariants ------------------------------------------------------

    @invariant()
    def tick_accumulation_equals_batch(self):
        if self.art is None:
            return
        batch = build_corpus(
            self._docs_df(), cfg=self.cfg, embeddings=self._emb_df()
        )
        key = "sem_survivors" if self.with_emb else "near_survivors"
        want = {r["doc_id"] for r in batch[key].select("doc_id").collect()}
        got_rows = self.art["survivors"].select("doc_id").collect()
        got = {r["doc_id"] for r in got_rows}
        assert len(got_rows) == len(got), "duplicated survivor rows"
        assert got == want, (
            f"inc-only={sorted(got - want)[:5]} batch-only={sorted(want - got)[:5]}"
        )

    @invariant()
    def evicted_log_is_consistent(self):
        if self.art is None or not self.wh.exists(self.tables.evicted):
            return
        ev = [r["doc_id"] for r in self.wh.read(self.tables.evicted).collect()]
        assert len(ev) == len(set(ev)), "evicted log re-appended an id"
        surv = {
            r["doc_id"] for r in self.art["survivors"].select("doc_id").collect()
        }
        assert not (set(ev) & surv), "evicted id readable as survivor"

    def teardown(self):
        shutil.rmtree(self.tmp, ignore_errors=True)


TestPretrainStateful = PretrainTickMachine.TestCase
TestPretrainStateful.settings = settings(
    max_examples=4, stateful_step_count=4, deadline=None
)
