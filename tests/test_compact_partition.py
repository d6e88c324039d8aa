"""Partition-scoped compaction (r08): the O(partition) rewrite + delta
commit a 100 TB flat store schedules instead of compact()'s O(table)
directory swap. Invariants: rows byte-identical, only the target
partition's files rewritten, every earlier op-log version still
time-travels (old files parked under _retained), pending delete_where
scopes shrink exactly by the rewritten files, indexes stay fresh, and
a commit landing mid-rewrite trips the flat OCC abort."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.sinks.warehouse import (
    TableSpec,
    Warehouse,
    WarehouseError,
)

SPEC = TableSpec(partition_grain="DAY", timestamp_field="ts")


def _df(spark, lo, hi, day):
    rows = [
        (i, datetime.datetime(2024, 1, day, 12, 0), float(i)) for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, ["id", "ts", "v"])


def _state(wh):
    return {(r["id"], r["p_date"]) for r in wh.read("t").collect()}


def _part_files(wh, day):
    tdir = wh.path("t")
    return [
        os.path.relpath(p, tdir)
        for p in Warehouse._data_files(tdir)
        if os.path.relpath(p, tdir).startswith(f"p_date=2024-01-0{day}/")
    ]


def test_compact_partition_rewrites_only_target_and_preserves_rows(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for k in range(3):  # three appends -> >=3 files per partition
        wh.append(_df(spark, k * 10, k * 10 + 10, day=1), "t", SPEC)
        wh.append(_df(spark, k * 10, k * 10 + 10, day=2), "t", SPEC)
    before = _state(wh)
    d1_files, d2_files = _part_files(wh, 1), _part_files(wh, 2)
    assert len(d1_files) >= 3 and len(d2_files) >= 3

    n = wh.compact_partition("t", SPEC, "2024-01-01", target_file_rows=10_000)
    assert n == len(d1_files)
    assert _state(wh) == before
    assert len(_part_files(wh, 1)) == 1          # rewritten small -> one file
    assert _part_files(wh, 2) == d2_files        # untouched, byte-identical set
    # the commit is a DELTA record, not a checkpoint/swap
    recs = wh._read_oplog("t")
    assert recs[-1]["op"] == "compact_partition"
    assert "delta" in recs[-1] and "state" not in recs[-1]
    assert set(recs[-1]["delta"]["remove"]) == set(d1_files)
    # every earlier version still time-travels (old files parked)
    counts = [wh.read("t", version=v).count() for v in range(len(recs))]
    assert counts == [10, 20, 30, 40, 50, 60, 60]
    # compacting an already-compact partition is a no-op
    assert wh.compact_partition("t", SPEC, "2024-01-01") == 0


def test_compact_partition_materializes_scoped_deletes_only(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10, day=1), "t", SPEC)
    wh.append(_df(spark, 10, 20, day=1), "t", SPEC)
    wh.append(_df(spark, 20, 30, day=2), "t", SPEC)
    wh.append(_df(spark, 30, 40, day=2), "t", SPEC)
    wh.delete_where("t", "id % 2 = 1")  # scope: all four files
    before = _state(wh)
    assert len(before) == 20  # odds filtered

    wh.compact_partition("t", SPEC, "2024-01-01", target_file_rows=10_000)
    assert _state(wh) == before
    # the pending predicate now scopes ONLY day-2's (unrewritten) files
    dels = wh.layout_meta("t").get("deferred_deletes")
    assert len(dels) == 1
    assert all(r.startswith("p_date=2024-01-02/") for r in dels[0]["files"])
    # day-2 rewrite materializes the rest; the predicate disappears
    wh.compact_partition("t", SPEC, "2024-01-02", target_file_rows=10_000)
    assert _state(wh) == before
    assert not wh.layout_meta("t").get("deferred_deletes")
    # a LATER matching append is untouched (delete stays snapshot-scoped)
    wh.append(_df(spark, 41, 42, day=1), "t", SPEC)  # id 41 is odd
    assert (41, "2024-01-01") in _state(wh)


def test_compact_partition_keeps_indexes_fresh_and_occ_aborts(spark, tmp_path):
    from tests.test_sketch_index import py_hll_estimate

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10, day=1), "t", SPEC)
    wh.append(_df(spark, 10, 20, day=1), "t", SPEC)
    wh.record_sketch("t", ["id"])

    # OCC: a commit landing between the rewrite's read and its publish
    # must abort loudly — injected by appending from inside the hook
    # that runs just before the commit-lock acquisition
    orig_lock = Warehouse._commit_lock
    fired = {"done": False}

    class RacingWarehouse(Warehouse):
        def _commit_lock(self, table):
            if not fired["done"]:
                fired["done"] = True
                Warehouse(self.spark, self.root).append(
                    _df(spark, 90, 92, day=2), "t", SPEC
                )
            return orig_lock(self, table)

    rwh = RacingWarehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(WarehouseError, match="concurrent commit"):
        rwh.compact_partition("t", SPEC, "2024-01-01", target_file_rows=10_000)
    # nothing torn: rows intact, retry converges, index stays exact
    assert wh.read("t").count() == 22
    n_d1 = len(_part_files(wh, 1))
    assert n_d1 >= 2
    assert wh.compact_partition("t", SPEC, "2024-01-01", target_file_rows=10_000) == n_d1
    assert wh.read("t").count() == 22
    est = wh.approx_distinct("t", "id").collect()[0].asDict()
    assert est == py_hll_estimate(set(range(20)) | {90, 91})
    assert not [d for d in os.listdir(str(tmp_path / "wh")) if d.startswith(".tmp_")]


def test_plan_compaction_flags_only_fragmented_small_partitions(spark, tmp_path):
    """plan_compaction (r08): metadata-only two-sided test — a partition
    qualifies on file COUNT >= min_files AND mean file size below the
    small-file bar; healthy and already-compacted partitions are
    skipped."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for k in range(4):  # day 1: 4x the files of day 2
        wh.append(_df(spark, k * 10, k * 10 + 10, day=1), "t", SPEC)
    wh.append(_df(spark, 0, 10, day=2), "t", SPEC)
    n1, n2 = len(_part_files(wh, 1)), len(_part_files(wh, 2))
    assert n1 > n2  # an append may write several part files; 4 appends > 1
    plan = wh.plan_compaction("t", SPEC, min_files=n2 + 1)
    assert [e["value"] for e in plan] == ["2024-01-01"]
    e = plan[0]
    assert e["n_files"] == n1 and e["total_bytes"] > 0
    # raising the count bar empties the plan
    assert wh.plan_compaction("t", SPEC, min_files=n1 + 1) == []
    # a tiny small-file bar declares the files healthy -> no plan
    assert wh.plan_compaction("t", SPEC, min_files=n2 + 1, small_file_bytes=1) == []


def test_auto_compact_drains_plan_and_is_idempotent(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for k in range(3):
        wh.append(_df(spark, k * 10, k * 10 + 10, day=1), "t", SPEC)
        wh.append(_df(spark, k * 10, k * 10 + 10, day=2), "t", SPEC)
    wh.append(_df(spark, 0, 10, day=3), "t", SPEC)  # healthy: fewest files
    before = _state(wh)
    n1 = len(_part_files(wh, 1))
    bar = len(
        [
            r
            for r in Warehouse._data_files(wh.path("t"))
            if os.path.relpath(r, wh.path("t")).startswith("p_date=2024-01-03/")
        ]
    ) + 1  # above day 3's count, at/below days 1-2

    # capped tick: drains exactly one partition, the rest stay planned
    done = wh.auto_compact(
        "t", SPEC, min_files=bar, target_file_rows=10_000, max_partitions=1
    )
    assert [e["value"] for e in done] == ["2024-01-01"]
    assert done[0]["files_rewritten"] == n1
    assert [e["value"] for e in wh.plan_compaction("t", SPEC, min_files=bar)] == [
        "2024-01-02"
    ]
    # next tick drains the rest; state never changes
    done2 = wh.auto_compact("t", SPEC, min_files=bar, target_file_rows=10_000)
    assert [e["value"] for e in done2] == ["2024-01-02"]
    assert _state(wh) == before
    assert len(_part_files(wh, 1)) == 1 and len(_part_files(wh, 2)) == 1
    # steady state: nothing left to do
    assert wh.auto_compact("t", SPEC, min_files=bar) == []
    # time travel across the auto-compact commits still resolves
    recs = wh._read_oplog("t")
    assert [r["op"] for r in recs[-2:]] == ["compact_partition"] * 2
    assert wh.read("t", version=len(recs) - 3).count() == 70


def test_plan_compaction_rejects_unpartitioned_and_bucketed(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    flat_spec = TableSpec(partition_grain="NONE")
    wh.append(
        spark.createDataFrame([(1, 1.0)], ["id", "v"]), "plainflat", flat_spec
    )
    with pytest.raises(WarehouseError, match="Hive-partitioned"):
        wh.plan_compaction("plainflat", flat_spec)
    bspec = TableSpec(partition_grain="NONE", key_bucket_count=4)
    df = spark.createDataFrame(
        [(1, 1.0, 0, False)], ["id", "v", "i", "__tombstone"]
    )
    wh.merge(df, "bt", ["id"], mode="upsert_delete", spec=bspec)
    with pytest.raises(WarehouseError, match="bucketed"):
        wh.plan_compaction(
            "bt", TableSpec(partition_grain="DAY", timestamp_field="ts")
        )


# ---------------------------------------------------------------------------
# Bucketed analog (r09): compact_buckets + maintenance_tick parity
# ---------------------------------------------------------------------------

BSPEC = TableSpec(partition_grain="NONE", key_bucket_count=4)


def _bdf(spark, lo, hi):
    rows = [(i, float(i)) for i in range(lo, hi)]
    return spark.createDataFrame(rows, ["k", "v"]).withColumn("i", F.col("k"))


def _fragmenting_merge(spark, wh, df, table):
    """Merge, then republish every bucket from an 8-task write through
    the SAME generation commit a merge uses — the multi-file-generation
    shape a multi-task merge produces at scale (at test scale the
    planner collapses the merge write to one task per bucket, so the
    fragmentation is staged explicitly through identical machinery)."""
    import uuid as _uuid

    wh.merge(df, table, ["k"], mode="upsert", order_col="i", spec=BSPEC)
    meta = wh.layout_meta(table)
    gens = meta["generations"]
    n_buckets = int(meta["key_bucket_count"])
    paths = [wh._bucket_gen_dir(table, b, g) for b, g in gens.items()]
    out = (
        spark.read.parquet(*paths)
        .repartition(8)  # explicit N: AQE never coalesces it
        .withColumn("__bucket", F.pmod(F.hash("k"), F.lit(n_buckets)))
    )
    tmp = wh.path(f".tmp_{table}_{_uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").partitionBy("__bucket").parquet(tmp)
    wh._commit_bucket_generations(
        table, tmp, sorted(int(b) for b in gens),
        n_buckets=n_buckets, key_cols=list(meta["key_cols"]),
        base_gen=int(meta["generation"]),
    )


def _bucket_files(wh, table):
    gens = wh.layout_meta(table)["generations"]
    return {
        int(b): len(wh._data_files(wh._bucket_gen_dir(table, b, g)))
        for b, g in gens.items()
    }


def test_compact_buckets_coalesces_capped_and_preserves_rows(spark, tmp_path):
    """Small-generation coalescing: fragmented buckets (merges write one
    file per shuffle task) rewrite capped-per-tick through the same OCC
    generation commit, rows byte-identical, untouched buckets keep
    their generation pointers."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _fragmenting_merge(spark, wh, _bdf(spark, 0, 200), "t")
    before_rows = {(r["k"], r["v"]) for r in wh.read("t").collect()}
    frag = _bucket_files(wh, "t")
    assert any(n >= 2 for n in frag.values()), frag  # multi-task merges fragment
    gens0 = dict(wh.layout_meta("t")["generations"])
    done = wh.compact_buckets("t", BSPEC, min_files=2, max_buckets=2)
    assert len(done) == 2  # cap honored
    after = _bucket_files(wh, "t")
    for b in done:
        assert after[b] == 1  # coalesced to one file
    gens1 = wh.layout_meta("t")["generations"]
    for b in frag:
        if b not in done:
            assert gens1[str(b)] == gens0[str(b)]  # untouched pointer
    assert {(r["k"], r["v"]) for r in wh.read("t").collect()} == before_rows


def test_maintenance_tick_is_sufficient_for_bucketed_tables(spark, tmp_path):
    """ONE maintenance_tick call per layout: on a bucketed table the
    tick substitutes compact_buckets (capped at max_partitions) and
    reaches steady state — a coalesced (single-file) bucket is never
    reselected."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _fragmenting_merge(spark, wh, _bdf(spark, 0, 200), "t")
    before_rows = {(r["k"], r["v"]) for r in wh.read("t").collect()}
    frag = [b for b, n in _bucket_files(wh, "t").items() if n >= 2]
    out1 = wh.maintenance_tick("t", BSPEC, min_files=2, max_partitions=2)
    assert out1["compacted_buckets"] == sorted(frag)[:2]
    assert "compacted" not in out1  # the flat partition pass is n/a
    assert "retained_layers_removed" not in out1  # generations GC'd per commit
    assert "vacuumed_paths" in out1
    # drain the rest, then steady state
    while True:
        out = wh.maintenance_tick("t", BSPEC, min_files=2, max_partitions=2)
        if not out["compacted_buckets"]:
            break
    assert all(n == 1 for n in _bucket_files(wh, "t").values())
    assert {(r["k"], r["v"]) for r in wh.read("t").collect()} == before_rows


def test_compact_buckets_occ_abort_on_concurrent_merge(spark, tmp_path, monkeypatch):
    """A merge landing between compact_buckets' read and its commit
    must abort the compaction loudly (same OCC contract as a merge)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge(_bdf(spark, 0, 120), "t", ["k"], mode="upsert", order_col="i", spec=BSPEC)

    real_commit = wh._commit_bucket_generations
    state = {"raced": False}

    def racing_commit(table, tmp, buckets, **kw):
        if not state["raced"]:
            state["raced"] = True
            wh2 = Warehouse(spark, wh.root)
            wh2.merge(
                _bdf(spark, 200, 220), "t", ["k"],
                mode="upsert", order_col="i", spec=BSPEC,
            )
        return real_commit(table, tmp, buckets, **kw)

    monkeypatch.setattr(wh, "_commit_bucket_generations", racing_commit)
    with pytest.raises(WarehouseError, match="concurrent MERGE commit"):
        wh.compact_buckets("t", BSPEC, min_files=1)
    # the racing merge's rows are intact
    ks = {r["k"] for r in wh.read("t").collect()}
    assert set(range(200, 220)) <= ks


def test_compact_buckets_rejects_flat_tables(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_bdf(spark, 0, 10).drop("i"), "t", TableSpec(partition_grain="NONE"))
    with pytest.raises(WarehouseError, match="flat table"):
        wh.compact_buckets("t", TableSpec(partition_grain="NONE"))
