"""Shallow clone (r08): zero-copy flat-table clone via hardlinks —
the dev/test-snapshot primitive (Delta SHALLOW CLONE). Invariants:
clone reads exactly what read(src, version=...) returned (deferred
deletes included), shares inodes not bytes, and is fully independent
from birth — source compaction/vacuum cannot break it, writes on
either side never show up on the other."""

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


def _df(spark, lo, hi, day=1):
    rows = [
        (i, datetime.datetime(2024, 1, day, 12, 0), float(i))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, ["id", "ts", "v"])


def _ids(df):
    return {r["id"] for r in df.collect()}


def test_clone_current_is_zero_copy_and_equal(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10), "t", SPEC)
    wh.append(_df(spark, 10, 20), "t", SPEC)
    out = wh.clone_table("t", "t2")
    assert out["n_files"] > 0 and out["n_copied"] == 0
    assert out["n_hardlinked"] == out["n_files"]  # same FS: all links
    assert _ids(wh.read("t2")) == _ids(wh.read("t")) == set(range(20))
    # shared inodes, not copied bytes
    src_inodes = {os.stat(p).st_ino for p in Warehouse._data_files(wh.path("t"))}
    dst_inodes = {os.stat(p).st_ino for p in Warehouse._data_files(wh.path("t2"))}
    assert dst_inodes == src_inodes
    # clone history starts at a self-contained clone commit
    recs = wh._read_oplog("t2")
    assert len(recs) == 1 and recs[0]["op"] == "clone"
    assert recs[0]["source"] == "t" and "state" in recs[0]
    assert wh.layout_meta("t2")["cloned_from"] == {"table": "t", "version": 1}


def test_clone_at_version_pins_files_and_pending_deletes(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10), "t", SPEC)          # v0
    wh.delete_where("t", "id % 2 = 1")               # v1: deferred
    wh.append(_df(spark, 10, 20), "t", SPEC)         # v2
    want_v1 = _ids(wh.read("t", version=1))
    assert want_v1 == {0, 2, 4, 6, 8}
    out = wh.clone_table("t", "t_v1", version=1)
    assert out["source_version"] == 1
    assert _ids(wh.read("t_v1")) == want_v1
    # the pending predicate rode along, scoped to the cloned files
    dels = wh.layout_meta("t_v1").get("deferred_deletes")
    assert dels and dels[0]["predicate"] == "id % 2 = 1"


def test_clone_is_independent_both_directions(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10), "t", SPEC)
    wh.clone_table("t", "t2")
    wh.append(_df(spark, 10, 20), "t", SPEC)    # source moves on
    wh.append(_df(spark, 90, 95), "t2", SPEC)   # clone moves on
    assert _ids(wh.read("t")) == set(range(20))
    assert _ids(wh.read("t2")) == set(range(10)) | set(range(90, 95))
    # the clone's own op log time-travels from its clone checkpoint
    assert _ids(wh.read("t2", version=0)) == set(range(10))


def test_clone_survives_source_compaction_and_vacuum(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for k in range(3):
        wh.append(_df(spark, k * 10, k * 10 + 10), "t", SPEC)
    wh.clone_table("t", "t2")
    before = _ids(wh.read("t2"))
    # source rewrites everything, then drops every retained layer
    wh.compact("t", SPEC, target_file_rows=10_000)
    wh.vacuum_retained("t", keep_layers=0)
    assert _ids(wh.read("t2")) == before  # inodes survived the unlink
    # and the source is fine too
    assert _ids(wh.read("t")) == before


def test_clone_refuses_existing_and_bad_version(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 5), "t", SPEC)
    wh.clone_table("t", "t2")
    with pytest.raises(WarehouseError, match="already exists"):
        wh.clone_table("t", "t2")
    with pytest.raises(WarehouseError, match="out of range"):
        wh.clone_table("t", "t3", version=99)
    with pytest.raises(WarehouseError, match="no such table"):
        wh.clone_table("nope", "t4")


BSPEC = TableSpec(partition_grain="NONE", key_bucket_count=4)


def _bmerge(spark, wh, table, rows, i):
    df = spark.createDataFrame(
        [(k, v, i, tomb) for k, v, tomb in rows],
        "id: bigint, v: double, i: bigint, __tombstone: boolean",
    )
    wh.merge(df, table, ["id"], mode="upsert_delete", order_col="i", spec=BSPEC)


def _kv(df):
    return {(r["id"], r["v"]) for r in df.collect()}


def test_clone_bucketed_current_and_pinned(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _bmerge(spark, wh, "bt", [(k, float(k), False) for k in range(8)], 0)  # g0
    _bmerge(spark, wh, "bt", [(0, 99.0, False), (1, 0.0, True)], 1)       # g1
    g0 = wh.snapshots("bt")[0]
    out = wh.clone_table("bt", "bt_dev")
    assert out["n_copied"] == 0 and out["n_files"] > 0
    assert _kv(wh.read("bt_dev")) == _kv(wh.read("bt"))
    pinned = wh.clone_table("bt", "bt_g0", version=g0)
    assert pinned["source_version"] == g0
    assert _kv(wh.read("bt_g0")) == {(k, float(k)) for k in range(8)}
    with pytest.raises(WarehouseError, match="not readable"):
        wh.clone_table("bt", "bt_bad", version=999)


def test_clone_bucketed_is_independent_and_cdc_capable(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _bmerge(spark, wh, "bt", [(k, float(k), False) for k in range(6)], 0)
    wh.clone_table("bt", "bt_dev")
    base = int(wh.layout_meta("bt_dev")["generation"])
    # both sides merge independently after the clone
    _bmerge(spark, wh, "bt", [(0, -1.0, False)], 1)
    _bmerge(spark, wh, "bt_dev", [(5, 50.0, False), (6, 60.0, False)], 1)
    assert _kv(wh.read("bt")) == {(0, -1.0)} | {(k, float(k)) for k in range(1, 6)}
    assert _kv(wh.read("bt_dev")) == (
        {(k, float(k)) for k in range(5)} | {(5, 50.0), (6, 60.0)}
    )
    # the clone's CDC feed starts at the clone point
    ch = wh.read_changes("bt_dev", from_version=base, images="both")
    types = {(r["id"], r["_change_type"]) for r in ch.select("id", "_change_type").collect()}
    assert (6, "insert") in types
    assert (5, "update_postimage") in types
    # source vacuum cannot break the clone (shared inodes, own dirs)
    wh.vacuum_snapshots("bt", keep_last=1)
    wh.vacuum("bt")
    assert _kv(wh.read("bt_dev")) == (
        {(k, float(k)) for k in range(5)} | {(5, 50.0), (6, 60.0)}
    )
