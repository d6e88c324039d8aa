"""Incremental materialized-aggregate maintenance (operators/rollup.py)
over the warehouse CDC feed, and the ``images="both"`` CDC mode that
feeds it: maintained rollup == recomputed rollup, always."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from kafka_connect_bigquery_spark.operators import rollup as R
from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

SPEC = TableSpec(partition_grain="NONE", key_bucket_count=4)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k: bigint, g: string, v: double, i: bigint, __tombstone: boolean")


def _staged(spark, tmp_path):
    """v0: 6 rows in 3 groups. v1: update k=1 (+10), delete k=3 and
    BOTH rows of group 'c' (group empties), insert k=10 in new group
    'd'."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = _mk(spark, [
        (1, "a", 1.5, 0, False),
        (2, "a", 2.0, 0, False),
        (3, "b", 4.25, 0, False),
        (4, "b", 1.0, 0, False),
        (5, "c", 7.5, 0, False),
        (6, "c", 0.5, 0, False),
    ])
    wh.merge(base, "t", ["k"], mode="upsert_delete", order_col="i", spec=SPEC)
    delta = _mk(spark, [
        (1, "a", 11.5, 1, False),   # update
        (3, "b", 0.0, 1, True),     # delete
        (5, "c", 0.0, 1, True),     # delete — group c empties
        (6, "c", 0.0, 1, True),
        (10, "d", 3.0, 1, False),   # insert, new group
    ])
    wh.merge(delta, "t", ["k"], mode="upsert_delete", order_col="i", spec=SPEC)
    return wh


def test_read_changes_both_images(spark, tmp_path):
    wh = _staged(spark, tmp_path)
    rows = {
        (r["_change_type"], r["k"], r["v"])
        for r in wh.read_changes("t", from_version=0, images="both").collect()
    }
    assert rows == {
        ("update_preimage", 1, 1.5),
        ("update_postimage", 1, 11.5),
        ("delete", 3, 4.25),
        ("delete", 5, 7.5),
        ("delete", 6, 0.5),
        ("insert", 10, 3.0),
    }


def test_read_changes_post_mode_unchanged(spark, tmp_path):
    wh = _staged(spark, tmp_path)
    rows = {
        (r["_change_type"], r["k"])
        for r in wh.read_changes("t", from_version=0).collect()
    }
    assert rows == {
        ("update", 1), ("delete", 3), ("delete", 5), ("delete", 6),
        ("insert", 10),
    }


def _measures():
    return {"n": F.lit(1).cast("bigint"), "sv": R.quantized("v")}


def test_maintained_equals_recomputed(spark, tmp_path):
    wh = _staged(spark, tmp_path)
    keys = ["g"]
    base = R.build_rollup(wh.read("t", version=0), keys, _measures())
    delta = R.rollup_delta(
        wh.read_changes("t", from_version=0, images="both"), keys, _measures()
    )
    maintained = R.apply_rollup_delta(base, delta, keys, count_measure="n")
    recomputed = R.build_rollup(wh.read_bucketed("t"), keys, _measures())
    as_set = lambda df: {
        (r["g"], r["n"], str(r["sv"])) for r in df.collect()
    }
    got, want = as_set(maintained), as_set(recomputed)
    assert got == want
    # the emptied group is gone; the new group is present
    groups = {g for g, _, _ in got}
    assert "c" not in groups and "d" in groups


def test_maintained_sum_value_roundtrip(spark, tmp_path):
    wh = _staged(spark, tmp_path)
    base = R.build_rollup(wh.read("t", version=0), ["g"], _measures())
    delta = R.rollup_delta(
        wh.read_changes("t", from_version=0, images="both"), ["g"], _measures()
    )
    out = R.apply_rollup_delta(base, delta, ["g"], count_measure="n")
    vals = {
        r["g"]: (r["n"], r["dv"])
        for r in out.select("g", "n", R.dequantized("sv").alias("dv")).collect()
    }
    assert vals == {"a": (2, 13.5), "b": (1, 1.0), "d": (1, 3.0)}


def test_rollup_delta_rejects_post_only_feed(spark, tmp_path):
    """A plain images="post" CDC frame has an un-applicable 'update'
    row; the delta must fail loudly, not corrupt silently."""
    wh = _staged(spark, tmp_path)
    changes = wh.read_changes("t", from_version=0)  # post-only
    delta = R.rollup_delta(changes, ["g"], _measures())
    with pytest.raises(Exception, match="images='both'"):
        delta.collect()


def test_maintainer_rebuilds_when_cursor_snapshot_pruned(spark, tmp_path):
    """retention=1: after the maintainer falls several merges behind,
    its cursor snapshot is gone — refresh degrades to a full rebuild
    and still lands on the recomputed answer."""
    wh = Warehouse(spark, str(tmp_path / "wh"), snapshot_retention=1)
    wh.merge(
        _mk(spark, [(1, "a", 1.0, 0, False), (2, "b", 2.0, 0, False)]),
        "t", ["k"], mode="upsert_delete", order_col="i", spec=SPEC,
    )
    m = R.RollupMaintainer(
        wh, "t", "t_roll", ["g"], _measures(), count_measure="n"
    )
    m.refresh()  # cursor at v0
    for step in range(1, 4):  # three more merges; v0 gets pruned
        wh.merge(
            _mk(spark, [(10 + step, "a", float(step), step, False)]),
            "t", ["k"], mode="upsert_delete", order_col="i", spec=SPEC,
        )
    assert 0 not in wh.snapshots("t")
    assert m.refresh() >= 1
    got = {(r["g"], r["n"]) for r in wh.read("t_roll").select("g", "n").collect()}
    want = {
        (r["g"], r["n"])
        for r in R.build_rollup(wh.read_bucketed("t"), ["g"], _measures())
        .select("g", "n").collect()
    }
    assert got == want


def test_maintainer_requires_bucketed_source(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(
        spark.createDataFrame([(1, "a", 1.0)], "k: bigint, g: string, v: double"),
        "flat",
    )
    m = R.RollupMaintainer(
        wh, "flat", "flat_roll", ["g"], _measures(), count_measure="n"
    )
    with pytest.raises(ValueError, match="bucketed"):
        m.refresh()


def test_null_group_key_is_a_group(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "whn"))
    base = spark.createDataFrame(
        [(1, None, 1.0, 0, False), (2, "x", 2.0, 0, False)],
        "k: bigint, g: string, v: double, i: bigint, __tombstone: boolean",
    )
    wh.merge(base, "t", ["k"], mode="upsert_delete", order_col="i", spec=SPEC)
    delta = spark.createDataFrame(
        [(3, None, 5.0, 1, False)],
        "k: bigint, g: string, v: double, i: bigint, __tombstone: boolean",
    )
    wh.merge(delta, "t", ["k"], mode="upsert_delete", order_col="i", spec=SPEC)
    b = R.build_rollup(wh.read("t", version=0), ["g"], _measures())
    d = R.rollup_delta(
        wh.read_changes("t", from_version=0, images="both"), ["g"], _measures()
    )
    out = R.apply_rollup_delta(b, d, ["g"], count_measure="n")
    got = {r["g"]: r["n"] for r in out.collect()}
    assert got == {None: 2, "x": 1}
