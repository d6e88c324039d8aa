"""Deferred (merge-on-read) predicate deletes on flat tables:
`delete_where` records an O(1) metadata commit scoped to the files
present at delete time; every read path applies the predicate to
exactly those files; compact()/rewrite materializes and clears.

The snapshot-scoping property (rows appended AFTER a delete survive
even when they match) is the one that separates a real merge-on-read
delete from a forever-filter — pinned here and fuzzed in
test_flat_warehouse_stateful.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.sinks.warehouse import (
    TableSpec,
    Warehouse,
    WarehouseError,
)

PLAIN = TableSpec(partition_grain="NONE")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _seed(spark, wh, n=10):
    df = spark.createDataFrame(
        [(i, float(i), "grp%d" % (i % 2)) for i in range(n)],
        "id: bigint, v: double, g: string",
    )
    wh.append(df, "t", PLAIN)
    return df


def test_deferred_delete_filters_reads_without_touching_files(spark, wh):
    _seed(spark, wh)
    files_before = wh.describe_detail("t")["num_files"]
    did = wh.delete_where("t", "id >= 7")
    assert did == 1
    assert wh.describe_detail("t")["num_files"] == files_before  # no rewrite
    assert _ids(wh.read("t")) == [0, 1, 2, 3, 4, 5, 6]
    assert wh.describe_detail("t")["pending_deletes"] == 1


def test_delete_scoped_to_snapshot_not_future_appends(spark, wh):
    _seed(spark, wh)
    wh.delete_where("t", "id >= 7")
    # re-append a matching row AFTER the delete: it must survive
    wh.append(
        spark.createDataFrame([(8, 88.0, "grp0")], "id: bigint, v: double, g: string"),
        "t",
        PLAIN,
    )
    assert _ids(wh.read("t")) == [0, 1, 2, 3, 4, 5, 6, 8]


def test_stacked_deletes_compose(spark, wh):
    _seed(spark, wh)
    wh.delete_where("t", "id >= 8")
    wh.delete_where("t", "g = 'grp1'")  # odd ids
    assert _ids(wh.read("t")) == [0, 2, 4, 6]
    assert len(wh.pending_deletes("t")) == 2


def test_null_predicate_rows_survive(spark, wh):
    """SQL DELETE semantics: WHERE NULL deletes nothing."""
    _seed(spark, wh, n=4)
    wh.delete_where("t", "v > 1.0 AND NULL")
    assert _ids(wh.read("t")) == [0, 1, 2, 3]


def test_compact_materializes_and_clears(spark, wh):
    _seed(spark, wh)
    wh.delete_where("t", "id >= 7")
    n = wh.compact("t", PLAIN, min_files=1)
    assert n > 0
    assert wh.pending_deletes("t") == []
    assert _ids(wh.read("t")) == [0, 1, 2, 3, 4, 5, 6]
    # a fresh append after materialization is a clean slate
    wh.append(
        spark.createDataFrame([(9, 9.0, "grp1")], "id: bigint, v: double, g: string"),
        "t",
        PLAIN,
    )
    assert _ids(wh.read("t")) == [0, 1, 2, 3, 4, 5, 6, 9]


def test_rewrite_mode_is_record_then_compact(spark, wh):
    _seed(spark, wh)
    wh.delete_where("t", "id = 0", mode="rewrite", spec=PLAIN)
    assert wh.pending_deletes("t") == []
    assert _ids(wh.read("t")) == [1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_overwrite_clears_pending_deletes(spark, wh):
    _seed(spark, wh)
    wh.delete_where("t", "id >= 5")
    wh.overwrite(
        spark.createDataFrame([(5, 5.0, "grp1")], "id: bigint, v: double, g: string"),
        "t",
        PLAIN,
    )
    # the overwrite re-states the table: the old predicate must not
    # re-delete the re-stated row
    assert _ids(wh.read("t")) == [5]
    assert wh.pending_deletes("t") == []


def test_delete_on_evolved_column_null_fills_old_files(spark, wh):
    """Scoped files that physically predate an evolved column read it
    as NULL — their rows survive a predicate over that column."""
    wh.append(
        spark.createDataFrame([(1, 1.0)], "id: bigint, v: double"), "t", PLAIN
    )
    wh.append(
        spark.createDataFrame([(2, 2.0, 20)], "id: bigint, v: double, w: bigint"),
        "t",
        PLAIN,
    )
    wh.delete_where("t", "w >= 10")
    assert _ids(wh.read("t")) == [1]


def test_pruned_reads_respect_deletes(spark, wh):
    df = spark.createDataFrame(
        [(i, float(i), "grp%d" % (i % 2)) for i in range(20)],
        "id: bigint, v: double, g: string",
    )
    spec = TableSpec(partition_grain="NONE", clustering=("id",))
    wh.append(df, "t", spec)
    wh.record_bloom("t", ["id"])
    wh.delete_where("t", "id >= 10")
    # zone-map / bloom pruned point lookups must not resurrect rows
    assert _ids(wh.read_pruned("t", "id", eq=3)) == [3]
    assert _ids(wh.read_pruned("t", "id", eq=15)) == []
    assert _ids(wh.read_pruned_where("t", {"id": (8, 12)})) == [8, 9]


def test_validation_and_errors(spark, wh):
    _seed(spark, wh)
    with pytest.raises(Exception):
        wh.delete_where("t", "no_such_col = 1")
    with pytest.raises(WarehouseError):
        wh.delete_where("t", "id = 1", mode="bogus")
    with pytest.raises(WarehouseError):
        wh.delete_where("nope", "id = 1")
    # recorded nothing for the failures
    assert wh.pending_deletes("t") == []


def test_bucketed_tables_reject_deferred_deletes(spark, wh):
    df = spark.createDataFrame([(1, "x", 0)], "k: bigint, val: string, i: bigint")
    wh.merge(
        df,
        "bt",
        key_cols=["k"],
        spec=TableSpec(partition_grain="NONE", key_bucket_count=4),
    )
    with pytest.raises(WarehouseError):
        wh.delete_where("bt", "val = 'x'")


def test_partitioned_table_delete_including_partition_predicate(spark, wh):
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 3), 12, 0), float(i))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
    wh.append(df, "t", spec)
    # predicate over the Hive partition column itself: basePath reads
    # must still surface it for the filter
    wh.delete_where("t", "p_date = '2024-01-02'")
    got = _ids(wh.read("t"))
    assert got == [i for i in range(12) if i % 3 != 1]
    # and a second, value-predicate delete stacks on the remainder
    wh.delete_where("t", "v >= 9.0")
    assert _ids(wh.read("t")) == [i for i in range(9) if i % 3 != 1]


def test_flat_merge_respects_and_materializes_pending_deletes(spark, wh):
    """The small-table MERGE path reads through read() (deletes
    applied) and rewrites through overwrite() (pending list cleared) —
    a MERGE after delete_where materializes the delete, and only keys
    the batch itself re-upserts come back."""
    base = spark.createDataFrame(
        [(k, "old%d" % k, 0) for k in range(6)], "k: bigint, val: string, i: bigint"
    )
    wh.merge(base, "t", key_cols=["k"])
    wh.delete_where("t", "k >= 4")
    batch = spark.createDataFrame(
        [(5, "resurrected", 1), (0, "updated", 1)],
        "k: bigint, val: string, i: bigint",
    )
    wh.merge(batch, "t", key_cols=["k"])
    got = {r["k"]: r["val"] for r in wh.read("t").collect()}
    assert got == {0: "updated", 1: "old1", 2: "old2", 3: "old3", 5: "resurrected"}
    assert wh.pending_deletes("t") == []


def test_flat_history_records_all_ops_across_swaps(spark, wh):
    """DESCRIBE HISTORY for the append-log layout: every commit —
    append, delete_where (with its predicate), compact, overwrite —
    lands one op-log row, and the log SURVIVES the overwrite/compact
    dir swaps (same capture-restore contract as the bloom recording)."""
    import json

    _seed(spark, wh)
    wh.delete_where("t", "id >= 7")
    wh.compact("t", PLAIN, min_files=1)
    wh.append(
        spark.createDataFrame([(99, 9.0, "grp1")], "id: bigint, v: double, g: string"),
        "t",
        PLAIN,
    )
    wh.overwrite(
        spark.createDataFrame([(1, 1.0, "grp0")], "id: bigint, v: double, g: string"),
        "t",
        PLAIN,
    )
    h = wh.history("t").orderBy("version").collect()
    ops = [r["op"] for r in h]
    assert ops == ["append", "delete_where", "compact", "append", "overwrite"]
    assert [r["version"] for r in h] == list(range(5))
    assert all(h[i]["committed_at"] <= h[i + 1]["committed_at"] for i in range(4))
    dd = json.loads(h[1]["detail"])
    assert dd["predicate"] == "id >= 7" and dd["mode"] == "deferred"
    assert json.loads(h[2]["detail"])["files_before"] >= 1


def test_drop_table_removes_everything_and_tmp_leftovers(spark, wh):
    import os

    _seed(spark, wh)
    wh.record_sketch("t", ["id"])
    wh.delete_where("t", "id >= 7")
    # simulate a crashed overwrite's abandoned staging dir
    os.makedirs(os.path.join(wh.root, ".tmp_t_deadbeef"), exist_ok=True)
    assert wh.drop_table("t") is True
    assert not wh.exists("t")
    assert not os.path.exists(os.path.join(wh.root, ".tmp_t_deadbeef"))
    with pytest.raises(WarehouseError):
        wh.drop_table("t")
    assert wh.drop_table("t", if_exists=True) is False
    # the name is immediately reusable
    _seed(spark, wh, n=3)
    assert _ids(wh.read("t")) == [0, 1, 2]


# ---------------------------------------------------------------------------
# flat time travel (op-log state snapshots)
# ---------------------------------------------------------------------------


def test_flat_time_travel_append_and_delete_history(spark, wh):
    """Append-only + delete history: every version reconstructs exactly
    — including the pre-delete view and the schema as of each commit."""
    wh.append(
        spark.createDataFrame([(1, 1.0)], "id: bigint, v: double"), "t", PLAIN
    )  # v0
    wh.append(
        spark.createDataFrame([(2, 2.0)], "id: bigint, v: double"), "t", PLAIN
    )  # v1
    wh.delete_where("t", "id = 1")  # v2
    wh.append(
        spark.createDataFrame([(3, 3.0, 30)], "id: bigint, v: double, w: bigint"),
        "t",
        PLAIN,
    )  # v3: schema evolves
    assert _ids(wh.read("t", version=0)) == [1]
    assert _ids(wh.read("t", version=1)) == [1, 2]
    assert _ids(wh.read("t", version=2)) == [2]  # delete visible at v2
    assert _ids(wh.read("t", version=3)) == [2, 3]
    assert "w" not in wh.read("t", version=2).columns
    assert "w" in wh.read("t", version=3).columns
    # v1 still shows the row deleted later — the whole point
    assert _ids(wh.read("t")) == [2, 3]


def test_flat_time_travel_as_of_ts(spark, wh):
    import time

    wh.append(spark.createDataFrame([(1,)], "id: bigint"), "t", PLAIN)
    t_between = time.time()
    time.sleep(0.05)
    wh.append(spark.createDataFrame([(2,)], "id: bigint"), "t", PLAIN)
    assert _ids(wh.read("t", as_of_ts=t_between)) == [1]
    assert _ids(wh.read("t", as_of_ts=time.time())) == [1, 2]


def test_flat_time_travel_survives_rewrites_via_retention(spark, wh):
    """Overwrite/compact park the replaced era's files under
    _retained/<layer>/, so EVERY version reconstructs — including one
    whose files now live in a layer — until vacuum_retained drops the
    layer, which fails the version loudly."""
    _seed(spark, wh, n=4)  # v0
    wh.append(
        spark.createDataFrame([(9, 9.0, "grp1")], "id: bigint, v: double, g: string"),
        "t",
        PLAIN,
    )  # v1
    wh.compact("t", PLAIN, min_files=1)  # v2: rewrites all files
    # pre-rewrite versions reconstruct from the retained layer
    assert _ids(wh.read("t", version=0)) == [0, 1, 2, 3]
    assert _ids(wh.read("t", version=1)) == [0, 1, 2, 3, 9]
    assert len(wh.retained_layers("t")) == 1
    assert _ids(wh.read("t", version=2)) == [0, 1, 2, 3, 9]
    wh.append(
        spark.createDataFrame([(7, 7.0, "grp0")], "id: bigint, v: double, g: string"),
        "t",
        PLAIN,
    )  # v3
    wh.overwrite(
        spark.createDataFrame([(5, 5.0, "grp1")], "id: bigint, v: double, g: string"),
        "t",
        PLAIN,
    )  # v4: second rewrite -> second layer; earlier layers carry over
    assert len(wh.retained_layers("t")) == 2
    assert _ids(wh.read("t", version=0)) == [0, 1, 2, 3]
    assert _ids(wh.read("t", version=3)) == [0, 1, 2, 3, 7, 9]
    assert _ids(wh.read("t", version=4)) == [5]
    assert _ids(wh.read("t")) == [5]
    # the current read never sees retained files
    # retention policy: dropping all layers ages the old versions out
    assert wh.vacuum_retained("t", keep_layers=0) == 2
    with pytest.raises(WarehouseError, match="vacuum_retained"):
        wh.read("t", version=0)
    with pytest.raises(WarehouseError, match="vacuum_retained"):
        wh.read("t", version=3)
    assert _ids(wh.read("t", version=4)) == [5]  # current era unaffected
    with pytest.raises(WarehouseError):
        wh.read("t", version=99)


def test_overwrite_restates_bucketed_table_as_flat(spark, wh):
    """Overwriting a bucketed-MERGE table is a full re-statement into
    the flat layout: snapshots die with the old dir (they described the
    bucketed era), the parked bucket files sit inertly in a retained
    layer until vacuum_retained, and flat versioning starts at v0 =
    the overwrite itself."""
    spec = TableSpec(partition_grain="NONE", key_bucket_count=4)
    df = spark.createDataFrame(
        [(k, "v%d" % k, 0) for k in range(8)], "k: bigint, val: string, i: bigint"
    )
    wh.merge(df, "t", key_cols=["k"], spec=spec)
    assert wh.snapshots("t") == [0]
    wh.overwrite(
        spark.createDataFrame([(1, "only", 0)], "k: bigint, val: string, i: bigint"),
        "t",
        PLAIN,
    )
    assert [tuple(r) for r in wh.read("t").collect()] == [(1, "only", 0)]
    assert wh.snapshots("t") == []
    assert len(wh.retained_layers("t")) == 1
    h = wh.history("t").collect()
    assert [(r["version"], r["op"]) for r in h] == [(0, "overwrite")]
    assert wh.read("t", version=0).count() == 1
    assert wh.vacuum_retained("t", keep_layers=0) == 1


def test_time_travel_preserves_partition_columns_from_retained_layer(spark, wh):
    """A version whose files were parked under _retained/<layer>/ must
    still surface its Hive partition column values — the per-layer
    basePath grouping in _read_files_with_deletes (one basePath across
    both depths is a probed Spark CONFLICTING_DIRECTORY_STRUCTURES
    error)."""
    import datetime

    spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 3), 12, 0), float(i))
        for i in range(12)
    ]
    wh.append(spark.createDataFrame(rows, ["id", "ts", "v"]), "t", spec)  # v0
    wh.overwrite(spark.createDataFrame(rows[:2], ["id", "ts", "v"]), "t", spec)  # v1
    v0 = wh.read("t", version=0)
    assert v0.count() == 12
    assert sorted(r[0] for r in v0.select("p_date").distinct().collect()) == [
        "2024-01-01", "2024-01-02", "2024-01-03",
    ]
    assert v0.filter("p_date = '2024-01-02'").count() == 4
    assert wh.read("t").count() == 2
