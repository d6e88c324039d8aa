"""CHECK constraints on the warehouse write path (TableSpec.constraints):
SQL semantics (violation = predicate IS FALSE, NULL passes), fail mode
rejecting the batch before any data lands, quarantine mode diverting
poison rows to <table>__quarantine — the engine-side analogue of the
reference's DLQ/error-reporter routing for unconvertible records."""

from __future__ import annotations

import pytest

from kafka_connect_bigquery_spark.sinks.warehouse import (
    TableSpec,
    Warehouse,
    WarehouseError,
)

CHECKS = (
    ("v_nonneg", "v >= 0"),
    ("cat_known", "cat IN ('a', 'b')"),
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k: bigint, cat: string, v: double")


def test_fail_mode_rejects_batch_and_writes_nothing(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE", constraints=CHECKS)
    with pytest.raises(WarehouseError) as e:
        wh.append(_df(spark, [(1, "a", 1.0), (2, "z", -1.0), (3, "z", 2.0)]), "t", spec)
    assert "v_nonneg: 1 rows" in str(e.value)
    assert "cat_known: 2 rows" in str(e.value)
    assert not wh.exists("t")  # nothing landed

    # a clean batch then goes through
    wh.append(_df(spark, [(1, "a", 1.0)]), "t", spec)
    assert wh.read("t").count() == 1


def test_null_predicate_passes_like_sql_check(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE", constraints=(("v_big", "v > 10"),))
    # v NULL -> predicate UNKNOWN -> row passes (standard CHECK)
    df = spark.createDataFrame([(1, "a", None), (2, "a", 11.0)], "k: bigint, cat: string, v: double")
    wh.append(df, "t", spec)
    assert wh.read("t").count() == 2


def test_quarantine_mode_splits_batch(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(
        partition_grain="NONE", constraints=CHECKS, constraint_mode="quarantine"
    )
    wh.append(
        _df(spark, [(1, "a", 1.0), (2, "z", -1.0), (3, "b", 5.0), (4, "z", 6.0)]),
        "t",
        spec,
    )
    assert {r["k"] for r in wh.read("t").collect()} == {1, 3}
    q = {r["k"]: sorted(r["_violated"]) for r in wh.read("t__quarantine").collect()}
    assert q == {2: ["cat_known", "v_nonneg"], 4: ["cat_known"]}

    # quarantine accumulates across batches
    wh.append(_df(spark, [(5, "q", 1.0)]), "t", spec)
    assert {r["k"] for r in wh.read("t__quarantine").collect()} == {2, 4, 5}


def test_quarantine_all_clean_writes_no_quarantine_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(
        partition_grain="NONE", constraints=CHECKS, constraint_mode="quarantine"
    )
    wh.append(_df(spark, [(1, "a", 1.0)]), "t", spec)
    assert not wh.exists("t__quarantine")


def test_merge_path_enforces_constraints(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(
        partition_grain="NONE",
        key_bucket_count=4,
        constraints=(("v_nonneg", "v >= 0"),),
    )
    good = spark.createDataFrame(
        [(1, 1.0, 0, False)], "k: bigint, v: double, i: bigint, __tombstone: boolean"
    )
    bad = spark.createDataFrame(
        [(2, -1.0, 1, False)], "k: bigint, v: double, i: bigint, __tombstone: boolean"
    )
    wh.merge(good, "t", ["k"], spec=spec)
    with pytest.raises(WarehouseError, match="v_nonneg"):
        wh.merge(bad, "t", ["k"], spec=spec)
    assert {r["k"] for r in wh.read("t").collect()} == {1}


def test_spec_validation(spark):
    with pytest.raises(WarehouseError, match="duplicate constraint"):
        TableSpec(constraints=(("c", "1=1"), ("c", "2=2")))
    with pytest.raises(WarehouseError, match="constraint_mode"):
        TableSpec(constraint_mode="explode")


def test_overwrite_enforces_constraints(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE", constraints=(("v_nonneg", "v >= 0"),))
    wh.overwrite(_df(spark, [(1, "a", 1.0)]), "t", spec)
    with pytest.raises(WarehouseError, match="v_nonneg"):
        wh.overwrite(_df(spark, [(2, "a", -1.0)]), "t", spec)
    # the failed overwrite left the previous state intact
    assert {r["k"] for r in wh.read("t").collect()} == {1}

    qspec = TableSpec(
        partition_grain="NONE",
        constraints=(("v_nonneg", "v >= 0"),),
        constraint_mode="quarantine",
    )
    wh.overwrite(_df(spark, [(3, "a", 1.0), (4, "a", -2.0)]), "t", qspec)
    assert {r["k"] for r in wh.read("t").collect()} == {3}
    assert {r["k"] for r in wh.read("t__quarantine").collect()} == {4}
