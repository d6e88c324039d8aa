"""Unit tests for upsert/delete MERGE semantics (operators/merge.py).

Scenario shapes mirror the reference's integration tests
(UpsertDeleteBigQuerySinkConnectorIT.java:112-283): paired records
sharing a key keep the second; every-Nth-record tombstones delete.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators.merge import (
    dedup_latest_per_key,
    merge_delete_only,
    merge_upsert,
    merge_upsert_delete,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, i int")


def test_dedup_latest_per_key(spark):
    batch = _df(spark, [(1, "a", 1), (1, "b", 2), (2, "c", 5), (2, "d", 3)])
    out = dedup_latest_per_key(batch, ["k"], "i").orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, "b"), (2, "c")]


def test_merge_upsert_updates_and_inserts(spark):
    dest = _df(spark, [(1, "old1", 0), (2, "old2", 0)])
    batch = _df(spark, [(2, "new2a", 1), (2, "new2b", 2), (3, "new3", 3)])
    out = merge_upsert(dest, batch, ["k"], "i").orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, "old1"), (2, "new2b"), (3, "new3")]


def test_merge_upsert_delete_tombstone_wins_if_latest(spark):
    dest = _df(spark, [(1, "old1", 0), (2, "old2", 0)])
    batch = (
        _df(spark, [(1, "upd", 1), (1, None, 2), (2, None, 1), (2, "upd2", 2), (4, None, 9)])
        .withColumn("__tombstone", F.col("v").isNull())
    )
    out = merge_upsert_delete(dest, batch, ["k"], "i").orderBy("k").collect()
    # key 1: latest record is tombstone -> deleted
    # key 2: tombstone then update -> updated survives
    # key 4: tombstone for nonexistent key -> no-op
    assert [(r.k, r.v) for r in out] == [(2, "upd2")]


def test_merge_delete_only_tombstone_ordering(spark):
    # dest is an append log (duplicate keys allowed)
    dest = _df(spark, [(1, "d1a", 0), (1, "d1b", 0), (2, "d2", 0), (3, "d3", 0)])
    batch = (
        _df(
            spark,
            [
                (1, "pre", 1),   # before tombstone -> dropped
                (1, None, 2),    # tombstone -> purges dest key 1
                (1, "post", 3),  # after tombstone -> inserted
                (2, "b2", 4),    # no tombstone for key 2 -> appended
                (9, "b9", 5),    # new key -> appended
            ],
        ).withColumn("__tombstone", F.col("v").isNull())
    )
    out = merge_delete_only(dest, batch, ["k"], "i").orderBy("k", "v").collect()
    got = [(r.k, r.v) for r in out]
    assert got == [(1, "post"), (2, "b2"), (2, "d2"), (3, "d3"), (9, "b9")]


def test_entry_contract_smoke(spark, sf_dir):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # spot-run one query at smoke scale
    assert qs["last_event_per_user"](spark, sf_dir).count() > 0
