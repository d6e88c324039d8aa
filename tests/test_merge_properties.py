"""Model-based property tests for the MERGE operators: random
dest/batch scenarios checked against a direct Python replay of the
reference's documented semantics (kcbq/MergeQueries.java — batch dedup
to newest per key, tombstone ordering, append-log delete-only).

Example counts are kept small: each example is a Spark job; the value
is in hypothesis finding adversarial key collisions / tombstone
orderings, not in volume."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_bigquery_spark.operators.merge import (
    merge_delete_only,
    merge_upsert,
    merge_upsert_delete,
)

# (key, value, tombstone) triples; i is the list position (unique, ordered)
_row = st.tuples(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=99),
    st.booleans(),
)
_batch = st.lists(_row, min_size=0, max_size=10)
_dest = st.dictionaries(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=99),
    max_size=5,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _dest_df(spark, dest):
    return spark.createDataFrame(
        [(k, v) for k, v in dest.items()] or [], "k: bigint, v: bigint"
    )


def _batch_df(spark, batch, with_tomb):
    rows = [
        ((k, v, i, t) if with_tomb else (k, v, i))
        for i, (k, v, t) in enumerate(batch)
    ]
    schema = (
        "k: bigint, v: bigint, i: bigint, __tombstone: boolean"
        if with_tomb
        else "k: bigint, v: bigint, i: bigint"
    )
    return spark.createDataFrame(rows or [], schema)


def _newest_per_key(batch):
    out = {}
    for i, (k, v, t) in enumerate(batch):
        out[k] = (v, t, i)  # later i wins
    return out


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@_SETTINGS
@given(_dest, _batch)
def test_upsert_matches_model(sp, dest, batch):
    got = {
        (r["k"], r["v"])
        for r in merge_upsert(
            _dest_df(sp, dest), _batch_df(sp, batch, False), ["k"]
        ).collect()
    }
    model = dict(dest)
    for k, (v, _, _) in _newest_per_key(batch).items():
        model[k] = v
    assert got == set(model.items())


@_SETTINGS
@given(_dest, _batch)
def test_upsert_delete_matches_model(sp, dest, batch):
    got = {
        (r["k"], r["v"])
        for r in merge_upsert_delete(
            _dest_df(sp, dest), _batch_df(sp, batch, True), ["k"]
        ).collect()
    }
    model = dict(dest)
    for k, (v, tomb, _) in _newest_per_key(batch).items():
        if tomb:
            model.pop(k, None)
        else:
            model[k] = v
    assert got == set(model.items())


@_SETTINGS
@given(st.lists(st.tuples(st.integers(0, 4), st.integers(0, 99)), max_size=8), _batch)
def test_delete_only_matches_model(sp, dest_rows, batch):
    dest_df = sp.createDataFrame(dest_rows or [], "k: bigint, v: bigint")
    got = sorted(
        (r["k"], r["v"])
        for r in merge_delete_only(dest_df, _batch_df(sp, batch, True), ["k"]).collect()
    )
    del_i = {}
    for i, (k, v, t) in enumerate(batch):
        if t:
            del_i[k] = i  # later tombstone wins (max i)
    kept = [(k, v) for k, v in dest_rows if k not in del_i]
    inserts = [
        (k, v)
        for i, (k, v, t) in enumerate(batch)
        if not t and (k not in del_i or i >= del_i[k])
    ]
    assert got == sorted(kept + inserts)


@_SETTINGS
@given(_dest, _batch, _batch)
def test_upsert_batching_invariance(sp, dest, b1, b2):
    """Two micro-batches applied in sequence == one concatenated batch
    (b2's sequence numbers after b1's) — the merge-flush cadence
    (mergeIntervalMs / mergeRecordsThreshold in the reference) must
    never change the result."""
    d = _dest_df(sp, dest)
    two_step = merge_upsert(
        merge_upsert(d, _batch_df(sp, b1, False), ["k"]),
        _batch_df(sp, b2, False),
        ["k"],
    )
    one_step = merge_upsert(d, _batch_df(sp, b1 + b2, False), ["k"])
    assert {(r["k"], r["v"]) for r in two_step.collect()} == {
        (r["k"], r["v"]) for r in one_step.collect()
    }
