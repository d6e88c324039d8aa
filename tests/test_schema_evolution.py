"""Unionization/evolution tests, mirroring SchemaManagerTest cases."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.schema.evolution import (
    SchemaEvolutionError,
    evolve,
    unionize,
)


def st(*fields):
    return T.StructType(list(fields))


def fld(name, dt, nullable=False):
    return T.StructField(name, dt, nullable)


LONG = T.LongType()
STR = T.StringType()


def test_union_disjoint_fields_become_nullable():
    a = st(fld("x", LONG))
    b = st(fld("y", STR))
    u = unionize(a, b)
    assert [f.name for f in u.fields] == ["x", "y"]
    assert all(f.nullable for f in u.fields)


def test_union_required_stays_required_when_on_both_sides():
    a = st(fld("x", LONG, False))
    b = st(fld("x", LONG, False))
    u = unionize(a, b)
    assert not u["x"].nullable


def test_union_relaxation_when_either_nullable():
    a = st(fld("x", LONG, False))
    b = st(fld("x", LONG, True))
    assert unionize(a, b)["x"].nullable


def test_union_type_mismatch_raises():
    with pytest.raises(SchemaEvolutionError, match="type mismatch.*'x'"):
        unionize(st(fld("x", LONG)), st(fld("x", STR)))


def test_union_nested_records_recursively():
    a = st(fld("r", st(fld("a", LONG)), False))
    b = st(fld("r", st(fld("b", STR)), False))
    u = unionize(a, b)
    inner = u["r"].dataType
    assert inner.fieldNames() == ["a", "b"]
    assert all(f.nullable for f in inner.fields)


def test_union_nested_type_mismatch_path_in_error():
    a = st(fld("r", st(fld("a", LONG)), False))
    b = st(fld("r", st(fld("a", STR)), False))
    with pytest.raises(SchemaEvolutionError, match="r.a"):
        unionize(a, b)


def test_evolve_tombstone_only_batch_keeps_existing():
    existing = st(fld("x", LONG))
    assert evolve(existing, []) == existing


def test_evolve_multiple_batch_schemas_unionized():
    out = evolve(None, [st(fld("x", LONG)), st(fld("y", STR))])
    assert out.fieldNames() == ["x", "y"]


def test_evolve_policy_new_fields_disallowed():
    existing = st(fld("x", LONG))
    with pytest.raises(SchemaEvolutionError, match="new fields"):
        evolve(existing, [st(fld("x", LONG), fld("y", STR))], allow_new_fields=False)


def test_evolve_policy_relaxation_disallowed():
    existing = st(fld("x", LONG, False))
    with pytest.raises(SchemaEvolutionError, match="relax"):
        evolve(existing, [st(fld("x", LONG, True))], allow_relaxation=False)


def test_evolve_without_unionization_cannot_drop_fields():
    existing = st(fld("x", LONG), fld("y", STR))
    with pytest.raises(SchemaEvolutionError, match="drops existing"):
        evolve(existing, [st(fld("x", LONG))], allow_unionization=False)
    # with unionization the dropped field is retained as NULLABLE
    out = evolve(existing, [st(fld("x", LONG))], allow_unionization=True)
    assert out["y"].nullable
