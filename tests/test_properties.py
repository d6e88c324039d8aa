"""Property-based tests (hypothesis) for the pure schema functions.

The reference pins these behaviors with enumerated unit cases
(SchemaManagerTest, FieldNameSanitizerTest); hypothesis explores the
input space instead: algebraic laws of schema unionization and
invariants of name sanitization. No SparkSession needed — these are
pure StructType/str functions, so hundreds of examples run in
milliseconds.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.schema.evolution import SchemaEvolutionError, unionize
from kafka_connect_bigquery_spark.schema.sanitize import sanitize_name

# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

_PRIMS = [T.LongType(), T.DoubleType(), T.StringType(), T.BooleanType(), T.TimestampType()]

_names = st.text(
    alphabet=st.sampled_from("abcdefgh"), min_size=1, max_size=4
)


def _types(depth: int) -> st.SearchStrategy:
    prim = st.sampled_from(_PRIMS)
    if depth <= 0:
        return prim
    return st.one_of(
        prim,
        st.builds(lambda e: T.ArrayType(e, True), _types(depth - 1)),
        _structs(depth - 1).filter(lambda s: len(s.fields) > 0),
    )


def _structs(depth: int = 2) -> st.SearchStrategy:
    return st.lists(
        st.builds(
            lambda n, dt, nullable: T.StructField(n, dt, nullable),
            _names,
            _types(depth),
            st.booleans(),
        ),
        max_size=5,
        unique_by=lambda f: f.name,
    ).map(T.StructType)


def _field_names(s: T.StructType) -> set[str]:
    return {f.name for f in s.fields}


def _nullability(s: T.StructType) -> dict[str, bool]:
    return {f.name: f.nullable for f in s.fields}


# ---------------------------------------------------------------------------
# unionization laws
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(_structs())
def test_unionize_idempotent(s):
    u = unionize(s, s)
    assert _field_names(u) == _field_names(s)
    # self-union never changes nullability (no one-sided fields)
    assert _nullability(u) == _nullability(s)


@settings(max_examples=200, deadline=None)
@given(_structs(), _structs())
def test_unionize_field_union_and_relaxation(a, b):
    try:
        u = unionize(a, b)
    except SchemaEvolutionError:
        # only legal for same-name fields with incompatible types
        shared = _field_names(a) & _field_names(b)
        assert shared, "error raised with no shared fields"
        return
    # field set is the union, existing-first order preserved
    assert _field_names(u) == _field_names(a) | _field_names(b)
    assert [f.name for f in u.fields[: len(a.fields)]] == [f.name for f in a.fields]
    nu, na, nb = _nullability(u), _nullability(a), _nullability(b)
    for name in nu:
        if name in na and name in nb:
            # REQUIRED->NULLABLE iff either side nullable
            assert nu[name] == (na[name] or nb[name])
        else:
            # one-sided fields always become NULLABLE
            assert nu[name] is True


@settings(max_examples=200, deadline=None)
@given(_structs(), _structs())
def test_unionize_absorbs_its_inputs(a, b):
    """unionize(a, unionize(a, b)) adds nothing new (absorption)."""
    try:
        u = unionize(a, b)
    except SchemaEvolutionError:
        return
    uu = unionize(a, u)
    assert _field_names(uu) == _field_names(u)
    assert _nullability(uu) == _nullability(u)


@settings(max_examples=200, deadline=None)
@given(_structs(), _structs())
def test_unionize_symmetric_on_names_and_nullability(a, b):
    """Field order differs (existing-first) but the *set* semantics —
    names and nullability — are symmetric."""
    try:
        u1, u2 = unionize(a, b), unionize(b, a)
    except SchemaEvolutionError:
        with pytest.raises(SchemaEvolutionError):
            unionize(b, a)
        return
    assert _field_names(u1) == _field_names(u2)
    assert _nullability(u1) == _nullability(u2)


def test_unionize_type_mismatch_raises():
    a = T.StructType([T.StructField("x", T.LongType(), False)])
    b = T.StructType([T.StructField("x", T.StringType(), False)])
    with pytest.raises(SchemaEvolutionError, match="type mismatch for field 'x'"):
        unionize(a, b)


# ---------------------------------------------------------------------------
# sanitization invariants
# ---------------------------------------------------------------------------

_LEGAL = re.compile(r"^[A-Za-z0-9_]*$")


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=20))
def test_sanitize_output_is_legal_and_idempotent(name):
    out = sanitize_name(name)
    assert _LEGAL.match(out)
    assert not (out and out[0].isdigit())
    assert sanitize_name(out) == out
    # length never shrinks below the original (chars are replaced 1:1,
    # plus an optional leading underscore)
    assert len(out) in (len(name), len(name) + 1)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from("abcXYZ09_"), min_size=1, max_size=12))
def test_sanitize_preserves_already_legal_names(name):
    expected = name if not name[0].isdigit() else "_" + name
    assert sanitize_name(name) == expected
