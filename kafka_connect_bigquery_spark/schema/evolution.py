"""Schema evolution: unionization + relaxation + validation.

Reference: kcbq/SchemaManager.java:379-522 — the most algorithmically
interesting piece of the reference. Semantics reproduced:

- ``unionize(a, b)``: field union; fields present on only one side
  become NULLABLE (:431-447); same-name fields must match in type
  (:471-506); nested RECORDs union recursively (:449-461);
  REQUIRED -> NULLABLE relaxation when either side is nullable
  (:508-522).
- ``evolve(existing, batch_schemas, policy)``: the policy gate used by
  table auto-evolution (:264-281): ``allow_new_fields``
  (BigQuerySinkConfig.java:301-306), ``allow_relaxation`` (:308-313),
  ``allow_unionization`` (:315-321). Without unionization, the new
  batch schema replaces the old but may not drop existing fields.
- Tombstone-only batches (no value schemas) fall back to the existing
  schema (:311-319, :357-365).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    """Mirrors BigQueryConnectException raised on invalid evolution."""


def _types_compatible(a: T.DataType, b: T.DataType) -> bool:
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        return True  # recursively unionized
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return _types_compatible(a.elementType, b.elementType)
    return a == b


def unionize(existing: T.StructType, proposed: T.StructType, path: str = "") -> T.StructType:
    """Union two struct schemas (SchemaManager.java:379-469).

    Field order: existing fields first (in their order), then new
    proposed fields — matching firstSchemaFields/secondSchemaFields
    iteration in the reference.
    """
    out: list[T.StructField] = []
    proposed_by_name = {f.name: f for f in proposed.fields}
    existing_names = {f.name for f in existing.fields}

    for ef in existing.fields:
        pf = proposed_by_name.get(ef.name)
        if pf is None:
            # present only in existing -> becomes NULLABLE (:431-438)
            out.append(T.StructField(ef.name, ef.dataType, True, ef.metadata))
            continue
        if not _types_compatible(ef.dataType, pf.dataType):
            raise SchemaEvolutionError(
                f"type mismatch for field '{path}{ef.name}': "
                f"{ef.dataType.simpleString()} vs {pf.dataType.simpleString()}"
            )
        if isinstance(ef.dataType, T.StructType):
            merged = unionize(ef.dataType, pf.dataType, path=f"{path}{ef.name}.")
        elif isinstance(ef.dataType, T.ArrayType) and isinstance(
            ef.dataType.elementType, T.StructType
        ):
            elem = unionize(
                ef.dataType.elementType, pf.dataType.elementType, path=f"{path}{ef.name}[]."
            )
            merged = T.ArrayType(elem, ef.dataType.containsNull or pf.dataType.containsNull)
        else:
            merged = ef.dataType
        # REQUIRED -> NULLABLE if either side nullable (:508-522)
        nullable = ef.nullable or pf.nullable
        out.append(T.StructField(ef.name, merged, nullable, ef.metadata))

    for pf in proposed.fields:
        if pf.name not in existing_names:
            # new field -> NULLABLE (:440-447)
            out.append(T.StructField(pf.name, pf.dataType, True, pf.metadata))

    return T.StructType(out)


def evolve(
    existing: T.StructType | None,
    batch_schemas: Sequence[T.StructType],
    *,
    allow_new_fields: bool = True,
    allow_relaxation: bool = True,
    allow_unionization: bool = False,
) -> T.StructType:
    """Compute the evolved table schema for a batch (SchemaManager
    getAndValidateProposedSchema, :290-377).

    ``batch_schemas`` are the value schemas seen in the batch (multiple
    when records carry different schema versions). Empty (tombstone-only
    batch) -> keep existing (:311-319).
    """
    if not batch_schemas:
        if existing is None:
            raise SchemaEvolutionError("no schemas in batch and no existing table schema")
        return existing

    proposed = batch_schemas[0]
    for s in batch_schemas[1:]:
        proposed = unionize(proposed, s)

    if existing is None:
        return proposed

    if allow_unionization:
        merged = unionize(existing, proposed)
    else:
        # proposed replaces existing, but must retain all existing fields
        # (:326-355 validation)
        missing = [
            f.name
            for f in existing.fields
            if f.name not in {p.name for p in proposed.fields}
        ]
        if missing:
            raise SchemaEvolutionError(
                f"proposed schema drops existing fields {missing} "
                "(enable allow_unionization to keep them)"
            )
        merged = unionize(existing, proposed)

    if not allow_new_fields:
        added = {f.name for f in merged.fields} - {f.name for f in existing.fields}
        if added:
            raise SchemaEvolutionError(
                f"new fields {sorted(added)} not allowed (allow_new_fields=False)"
            )
    if not allow_relaxation:
        relaxed = [
            f.name
            for f, m in zip(existing.fields, merged.fields[: len(existing.fields)])
            if (not f.nullable) and m.nullable
        ]
        if relaxed:
            raise SchemaEvolutionError(
                f"fields {relaxed} would relax REQUIRED->NULLABLE "
                "(allow_relaxation=False)"
            )
    return merged
