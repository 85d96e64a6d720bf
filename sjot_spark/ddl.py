"""CheckSpec → physical table schema: Spark ``StructType`` and
Iceberg-style DDL emitters.

The input_hint's contract is an Iceberg table whose REQUIRED-ness the
engine exploits (``element: required`` elides the per-element null
scan — compiler._interval_elem_pred; parquet read schemas are
force-nullable so only a catalog table can carry the contract). These
emitters close the loop: the SAME CheckSpec that validates a table
also DECLARES it, so required props become ``NOT NULL`` columns,
array element types become non-null elements, and sized ints pick the
narrowest Spark integral type (reference type grammar,
index.js:485-618). A reference user's schema therefore provisions the
table AND validates it — one source of truth.

Pure driver-side Python: no Spark session needed for DDL strings; the
StructType is usable as ``spark.read.schema(...)`` or
``CREATE TABLE ... USING iceberg``.
"""

from __future__ import annotations

from pyspark.sql import types as T

from sjot_spark.errors import SpecError
from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import (
    ArrayOf,
    CharLen,
    ObjectT,
    Primitive,
    Range,
    Ref,
    Regex,
    SizedInt,
    Tuple,
    TypeNode,
    UnionT,
)

_SIZED = {
    ("byte", True): T.ByteType(),
    ("short", True): T.ShortType(),
    ("int", True): T.IntegerType(),
    ("long", True): T.LongType(),
    ("ubyte", True): T.ShortType(),    # 0..255 needs the next width up
    ("ushort", True): T.IntegerType(),
    ("uint", True): T.LongType(),
    ("ulong", True): T.DecimalType(20, 0),  # beyond int64
}

_PRIM = {
    "boolean": T.BooleanType(), "true": T.BooleanType(),
    "false": T.BooleanType(),
    "integer": T.LongType(), "float": T.FloatType(),
    "double": T.DoubleType(), "number": T.DoubleType(),
    "string": T.StringType(), "char": T.StringType(),
    "base64": T.StringType(), "hex": T.StringType(),
    "uuid": T.StringType(), "date": T.DateType(),
    "time": T.StringType(), "datetime": T.TimestampType(),
    "duration": T.StringType(), "any": T.StringType(),
    "atom": T.StringType(), "null": T.StringType(),
}


def _node_type(t: TypeNode, resolve) -> T.DataType:
    while isinstance(t, Ref):
        t = resolve(t.name)
    if isinstance(t, SizedInt):
        got = _SIZED.get((t.name, True))
        if got is None:
            raise SpecError(f"ddl: unknown sized int {t.name}")
        return got
    if isinstance(t, Range):
        # float-literal ranges hold fractional values; pure-integer
        # ranges pick the narrowest integral type that covers the hull
        if any(any(it.checked_float) for it in t.spec.items):
            return T.DoubleType()
        lo, hi = t.spec.bounds_hull()
        if lo is None or hi is None:
            return T.LongType()
        for dt, dlo, dhi in (
            (T.ByteType(), -128, 127),
            (T.ShortType(), -32768, 32767),
            (T.IntegerType(), -2**31, 2**31 - 1),
        ):
            if lo >= dlo and hi <= dhi:
                return dt
        return T.LongType()
    if isinstance(t, (Regex, CharLen)):
        return T.StringType()
    if isinstance(t, Primitive):
        got = _PRIM.get(t.name)
        if got is None:
            raise SpecError(f"ddl: unmapped primitive {t.name}")
        return got
    if isinstance(t, ArrayOf):
        # SJOT sets/arrays of non-null elements -> element required
        return T.ArrayType(_node_type(t.item, resolve), containsNull=False)
    if isinstance(t, Tuple):
        return T.StructType([
            T.StructField(f"_{i}", _node_type(it, resolve), nullable=True)
            for i, it in enumerate(t.items)
        ])
    if isinstance(t, ObjectT):
        return T.StructType([
            T.StructField(p.name, _node_type(p.type, resolve),
                          nullable=p.optional)
            for p in t.props if not p.is_regex
        ])
    if isinstance(t, UnionT):
        # a column holds ONE static type: only unions whose members
        # share a physical type are materializable (otherwise the data
        # belongs in a JSON/VARIANT column -> jsonvalidate)
        kinds = {
            _node_type(m, resolve).simpleString() for m in t.members
        }
        if len(kinds) == 1:
            return _node_type(t.members[0], resolve)
        raise SpecError(
            "ddl: union members map to different physical types "
            f"({sorted(kinds)}) — store as a JSON string column and "
            "validate with jsonvalidate")
    raise SpecError(f"ddl: unsupported node {t!r}")


def spec_to_struct(spec: CheckSpec | dict) -> T.StructType:
    """Spark schema for the spec's root object: required props are
    non-nullable, array elements are required (the Iceberg contract
    the null-scan elision relies on)."""
    if not isinstance(spec, CheckSpec):
        spec = CheckSpec(spec)
    root = spec.root
    while isinstance(root, Ref):
        root = spec.resolve(root.name)
    if not isinstance(root, ObjectT):
        raise SpecError("ddl: root must be an object type")
    return T.StructType([
        T.StructField(p.name, _node_type(p.type, spec.resolve),
                      nullable=p.optional)
        for p in root.props if not p.is_regex
    ])


def _ddl_type(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        elem = _ddl_type(dt.elementType)
        # Iceberg DDL spells required elements via the element type
        # being non-null in the schema; Spark DDL has no element
        # nullability syntax, so it rides on the produced StructType
        return f"ARRAY<{elem}>"
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name}: {_ddl_type(f.dataType)}" for f in dt.fields)
        return f"STRUCT<{inner}>"
    return dt.simpleString().upper()


def spec_to_ddl(
    spec: CheckSpec | dict,
    table: str,
    using: str = "iceberg",
    partition_by: str | None = None,
) -> str:
    """CREATE TABLE statement for the spec: NOT NULL on required
    props; PARTITIONED BY from @table.partition_by (or the override).
    The DDL pairs with ``ValidationEngine`` reading the same spec —
    declare and validate from one document."""
    if not isinstance(spec, CheckSpec):
        spec = CheckSpec(spec)
    struct = spec_to_struct(spec)
    cols = ",\n  ".join(
        f"{f.name} {_ddl_type(f.dataType)}"
        + ("" if f.nullable else " NOT NULL")
        for f in struct.fields
    )
    part = partition_by or spec.table.partition_by
    tail = f"\nPARTITIONED BY ({part})" if part else ""
    return f"CREATE TABLE {table} (\n  {cols}\n)\nUSING {using}{tail}"
