"""Compile a CheckSpec into vectorized Spark Column expressions.

The analog of one sjot_validate specialization per declared type
(/root/reference/index.js:109-757) — but compiled ONCE on the driver
into built-in Catalyst expressions (between / rlike / forall / size /
when), so every check for every row evaluates inside whole-stage
codegen in a single projection pass. No Python runs per row anywhere.

Schema-level conformance (SJOT's typeof dispatch, required-property
presence of the column itself, @final extra-property rejection) is
resolved at COMPILE time against the DataFrame schema: columns have
fixed types, so what SJOT decides per value we decide once per job.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce
from operator import and_, or_
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sjot_spark.errors import SpecError
from sjot_spark.spec.bounds import Bounds
from sjot_spark.spec.ranges import RangeSpec
from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import (
    ArrayOf, CharLen, ObjectT, Primitive, Prop, Range, Ref, Regex,
    SizedInt, Tuple, TypeNode, UnionT, FORMAT_REGEX,
)

_FLOATY = (T.FloatType, T.DoubleType, T.DecimalType)
_NANABLE = (T.FloatType, T.DoubleType)  # isnan() only analyzes on these
_INTY = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _FLOATY + _INTY

# value range each integral Spark type can physically hold — bounds
# outside it are statically true and elided (this also makes ulong's
# 2^64-1 upper bound compilable: it never reaches F.lit for integral
# columns, and floats get a decimal literal instead; index.js:532-536)
_INT_DOMAIN = {
    T.ByteType: (-(2 ** 7), 2 ** 7 - 1),
    T.ShortType: (-(2 ** 15), 2 ** 15 - 1),
    T.IntegerType: (-(2 ** 31), 2 ** 31 - 1),
    T.LongType: (-(2 ** 63), 2 ** 63 - 1),
}

_I64_MIN, _I64_MAX = -(2 ** 63), 2 ** 63 - 1


def _int_lit(v: int) -> Column:
    """Integer literal Column; values beyond int64 (only ulong's hi
    bound, 2^64-1) compile as an exact DECIMAL(20,0) literal because
    F.lit raises NumberFormatException past the long domain."""
    if _I64_MIN <= v <= _I64_MAX:
        return F.lit(v)
    from decimal import Decimal

    return F.lit(Decimal(v)).cast("decimal(20,0)")


def _is_integral(c: Column) -> Column:
    """Value-is-integral test for float columns. NOT `c == F.floor(c)`:
    Spark's floor(double) returns LONG and saturates at 2^63-1, so
    integral doubles >= 2^63 (valid ulong territory) would falsely
    fail. `c % 1 == 0` is exact at every magnitude (doubles >= 2^53
    are always integral, and % stays in double). +-Infinity counts as
    integral to match the reference, where v === Math.floor(v) holds
    for infinities (JS Math.floor(Inf) is Inf)."""
    inf = float("inf")
    return (c % 1 == 0) | c.isin(inf, -inf)


def _not_nan(c: Column, dt: T.DataType) -> Column:
    """JS numeric comparisons with NaN are all false, so the reference
    rejects NaN from every range/sized-int/integer check; Spark treats
    NaN as equal-to-NaN and greater-than-everything, so it must be
    excluded explicitly (ADVICE r1)."""
    return ~F.isnan(c) if isinstance(dt, _NANABLE) else F.lit(True)


@dataclass(frozen=True)
class RowCheck:
    """One named row-level check: a pass-predicate Column plus a lazy
    detail Column (materialized only under when(fail, ...) — the
    FAST-build analog, /root/reference/build.sh:19-26)."""

    check_id: str
    passed: Column
    detail: Column
    typepath: str


def _detail(col_name: str, value_col: Column, type_desc: str, typepath: str) -> Column:
    """SJOT-shaped diagnostic: `$.a value "x" is not of type 1..10
    required by /@root/a` (sjot_error, index.js:1247-1269)."""
    return F.format_string(
        "$.%s value %s is not of type %s required by %s",
        F.lit(col_name),
        F.coalesce(value_col.cast("string"), F.lit("null")),
        F.lit(type_desc),
        F.lit(typepath),
    )


def node_desc(t: TypeNode) -> str:
    if isinstance(t, Range):
        return t.spec.source
    if isinstance(t, SizedInt) or isinstance(t, Primitive):
        return t.name
    if isinstance(t, Regex):
        return t.pattern
    if isinstance(t, CharLen):
        b = t.bounds
        inner = str(b.lo) if b.exact else f"{b.lo or ''},{b.hi or ''}"
        return f"char[{inner}]"
    if isinstance(t, ArrayOf):
        b, br = t.bounds, "{}" if t.is_set else "[]"
        inner = "" if b.unbounded else (str(b.lo) if b.exact else f"{'' if b.lo is None else b.lo},{'' if b.hi is None else b.hi}")
        return f"{node_desc(t.item)}{br[0]}{inner}{br[1]}"
    if isinstance(t, Ref):
        return t.name
    if isinstance(t, UnionT):
        return "[[" + ",".join(node_desc(m) for m in t.members) + "]]"
    return type(t).__name__.lower()


def range_pred(rs: RangeSpec, c: Column, col_is_float: bool) -> Column:
    """Numeric range/enum → boolean Column, preserving the reference's
    ordered-scan float semantics (see sjot_spark.spec.ranges)."""

    def interval(it) -> Column:
        conds = []
        if it.lo is not None:
            conds.append(c > F.lit(it.lo) if it.xlo else c >= F.lit(it.lo))
        if it.hi is not None:
            conds.append(c < F.lit(it.hi) if it.xhi else c <= F.lit(it.hi))
        return reduce(and_, conds) if conds else F.lit(True)

    int_match = reduce(or_, (interval(i) for i in rs.items))
    if not col_is_float:
        return int_match
    isfloat = ~_is_integral(c)
    fp = rs.float_prefix
    float_match = reduce(or_, (interval(i) for i in fp)) if fp else F.lit(False)
    return F.when(isfloat, float_match).otherwise(int_match)


def scalar_pred(t: TypeNode, c: Column, dt: T.DataType, resolve,
                nonnull_elems: bool = False) -> Column | None:
    """Runtime pass-predicate for a scalar node over column c of Spark
    type dt; None = statically always-true (schema already guarantees
    it — the Catalyst analog of SJOT's typeof switch arms that return
    immediately)."""
    while isinstance(t, Ref):
        t = resolve(t.name)
    if isinstance(t, Range):
        if not isinstance(dt, _NUMERIC):
            raise SpecError(f"range type on non-numeric column type {dt}")
        p = range_pred(t.spec, c, isinstance(dt, _FLOATY))
        if isinstance(dt, _NANABLE):
            p = _not_nan(c, dt) & p
        return p
    if isinstance(t, SizedInt):
        if not isinstance(dt, _NUMERIC):
            raise SpecError(f"{t.name} type on non-numeric column type {dt}")
        dom = _INT_DOMAIN.get(type(dt))
        conds = []
        if dom is None or t.lo > dom[0]:
            conds.append(c >= _int_lit(t.lo))
        if dom is None or t.hi < dom[1]:
            conds.append(c <= _int_lit(t.hi))
        if isinstance(dt, _FLOATY):
            conds.append(_is_integral(c))
            if isinstance(dt, _NANABLE):
                conds.insert(0, _not_nan(c, dt))
        # both bounds statically unreachable on an integral column
        # (e.g. ulong over byte): schema already guarantees the check
        return reduce(and_, conds) if conds else None
    if isinstance(t, Regex):
        if not isinstance(dt, T.StringType):
            raise SpecError(f"regex type on non-string column type {dt}")
        return c.rlike(t.anchored)
    if isinstance(t, CharLen):
        if not isinstance(dt, T.StringType):
            raise SpecError(f"char type on non-string column type {dt}")
        return bounds_pred(t.bounds, F.length(c))
    if isinstance(t, Primitive):
        n = t.name
        if n in FORMAT_REGEX:
            if not isinstance(dt, T.StringType):
                raise SpecError(f"{n} type on non-string column type {dt}")
            return c.rlike(FORMAT_REGEX[n])
        if n == "char":
            if not isinstance(dt, T.StringType):
                raise SpecError(f"char type on non-string column type {dt}")
            return F.length(c) == 1
        if n in ("true", "false"):
            if not isinstance(dt, T.BooleanType):
                raise SpecError(f"{n} type on non-boolean column type {dt}")
            return c == F.lit(n == "true")
        if n == "integer":
            if not isinstance(dt, _NUMERIC):
                raise SpecError(f"integer type on non-numeric column type {dt}")
            if isinstance(dt, _FLOATY):
                return _not_nan(c, dt) & _is_integral(c)
            return None
        if n == "null":
            # inside unions / struct fields: the value itself must be
            # null (top-level presence handling lives in _compile_column)
            return c.isNull()
        if n in ("any", "atom", "object", "array", "string", "boolean",
                 "number", "float", "double"):
            # conformance is the column's Spark type; checked statically
            _static_conform(n, dt)
            return None
        raise SpecError(f"unsupported primitive {n}")
    if isinstance(t, UnionT):
        # columns have one fixed Spark type: dispatch statically to the
        # members compatible with dt (SJOT dispatches per value on JS
        # typeof, index.js:802-909 — same decision, made once).
        # Object members with @if/@then are runtime-discriminated: when
        # the @if field is present, the @then type DECIDES — a
        # when-chain, exclusive over the fall-through members, exactly
        # like the reference picks the member by discriminator before
        # try-all (index.js:878-900).
        discriminated: list[tuple[Column, Column]] = []
        preds = []
        for m in t.members:
            node = m
            while isinstance(node, Ref):
                node = resolve(node.name)
            if (isinstance(node, ObjectT) and node.if_then
                    and isinstance(dt, T.StructType)):
                fields = {f.name: f for f in dt.fields}
                for ifprop, then in node.if_then:
                    if ifprop not in fields:
                        continue
                    then_p = scalar_pred(then, c, dt, resolve, nonnull_elems)
                    discriminated.append((
                        c.getField(ifprop).isNotNull(),
                        F.lit(True) if then_p is None else then_p))
                continue
            try:
                p = scalar_pred(m, c, dt, resolve, nonnull_elems)
            except SpecError:
                continue
            preds.append(F.lit(True) if p is None else p)
        if not preds and not discriminated:
            raise SpecError(f"no union member matches column type {dt}")
        fallthrough = reduce(or_, preds) if preds else F.lit(False)
        if not discriminated:
            return fallthrough
        chain = None
        for cond, then_p in discriminated:
            chain = (F.when(cond, then_p) if chain is None
                     else chain.when(cond, then_p))
        return chain.otherwise(fallthrough)
    if isinstance(t, ArrayOf):
        # nested arrays (A6): compose bounds + element typing + set
        # uniqueness into one predicate, recursing through forall
        if not isinstance(dt, T.ArrayType):
            raise SpecError(f"array type on non-array column type {dt}")
        preds = []
        bp = bounds_pred(t.bounds, F.size(c))
        if bp is not None:
            preds.append(bp)
        if t.is_set:
            preds.append(F.size(F.array_distinct(c)) == F.size(c))
        item_node = t.item
        while isinstance(item_node, Ref):
            item_node = resolve(item_node.name)
        contains_null = dt.containsNull and not nonnull_elems
        if _needs_element_check(t.item, item_node, dt.elementType,
                                contains_null, resolve):
            fast = _interval_elem_pred(item_node, c, dt.elementType,
                                       contains_null)
            if fast is not None:
                preds.append(fast)
            else:
                def ep(x: Column) -> Column:
                    p = scalar_pred(t.item, x, dt.elementType, resolve, nonnull_elems)
                    base = x.isNotNull()
                    return base if p is None else base & F.coalesce(p, F.lit(False))
                preds.append(F.forall(c, ep))
        return reduce(and_, preds) if preds else None
    if isinstance(t, Tuple):
        if not isinstance(dt, T.ArrayType):
            raise SpecError(f"tuple type on non-array column type {dt}")
        preds = [F.size(c) == len(t.items)]
        for i, it in enumerate(t.items):
            ec = F.get(c, i)  # null-safe under ANSI mode
            p = scalar_pred(it, ec, dt.elementType, resolve, nonnull_elems)
            preds.append(ec.isNotNull() if p is None else F.coalesce(p, F.lit(False)))
        return reduce(and_, preds)
    if isinstance(t, ObjectT):
        # nested struct column: conjunction over fields
        if not isinstance(dt, T.StructType):
            raise SpecError(f"object type on non-struct column type {dt}")
        preds = []
        fields = {f.name: f for f in dt.fields}
        for p in t.props:
            if p.is_regex:
                names = [n for n in fields if re.match(f"^{p.name}$", n)]
            else:
                if p.name not in fields:
                    if p.optional:
                        continue
                    raise SpecError(f"required struct field {p.name} missing")
                names = [p.name]
            node = p.type
            while isinstance(node, Ref):
                node = resolve(node.name)
            for nm in names:
                fc = c.getField(nm)
                if isinstance(node, Primitive) and node.name == "null":
                    # null-typed field: the value must be null, full stop
                    preds.append(fc.isNull())
                    continue
                fp = scalar_pred(p.type, fc, fields[nm].dataType, resolve, nonnull_elems)
                base = fc.isNotNull() if not p.optional else F.lit(True)
                if fp is not None:
                    base = base & F.when(fc.isNull(), p.optional).otherwise(fp)
                preds.append(base)
        if t.final:
            extra = set(fields) - {p.name for p in t.props if not p.is_regex}
            extra = {
                n for n in extra
                if not any(re.match(f"^{p.name}$", n) for p in t.props if p.is_regex)
            }
            if extra:
                raise SpecError(f"@final object has extra struct fields {sorted(extra)}")
        return reduce(and_, preds) if preds else None
    raise SpecError(f"cannot compile scalar predicate for {t}")


def _static_conform(name: str, dt: T.DataType) -> None:
    ok = {
        "string": isinstance(dt, T.StringType),
        "boolean": isinstance(dt, T.BooleanType),
        "number": isinstance(dt, _NUMERIC),
        "float": isinstance(dt, _NUMERIC),
        "double": isinstance(dt, _NUMERIC),
        "object": isinstance(dt, (T.StructType, T.MapType)),
        "array": isinstance(dt, T.ArrayType),
        "any": True,
        "atom": isinstance(dt, (T.StringType, T.BooleanType) + _NUMERIC),
        "null": True,  # null-typed: only null passes; handled by caller
    }[name]
    if not ok:
        raise SpecError(f"column type {dt} does not conform to {name}")


def bounds_pred(b: Bounds, n: Column) -> Column | None:
    if b.unbounded:
        return None
    if b.exact:
        return n == F.lit(b.lo)
    conds = []
    if b.lo is not None:
        conds.append(n >= F.lit(b.lo))
    if b.hi is not None:
        conds.append(n <= F.lit(b.hi))
    return reduce(and_, conds)


def _needs_element_check(
    item: TypeNode, item_resolved: TypeNode, elem_dt: T.DataType,
    contains_null: bool, resolve,
) -> bool:
    """Single source of truth for whether an array needs a per-element
    check: the item type has a runtime predicate, OR it is a container
    (null sub-arrays/structs must be caught), OR null elements are
    possible and the item type doesn't admit them. (This decision
    diverged between its two call sites once — keep it in one place.)"""
    return (
        scalar_pred(item, F.lit(0), elem_dt, resolve) is not None
        or isinstance(item_resolved, (ArrayOf, Tuple, ObjectT))
        or (contains_null and not _elem_admits_null(item_resolved))
    )


def _elem_admits_null(item: TypeNode) -> bool:
    """'any' array elements admit null (the reference's default value
    for `any` IS null, index.js:1194-1244, so a null element survives
    default substitution there); every other item type treats a null
    element as a violation under the engine's no-mutation stance."""
    return isinstance(item, Primitive) and item.name == "any"


def _interval_elem_pred(
    item: TypeNode, c: Column, elem_dt: T.DataType,
    contains_null: bool = True,
) -> Column | None:
    """Specialized whole-array element-range check: for a single
    contiguous interval over an integral element type,
        no-null-elements AND array_min >= lo AND array_max <= hi
    replaces the per-element forall lambda (~25% faster on the token
    hot path — array_min/max/compact are specialized codegen).
    Returns None when the semantics need the general lambda (enums,
    multiple intervals, float-literal scan rules on float elements)."""
    if isinstance(elem_dt, _FLOATY):
        return None  # float-break scan semantics need the general path
    if isinstance(item, SizedInt):
        lo, hi, xlo, xhi = item.lo, item.hi, False, False
    elif isinstance(item, Range) and len(item.spec.items) == 1:
        it = item.spec.items[0]
        lo, hi, xlo, xhi = it.lo, it.hi, it.xlo, it.xhi
    else:
        return None
    # elide bounds the element type can't violate (also keeps ulong's
    # 2^64-1 out of F.lit, which rejects literals past the long domain)
    dom = _INT_DOMAIN.get(type(elem_dt))
    if dom is not None:
        if lo is not None and not xlo and lo <= dom[0]:
            lo = None
        if hi is not None and not xhi and hi >= dom[1]:
            hi = None
    conds = []
    if contains_null:
        # the null-element scan is a second full array traversal
        # (~2x the min/max cost at 2M x 370 tokens; every dynamic
        # formulation measures the same) — elided when the schema
        # GUARANTEES non-null elements (containsNull=False, e.g. an
        # Iceberg `element: required` column), which is the scale path
        conds.append(F.size(F.array_compact(c)) == F.size(c))
    if lo is not None:
        mn = F.array_min(c)
        conds.append(mn > F.lit(lo) if xlo else mn >= F.lit(lo))
    if hi is not None:
        mx = F.array_max(c)
        conds.append(mx < F.lit(hi) if xhi else mx <= F.lit(hi))
    if not conds:
        return F.lit(True)  # everything statically guaranteed
    pred = reduce(and_, conds)
    # empty arrays have no elements to violate (forall over [] is true)
    return F.when(F.size(c) == 0, F.lit(True)).otherwise(pred)


def _elem_kind(item: TypeNode) -> str:
    if isinstance(item, (Range, SizedInt)):
        return "element_range"
    if isinstance(item, (Regex, CharLen)):
        return "element_format"
    return "element_type"


@dataclass
class CompiledSpec:
    spec: CheckSpec
    key: str | None
    partition_by: str | None
    row_checks: list[RowCheck]
    columns: list[str]  # root object columns present in the df


def compile_spec(spec: CheckSpec, schema: T.StructType,
                 assume_nonnull_elements: bool = False) -> CompiledSpec:
    """Compile the root object against a DataFrame schema into the full
    row-level check list (P1-P12, A1-A6, C1-C6, @table.consistent).
    Plan-level checks (unique/ref/drift) are driven by the engine."""
    spec.check()
    root = spec.root
    if not isinstance(root, ObjectT):
        raise SpecError("root type must be an object over table columns")
    fields = {f.name: f for f in schema.fields}
    tname = spec.root_name
    checks: list[RowCheck] = []

    # @final: reject extra columns (index.js:448-451) — compile-time
    if root.final:
        declared = {p.name for p in root.props if not p.is_regex}
        rex = [p.name for p in root.props if p.is_regex]
        extra = [
            n for n in fields
            if n not in declared and not any(re.match(f"^{r}$", n) for r in rex)
        ]
        if extra:
            raise SpecError(f"@final: table has undeclared columns {extra}")

    def expand(p: Prop) -> list[tuple[str, Prop]]:
        if not p.is_regex:
            return [(p.name, p)]
        return [(n, p) for n in fields if re.match(f"^{p.name}$", n)]

    for p in root.props:
        for col_name, prop in expand(p):
            if col_name not in fields:
                if prop.optional:
                    continue  # optional column may be absent entirely
                raise SpecError(f"required column {col_name} missing from table")
            checks.extend(
                _compile_column(col_name, prop, fields[col_name].dataType,
                                spec.resolve, f"/@root/{tname}/{col_name}",
                                assume_nonnull_elements)
            )

    # C1-C4 presence combinators over column nullness; an optional
    # column absent from the table is simply never present
    present = lambda n: (  # noqa: E731
        F.col(n).isNotNull() if n in fields else F.lit(False)
    )
    for s in root.one:
        cnt = reduce(
            lambda a, b: a + b, (present(n).cast("int") for n in s)
        )
        checks.append(RowCheck(
            "one_" + "_".join(s), cnt == 1,
            _detail("+".join(s), cnt, f"@one {list(s)}", f"/@root/{tname}/@one"),
            f"/@root/{tname}/@one"))
    for s in root.any:
        pr = reduce(or_, (present(n) for n in s))
        checks.append(RowCheck(
            "any_" + "_".join(s), pr,
            _detail("+".join(s), F.lit("absent"), f"@any {list(s)}", f"/@root/{tname}/@any"),
            f"/@root/{tname}/@any"))
    for s in root.all:
        allp = reduce(and_, (present(n) for n in s))
        nonep = ~reduce(or_, (present(n) for n in s))
        checks.append(RowCheck(
            "all_" + "_".join(s), allp | nonep,
            _detail("+".join(s), F.lit("partial"), f"@all {list(s)}", f"/@root/{tname}/@all"),
            f"/@root/{tname}/@all"))
    for pn, deps in root.dep:
        pr = ~present(pn) | reduce(and_, (present(d) for d in deps))
        checks.append(RowCheck(
            f"dep_{pn}", pr,
            _detail(pn, F.lit("present"), f"@dep {list(deps)}", f"/@root/{tname}/@dep"),
            f"/@root/{tname}/@dep"))

    # @table.consistent: sibling-column expressions, e.g. n_tok == size(tokens)
    for col_name, expr_sql in spec.table.consistent:
        lhs, rhs = F.col(col_name), F.expr(expr_sql)
        # null on either side passes: presence is its own check
        # (keeps each seeded corruption mapped to exactly one check_id)
        pr = F.when(lhs.isNull() | rhs.isNull(), F.lit(True)).otherwise(lhs == rhs)
        checks.append(RowCheck(
            f"{col_name}_consistency", pr,
            _detail(col_name, lhs, f"== {expr_sql}", f"/@table/consistent/{col_name}"),
            f"/@table/consistent/{col_name}"))

    cols = [p.name for p in root.props if not p.is_regex and p.name in fields]
    return CompiledSpec(
        spec=spec,
        key=spec.table.key,
        partition_by=spec.table.partition_by,
        row_checks=checks,
        columns=cols,
    )


def _compile_column(
    name: str, prop: Prop, dt: T.DataType, resolve, typepath: str,
    nonnull_elems: bool = False,
) -> list[RowCheck]:
    """All row-level checks for one column."""
    c = F.col(name)
    out: list[RowCheck] = []
    t = prop.type
    while isinstance(t, Ref):
        t = resolve(t.name)

    # a union with an explicit "null" member admits null values, so
    # the presence check is waived (the union pred handles it)
    union_admits_null = isinstance(t, UnionT) and any(
        isinstance(_m := (resolve(m.name) if isinstance(m, Ref) else m),
                   Primitive) and _m.name == "null"
        for m in t.members
    )

    # presence (P1/P10): required column must be non-null; regex-named
    # props are implicitly optional (they validate observed columns,
    # index.js:388-405)
    if not prop.optional and not prop.is_regex and not union_admits_null \
            and not (isinstance(t, Primitive) and t.name == "null"):
        out.append(RowCheck(
            f"{name}_not_null", c.isNotNull(),
            _detail(name, c, node_desc(prop.type), typepath), typepath))
    if isinstance(t, Primitive) and t.name == "null":
        out.append(RowCheck(
            f"{name}_null", c.isNull(),
            _detail(name, c, "null", typepath), typepath))
        return out

    null_ok = F.lit(True)  # null handled by the presence check / optional

    def guarded(p: Column) -> Column:
        return F.when(c.isNull(), null_ok).otherwise(p)

    if isinstance(t, ArrayOf):
        if not isinstance(dt, T.ArrayType):
            raise SpecError(f"array type on non-array column {name}: {dt}")
        # A2/A3: size bounds (n_tok-style sibling consistency lives in
        # @table.consistent; this is the literal-bounds operator)
        bp = bounds_pred(t.bounds, F.size(c))
        if bp is not None:
            out.append(RowCheck(
                f"{name}_len_bounds", guarded(bp),
                _detail(name, F.size(c), node_desc(t), typepath + "[]"), typepath))
        # A5 intra-row set uniqueness — hash-based, replaces the
        # reference's O(n log n) sort (index.js:294-299)
        if t.is_set:
            out.append(RowCheck(
                f"{name}_unique_items",
                guarded(F.size(F.array_distinct(c)) == F.size(c)),
                _detail(name, c, node_desc(t), typepath), typepath))
        # A1: element typing via forall — one vectorized pass
        elem_dt = dt.elementType
        # dry-build once to learn whether the item type needs a runtime
        # predicate (None = schema already guarantees it); container
        # items always need one (null sub-arrays/structs must be caught)
        item_dry = t.item
        while isinstance(item_dry, Ref):
            item_dry = resolve(item_dry.name)
        contains_null = dt.containsNull and not nonnull_elems
        # null-scan elision: containsNull=False (Iceberg `element:
        # required`) or engine assume_nonnull_elements makes a
        # statically-conformant element check free entirely
        needs_elem = _needs_element_check(
            t.item, item_dry, elem_dt, contains_null, resolve)

        def elem_pred(x: Column) -> Column:
            p = scalar_pred(t.item, x, elem_dt, resolve, nonnull_elems)
            base = x.isNotNull()  # null elements violate (no default insertion)
            return base if p is None else base & F.coalesce(p, F.lit(False))

        if needs_elem:
            first_bad = F.element_at(
                F.filter(c, lambda x: ~elem_pred(x)), 1)
            item_node = t.item
            while isinstance(item_node, Ref):
                item_node = resolve(item_node.name)
            fast = _interval_elem_pred(item_node, c, elem_dt,
                                       contains_null)
            out.append(RowCheck(
                f"{name}_{_elem_kind(t.item)}",
                guarded(fast if fast is not None else F.forall(c, elem_pred)),
                _detail(name, first_bad, node_desc(t.item), typepath + "[]"),
                typepath))
        return out

    if isinstance(t, Tuple):
        if not isinstance(dt, T.ArrayType):
            raise SpecError(f"tuple type on non-array column {name}: {dt}")
        out.append(RowCheck(
            f"{name}_len_bounds", guarded(F.size(c) == len(t.items)),
            _detail(name, F.size(c), node_desc(t), typepath), typepath))
        preds = []
        for i, it in enumerate(t.items):
            ec = F.get(c, i)  # null-safe under ANSI mode
            p = scalar_pred(it, ec, dt.elementType, resolve, nonnull_elems)
            preds.append(ec.isNotNull() if p is None else F.coalesce(p, F.lit(False)))
        out.append(RowCheck(
            f"{name}_tuple_types", guarded(reduce(and_, preds)),
            _detail(name, c, node_desc(t), typepath), typepath))
        return out

    p = scalar_pred(t, c, dt, resolve, nonnull_elems)
    if p is not None:
        kind = (
            "range" if isinstance(t, (Range, SizedInt))
            or (isinstance(t, Primitive) and t.name == "integer")
            else "format" if isinstance(t, (Regex,))
            or (isinstance(t, Primitive) and t.name in FORMAT_REGEX)
            else "len_bounds" if isinstance(t, CharLen)
            else "type"
        )
        out.append(RowCheck(
            f"{name}_{kind}", guarded(p),
            _detail(name, c, node_desc(prop.type), typepath), typepath))
    return out
