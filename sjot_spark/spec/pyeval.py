"""Pure-Python row evaluator — an INDEPENDENT implementation of the
engine's check semantics used as a differential-testing oracle
(tests/test_differential.py): for any row, the set of failing check
ids must equal what the compiled Spark plan reports.

Deliberately written against the semantics spec (SURVEY §2 + the
reference behavior), not by translating compiler.py, so the two can
disagree when either is wrong.
"""

from __future__ import annotations

import math
import re

from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import (
    ArrayOf, CharLen, ObjectT, Primitive, Prop, Range, Ref, Regex,
    SizedInt, Tuple, TypeNode, UnionT, FORMAT_REGEX,
)

_FLOATY_DTYPES = {"float", "double"}


def _is_float_dtype(dtype: str) -> bool:
    return dtype in _FLOATY_DTYPES


def _integral_py(v) -> bool:
    """Mirror of compiler._is_integral: infinities count as integral
    (JS Math.floor(Inf) is Inf); math.floor would raise on them."""
    if isinstance(v, float) and math.isinf(v):
        return True
    return float(v) == math.floor(v)


def _scalar_ok(t: TypeNode, v, dtype: str, resolve) -> bool:
    """Does scalar value v pass type t? v is non-null."""
    while isinstance(t, Ref):
        t = resolve(t.name)
    if isinstance(t, Range):
        if _is_float_dtype(dtype):
            return t.spec.match_py(float(v))
        # integral column: only the plain interval union applies
        return any(it.contains(v) for it in t.spec.items)
    if isinstance(t, SizedInt):
        if isinstance(v, float) and math.isnan(v):
            return False
        if not (t.lo <= v <= t.hi):
            return False
        if _is_float_dtype(dtype):
            return _integral_py(v)
        return True
    if isinstance(t, Regex):
        return re.match(t.anchored, v) is not None
    if isinstance(t, CharLen):
        return t.bounds.check_len(len(v))
    if isinstance(t, Primitive):
        n = t.name
        if n in FORMAT_REGEX:
            return re.match(FORMAT_REGEX[n], v) is not None
        if n == "char":
            return len(v) == 1
        if n == "true":
            return v is True
        if n == "false":
            return v is False
        if n == "integer":
            if _is_float_dtype(dtype):
                return not math.isnan(v) and _integral_py(v)
            return True
        if n == "null":
            return v is None
        return True  # statically-conformant primitives
    if isinstance(t, UnionT):
        # discriminated members would need struct values; the
        # differential spec avoids them
        for m in t.members:
            node = m
            while isinstance(node, Ref):
                node = resolve(node.name)
            if isinstance(node, Primitive) and node.name == "null":
                if v is None:
                    return True
                continue
            try:
                if _scalar_ok(m, v, dtype, resolve):
                    return True
            except (TypeError, AttributeError):
                continue
        return False
    if isinstance(t, ArrayOf):
        return _array_ok(t, v, dtype, resolve)
    raise NotImplementedError(f"pyeval scalar {t}")


def _elem_dtype(dtype: str) -> str:
    m = re.match(r"array<(.*)>$", dtype)
    return m.group(1) if m else dtype


def _array_ok(t: ArrayOf, v, dtype: str, resolve) -> bool:
    """Combined nested-array predicate (bounds + uniqueness + elems)."""
    if not t.bounds.check_len(len(v)):
        return False
    if t.is_set and len(set(v)) != len(v):
        return False
    ed = _elem_dtype(dtype)
    for x in v:
        if x is None:
            return False
        if not _scalar_ok(t.item, x, ed, resolve):
            return False
    return True


def evaluate_row(
    spec: CheckSpec, row: dict, dtypes: dict[str, str]
) -> set[str]:
    """Failing check ids for one row (row-level checks only — unique/
    ref/drift are table-level)."""
    root = spec.root
    assert isinstance(root, ObjectT)
    resolve = spec.resolve
    failing: set[str] = set()

    def present(n: str) -> bool:
        return n in row and row[n] is not None

    for p in root.props:
        if p.is_regex:
            names = [n for n in dtypes if re.match(f"^{p.name}$", n)]
        else:
            if p.name not in dtypes:
                continue
            names = [p.name]
        for name in names:
            v = row.get(name)
            t = p.type
            while isinstance(t, Ref):
                t = resolve(t.name)
            union_null = isinstance(t, UnionT) and any(
                isinstance(m, Primitive) and m.name == "null"
                for m in (
                    resolve(x.name) if isinstance(x, Ref) else x
                    for x in t.members
                )
            )
            if isinstance(t, Primitive) and t.name == "null":
                if v is not None:
                    failing.add(f"{name}_null")
                continue
            if v is None:
                if not p.optional and not p.is_regex and not union_null:
                    failing.add(f"{name}_not_null")
                continue
            if isinstance(t, ArrayOf):
                if not t.bounds.unbounded and not t.bounds.check_len(len(v)):
                    failing.add(f"{name}_len_bounds")
                if t.is_set and len(set(v)) != len(v):
                    failing.add(f"{name}_unique_items")
                ed = _elem_dtype(dtypes[name])
                kind = ("element_range"
                        if isinstance(t.item, (Range, SizedInt))
                        else "element_format"
                        if isinstance(t.item, (Regex, CharLen))
                        else "element_type")
                for x in v:
                    if x is None or not _scalar_ok(t.item, x, ed, resolve):
                        failing.add(f"{name}_{kind}")
                        break
                continue
            if isinstance(t, Tuple):
                if len(v) != len(t.items):
                    failing.add(f"{name}_len_bounds")
                ed = _elem_dtype(dtypes[name])
                ok = len(v) >= len(t.items)
                for i, it in enumerate(t.items):
                    if i >= len(v) or v[i] is None \
                            or not _scalar_ok(it, v[i], ed, resolve):
                        ok = False
                if not ok:
                    failing.add(f"{name}_tuple_types")
                continue
            kind = (
                "range" if isinstance(t, (Range, SizedInt))
                or (isinstance(t, Primitive) and t.name == "integer")
                else "format" if isinstance(t, Regex)
                or (isinstance(t, Primitive) and t.name in FORMAT_REGEX)
                else "len_bounds" if isinstance(t, CharLen)
                else "type"
            )
            if not _scalar_ok(t, v, dtypes[name], resolve):
                failing.add(f"{name}_{kind}")

    for s in root.one:
        if sum(present(n) for n in s) != 1:
            failing.add("one_" + "_".join(s))
    for s in root.any:
        if not any(present(n) for n in s):
            failing.add("any_" + "_".join(s))
    for s in root.all:
        if any(present(n) for n in s) and not all(present(n) for n in s):
            failing.add("all_" + "_".join(s))
    for pn, deps in root.dep:
        if present(pn) and not all(present(d) for d in deps):
            failing.add(f"dep_{pn}")
    return failing
