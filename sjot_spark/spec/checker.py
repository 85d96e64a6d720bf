"""Compile-time spec checking — the analog of SJOT.check
(/root/reference/index.js:80-102, sjot_check 1273-1713,
sjot_check_union 1730-2043, sjot_check_satisfiable 2056-2111).

Runs driver-side in pure Python before any Spark job is submitted.
"""

from __future__ import annotations

from itertools import combinations

from sjot_spark.errors import SpecError
from sjot_spark.spec.typestr import (
    ArrayOf, CharLen, ObjectT, Primitive, Range, Ref, Regex, SizedInt,
    Tuple, TypeNode, UnionT,
)


def check_satisfiable(
    one: tuple[tuple[str, ...], ...],
    any_: tuple[tuple[str, ...], ...],
    all_: tuple[tuple[str, ...], ...],
    dep: tuple[tuple[str, tuple[str, ...]], ...],
) -> bool:
    """Brute-force 2^n presence assignments over the propset variables;
    n<2 or n>20 assumed satisfiable (NP-complete cutoff, the same rule
    as index.js:2081-2082)."""
    names: dict[str, int] = {}

    def add(p: str) -> None:
        names.setdefault(p, len(names))

    for sets in (one, any_, all_):
        for s in sets:
            for p in s:
                add(p)
    for p, deps in dep:
        add(p)
        for d in deps:
            add(d)

    n = len(names)
    if n < 2 or n > 20:
        return True
    keys = list(names)
    for k in range(1 << n):
        bits = {keys[i]: bool(k & (1 << i)) for i in range(n)}
        if any(sum(bits[p] for p in s) != 1 for s in one):
            continue
        if any(not any(bits[p] for p in s) for s in any_):
            continue
        if any(
            any(bits[p] for p in s) and not all(bits[p] for p in s) for s in all_
        ):
            continue
        if any(bits[p] and not all(bits[d] for d in deps) for p, deps in dep):
            continue
        return True
    return False


def _union_class(t: TypeNode, resolve) -> tuple[int, str, frozenset]:
    """(array-depth, scalar class, object prop-name set) for union
    distinctness — the per-depth conflict sets of sjot_check_union
    (index.js:1730-2043). Classes: null/boolean/number/string/object/
    array/any/atom."""
    depth = 0
    while True:
        if isinstance(t, Ref):
            t = resolve(t.name)
            continue
        if isinstance(t, ArrayOf):
            depth += 1
            t = t.item
            continue
        if isinstance(t, Tuple):
            return depth + 1, "tuple", frozenset()
        break
    if isinstance(t, UnionT):
        raise SpecError("unions cannot be nested")
    if isinstance(t, ObjectT):
        req = frozenset(p.name for p in t.props)
        return depth, "object", req
    if isinstance(t, (SizedInt, Range)):
        return depth, "number", frozenset()
    if isinstance(t, (Regex, CharLen)):
        return depth, "string", frozenset()
    if isinstance(t, Primitive):
        n = t.name
        if n in ("boolean", "true", "false"):
            return depth, "boolean", frozenset()
        if n in ("integer", "float", "double", "number"):
            return depth, "number", frozenset()
        if n in ("string", "char", "base64", "hex", "uuid", "date", "time",
                 "datetime", "duration"):
            return depth, "string", frozenset()
        if n == "null":
            return depth, "null", frozenset()
        if n == "object":
            return depth, "object", frozenset()
        if n == "array":
            return depth + 1, "any", frozenset()
        return depth, n, frozenset()  # any / atom
    return depth, "any", frozenset()


def check_union(u: UnionT, resolve) -> None:
    """Members must be type-distinct per array depth so dispatch is
    unambiguous (index.js:1730-2043; verified: overlapping object
    members are rejected by the reference)."""
    if len(u.members) == 0:
        raise SpecError("empty union")
    seen: list[tuple[int, str, frozenset, bool]] = []
    for m in u.members:
        depth, cls, props = _union_class(m, resolve)
        node = m
        while isinstance(node, Ref):
            node = resolve(node.name)
        has_ifthen = isinstance(node, ObjectT) and bool(node.if_then)
        for od, ocls, other_props, other_ifthen in seen:
            if od != depth:
                continue
            conflict = (
                ocls == cls
                or "any" in (ocls, cls)
                or ("atom" in (ocls, cls) and {ocls, cls} & {"boolean", "number", "string", "atom"})
            )
            if conflict and cls == "object" and ocls == "object":
                # objects are distinguishable iff their prop sets are
                # disjoint — or either declares an @if/@then
                # discriminator (index.js:1919-1987 accepts
                # discriminated overlap)
                conflict = (
                    not (has_ifthen or other_ifthen)
                    and (bool(props & other_props) or not props or not other_props)
                )
            if conflict:
                raise SpecError(
                    f"union members are ambiguous: {cls}@depth{depth} conflicts with {ocls}"
                )
        seen.append((depth, cls, props, has_ifthen))


def check_object(o: ObjectT, resolve, typepath: str = "") -> None:
    """Object-level rules (index.js:1399-1510): propset members must be
    optional NON-defaulted props; props across the sets of one
    directive pairwise distinct; @dep targets declared; satisfiable."""
    optional_nondefault = {
        p.name for p in o.props if p.optional and not p.has_default and not p.is_regex
    }
    import re as _re

    regex_props = [p.name for p in o.props if p.is_regex]

    def is_declared(name: str) -> bool:
        if name in optional_nondefault:
            return True
        return any(_re.match(f"^{rp}$", name) for rp in regex_props)

    for directive, sets in (("@one", o.one), ("@any", o.any), ("@all", o.all)):
        seen: set[str] = set()
        for s in sets:
            for p in s:
                if p.startswith("@") or p.startswith("("):
                    raise SpecError(f"{directive} is not an array of property sets", typepath)
                if p in seen:
                    raise SpecError(f"{directive} property sets are not disjoint", typepath)
                seen.add(p)
                if not is_declared(p):
                    raise SpecError(
                        f"{directive} contains property {p} that is not an optional "
                        f"non-default property of this object", typepath)
    for p, deps in o.dep:
        for name in (p, *deps):
            if not is_declared(name):
                raise SpecError(
                    f"@dep contains property {name} that is not an optional "
                    f"non-default property of this object", typepath)
    if not check_satisfiable(o.one, o.any, o.all, o.dep):
        raise SpecError("has non-satisfiable constraints and rejects all data", typepath)


def check_type(t: TypeNode, resolve, typepath: str = "", _depth: int = 0) -> None:
    """Recursive structural check of a parsed type tree. Grammar-level
    problems (bad ranges/bounds/regexes) already raise during parsing;
    this adds the cross-node rules."""
    if _depth > 64:
        raise SpecError("type nesting too deep", typepath)
    if isinstance(t, Ref):
        target = resolve(t.name)  # raises if missing
        if isinstance(target, Ref):
            raise SpecError(f"spaghetti reference {t.name} -> {target.name}", typepath)
        return
    if isinstance(t, ArrayOf):
        check_type(t.item, resolve, typepath + "[]", _depth + 1)
        if t.is_set:
            inner = t.item
            while isinstance(inner, Ref):
                inner = resolve(inner.name)
            if isinstance(inner, (ObjectT, ArrayOf, Tuple, UnionT)):
                raise SpecError("set items must be atoms", typepath)
        return
    if isinstance(t, Tuple):
        for i, it in enumerate(t.items):
            check_type(it, resolve, f"{typepath}[{i}]", _depth + 1)
        return
    if isinstance(t, UnionT):
        for m in t.members:
            if isinstance(m, UnionT):
                raise SpecError("unions cannot be nested", typepath)
            check_type(m, resolve, typepath + "[[]]", _depth + 1)
        check_union(t, resolve)
        return
    if isinstance(t, ObjectT):
        for p in t.props:
            check_type(p.type, resolve, f"{typepath}/{p.name}", _depth + 1)
        for _ifp, then in t.if_then:
            check_type(then, resolve, typepath + "/@then", _depth + 1)
        check_object(t, resolve, typepath)
        return
    # leaves (Primitive/SizedInt/Range/Regex/CharLen) validated at parse
