"""Parse SJOT type declarations into TypeNode trees.

Dispatch mirrors sjot_validate's type-string handling
(/root/reference/index.js:150-755) and the README grammar
(/root/reference/README.md:55-99):

- string types: primitives, ``(regex)``, ranges/enums, ``char[n,m]``,
  ``type[n,m]`` arrays, ``type{n,m}`` sets, ``#name`` references
- dict types: objects with required/optional/defaulted props
- list types: inline arrays ``[type]``/``[n]``/``[n,m]``/``[n,type,m]``,
  tuples ``[t1,t2,...]``, unions ``[[t1,t2,...]]``
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union as _U

import re

from sjot_spark.errors import SpecError
from sjot_spark.spec.bounds import Bounds, parse_bounds
from sjot_spark.spec.ranges import RangeSpec, parse_range

# signed/unsigned integer primitive ranges (index.js:490-536; note the
# reference's long is +-(2^47-1), not 2^63 — preserved for parity)
INT_RANGES: dict[str, tuple[int, int]] = {
    "byte": (-128, 127),
    "short": (-32768, 32767),
    "int": (-2147483648, 2147483647),
    "long": (-140737488355328, 140737488355327),
    "ubyte": (0, 255),
    "ushort": (0, 65535),
    "uint": (0, 4294967295),
    "ulong": (0, 18446744073709551615),
}

# string-format regexes, copied verbatim from index.js:696-743 so the
# accepted languages are identical (anchors kept explicit — Spark
# rlike is unanchored substring search)
FORMAT_REGEX: dict[str, str] = {
    "base64": r"^[0-9A-Za-z+/]*=?=?$",
    "hex": r"^[0-9A-Fa-f]*$",
    "uuid": r"^(urn:uuid:)?[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$",
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "time": r"^\d{2}:\d{2}:\d{2}(\.\d{1,6})?([-+]\d{2}:?\d{2}|Z)?$",
    "datetime": r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{1,6})?([-+]\d{2}:?\d{2}|Z)?$",
    "duration": r"^-?P(-?[0-9,.]*Y)?(-?[0-9,.]*M)?(-?[0-9,.]*W)?(-?[0-9,.]*D)?(T(-?[0-9,.]*H)?(-?[0-9,.]*M)?(-?[0-9,.]*S)?)?$",
}

_SIMPLE_PRIMITIVES = {
    "any", "atom", "boolean", "true", "false", "integer", "float",
    "double", "number", "string", "char", "null", "object", "array",
}


# ---------------------------------------------------------------- nodes

@dataclass(frozen=True)
class TypeNode:
    pass


@dataclass(frozen=True)
class Primitive(TypeNode):
    """any/atom/boolean/true/false/integer/float/double/number/string/
    char/null/object/array/base64/hex/... — name-dispatched leaf."""

    name: str


@dataclass(frozen=True)
class SizedInt(TypeNode):
    name: str
    lo: int
    hi: int


@dataclass(frozen=True)
class Range(TypeNode):
    spec: RangeSpec


@dataclass(frozen=True)
class Regex(TypeNode):
    pattern: str  # anchored ^...$ added at compile

    @property
    def anchored(self) -> str:
        return f"^{self.pattern}$"


@dataclass(frozen=True)
class CharLen(TypeNode):
    """char[n,m] — string with length bounds (index.js:679-690)."""

    bounds: Bounds


@dataclass(frozen=True)
class ArrayOf(TypeNode):
    item: TypeNode  # Primitive('any') for untyped
    bounds: Bounds
    is_set: bool = False  # type{n,m}: unique atoms (index.js:279-313)


@dataclass(frozen=True)
class Tuple(TypeNode):
    items: tuple[TypeNode, ...]


@dataclass(frozen=True)
class UnionT(TypeNode):
    members: tuple[TypeNode, ...]


@dataclass(frozen=True)
class Ref(TypeNode):
    name: str


@dataclass(frozen=True)
class Prop:
    name: str            # column/field name, or regex pattern
    type: TypeNode
    optional: bool
    default: object = None     # parsed default value, if given
    has_default: bool = False
    is_regex: bool = False     # (regex) property name (index.js:388-405)


@dataclass(frozen=True)
class ObjectT(TypeNode):
    props: tuple[Prop, ...]
    final: bool = False
    one: tuple[tuple[str, ...], ...] = ()
    any: tuple[tuple[str, ...], ...] = ()
    all: tuple[tuple[str, ...], ...] = ()
    dep: tuple[tuple[str, tuple[str, ...]], ...] = ()
    extends: str | None = None
    if_then: tuple[tuple[str, "TypeNode"], ...] = ()  # @if prop -> @then

    def prop(self, name: str) -> Prop | None:
        for p in self.props:
            if p.name == name and not p.is_regex:
                return p
        return None


# --------------------------------------------------------------- parser

def _parse_default(dflt: str, t: TypeNode):
    """Parse the textual default in ``prop?dflt`` according to the
    declared type (sjot_default, index.js:1194-1244, simplified to the
    scalar cases our engine supports)."""
    if dflt == "":
        return None
    if isinstance(t, Primitive) and t.name in ("boolean", "true", "false"):
        return dflt == "true"
    if isinstance(t, (SizedInt,)) or (
        isinstance(t, Primitive) and t.name == "integer"
    ):
        return int(dflt)
    if isinstance(t, Range) or (
        isinstance(t, Primitive) and t.name in ("float", "double", "number")
    ):
        f = float(dflt)
        return int(f) if f.is_integer() and "." not in dflt else f
    return dflt


def parse_type(t, typepath: str = "") -> TypeNode:
    """Parse any SJOT type declaration (string / dict / list)."""
    if isinstance(t, str):
        return _parse_type_string(t, typepath)
    if isinstance(t, dict):
        return _parse_object(t, typepath)
    if isinstance(t, list):
        return _parse_list(t, typepath)
    raise SpecError(f"{t!r} is not a valid type", typepath)


def _parse_type_string(t: str, typepath: str) -> TypeNode:
    if t == "":
        raise SpecError("empty type string", typepath)
    # references: #name / URI#name / # (root) — but not regex/array/set
    if "#" in t and not t.startswith("(") and not t.endswith("]") and not t.endswith("}"):
        return Ref(t)
    if t.startswith("("):
        if not t.endswith(")"):
            raise SpecError(f"{t!r} is not a valid regex type", typepath)
        pat = t
        try:
            re.compile(f"^{pat}$")
        except re.error as e:
            raise SpecError(f"regex {t!r} does not compile: {e}", typepath)
        return Regex(pat)
    if t.endswith("]"):
        i = t.rindex("[")
        inner, item = t[i + 1:-1], t[:i]
        if item == "char":
            # char[n,m]: bounded-length string, not an array
            return CharLen(parse_bounds(inner, typepath))
        bounds = parse_bounds(inner, typepath)
        itemnode = (
            Primitive("any") if item in ("", "any") else _parse_type_string(item, typepath + "[]")
        )
        return ArrayOf(itemnode, bounds)
    if t.endswith("}"):
        i = t.rindex("{")
        inner, item = t[i + 1:-1], t[:i]
        itemnode = (
            Primitive("atom") if item == "" else _parse_type_string(item, typepath + "{}")
        )
        return ArrayOf(itemnode, parse_bounds(inner, typepath), is_set=True)
    if t in _SIMPLE_PRIMITIVES:
        return Primitive(t)
    if t in INT_RANGES:
        lo, hi = INT_RANGES[t]
        return SizedInt(t, lo, hi)
    if t in FORMAT_REGEX:
        return Primitive(t)
    # everything else must be a numeric range/enum
    return Range(parse_range(t, typepath))


def _split_propsets(v, key: str, typepath: str) -> tuple[tuple[str, ...], ...]:
    """@one/@any/@all are arrays of arrays of prop names
    (index.js:1399-1473)."""
    if not isinstance(v, list) or not all(
        isinstance(s, list) and len(s) >= 2 and all(isinstance(p, str) for p in s)
        for s in v
    ):
        raise SpecError(f"{key} must be an array of arrays of 2+ prop names", typepath)
    return tuple(tuple(s) for s in v)


def _parse_object(t: dict, typepath: str) -> ObjectT:
    props: list[Prop] = []
    one = any_ = all_ = ()
    dep: tuple = ()
    final = False
    extends = None
    if_prop = None
    then_type = None
    for k, v in t.items():
        if k == "@final":
            if not isinstance(v, bool):
                raise SpecError("@final must be boolean", typepath)
            final = v
        elif k == "@one":
            one = _split_propsets(v, "@one", typepath)
        elif k == "@any":
            any_ = _split_propsets(v, "@any", typepath)
        elif k == "@all":
            all_ = _split_propsets(v, "@all", typepath)
        elif k == "@dep":
            if not isinstance(v, dict):
                raise SpecError("@dep must be an object", typepath)
            dd = []
            for p, deps in v.items():
                deps = [deps] if isinstance(deps, str) else deps
                if not all(isinstance(d, str) for d in deps):
                    raise SpecError("@dep values must be prop name(s)", typepath)
                dd.append((p, tuple(deps)))
            dep = tuple(dd)
        elif k == "@extends":
            extends = v
        elif k == "@if":
            if_prop = v
        elif k == "@then":
            then_type = v
        elif k in ("@root", "@id", "@note", "@sjot"):
            continue  # metadata, handled at spec level
        elif k.startswith("@"):
            raise SpecError(f"unknown directive {k}", typepath)
        else:
            is_regex = k.startswith("(") and k.endswith(")")
            name, optional, dflt, has_dflt = k, False, None, False
            if not is_regex and "?" in k:
                name, _, dtext = k.partition("?")
                optional = True
                node = parse_type(v, f"{typepath}/{name}")
                if dtext != "":
                    dflt, has_dflt = _parse_default(dtext, node), True
                props.append(Prop(name, node, optional, dflt, has_dflt, False))
                continue
            node = parse_type(v, f"{typepath}/{name}")
            if is_regex:
                try:
                    re.compile(f"^{k}$")
                except re.error as e:
                    raise SpecError(f"regex prop {k!r} does not compile: {e}", typepath)
            props.append(Prop(name, node, optional, dflt, has_dflt, is_regex))
    if_then = ()
    if if_prop is not None or then_type is not None:
        if if_prop is None or then_type is None:
            raise SpecError("@if requires @then and vice versa", typepath)
        if_then = ((if_prop, parse_type(then_type, typepath + "/@then")),)
    return ObjectT(tuple(props), final, one, any_, all_, dep, extends, if_then)


def _parse_list(t: list, typepath: str) -> TypeNode:
    if len(t) == 0:
        return ArrayOf(Primitive("any"), Bounds())
    # union [[t1, t2, ...]]
    if len(t) == 1 and isinstance(t[0], list):
        members = tuple(parse_type(m, typepath + "[[]]") for m in t[0])
        return UnionT(members)
    if len(t) == 1:
        if isinstance(t[0], (int, float)) and not isinstance(t[0], bool):
            n = int(t[0])
            return ArrayOf(Primitive("any"), Bounds(n, n, exact=True))
        return ArrayOf(parse_type(t[0], typepath + "[]"), Bounds())
    if len(t) == 2:
        a, b = t
        a_num = isinstance(a, (int, float)) and not isinstance(a, bool)
        b_num = isinstance(b, (int, float)) and not isinstance(b, bool)
        if a_num and b_num:  # [n,m]
            return ArrayOf(Primitive("any"), Bounds(int(a), int(b)))
        if b_num:  # [type,m]
            return ArrayOf(parse_type(a, typepath + "[]"), Bounds(None, int(b)))
        if a_num:  # [n,type]
            return ArrayOf(parse_type(b, typepath + "[]"), Bounds(int(a), None))
        return Tuple((parse_type(a, typepath + "[0]"), parse_type(b, typepath + "[1]")))
    if (
        len(t) == 3
        and isinstance(t[0], (int, float)) and not isinstance(t[0], bool)
        and isinstance(t[2], (int, float)) and not isinstance(t[2], bool)
    ):  # [n,type,m]
        return ArrayOf(parse_type(t[1], typepath + "[]"), Bounds(int(t[0]), int(t[2])))
    return Tuple(tuple(parse_type(x, f"{typepath}[{i}]") for i, x in enumerate(t)))
