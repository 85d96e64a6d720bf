"""snapSJOT-parity schema inference from JSON VALUES — the missing
half of V3/V4: cross-row recursive union/object unification
(/root/reference/dev/snapsjot.js:22-402), reimplemented (not copied)
with the same rules:

- atoms -> "boolean"/"number"/"string", null -> "null"
  (snapsjot_convert, snapsjot.js:36-93)
- arrays -> element types unified into "[t]" or "[[[u1,u2,..]]]"
  (snapsjot.js:43-59)
- objects -> {"@final": true, prop: type}; property names with SJOT
  metacharacters become escaped regex props (snapsjot_make_regex,
  snapsjot.js:96-114)
- unify(t1, t2): equal -> t1; unions merge; arrays unify item-wise
  (a union of array types collapses to an array of the union,
  snapsjot.js:185-203); objects unify prop-wise with optionality for
  one-sided props (snapsjot_unify_object_types, snapsjot.js:304-375)
  UNLESS they share no properties, in which case they stay a union
  (snapsjot_distinct_object_types, snapsjot.js:378-402); anything
  else -> the two-member union [[t1, t2]]

``infer_json_spec(df, column)`` applies the row dimension the
reference never had: every sampled row's JSON value is one more
operand of the same unification, so a column of heterogeneous JSON
documents infers one spec that accepts them all (set-oriented
snapSJOT). The sample is bounded and the unification runs driver-side
— like the reference, this is metadata work, not a data pass.

The node-parity test (tests/test_jsoninfer.py) runs the ACTUAL
reference snapsjot.js on the same values and asserts our unified
schema is identical.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from sjot_spark.spec.spec import CheckSpec

_REGEX_ESCAPES = str.maketrans({
    "\\": "\\\\", ".": "\\.", "(": "\\(", ")": "\\)",
    "[": "\\(", "]": "\\)", "{": "\\(", "}": "\\)",
    "+": "\\+", "*": "\\+", "?": "\\?", "^": "\\^", "$": "\\$",
})

_META_PROPS = {"@root", "@one", "@any", "@all", "@dep", "@final",
               "@extends", "@note"}


def _make_regex(prop: str) -> str:
    # snapsjot_make_regex (snapsjot.js:96-114): escape SJOT/regex
    # metacharacters so the observed name validates as a regex prop
    return "(" + prop.translate(_REGEX_ESCAPES) + ")"


def _needs_regex(prop: str) -> bool:
    return ("?" in prop or prop.startswith("(") or prop in _META_PROPS)


def convert(data) -> object:
    """JSON value -> SJOT type (snapsjot_convert parity)."""
    if data is None:
        return "null"
    if isinstance(data, bool):
        return "boolean"
    if isinstance(data, (int, float)):
        return "number"
    if isinstance(data, str):
        return "string"
    if isinstance(data, list):
        union: list = []
        for i, item in enumerate(data):
            if i == 0:
                union = [convert(item)]
            else:
                unify_unions(union, [convert(item)])
        if len(union) <= 1:
            return union
        return [[union]]  # array of a union element (snapsjot.js:57-58)
    # object
    out: dict = {"@final": True}
    for prop, v in data.items():
        if prop == "@sjot":
            out[prop] = [[{}, [{}]]]
        elif _needs_regex(prop):
            out[_make_regex(prop)] = convert(v)
        else:
            out[prop] = convert(v)
    return out


def _is_union(t) -> bool:
    return isinstance(t, list) and len(t) == 1 and isinstance(t[0], list)


def unify(t1, t2):
    """snapsjot_unify_types parity (snapsjot.js:169-214)."""
    if t1 == t2:
        return t1
    if _is_union(t1):
        if _is_union(t2):
            return [unify_unions(t1[0], t2[0])]
        return [unify_unions(t1[0], [t2])]
    if _is_union(t2):
        return [unify_unions([t1], t2[0])]
    if isinstance(t1, list):
        if isinstance(t2, list):
            # both array types: unify item types; a union result
            # becomes an array of per-member arrays (snapsjot.js:189-199)
            if not t1 or not t2:
                return t1 or t2  # empty-array type absorbs
            u = unify(t1[0], t2[0])
            if _is_union(u):
                return [[[m] for m in u[0]]]
            return [u]
    elif isinstance(t1, dict) and isinstance(t2, dict):
        return unify_objects(t1, t2)
    return [[t1, t2]]


def unify_unions(u1: list, u2: list) -> list:
    """snapsjot_unify_union_types parity (snapsjot.js:216-301);
    mutates and returns u1 (u2 entries are consumed)."""
    redo = True
    while redo:
        redo = False
        for i in range(len(u1)):
            if redo:
                break
            for j in range(len(u2)):
                if redo or u2[j] is None:
                    continue
                t = None
                if isinstance(u1[i], dict) and isinstance(u2[j], dict):
                    # dict-dict FIRST, even when equal: the reference
                    # never equates two object types in place — equal
                    # objects merge-cascade to the END of the union
                    # (snapsjot.js:249-265), so member order matches
                    t2 = unify_objects(u1[i], u2[j])
                    if not isinstance(t2, list):
                        # merged object: cascade — drop u1[i], requeue
                        # the merge for another pass (snapsjot.js:252-259)
                        del u1[i]
                        u2[j] = t2
                        redo = True
                    # distinct objects: result discarded; u2[j] stays
                    # and is appended by the final sweep
                    # (snapsjot.js:249-265: `type = null` either way)
                elif u1[i] == u2[j]:
                    u2[j] = None
                elif (isinstance(u1[i], list) and u1[i]
                        and isinstance(u2[j], list) and not u2[j]):
                    u2[j] = None
                elif (isinstance(u1[i], list) and not u1[i]
                        and isinstance(u2[j], list) and u2[j]):
                    u1[i] = u2[j]
                    u2[j] = None
                elif (isinstance(u1[i], list) and u1[i]
                        and isinstance(u2[j], list) and u2[j]):
                    t = unify(u1[i], u2[j])
                    u2[j] = None
                if t is not None:
                    if _is_union(t):
                        u1[i] = t[0][0]
                        u1.extend(t[0][1:])
                    else:
                        u1[i] = t
    u1.extend(x for x in u2 if x is not None)
    return u1


def unify_objects(o1: dict, o2: dict):
    """snapsjot_unify_object_types parity (snapsjot.js:304-375);
    consumes o2. Objects sharing no properties stay a union."""
    if _distinct_objects(o1, o2):
        return [[o1, o2]]
    o2 = dict(o2)
    out: dict = {"@final": True}
    for prop, t1 in o1.items():
        if prop.startswith("@"):
            continue
        if prop in o2:
            out[prop] = unify(t1, o2.pop(prop))
        elif prop.endswith("?"):
            base = prop[:-1]
            if base in o2:
                out[prop] = unify(t1, o2.pop(base))
            else:
                out[prop] = t1
        else:
            opt = prop + "?"
            if opt in o2:
                out[opt] = unify(t1, o2.pop(opt))
            else:
                out[opt] = t1
    for prop, t2 in o2.items():
        if prop.startswith("@"):
            continue
        out[prop if prop.endswith("?") else prop + "?"] = t2
    return out


def _distinct_objects(o1: dict, o2: dict) -> bool:
    # snapsjot_distinct_object_types (snapsjot.js:378-402)
    n = 0
    for prop in o1:
        if prop.startswith("@"):
            continue
        base = prop[:-1] if prop.endswith("?") else prop
        if base in o2 or base + "?" in o2:
            return False
        n += 1
    if n > 0:
        return any(not p.startswith("@") for p in o2)
    return False


def convert_value(data) -> dict:
    """snapSJOT.convert parity: one JSON value -> full schema doc."""
    return {
        "@note": "SJOT schema created from JSON data by snapSJOT",
        "@root": convert(data),
    }


def infer_json_spec(
    df: DataFrame, column: str,
    sample_rows: int = 10_000, type_name: str = "Json",
) -> CheckSpec:
    """Unify the JSON documents of a string column across rows into
    one CheckSpec (each row = one more unification operand; identical
    to snapSJOT converting the rows as an array and taking the
    element type). Invalid-JSON rows are skipped."""
    rows = (
        df.select(column).where(f"{column} IS NOT NULL")
        .limit(sample_rows).collect()
    )
    unified = None
    n_seen = 0
    for r in rows:
        try:
            value = json.loads(r[0])
        except (TypeError, ValueError):
            continue
        t = convert(value)
        unified = t if n_seen == 0 else unify(unified, t)
        n_seen += 1
    if n_seen == 0:
        unified = "any"
    doc = {"@root": f"#{type_name}", type_name: unified}
    spec = CheckSpec(doc)
    spec.check()
    return spec
