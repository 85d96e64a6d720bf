"""JSON Schema converters — the sjot2js / js2sjot analogs
(/root/reference/dev/sjot2js.js:41-629, dev/js2sjot.js:55-824),
covering the subset of both languages our engine uses.

- ``to_json_schema(spec, version)``: CheckSpec -> JSON Schema.
  ``version`` mirrors the reference's version argument
  (sjot2js.js:41, 165-170): 1 (plain ``schema#``), 3 (draft-03:
  per-property ``required: true``, boolean exclusive bounds,
  ``dependencies``, no propset combinators), 4 (draft-04: required
  lists, boolean exclusive bounds, ``items`` tuple arrays,
  oneOf/anyOf combinators), and 7 (draft-07, the default: numeric
  exclusive bounds, ``prefixItems``, ``dependentRequired``).
- ``from_json_schema(doc)``: JSON Schema -> CheckSpec; accepts any of
  the emitted variants (js2sjot handles v3 and v4 inputs,
  js2sjot.js:55-72).

Pure Python, driver-side utilities.
"""

from __future__ import annotations

import json

from sjot_spark.errors import SpecError
from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import (
    ArrayOf, CharLen, ObjectT, Primitive, Range, Ref, Regex, SizedInt,
    Tuple, TypeNode, UnionT, FORMAT_REGEX,
)

_PRIM_TO_JS = {
    "string": {"type": "string"},
    "boolean": {"type": "boolean"},
    "true": {"type": "boolean", "const": True},
    "false": {"type": "boolean", "const": False},
    "number": {"type": "number"},
    "float": {"type": "number"},
    "double": {"type": "number"},
    "integer": {"type": "integer"},
    "atom": {"type": ["string", "number", "boolean"]},
    "null": {"type": "null"},
    "object": {"type": "object"},
    "array": {"type": "array"},
    "any": {},
    "char": {"type": "string", "minLength": 1, "maxLength": 1},
}

_SCHEMA_URI = {
    1: "http://json-schema.org/schema#",
    3: "http://json-schema.org/draft-03/schema#",
    4: "http://json-schema.org/draft-04/schema#",
    7: "http://json-schema.org/draft-07/schema#",
}


def _num(v: float):
    return int(v) if float(v).is_integer() else v


def _const(v, version: int) -> dict:
    # const is draft-06+; older drafts spell it enum:[v]
    return {"const": v} if version >= 7 else {"enum": [v]}


def _interval_to_js(it, integral: bool, version: int) -> dict:
    d: dict = {"type": "integer" if integral else "number"}
    if version >= 7:
        if it.lo is not None:
            d["exclusiveMinimum" if it.xlo else "minimum"] = _num(it.lo)
        if it.hi is not None:
            d["exclusiveMaximum" if it.xhi else "maximum"] = _num(it.hi)
    else:
        # draft-03/04: exclusive bounds are BOOLEANS modifying
        # minimum/maximum (sjot2js emits this shape)
        if it.lo is not None:
            d["minimum"] = _num(it.lo)
            if it.xlo:
                d["exclusiveMinimum"] = True
        if it.hi is not None:
            d["maximum"] = _num(it.hi)
            if it.xhi:
                d["exclusiveMaximum"] = True
    return d


def _node_to_js(t: TypeNode, version: int = 7) -> dict:
    v = version
    if isinstance(t, Ref):
        return {"$ref": f"#/definitions/{t.name.lstrip('#')}"}
    if isinstance(t, SizedInt):
        return {"type": "integer", "minimum": t.lo, "maximum": t.hi}
    if isinstance(t, Range):
        if all(it.lo is not None and it.lo == it.hi for it in t.spec.items):
            return {"enum": [_num(it.lo) for it in t.spec.items]}
        alts = []
        for it in t.spec.items:
            integral = not it.all_float
            if it.lo is not None and it.lo == it.hi:
                alts.append(_const(_num(it.lo), v))
                continue
            alts.append(_interval_to_js(it, integral, v))
        return alts[0] if len(alts) == 1 else {"anyOf": alts}
    if isinstance(t, Regex):
        return {"type": "string", "pattern": t.anchored}
    if isinstance(t, CharLen):
        d = {"type": "string"}
        if t.bounds.lo is not None:
            d["minLength"] = t.bounds.lo
        if t.bounds.hi is not None:
            d["maxLength"] = t.bounds.hi
        return d
    if isinstance(t, Primitive):
        if t.name in FORMAT_REGEX:
            fmt = {"date": "date", "time": "time", "datetime": "date-time",
                   "uuid": "uuid", "duration": "duration"}.get(t.name)
            d = {"type": "string", "pattern": FORMAT_REGEX[t.name]}
            if fmt:
                d["format"] = fmt
            return d
        d = dict(_PRIM_TO_JS[t.name])
        if "const" in d and v < 7:
            d = {"type": d["type"], **_const(d.pop("const"), v),
                 }
        return d
    if isinstance(t, ArrayOf):
        d: dict = {"type": "array", "items": _node_to_js(t.item, v)}
        if t.bounds.exact:
            d["minItems"] = d["maxItems"] = t.bounds.lo
        else:
            if t.bounds.lo is not None:
                d["minItems"] = t.bounds.lo
            if t.bounds.hi is not None:
                d["maxItems"] = t.bounds.hi
        if t.is_set:
            d["uniqueItems"] = True
        return d
    if isinstance(t, Tuple):
        slots = [_node_to_js(x, v) for x in t.items]
        d = {"type": "array",
             "minItems": len(t.items), "maxItems": len(t.items)}
        if v >= 7:
            d["prefixItems"] = slots
        else:
            d["items"] = slots  # draft-03/04 positional form
        return d
    if isinstance(t, UnionT):
        return {"anyOf": [_node_to_js(m, v) for m in t.members]}
    if isinstance(t, ObjectT):
        props, required, patterns = {}, [], {}
        for p in t.props:
            js = _node_to_js(p.type, v)
            if p.has_default:
                js = {**js, "default": p.default}
            if p.is_regex:
                patterns[f"^{p.name}$"] = js
            else:
                if not p.optional:
                    if v >= 4:
                        required.append(p.name)
                    else:
                        # draft-03: required is a per-property boolean
                        # (sjot2js.js:262-265)
                        js = {**js, "required": True}
                props[p.name] = js
        d: dict = {"type": "object", "properties": props}
        if patterns:
            d["patternProperties"] = patterns
        if required:
            d["required"] = required
        if t.final:
            d["additionalProperties"] = False
        if v >= 4:
            # propset combinators need oneOf/anyOf/not: draft-04+.
            # Shape matches the reference exactly (sjot2js.js:339-383):
            # a SINGLE @one/@any propset becomes the object's own
            # oneOf/anyOf; multiple propsets each wrap in an allOf
            # member; @all always emits as allOf members of the form
            # oneOf[{required: set}, {not: {anyOf: each-required}}].
            one_sets = [[{"required": [p]} for p in s] for s in t.one]
            any_sets = [[{"required": [p]} for p in s] for s in t.any]
            all_of = []
            if len(one_sets) == 1:
                d["oneOf"] = one_sets[0]
            else:
                all_of += [{"oneOf": s} for s in one_sets]
            if len(any_sets) == 1:
                d["anyOf"] = any_sets[0]
            else:
                all_of += [{"anyOf": s} for s in any_sets]
            all_of += [
                {"oneOf": [
                    {"required": list(s)},
                    {"not": {"anyOf": [{"required": [p]} for p in s]}},
                ]}
                for s in t.all
            ]
            if all_of:
                d["allOf"] = all_of
        if t.dep:
            key = "dependentRequired" if v >= 7 else "dependencies"
            d[key] = {p: list(deps) for p, deps in t.dep}
        return d
    raise SpecError(f"cannot convert {t} to JSON Schema")


def to_json_schema(spec: CheckSpec, version: int = 7) -> dict:
    """CheckSpec -> JSON Schema document (root + definitions)."""
    if version not in _SCHEMA_URI:
        raise SpecError(f"unsupported JSON Schema version {version}; "
                        f"use one of {sorted(_SCHEMA_URI)}")
    defs = {
        name: _node_to_js(t, version)
        for name, t in spec.named.items() if name != spec.root_name
    }
    out = {"$schema": _SCHEMA_URI[version]}
    out.update(_node_to_js(spec.root, version))
    if defs:
        out["definitions"] = defs
    return out


# ----------------------------------------------------- js -> CheckSpec

_JS_FORMATS = {"date": "date", "time": "time", "date-time": "datetime",
               "uuid": "uuid", "duration": "duration"}


def _bound(js: dict, key: str, xkey: str):
    """(value, exclusive) for draft-07 numeric exclusive bounds AND
    draft-03/04 boolean exclusive bounds."""
    x = js.get(xkey)
    if isinstance(x, (int, float)) and not isinstance(x, bool):
        return x, True
    return js.get(key), bool(x) and key in js


def _propset_variants(lst):
    """``[{"required": ["p"]}, ...]`` (>= 2 single-prop variants, the
    shape sjot2js emits per @one/@any propset) -> ``["p", ...]``."""
    if (isinstance(lst, list) and len(lst) >= 2 and all(
            isinstance(m, dict) and set(m) == {"required"}
            and isinstance(m["required"], list) and len(m["required"]) == 1
            and isinstance(m["required"][0], str)
            for m in lst)):
        return [m["required"][0] for m in lst]
    return None


def _all_propset(m: dict):
    """allOf member encoding an @all propset (sjot2js.js:363-371:
    ``oneOf [{required: set}, {not: {anyOf: each-required}}]``;
    the equivalent anyOf spelling is accepted too) -> prop list."""
    for key in ("oneOf", "anyOf"):
        alt = m.get(key)
        if (isinstance(alt, list) and len(alt) == 2
                and isinstance(alt[0], dict) and set(alt[0]) == {"required"}
                and isinstance(alt[1], dict) and set(alt[1]) == {"not"}
                and isinstance(alt[1]["not"], dict)
                and _propset_variants(alt[1]["not"].get("anyOf"))
                == alt[0]["required"]):
            return list(alt[0]["required"])
    return None


def _js_to_type(js: dict):
    if not isinstance(js, dict):
        raise SpecError("invalid JSON Schema node")
    if "$ref" in js:
        return "#" + js["$ref"].rsplit("/", 1)[-1]
    # an object node may carry a propset-encoded anyOf (single @any,
    # sjot2js.js:357-359) — that is NOT a union; fall through to the
    # object branch which reads it back as @any
    if "anyOf" in js and js.get("type") != "object" \
            and "properties" not in js:
        members = [_js_to_type(x) for x in js["anyOf"]]
        from sjot_spark.spec.ranges import RANGE_STRING_RE

        # anyOf of pure numeric ranges folds back to one range string
        if all(isinstance(m, str) and RANGE_STRING_RE.match(m) for m in members):
            return ",".join(members)
        return [members]
    if "enum" in js and all(
        isinstance(v, (int, float)) and not isinstance(v, bool)
        for v in js["enum"]
    ) and js["enum"]:
        return ",".join(str(_num(v)) for v in js["enum"])
    if "const" in js and isinstance(js["const"], (int, float)) \
            and not isinstance(js["const"], bool):
        return str(_num(js["const"]))
    t = js.get("type")
    if isinstance(t, list):
        return [[_js_to_type({**js, "type": x}) for x in t]]
    if t == "integer" or (t == "number" and (
            "minimum" in js or "maximum" in js
            or "exclusiveMinimum" in js or "exclusiveMaximum" in js)):
        lo, xlo = _bound(js, "minimum", "exclusiveMinimum")
        hi, xhi = _bound(js, "maximum", "exclusiveMaximum")

        def fmt(v):
            if v is None:
                return ""
            v = _num(v)
            if t == "number" and isinstance(v, int):
                return f"{v}.0"
            return str(v)

        if lo is None and hi is None:
            return "integer" if t == "integer" else "number"
        return f"{'<' if xlo else ''}{fmt(lo)}..{fmt(hi)}{'>' if xhi else ''}"
    if t == "number":
        return "number"
    if t == "string":
        if js.get("format") in _JS_FORMATS:
            return _JS_FORMATS[js["format"]]
        if "pattern" in js:
            pat = js["pattern"]
            pat = pat[1:] if pat.startswith("^") else pat
            pat = pat[:-1] if pat.endswith("$") else pat
            return pat if pat.startswith("(") and pat.endswith(")") else f"({pat})"
        if "minLength" in js or "maxLength" in js:
            lo = js.get("minLength", "")
            hi = js.get("maxLength", "")
            return f"char[{lo},{hi}]"
        return "string"
    if t == "boolean":
        if js.get("const") is True or js.get("enum") == [True]:
            return "true"
        if js.get("const") is False or js.get("enum") == [False]:
            return "false"
        return "boolean"
    if t == "null":
        return "null"
    if t == "array":
        slots = js.get("prefixItems")
        if slots is None and isinstance(js.get("items"), list):
            slots = js["items"]  # draft-03/04 positional tuple form
        if slots is not None:
            return [_js_to_type(x) for x in slots]
        item = _js_to_type(js["items"]) if "items" in js else "any"
        lo, hi = js.get("minItems"), js.get("maxItems")
        suffix = "{" if js.get("uniqueItems") else "["
        close = "}" if js.get("uniqueItems") else "]"
        if not isinstance(item, str):
            if lo is not None and hi is not None:
                return [lo, item, hi]
            return [item]
        if lo is None and hi is None:
            return f"{item}{suffix}{close}"
        if lo is not None and lo == hi:
            return f"{item}{suffix}{lo}{close}"
        return f"{item}{suffix}{'' if lo is None else lo},{'' if hi is None else hi}{close}"
    if t == "object":
        out: dict = {}
        required = set(js.get("required", [])) \
            if isinstance(js.get("required"), list) else set()
        for name, sub in js.get("properties", {}).items():
            req = name in required or sub.get("required") is True
            if sub.get("required") is True:
                # strip ONLY the draft-03 boolean flag; a nested
                # object's required LIST must survive into recursion
                sub = {k: v for k, v in sub.items() if k != "required"}
            key = name if req else (
                f"{name}?{json.dumps(sub['default'])}".replace('"', "")
                if "default" in sub else f"{name}?")
            out[key] = _js_to_type(sub)
        for pat, sub in js.get("patternProperties", {}).items():
            p = pat[1:-1] if pat.startswith("^") and pat.endswith("$") else pat
            out[p if p.startswith("(") else f"({p})"] = _js_to_type(sub)
        if js.get("additionalProperties") is False:
            out["@final"] = True
        deps = js.get("dependentRequired", js.get("dependencies"))
        if isinstance(deps, dict):
            out["@dep"] = {
                k: list(v) for k, v in deps.items() if isinstance(v, list)
            }
        # propsets back from every shape the emitter produces: a single
        # @one/@any propset rides on the object's own oneOf/anyOf;
        # multiple (and all @all) are allOf members
        one, any_, all_ = [], [], []
        ps = _propset_variants(js.get("oneOf"))
        if ps:
            one.append(ps)
        ps = _propset_variants(js.get("anyOf"))
        if ps:
            any_.append(ps)
        for m in js.get("allOf", []):
            if not isinstance(m, dict):
                continue
            s = _all_propset(m)
            if s is not None:
                all_.append(s)
                continue
            ps = _propset_variants(m.get("oneOf"))
            if ps:
                one.append(ps)
                continue
            ps = _propset_variants(m.get("anyOf"))
            if ps:
                any_.append(ps)
        if one:
            out["@one"] = one
        if any_:
            out["@any"] = any_
        if all_:
            out["@all"] = all_
        return out
    return "any"


def from_json_schema(doc: dict | str, root_name: str = "Root") -> CheckSpec:
    """JSON Schema -> CheckSpec (subset: the constructs to_json_schema
    emits round-trip, in every emitted version variant)."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    spec_doc: dict = {"@root": f"#{root_name}",
                      root_name: _js_to_type(doc)}
    for name, sub in doc.get("definitions", {}).items():
        spec_doc[name] = _js_to_type(sub)
    return CheckSpec(spec_doc)
