"""JSON Schema converters — the sjot2js / js2sjot analogs
(/root/reference/dev/sjot2js.js:41-629, dev/js2sjot.js:55-824),
covering the subset of both languages our engine uses.

- ``to_json_schema(spec)``: CheckSpec -> JSON Schema (draft-07 style)
- ``from_json_schema(doc)``: JSON Schema -> CheckSpec

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


def _num(v: float):
    return int(v) if float(v).is_integer() else v


def _node_to_js(t: TypeNode) -> dict:
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
                alts.append({"const": _num(it.lo)})
                continue
            d: dict = {"type": "integer" if integral else "number"}
            if it.lo is not None:
                d["exclusiveMinimum" if it.xlo else "minimum"] = _num(it.lo)
            if it.hi is not None:
                d["exclusiveMaximum" if it.xhi else "maximum"] = _num(it.hi)
            alts.append(d)
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
        return dict(_PRIM_TO_JS[t.name])
    if isinstance(t, ArrayOf):
        d: dict = {"type": "array", "items": _node_to_js(t.item)}
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
        return {
            "type": "array",
            "prefixItems": [_node_to_js(x) for x in t.items],
            "minItems": len(t.items), "maxItems": len(t.items),
        }
    if isinstance(t, UnionT):
        return {"anyOf": [_node_to_js(m) for m in t.members]}
    if isinstance(t, ObjectT):
        props, required, patterns = {}, [], {}
        for p in t.props:
            js = _node_to_js(p.type)
            if p.has_default:
                js = {**js, "default": p.default}
            if p.is_regex:
                patterns[f"^{p.name}$"] = js
            else:
                props[p.name] = js
                if not p.optional:
                    required.append(p.name)
        d: dict = {"type": "object", "properties": props}
        if patterns:
            d["patternProperties"] = patterns
        if required:
            d["required"] = required
        if t.final:
            d["additionalProperties"] = False
        all_of = []
        for s in t.one:
            all_of.append({"oneOf": [{"required": [p]} for p in s]})
        for s in t.any:
            all_of.append({"anyOf": [{"required": [p]} for p in s]})
        for s in t.all:
            all_of.append({"anyOf": [
                {"required": list(s)},
                {"not": {"anyOf": [{"required": [p]} for p in s]}},
            ]})
        if t.dep:
            d["dependentRequired"] = {p: list(deps) for p, deps in t.dep}
        if all_of:
            d["allOf"] = all_of
        return d
    raise SpecError(f"cannot convert {t} to JSON Schema")


def to_json_schema(spec: CheckSpec) -> dict:
    """CheckSpec -> JSON Schema document (root + definitions)."""
    defs = {
        name: _node_to_js(t)
        for name, t in spec.named.items() if name != spec.root_name
    }
    out = {"$schema": "http://json-schema.org/draft-07/schema#"}
    out.update(_node_to_js(spec.root))
    if defs:
        out["definitions"] = defs
    return out


# ----------------------------------------------------- js -> CheckSpec

_JS_FORMATS = {"date": "date", "time": "time", "date-time": "datetime",
               "uuid": "uuid", "duration": "duration"}


def _js_to_type(js: dict):
    if not isinstance(js, dict):
        raise SpecError("invalid JSON Schema node")
    if "$ref" in js:
        return "#" + js["$ref"].rsplit("/", 1)[-1]
    if "anyOf" in js:
        members = [_js_to_type(x) for x in js["anyOf"]]
        from sjot_spark.spec.ranges import RANGE_STRING_RE

        # anyOf of pure numeric ranges folds back to one range string
        if all(isinstance(m, str) and RANGE_STRING_RE.match(m) for m in members):
            return ",".join(members)
        return [members]
    if "enum" in js and all(isinstance(v, (int, float)) for v in js["enum"]):
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
        lo = js.get("minimum", js.get("exclusiveMinimum"))
        hi = js.get("maximum", js.get("exclusiveMaximum"))
        xlo = "exclusiveMinimum" in js
        xhi = "exclusiveMaximum" in js

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
        if js.get("const") is True:
            return "true"
        if js.get("const") is False:
            return "false"
        return "boolean"
    if t == "null":
        return "null"
    if t == "array":
        if "prefixItems" in js:
            return [_js_to_type(x) for x in js["prefixItems"]]
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
        required = set(js.get("required", []))
        for name, sub in js.get("properties", {}).items():
            key = name if name in required else (
                f"{name}?{json.dumps(sub['default'])}".replace('"', "")
                if "default" in sub else f"{name}?")
            out[key] = _js_to_type(sub)
        for pat, sub in js.get("patternProperties", {}).items():
            p = pat[1:-1] if pat.startswith("^") and pat.endswith("$") else pat
            out[p if p.startswith("(") else f"({p})"] = _js_to_type(sub)
        if js.get("additionalProperties") is False:
            out["@final"] = True
        if "dependentRequired" in js:
            out["@dep"] = {k: list(v) for k, v in js["dependentRequired"].items()}
        return out
    return "any"


def from_json_schema(doc: dict | str, root_name: str = "Root") -> CheckSpec:
    """JSON Schema -> CheckSpec (subset: the constructs to_json_schema
    emits round-trip)."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    spec_doc: dict = {"@root": f"#{root_name}",
                      root_name: _js_to_type(doc)}
    for name, sub in doc.get("definitions", {}).items():
        spec_doc[name] = _js_to_type(sub)
    return CheckSpec(spec_doc)
