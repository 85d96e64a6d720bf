"""JSON Schema converter round-trips (sjot2js/js2sjot analogs)."""

import json
import shutil

import pytest

from sjot_spark.jsonschema import from_json_schema, to_json_schema
from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import ArrayOf, CharLen, ObjectT, Range, Regex

FULL = {
    "@root": "#T",
    "Score": "0..100",
    "T": {
        "id": "(doc\\d+)",
        "n": "1..8192",
        "toks": "0..50256[1,100]",
        "s?": "string{1,10}",
        "c?": "char[2,4]",
        "fmt?": "date",
        "u?": [["(a+)", "0..9"]],
        "ref?": "#Score",
        "flag?true": "boolean",
        "a?": "int", "b?": "int",
        "@one": [["a", "b"]],
        "@dep": {"s": ["c"]},
    },
}


def test_to_json_schema_shapes():
    js = to_json_schema(CheckSpec(FULL))
    assert js["type"] == "object"
    p = js["properties"]
    assert p["id"]["pattern"] == "^(doc\\d+)$"
    assert p["n"] == {"type": "integer", "minimum": 1, "maximum": 8192}
    assert p["toks"]["type"] == "array"
    assert p["toks"]["minItems"] == 1 and p["toks"]["maxItems"] == 100
    assert p["s"]["uniqueItems"] is True
    assert p["c"] == {"type": "string", "minLength": 2, "maxLength": 4}
    assert p["fmt"]["format"] == "date"
    assert "anyOf" in p["u"]
    assert p["ref"] == {"$ref": "#/definitions/Score"}
    assert p["flag"]["default"] is True
    assert set(js["required"]) == {"id", "n", "toks"}
    assert js["dependentRequired"] == {"s": ["c"]}
    # a SINGLE @one propset rides on the object's own oneOf
    # (sjot2js.js:347-349), not inside allOf
    assert js["oneOf"] == [{"required": ["a"]}, {"required": ["b"]}]
    assert "allOf" not in js
    assert js["definitions"]["Score"] == {
        "type": "integer", "minimum": 0, "maximum": 100}


def test_round_trip_preserves_semantics():
    spec = CheckSpec(FULL)
    spec.check()
    back = from_json_schema(to_json_schema(spec), root_name="T")
    back.check()
    root = back.root
    assert isinstance(root, ObjectT)
    props = {p.name: p for p in root.props}
    assert isinstance(props["id"].type, Regex)
    assert isinstance(props["n"].type, Range)
    assert props["n"].type.spec.source == "1..8192"
    t = props["toks"].type
    assert isinstance(t, ArrayOf) and (t.bounds.lo, t.bounds.hi) == (1, 100)
    assert isinstance(props["c"].type, CharLen)
    s = props["s"].type
    assert isinstance(s, ArrayOf) and s.is_set
    assert props["s"].optional and not props["id"].optional
    assert root.dep == (("s", ("c",)),)


def test_exclusive_bounds_round_trip():
    spec = CheckSpec({"@root": "#T", "T": {"x": "<0..100>"}})
    js = to_json_schema(spec)
    assert js["properties"]["x"]["exclusiveMinimum"] == 0
    assert js["properties"]["x"]["exclusiveMaximum"] == 100
    back = from_json_schema(js, root_name="T")
    x = {p.name: p for p in back.root.props}["x"].type
    assert x.spec.source == "<0..100>"
    assert not x.spec.match_py(0) and not x.spec.match_py(100)
    assert x.spec.match_py(50)


def test_float_range_round_trip():
    spec = CheckSpec({"@root": "#T", "T": {"x": "1.0..2.0"}})
    back = from_json_schema(to_json_schema(spec), root_name="T")
    x = {p.name: p for p in back.root.props}["x"].type
    assert x.spec.match_py(1.5)  # stays float-admitting after round trip


def test_enum_round_trip():
    spec = CheckSpec({"@root": "#T", "T": {"x": "-999,-1,0,1,999"}})
    js = to_json_schema(spec)
    back = from_json_schema(js, root_name="T")
    x = {p.name: p for p in back.root.props}["x"].type
    assert x.spec.match_py(-999) and not x.spec.match_py(2)


# --------------------------- version variants (sjot2js.js:41, 165-170)

def test_version_schema_uris_and_required_placement():
    spec = CheckSpec(FULL)
    v1 = to_json_schema(spec, version=1)
    v3 = to_json_schema(spec, version=3)
    v4 = to_json_schema(spec, version=4)
    assert v1["$schema"] == "http://json-schema.org/schema#"
    assert v3["$schema"] == "http://json-schema.org/draft-03/schema#"
    assert v4["$schema"] == "http://json-schema.org/draft-04/schema#"
    # draft-03: per-property required flag, no required list, no allOf
    assert "required" not in v3
    assert v3["properties"]["id"]["required"] is True
    assert "required" not in v3["properties"]["s"]
    assert "allOf" not in v3
    assert v3["dependencies"] == {"s": ["c"]}
    # draft-04: required list + combinators, dependencies spelling
    assert set(v4["required"]) == {"id", "n", "toks"}
    assert v4["oneOf"] == [{"required": ["a"]}, {"required": ["b"]}]
    assert "oneOf" not in v3  # propsets are draft-04+ only
    assert v4["dependencies"] == {"s": ["c"]}
    with pytest.raises(Exception):
        to_json_schema(spec, version=5)


@pytest.mark.parametrize("version", [1, 3, 4, 7])
def test_every_version_round_trips_semantics(version):
    doc = {
        "@root": "#T",
        "T": {
            "id": "(doc\\d+)",
            "x?": "<0..100>",
            "f?": "true",
            "tup?": ["0..9", "10..19"],
            "s?": "string",
            "c?": "char[2,4]",
            "@dep": {"s": ["c"]},
        },
    }
    spec = CheckSpec(doc)
    spec.check()
    js = to_json_schema(spec, version=version)
    back = from_json_schema(js, root_name="T")
    back.check()
    props = {p.name: p for p in back.root.props}
    assert not props["id"].optional and props["x"].optional
    x = props["x"].type
    assert isinstance(x, Range)
    assert not x.spec.match_py(0) and not x.spec.match_py(100) \
        and x.spec.match_py(50)
    from sjot_spark.spec.typestr import Primitive, Tuple as TupleT
    assert isinstance(props["f"].type, Primitive) \
        and props["f"].type.name == "true"
    assert isinstance(props["tup"].type, TupleT) \
        and len(props["tup"].type.items) == 2
    assert back.root.dep == (("s", ("c",)),)


# ------------------------ propsets @one/@any/@all (sjot2js.js:339-383)

PROPSET = {
    "@root": "#T",
    "T": {
        "a?": "int", "b?": "int", "p?": "int", "q?": "int",
        "m?": "int", "n?": "int", "y1?": "int", "y2?": "int",
        "@one": [["a", "b"]],
        "@any": [["y1", "y2"], ["p", "q"]],
        "@all": [["m", "n"]],
    },
}


def test_propset_emission_and_round_trip():
    spec = CheckSpec(PROPSET)
    for version in (4, 7):
        js = to_json_schema(spec, version=version)
        # single @one rides on the object's own oneOf
        assert js["oneOf"] == [{"required": ["a"]}, {"required": ["b"]}]
        # two @any propsets each wrap in an allOf member
        assert {"anyOf": [{"required": ["y1"]}, {"required": ["y2"]}]} \
            in js["allOf"]
        assert {"anyOf": [{"required": ["p"]}, {"required": ["q"]}]} \
            in js["allOf"]
        assert {"oneOf": [
            {"required": ["m", "n"]},
            {"not": {"anyOf": [{"required": ["m"]}, {"required": ["n"]}]}},
        ]} in js["allOf"]
        back = from_json_schema(js, root_name="T")
        back.check()
        assert back.root.one == (("a", "b"),)
        assert back.root.any == (("y1", "y2"), ("p", "q"))
        assert back.root.all == (("m", "n"),)
    # draft-03: no combinators at all (reference emits them only v>=4)
    v3 = to_json_schema(spec, version=3)
    assert "oneOf" not in v3 and "anyOf" not in v3 and "allOf" not in v3


def test_propset_multi_one_wraps_in_allof():
    spec = CheckSpec({"@root": "#T", "T": {
        "a?": "int", "b?": "int", "c?": "int", "d?": "int",
        "@one": [["a", "b"], ["c", "d"]]}})
    js = to_json_schema(spec, version=4)
    assert "oneOf" not in js
    assert {"oneOf": [{"required": ["a"]}, {"required": ["b"]}]} in js["allOf"]
    assert {"oneOf": [{"required": ["c"]}, {"required": ["d"]}]} in js["allOf"]
    back = from_json_schema(js, root_name="T")
    assert back.root.one == (("a", "b"), ("c", "d"))
    assert not back.root.all


_S2J_DRIVER = r"""
const fs = require("fs");
const code = fs.readFileSync("/root/reference/dev/sjot2js.js", "utf8");
(0,eval)(code + "\nglobalThis.SJOT2JS = SJOT2JS;");
const inp = JSON.parse(fs.readFileSync(0, "utf8"));
console.log(JSON.stringify(inp.versions.map(
  v => SJOT2JS.toJSONSchema(inp.schema, v))));
"""


@pytest.mark.skipif(shutil.which("node") is None, reason="node not installed")
def test_propset_emission_matches_reference():
    """Byte-level parity of the propset subtrees (and properties) with
    the ACTUAL reference emitter run under node, per version."""
    import subprocess

    r = subprocess.run(
        [shutil.which("node"), "-e", _S2J_DRIVER],
        input=json.dumps({"schema": PROPSET, "versions": [3, 4]}).encode(),
        capture_output=True, check=True)
    ref_v3, ref_v4 = json.loads(r.stdout)
    spec = CheckSpec(PROPSET)
    ours_v4 = to_json_schema(spec, version=4)
    theirs = ref_v4["definitions"]["T"]
    for key in ("oneOf", "anyOf", "allOf"):
        assert ours_v4.get(key) == theirs.get(key), key
    assert ours_v4["properties"] == theirs["properties"]
    # draft-03: the reference omits combinators entirely, and so do we
    assert all(k not in ref_v3["definitions"]["T"]
               for k in ("oneOf", "anyOf", "allOf"))


def test_nested_object_required_survives_round_trip():
    """A nested object's required LIST must not be consumed by the
    draft-03 boolean-required stripping (round-2 review finding)."""
    spec = CheckSpec({"@root": "#T",
                      "T": {"o?": {"x": "0..9", "y?": "string"}}})
    for version in (3, 4, 7):
        back = from_json_schema(to_json_schema(spec, version=version),
                                root_name="T")
        o = {p.name: p for p in back.root.props}["o"].type
        sub = {p.name: p for p in o.props}
        assert not sub["x"].optional, f"v{version}: nested x lost required"
        assert sub["y"].optional
