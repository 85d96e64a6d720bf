"""JSON Schema converter round-trips (sjot2js/js2sjot analogs)."""

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
    assert {"oneOf": [{"required": ["a"]}, {"required": ["b"]}]} in js["allOf"]
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
    assert {"oneOf": [{"required": ["a"]}, {"required": ["b"]}]} in v4["allOf"]
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
