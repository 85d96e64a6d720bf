"""Spec parsing + checker tests — mirrors sjot_check's error catalogue
(/root/reference/index.js:1273-1713) and the satisfiability model
checker (index.js:2056-2111)."""

import pytest

from sjot_spark.errors import SpecError
from sjot_spark.spec.bounds import parse_bounds
from sjot_spark.spec.checker import check_satisfiable
from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import (
    ArrayOf, CharLen, ObjectT, Primitive, Range, Ref, Regex, SizedInt,
    Tuple, UnionT, parse_type,
)


# ------------------------------------------------------------- bounds

def test_bounds_forms():
    assert parse_bounds("").unbounded
    b = parse_bounds("3")
    assert b.exact and b.check_len(3) and not b.check_len(2)
    b = parse_bounds("1,8192")
    assert b.check_len(1) and b.check_len(8192)
    assert not b.check_len(0) and not b.check_len(8193)
    assert parse_bounds("2,").check_len(99) and not parse_bounds("2,").check_len(1)
    assert parse_bounds(",5").check_len(0) and not parse_bounds(",5").check_len(6)
    with pytest.raises(SpecError):
        parse_bounds("5,2")
    with pytest.raises(SpecError):
        parse_bounds("x")


# ------------------------------------------------------------ typestr

def test_parse_primitives_and_sized_ints():
    assert parse_type("string") == Primitive("string")
    t = parse_type("int")
    assert isinstance(t, SizedInt) and (t.lo, t.hi) == (-2147483648, 2147483647)
    # the reference's long is +-(2^47-1) — parity preserved
    t = parse_type("long")
    assert (t.lo, t.hi) == (-140737488355328, 140737488355327)


def test_parse_array_set_char():
    t = parse_type("0..50256[1,8192]")
    assert isinstance(t, ArrayOf) and not t.is_set
    assert isinstance(t.item, Range)
    assert (t.bounds.lo, t.bounds.hi) == (1, 8192)
    t = parse_type("string{1,10}")
    assert isinstance(t, ArrayOf) and t.is_set
    t = parse_type("char[2]")
    assert isinstance(t, CharLen) and t.bounds.exact and t.bounds.lo == 2
    t = parse_type("string[][]")
    assert isinstance(t, ArrayOf) and isinstance(t.item, ArrayOf)


def test_parse_regex_ref_union_tuple():
    t = parse_type("(doc\\d{12})")
    assert isinstance(t, Regex)
    assert parse_type("#Foo") == Ref("#Foo")
    t = parse_type([["string", "int"]])
    assert isinstance(t, UnionT) and len(t.members) == 2
    t = parse_type(["string", "int"])
    assert isinstance(t, Tuple)
    t = parse_type([1, "string", 5])
    assert isinstance(t, ArrayOf) and (t.bounds.lo, t.bounds.hi) == (1, 5)
    t = parse_type([4])
    assert isinstance(t, ArrayOf) and t.bounds.exact


def test_parse_object_props():
    o = parse_type({"a": "int", "b?": "string", "c?42": "int", "@final": True})
    assert isinstance(o, ObjectT) and o.final
    a, b, c = o.props
    assert not a.optional and b.optional and not b.has_default
    assert c.optional and c.has_default and c.default == 42


def test_bad_regex_rejected():
    with pytest.raises(SpecError):
        parse_type("([unclosed)")


# ---------------------------------------------------- satisfiability

def test_satisfiable_cases():
    assert check_satisfiable((), (), (), ())
    # @one [a,b] + @all [a,b]: no assignment works [verified vs reference]
    assert not check_satisfiable((("a", "b"),), (), (("a", "b"),), ())
    assert check_satisfiable((("a", "b"),), (), (), ())
    # @one [a,b] + @dep a->b is satisfiable with only b set
    assert check_satisfiable((("a", "b"),), (), (), (("a", ("b",)),))
    # >20 vars: assumed satisfiable (cutoff parity)
    big = tuple((f"p{i}", f"q{i}") for i in range(11))
    assert check_satisfiable(big, (), (big[0] + big[1],), ())


# ------------------------------------------------------------- spec

GOOD = {
    "@root": "#Sequence",
    "Sequence": {
        "doc_id": "(doc\\d{12})",
        "tokens": "0..50256[1,8192]",
        "n_tok": "1..8192",
        "source": "string",
    },
    "@table": {
        "key": "doc_id",
        "partition_by": "source",
        "unique": ["doc_id"],
        "consistent": {"n_tok": "size(tokens)"},
        "ref": {"source": {"dim": "allowed_sources", "column": "source"}},
    },
}


def test_good_spec_checks():
    spec = CheckSpec(GOOD)
    assert spec.check() is True
    assert spec.root_name == "Sequence"
    assert spec.table.unique == ("doc_id",)
    assert spec.table.refs[0].dim == "allowed_sources"


def test_spec_from_json_string():
    import json

    spec = CheckSpec(json.dumps(GOOD))
    assert spec.check() is True


def test_unsat_spec_rejected():
    spec = CheckSpec({
        "@root": "#T",
        "T": {"a?": "int", "b?": "int",
              "@one": [["a", "b"]], "@all": [["a", "b"]]},
    })
    with pytest.raises(SpecError, match="non-satisfiable"):
        spec.check()


def test_propset_must_be_optional_nondefault():
    spec = CheckSpec({"@root": "#T", "T": {"a": "int", "b?": "int",
                                           "@one": [["a", "b"]]}})
    with pytest.raises(SpecError, match="optional non-default"):
        spec.check()
    spec = CheckSpec({"@root": "#T", "T": {"a?5": "int", "b?": "int",
                                           "@one": [["a", "b"]]}})
    with pytest.raises(SpecError, match="optional non-default"):
        spec.check()


def test_propsets_disjoint():
    spec = CheckSpec({"@root": "#T",
                      "T": {"a?": "int", "b?": "int", "c?": "int",
                            "@one": [["a", "b"], ["b", "c"]]}})
    with pytest.raises(SpecError, match="disjoint"):
        spec.check()


def test_nested_union_rejected():
    with pytest.raises(SpecError, match="nested"):
        CheckSpec({"@root": "#T", "T": {"x": [[[["int", "string"]], "null"]]}}).check()


def test_ambiguous_union_rejected():
    spec = CheckSpec({"@root": "#T", "T": {"x": [["int", "1..5"]]}})
    with pytest.raises(SpecError, match="ambiguous"):
        spec.check()


def test_object_union_disjoint_props():
    ok = CheckSpec({"@root": "#T",
                    "T": {"x": [[{"a": "int"}, {"b": "string"}]]}})
    assert ok.check()
    bad = CheckSpec({"@root": "#T",
                     "T": {"x": [[{"a": "int"}, {"a": "string"}]]}})
    with pytest.raises(SpecError, match="ambiguous"):
        bad.check()


def test_spaghetti_ref_rejected():
    spec = CheckSpec({"@root": "#A", "A": "#B", "B": "#C", "C": "int"})
    with pytest.raises(SpecError, match="spaghetti"):
        spec.check()


def test_missing_ref_rejected():
    spec = CheckSpec({"@root": "#T", "T": {"x": "#Nope"}})
    with pytest.raises(SpecError):
        spec.check()


def test_extends_flattening():
    spec = CheckSpec({
        "@root": "#Derived",
        "Base": {"a": "int", "b?": "string"},
        "Derived": {"@extends": "#Base", "c": "boolean"},
    })
    assert spec.check()
    root = spec.root
    assert {p.name for p in root.props} == {"a", "b", "c"}


def test_extends_override_rejected():
    with pytest.raises(SpecError, match="override"):
        CheckSpec({
            "@root": "#D",
            "Base": {"a": "int"},
            "D": {"@extends": "#Base", "a": "string"},
        })


def test_extends_final_rejected():
    with pytest.raises(SpecError, match="final"):
        CheckSpec({
            "@root": "#D",
            "Base": {"a": "int", "@final": True},
            "D": {"@extends": "#Base", "b": "string"},
        })


def test_extends_concatenates_propsets():
    spec = CheckSpec({
        "@root": "#D",
        "Base": {"a?": "int", "b?": "int", "@one": [["a", "b"]]},
        "D": {"@extends": "#Base", "c?": "int", "d?": "int",
              "@one": [["c", "d"]]},
    })
    assert spec.check()
    assert spec.root.one == (("a", "b"), ("c", "d"))


def test_if_then_discriminated_union_accepted():
    # overlapping object members are OK when @if/@then discriminates
    # (reference accepts discriminated overlap, index.js:1919-1987)
    ok = CheckSpec({"@root": "#T",
                    "T": {"x": [[{"a": "int", "@if": "a", "@then": {"a": "int"}},
                                  {"a": "string", "b?": "int"}]]}})
    assert ok.check()
