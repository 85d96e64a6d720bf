"""Range/enum parser parity tests — mirrors the semantic edge cases
verified against the reference (/root/reference/index.js:543-663)."""

import pytest

from sjot_spark.errors import SpecError
from sjot_spark.spec.ranges import parse_range


def m(s, v):
    return parse_range(s).match_py(v)


def test_inclusive_range():
    assert m("1..10", 1) and m("1..10", 10) and m("1..10", 5)
    assert not m("1..10", 0) and not m("1..10", 11)


def test_integral_range_rejects_floats():
    # [verified vs reference]: 1.5 not in "1..10"
    assert not m("1..10", 1.5)
    assert m("1.0..10.0", 1.5)  # float literals admit floats


def test_exclusive_bounds():
    assert not m("<1..10", 1) and m("<1..10", 2)
    assert not m("1..10>", 10) and m("1..10>", 9)
    assert not m("<1..10>", 1) and not m("<1..10>", 10) and m("<1..10>", 5)


def test_open_ranges():
    assert m("5..", 5) and m("5..", 1e9) and not m("5..", 4)
    assert not m("<5..", 5) and m("<5..", 6)
    assert m("..5", 5) and m("..5", -1e9) and not m("..5", 6)
    assert not m("..5>", 5) and m("..5>", 4)


def test_enumeration():
    # [verified vs reference]: 3 in "1,3..5", 2 not in
    assert m("1,3..5", 1) and m("1,3..5", 3) and m("1,3..5", 4) and m("1,3..5", 5)
    assert not m("1,3..5", 2) and not m("1,3..5", 6)


def test_pure_enum():
    assert m("-999,-1,0,1,999", -999) and m("-999,-1,0,1,999", 999)
    assert not m("-999,-1,0,1,999", 2)


def test_float_scan_breaks_at_first_integral_item():
    # reference scan BREAKS for float data at the first item whose
    # literal lacks a '.' — even if a later float item would match
    assert not m("1,1.0..2.0", 1.5)
    assert m("1.0..2.0,1", 1.5)  # float item first: matches before break
    assert m("1,1.0..2.0", 1)    # integral data unaffected


def test_mixed_literal_range_excludes_floats():
    # "1.0..5": lo is float literal but hi is integral -> break for floats
    assert not m("1.0..5", 2.5)
    assert m("1.0..5", 2)


def test_negative_values():
    assert m("-10..10", -10) and m("-10..10", 0)
    assert not m("-10..10", -11)
    assert not m("<-10..10>", -10) and m("<-10..10>", -9)


def test_bad_grammar_rejected():
    for bad in ["", "abc", "1...5", "..", "1..5..9", "1,,2", "<1", "1>", "--1..5"]:
        with pytest.raises(SpecError):
            parse_range(bad)


def test_empty_range_rejected():
    with pytest.raises(SpecError):
        parse_range("10..1")
    with pytest.raises(SpecError):
        parse_range("<5..5")
    parse_range("5..5")  # single-point inclusive is fine


def test_bounds_hull():
    assert parse_range("1..10").bounds_hull() == (1, 10)
    assert parse_range("1,3..5,20").bounds_hull() == (1, 20)
    assert parse_range("..5").bounds_hull() == (None, 5)
    assert parse_range("5..").bounds_hull() == (5, None)
