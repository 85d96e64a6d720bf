"""Row-level check micro-tests: each SJOT check class compiled to a
Column and exercised over a small typed DataFrame — the engine-side
twin of the reference's README valid/invalid example pairs
(/root/reference/README.md:277-369)."""

import pytest

from sjot_spark.engine import ValidationEngine
from sjot_spark.errors import SpecError


def run_checks(spark, spec, rows, schema):
    eng = ValidationEngine(spec)
    df = spark.createDataFrame(rows, schema)
    res = eng.run(df)
    viol = {}
    for r in res.violations.collect():
        viol.setdefault(r.key, set()).add(r.check_id)
    return viol


def test_float_range_semantics_on_double_column(spark):
    # "1..10" rejects 1.5 on a double column; "1.0..10.0" accepts
    spec = {"@root": "#T",
            "T": {"k": "string", "a?": "1..10", "b?": "1.0..10.0"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", 1.5, 1.5), ("r2", 5.0, 10.0), ("r3", 11.0, 0.5)],
        "k string, a double, b double",
    )
    assert viol == {"r1": {"a_range"}, "r3": {"a_range", "b_range"}}


def test_enum_and_exclusive_ranges(spark):
    spec = {"@root": "#T", "T": {"k": "string", "e?": "-999,-1,0,1,999",
                                 "x?": "<0..100>"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", 2, 0), ("r2", 999, 100), ("r3", -999, 50)],
        "k string, e int, x int",
    )
    # 0 and 100 are both excluded by <0..100>
    assert viol == {"r1": {"e_range", "x_range"}, "r2": {"x_range"}}


def test_sized_int_parity_long_is_2pow47(spark):
    spec = {"@root": "#T", "T": {"k": "string", "v?": "long"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("ok", 140737488355327), ("bad", 140737488355328)],
        "k string, v long",
    )
    assert viol == {"bad": {"v_range"}}


def test_ulong_compiles_and_validates(spark):
    """ulong's 2^64-1 upper bound exceeds F.lit's long domain; it must
    compile (statically-true bound elided on integral columns, decimal
    literal on floats) instead of crashing (round-1 ADVICE;
    index.js:532-536)."""
    spec = {"@root": "#T", "T": {"k": "string", "v?": "ulong",
                                 "f?": "ulong", "a?": "ulong[]"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("ok", 2 ** 63 - 1, 12.0, [0, 5]), ("neg", -1, -3.0, [-2]),
         ("frac", 7, 1.5, [1])],
        "k string, v long, f double, a array<int>",
    )
    assert viol == {"neg": {"v_range", "f_range", "a_element_range"},
                    "frac": {"f_range"}}


def test_nan_rejected_by_ranges_and_sized_ints(spark):
    """JS comparisons with NaN are all false, so the reference rejects
    NaN from every numeric check — including lower-bound-only ranges
    where Spark's NaN-greater-than-everything would otherwise pass it
    (round-1 ADVICE)."""
    spec = {"@root": "#T",
            "T": {"k": "string", "lo?": "0..", "i?": "int",
                  "g?": "integer"},
            "@table": {"key": "k"}}
    nan = float("nan")
    viol = run_checks(
        spark, spec,
        [("r1", nan, nan, nan), ("r2", 5.0, 5.0, 5.0)],
        "k string, lo double, i double, g double",
    )
    assert viol == {"r1": {"lo_range", "i_range", "g_range"}}


def test_char_and_regex_and_formats(spark):
    spec = {"@root": "#T",
            "T": {"k": "string", "c?": "char[2,3]", "r?": "(ab+c)",
                  "u?": "uuid", "d?": "date", "h?": "hex"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", "ab", "abbc", "123e4567-e89b-12d3-a456-426614174000",
          "2024-01-31", "DEADbeef"),
         ("r2", "a", "ac", "nope", "2024-1-1", "xyz")],
        "k string, c string, r string, u string, d string, h string",
    )
    assert viol == {"r2": {"c_len_bounds", "r_format", "u_format",
                           "d_format", "h_format"}}


def test_boolean_fixed_and_atom(spark):
    spec = {"@root": "#T", "T": {"k": "string", "t?": "true", "f?": "false"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", True, False), ("r2", False, True)],
        "k string, t boolean, f boolean",
    )
    assert viol == {"r2": {"t_type", "f_type"}}


def test_integer_on_double_column(spark):
    spec = {"@root": "#T", "T": {"k": "string", "v?": "integer"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec, [("r1", 3.0), ("r2", 3.5)], "k string, v double",
    )
    assert viol == {"r2": {"v_range"}}


def test_array_bounds_and_element_types(spark):
    spec = {"@root": "#T", "T": {"k": "string", "a?": "0..9[2,3]"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", [1, 2]), ("r2", [1]), ("r3", [1, 2, 3, 4]),
         ("r4", [1, 77]), ("r5", [1, None, 2])],
        "k string, a array<int>",
    )
    assert viol == {"r2": {"a_len_bounds"}, "r3": {"a_len_bounds"},
                    "r4": {"a_element_range"}, "r5": {"a_element_range"}}


def test_nested_arrays(spark):
    spec = {"@root": "#T", "T": {"k": "string", "a?": "0..9[][2]"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", [[1, 2], [3]]), ("r2", [[1]]), ("r3", [[1], [88]])],
        "k string, a array<array<int>>",
    )
    assert viol == {"r2": {"a_len_bounds"}, "r3": {"a_element_type"}}


def test_set_uniqueness_intra_row(spark):
    # [verified vs reference]: {s:[3,1,2,2]} rejected
    spec = {"@root": "#T", "T": {"k": "string", "s?": "int{1,10}"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", [3, 1, 2]), ("r2", [3, 1, 2, 2]), ("r3", [])],
        "k string, s array<int>",
    )
    assert viol == {"r2": {"s_unique_items"}, "r3": {"s_len_bounds"}}


def test_tuple_per_slot(spark):
    spec = {"@root": "#T", "T": {"k": "string", "t?": ["0..9", "10..19"]},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", [5, 15]), ("r2", [5, 5]), ("r3", [5])],
        "k string, t array<int>",
    )
    # unlike SJOT's fail-fast, the engine reports ALL failing checks:
    # a short tuple fails both the length and the missing-slot check
    assert viol == {"r2": {"t_tuple_types"},
                    "r3": {"t_len_bounds", "t_tuple_types"}}


def test_union_static_dispatch(spark):
    # union over distinct scalar classes: a string column dispatches to
    # the string member (regex), an int column to the numeric member
    spec = {"@root": "#T",
            "T": {"k": "string", "s?": [["(a+)", "0..9"]],
                  "n?": [["(a+)", "0..9"]]},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", "aaa", 5), ("r2", "b", 11)],
        "k string, s string, n int",
    )
    assert viol == {"r2": {"s_type", "n_type"}}


def test_required_vs_optional_null(spark):
    spec = {"@root": "#T", "T": {"k": "string", "req": "int", "opt?": "int"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", 1, None), ("r2", None, 1)],
        "k string, req int, opt int",
    )
    assert viol == {"r2": {"req_not_null"}}


def test_one_any_all_dep_combinators(spark):
    # [verified vs reference] @dep truth table
    spec = {"@root": "#T",
            "T": {"k": "string", "a?": "int", "b?": "int", "c?": "int",
                  "d?": "int",
                  "@one": [["a", "b"]], "@dep": {"c": ["d"]}},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", 1, None, None, None),   # one of a,b; no c
         ("r2", 1, 2, None, None),      # both a and b -> @one fails
         ("r3", None, None, 1, None),   # @one fails (none) + @dep fails
         ("r4", None, 1, 1, 2)],        # ok
        "k string, a int, b int, c int, d int",
    )
    assert viol == {"r2": {"one_a_b"}, "r3": {"one_a_b", "dep_c"}}


def test_all_or_none(spark):
    spec = {"@root": "#T",
            "T": {"k": "string", "x?": "int", "y?": "int",
                  "@all": [["x", "y"]]},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", 1, 2), ("r2", None, None), ("r3", 1, None)],
        "k string, x int, y int",
    )
    assert viol == {"r3": {"all_x_y"}}


def test_final_rejects_extra_columns_at_compile(spark):
    eng = ValidationEngine({"@root": "#T",
                            "T": {"k": "string", "@final": True},
                            "@table": {"key": "k"}})
    df = spark.createDataFrame([("a", 1)], "k string, extra int")
    with pytest.raises(SpecError, match="undeclared columns"):
        eng.run(df)


def test_missing_required_column_rejected_at_compile(spark):
    eng = ValidationEngine({"@root": "#T",
                            "T": {"k": "string", "gone": "int"},
                            "@table": {"key": "k"}})
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(SpecError, match="required column gone"):
        eng.run(df)


def test_regex_property_names(spark):
    # (regex) prop names match multiple columns (index.js:388-405)
    spec = {"@root": "#T",
            "T": {"k": "string", "(m_\\d+)": "0..9"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", 5, 3), ("r2", 11, 5)],
        "k string, m_1 int, m_2 int",
    )
    assert viol == {"r2": {"m_1_range"}}


def test_ref_types_resolve(spark):
    spec = {"@root": "#T",
            "Score": "0..100",
            "T": {"k": "string", "v?": "#Score"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec, [("r1", 50), ("r2", 101)], "k string, v int",
    )
    assert viol == {"r2": {"v_range"}}


def test_struct_column_object_type(spark):
    spec = {"@root": "#T",
            "T": {"k": "string", "o?": {"x": "0..9", "y?": "string"}},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", (5, "a")), ("r2", (11, None)), ("r3", (None, "b"))],
        "k string, o struct<x:int,y:string>",
    )
    assert viol == {"r2": {"o_type"}, "r3": {"o_type"}}


def test_union_if_then_discrimination_on_struct(spark):
    """@if/@then union dispatch (index.js:878-900): when the @if field
    is present, the @then object type applies."""
    spec = {"@root": "#T",
            "T": {"k": "string",
                  "o?": [[
                      {"tag?": "string", "v?": "0..9",
                       "@if": "tag", "@then": {"tag?": "string", "v?": "0..9"}},
                      {"w?": "string"},
                  ]]},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", ("x", 5, None)),      # discriminated: tag present, v ok
         ("r2", ("x", 55, None)),     # discriminated: v out of range
         ("r3", (None, None, "w")),   # falls through to the {w} member
        ],
        "k string, o struct<tag:string,v:int,w:string>",
    )
    assert viol == {"r2": {"o_type"}}


def test_nullable_integer_union_from_json_schema(spark):
    """The common JSON Schema {"type": ["integer","null"]} pattern must
    survive conversion and validate correctly (round-2 of the
    union-null review finding)."""
    from sjot_spark.jsonschema import from_json_schema

    js = {"type": "object",
          "properties": {"k": {"type": "string"},
                         "x": {"type": ["integer", "null"]}},
          "required": ["k", "x"]}
    spec = from_json_schema(js, root_name="T")
    spec.doc["@table"] = {"key": "k"}
    spec = type(spec)(spec.doc)
    viol = run_checks(
        spark, spec,
        [("a", 5), ("b", None)],
        "k string, x int",
    )
    assert viol == {}  # null admitted by the union, 5 is an integer


def test_any_combinator(spark):
    spec = {"@root": "#T",
            "T": {"k": "string", "x?": "int", "y?": "int",
                  "@any": [["x", "y"]]},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", 1, None), ("r2", None, None), ("r3", None, 2)],
        "k string, x int, y int",
    )
    assert viol == {"r2": {"any_x_y"}}


def test_null_elements_violate_even_for_static_item_types(spark):
    """A null element violates regardless of whether the item type
    needs a runtime predicate ('int' over array<int> is statically
    conformant but null must still be caught); 'any' items admit null
    (the reference's default for any IS null, index.js:1194-1244)."""
    spec = {"@root": "#T",
            "T": {"k": "string", "ints?": "int[]", "strs?": "string[]",
                  "anys?": "any[]"},
            "@table": {"key": "k"}}
    viol = run_checks(
        spark, spec,
        [("r1", [1, None, 2], ["a", None], [9, None]),
         ("r2", [1, 2], ["a"], [None])],
        "k string, ints array<int>, strs array<string>, anys array<int>",
    )
    assert viol == {"r1": {"ints_element_range", "strs_element_type"}}
