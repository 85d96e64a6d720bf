"""Differential testing: the compiled Spark plan and the independent
pure-Python evaluator (sjot_spark.spec.pyeval) must report identical
failing-check sets for every hypothesis-generated row."""

import pytest
from hypothesis import given, settings, strategies as st

from sjot_spark.engine import ValidationEngine
from sjot_spark.spec.pyeval import evaluate_row
from sjot_spark.spec.spec import CheckSpec

SPEC = CheckSpec({
    "@root": "#T",
    "Score": "0..100",
    "T": {
        "k": "string",
        "rng?": "-10..10",
        "xr?": "<0..50>",
        "enm?": "-999,-1,0,1,999",
        "fr?": "1.0..2.0",
        "mixed?": "1,3..5",
        "ref?": "#Score",
        "rx?": "(ab+c)",
        "hx?": "hex",
        "ch?": "char[2,4]",
        "arr?": "0..9[1,4]",
        "stt?": "int{1,5}",
        "tup?": ["0..9", "10..19"],
        "un?": [["0..9", "null"]],
        "ul?": "ulong",
        "p?": "int", "q?": "int",
        "@one": [["p", "q"]],
        "@dep": {"p": ["q"]},
    },
    "@table": {"key": "k"},
})

DTYPES = {
    "k": "string", "rng": "int", "xr": "int", "enm": "int", "fr": "double",
    "mixed": "double", "ref": "int", "rx": "string", "hx": "string",
    "ch": "string", "arr": "array<int>", "stt": "array<int>",
    "tup": "array<int>", "un": "int", "ul": "double",
    "p": "int", "q": "int",
}
SCHEMA = ("k string, rng int, xr int, enm int, fr double, mixed double, "
          "ref int, rx string, hx string, ch string, arr array<int>, "
          "stt array<int>, tup array<int>, un int, ul double, "
          "p int, q int")

maybe_int = st.one_of(st.none(), st.integers(-1000, 1000))
small_int = st.one_of(st.none(), st.integers(-12, 12))
maybe_float = st.one_of(st.none(), st.floats(-3, 3, allow_nan=False),
                        st.integers(-3, 3).map(float))
# NaN included: the engine must reject it from every numeric check
# exactly like the pure-Python evaluator (JS comparison semantics)
nanable_float = st.one_of(
    st.none(), st.just(float("nan")), st.floats(-2, 2 ** 40),
    # integral doubles beyond 2^63: floor(double) saturates to long,
    # the integrality check must not (round-2 review finding)
    st.sampled_from([1e19, 2.0 ** 63, 2.0 ** 64 - 4096, 1.5e19]),
    st.integers(-3, 3).map(float))
maybe_str = st.one_of(st.none(), st.sampled_from(
    ["", "a", "ab", "abc", "abbc", "ac", "deadBEEF", "xyz", "ff00",
     "chars", "longer-string"]))
int_list = st.one_of(
    st.none(), st.lists(st.integers(-2, 12), min_size=0, max_size=6))

row_strategy = st.fixed_dictionaries({
    "rng": small_int, "xr": st.one_of(st.none(), st.integers(-5, 60)),
    "enm": maybe_int, "fr": maybe_float, "mixed": maybe_float,
    "ref": st.one_of(st.none(), st.integers(-5, 105)),
    "rx": maybe_str, "hx": maybe_str, "ch": maybe_str,
    "arr": int_list, "stt": int_list, "tup": int_list,
    "un": small_int, "ul": nanable_float,
    "p": small_int, "q": small_int,
})


@settings(max_examples=12, deadline=None)
@given(st.lists(row_strategy, min_size=1, max_size=25))
def test_engine_matches_pyeval(spark, rows):
    eng = ValidationEngine(SPEC)
    data = [tuple([f"r{i:03d}"] + [r[c] for c in list(DTYPES)[1:]])
            for i, r in enumerate(rows)]
    df = spark.createDataFrame(data, SCHEMA)
    res = eng.run(df, persist_violations=False)
    got: dict[str, set] = {}
    for v in res.violations.collect():
        got.setdefault(v.key, set()).add(v.check_id)
    for i, r in enumerate(rows):
        key = f"r{i:03d}"
        expected = evaluate_row(SPEC, {"k": key, **r}, DTYPES)
        assert got.get(key, set()) == expected, (
            f"row {r}: engine={got.get(key, set())} pyeval={expected}")
