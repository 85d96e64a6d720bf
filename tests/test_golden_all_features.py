"""The engine twin of the reference's comprehensive golden test
(/root/reference/dev/test.js:3-116): ONE CheckSpec declaring every
DSL feature, checked and compiled against one wide table; a clean row
passes everything, and each feature class has a seeded negative twin
(README.md:277-369 pattern)."""

import pytest

from sjot_spark.engine import ValidationEngine
from sjot_spark.spec.spec import CheckSpec

GOLDEN_SPEC = {
    "@root": "#Everything",
    "Score": "0..100",                      # named type + reference
    "Base": {"inherited?": "boolean"},       # @extends base
    "Everything": {
        "@extends": "#Base",
        # primitives / sized ints / ranges / enums
        "id": "(row\\d{3})",
        "b?": "boolean",
        "t?": "true",
        "i?": "int",
        "lng?": "long",
        "rng?": "-10..10",
        "xrng?": "<0..100>",
        "enm?": "-999,-1,0,1,999",
        "frng?": "1.0..2.0",
        "intg?": "integer",
        # strings / formats
        "s?": "string",
        "ch?": "char[1,10]",
        "rx?": "(ab+c)",
        "b64?": "base64",
        "hx?": "hex",
        "uu?": "uuid",
        "dt?": "date",
        "tm?": "time",
        "dtt?": "datetime",
        "dur?": "duration",
        # arrays / sets / tuples / nesting / unions / refs
        "arr?": "0..9[1,5]",
        "nest?": "string[][]",
        "st?": "int{1,10}",
        "tup?": ["0..9", "10..19"],
        "un?": [["(a+)", "0..9"]],
        "ref?": "#Score",
        "obj?": {"x": "0..9", "y?": "string"},
        # combinators
        "p?": "int", "q?": "int", "m?": "int", "n?": "int",
        "dflt?42": "int",
        "@one": [["p", "q"]],
        "@all": [["m", "n"]],
        "@dep": {"m": ["n"]},
    },
    "@table": {"key": "id", "consistent": {"i": "i"}},
}

SCHEMA = (
    "id string, inherited boolean, b boolean, t boolean, i int, lng long, "
    "rng int, xrng int, enm int, frng double, intg double, s string, "
    "ch string, rx string, b64 string, hx string, uu string, dt string, "
    "tm string, dtt string, dur string, arr array<int>, "
    "nest array<array<string>>, st array<int>, tup array<int>, "
    "un string, ref int, obj struct<x:int,y:string>, "
    "p int, q int, m int, n int, dflt int"
)

CLEAN = (
    "row001", True, True, True, 7, 140737488355327, -10, 50, 999, 1.5, 3.0,
    "any", "chars", "abbc", "SGVsbG8=", "deadBEEF",
    "123e4567-e89b-12d3-a456-426614174000", "2024-01-31", "12:34:56Z",
    "2024-01-31T12:34:56.123+02:00", "P1Y2M3DT4H5M6S",
    [1, 2, 3], [["a"], ["b", "c"]], [3, 1, 2], [5, 15], "aaa", 100,
    (5, None), 1, None, 2, 3, None,
)

# (mutations, expected check_ids) — one negative twin per feature class
NEGATIVES = [
    ({"id": "badid"}, {"id_format"}),
    ({"t": False}, {"t_type"}),
    ({"lng": 140737488355328}, {"lng_range"}),
    ({"rng": 11}, {"rng_range"}),
    ({"xrng": 0}, {"xrng_range"}),
    ({"enm": 2}, {"enm_range"}),
    ({"frng": 0.5}, {"frng_range"}),
    ({"intg": 3.5}, {"intg_range"}),
    ({"ch": "elevenchars"}, {"ch_len_bounds"}),
    ({"rx": "ac"}, {"rx_format"}),
    ({"b64": "not base64!"}, {"b64_format"}),
    ({"hx": "xyz"}, {"hx_format"}),
    ({"uu": "nope"}, {"uu_format"}),
    ({"dt": "2024-1-1"}, {"dt_format"}),
    ({"tm": "12:34"}, {"tm_format"}),
    ({"dtt": "2024-01-31 12:34:56"}, {"dtt_format"}),
    ({"dur": "1Y"}, {"dur_format"}),
    ({"arr": [1, 77, 2]}, {"arr_element_range"}),
    ({"arr": []}, {"arr_len_bounds"}),
    ({"nest": [["a"], None]}, {"nest_element_type"}),
    ({"st": [1, 1, 2]}, {"st_unique_items"}),
    ({"tup": [77, 15]}, {"tup_tuple_types"}),
    ({"tup": [5]}, {"tup_len_bounds", "tup_tuple_types"}),
    ({"un": "b"}, {"un_type"}),
    ({"ref": 101}, {"ref_range"}),
    ({"obj": (55, None)}, {"obj_type"}),
    ({"p": 1, "q": 1}, {"one_p_q"}),
    ({"m": 5, "n": None}, {"all_m_n", "dep_m"}),
    ({"id": None}, {"id_not_null"}),
]


@pytest.fixture(scope="module")
def engine():
    spec = CheckSpec(GOLDEN_SPEC)
    assert spec.check() is True  # the SJOT.check half of the golden test
    return ValidationEngine(spec)


def _cols() -> list[str]:
    # split the DDL on commas OUTSIDE angle brackets (struct<...>)
    out, depth, cur = [], 0, ""
    for ch in SCHEMA:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append(cur)
            cur = ""
        else:
            cur += ch
    out.append(cur)
    return [c.strip().split(" ")[0] for c in out]


def _row(mut: dict) -> tuple:
    cols = _cols()
    base = dict(zip(cols, CLEAN))
    base.update(mut)
    return tuple(base[c] for c in cols)


def test_clean_row_passes_every_feature(spark, engine):
    df = spark.createDataFrame([CLEAN], SCHEMA)
    res = engine.run(df)
    got = [(r.check_id, r.detail) for r in res.violations.collect()]
    assert got == [], got


def test_each_feature_has_a_working_negative(spark, engine):
    rows = [_row(m) for m, _ in NEGATIVES]
    # give every negative row a unique id unless the mutation targets id
    rows = [
        tuple((f"row{100+i:03d}" if j == 0 and "id" not in NEGATIVES[i][0]
               else v) for j, v in enumerate(r))
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    res = engine.run(df)
    got: dict[str, set] = {}
    for r in res.violations.collect():
        got.setdefault(r.key, set()).add(r.check_id)
    for i, (mut, expected) in enumerate(NEGATIVES):
        key = ("badid" if mut.get("id") == "badid"
               else None if "id" in mut and mut["id"] is None
               else f"row{100+i:03d}")
        found = got.get(key, set())
        assert expected <= found, (
            f"negative {i} {mut}: expected {expected}, got {found}")
