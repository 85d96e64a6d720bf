"""snapSJOT-parity JSON inference: our unification vs the ACTUAL
reference snapsjot.js run under node on the same values, plus the
cross-row column inference and its self-acceptance."""

import json
import shutil
import subprocess

import pytest

from sjot_spark import jsoninfer

node = shutil.which("node")

# values chosen to exercise every unification rule: heterogeneous
# arrays (atom unions), object merging w/ optionality, distinct
# objects staying unions, nested arrays, union-of-arrays collapse,
# metacharacter property names, nulls
CASES = [
    True,
    3.14,
    "hello",
    None,
    [],
    [1, 2, 3],
    [1, "two", 3],
    [1, "two", None, True],
    {"a": 1, "b": "x"},
    [{"a": 1}, {"a": 2, "b": "x"}],           # shared prop -> merge, b?
    [{"a": 1}, {"z": "w"}],                   # distinct -> union
    [{"a": 1}, {"a": 2}, {"a": 3, "c": []}],  # cascade merge
    [[1, 2], ["a"], []],                      # union of arrays
    [[1, 2], [3, 4]],
    {"weird.name[0]": 1, "p?": 2},            # regex-escaped props
    {"nested": {"x": [1, "y"]}},
    [{"a": [1]}, {"a": ["s"]}],               # array-item union inside merge
    [None, {"a": 1}],
    [{"a": 1}, "x", {"a": 2}],  # equal objects merge-cascade to union END
    [{"a": 1}, "x", {"a": 1}, True, {"a": 2}],
]


@pytest.mark.skipif(node is None, reason="node not installed")
def test_convert_matches_reference_snapsjot():
    driver = r"""
const fs = require("fs");
const code = fs.readFileSync("/root/reference/dev/snapsjot.js", "utf8");
const snapSJOT = new Function(code + "; return snapSJOT;")();
const cases = JSON.parse(fs.readFileSync(0, "utf8"));
console.log(JSON.stringify(cases.map(c => snapSJOT.convert(c))));
"""
    p = subprocess.run([node, "-e", driver],
                       input=json.dumps(CASES).encode(),
                       capture_output=True, check=True)
    ref = json.loads(p.stdout)
    for case, expected in zip(CASES, ref):
        got = jsoninfer.convert_value(case)
        assert got == expected, (
            f"divergence for {case!r}:\n ours: {got}\n ref:  {expected}")


def test_cross_row_unification_equals_array_element_unification():
    rows = [{"a": 1}, {"a": 2, "b": "x"}, {"z": [1, 2]}]
    unified = jsoninfer.convert(rows[0])
    for r in rows[1:]:
        unified = jsoninfer.unify(unified, jsoninfer.convert(r))
    as_array = jsoninfer.convert(rows)  # [elem_type] or [union]
    elem = as_array[0] if len(as_array) == 1 else as_array
    assert unified == elem or [unified] == as_array


def test_infer_json_spec_from_events_props(spark):
    df = spark.createDataFrame(
        [('{"k": 1, "tag": "x"}',), ('{"k": 2}',),
         ('{"k": 3, "extra": [1, 2]}',), ("not json",), (None,)],
        "props string")
    spec = jsoninfer.infer_json_spec(df, "props", type_name="Props")
    root = spec.doc["Props"]
    assert root["k"] == "number"          # present in every valid row
    assert root["tag?"] == "string"       # missing in some -> optional
    assert root["extra?"] == ["number"]
    assert root["@final"] is True
    assert spec.check() is True


def test_infer_json_spec_accepts_real_events_table(spark):
    import copy

    docs = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    spec = jsoninfer.infer_json_spec(docs, "props", type_name="Props")
    assert spec.check() is True
    root = spec.doc["Props"]
    assert isinstance(root, dict)
    # self-acceptance (the snapSJOT invariant): unifying the inferred
    # type with any sampled value must be a NO-OP — the value is
    # already covered. deepcopy because unify mutates union lists.
    sampled = [r[0] for r in docs.select("props")
               .where("props IS NOT NULL").limit(200).collect()]
    assert sampled
    for raw in sampled:
        v = json.loads(raw)
        unified = jsoninfer.unify(copy.deepcopy(root),
                                  jsoninfer.convert(v))
        assert unified == root, f"value {v} not covered by inferred {root}"