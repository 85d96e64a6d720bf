"""Per-row JSON validation (jsonvalidate.py): unit semantics plus
executable verdict-parity against the ACTUAL reference validator under
node — the same documents, the same SJOT schema, SJOT.valid() vs
"no violations for that key" (index.js:64-76). The reference is an
oracle only; no code is copied."""

import json
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

from sjot_spark.jsonvalidate import (
    union_dispatch_index,
    validate_json_column,
)
from sjot_spark.queries import JSON_DOC_SPEC

node = shutil.which("node")

# (key, raw JSON text) — heterogeneous runtime types per row, the case
# fixed-schema columns cannot express
DOCS = [
    (0, '{"id":0,"val":12,"tag":"t1","meta":{"w":3}}'),        # clean int
    (1, '{"id":1,"val":"v12","tag":"t2","meta":{"w":0}}'),     # clean str
    (2, '{"id":2,"val":12.5,"tag":"t3","meta":{"w":25}}'),     # clean float
    (3, '{"id":3,"val":80.25,"tag":"t4","meta":{"w":1}}'),     # >80 -> union
    (4, '{"id":4,"val":"v1000","tag":"t0","meta":{"w":2}}'),   # 4 digits
    (5, '{"id":5,"val":true,"tag":"t1","meta":{"w":3}}'),      # bool -> union
    (6, '{"id":6,"val":7,"meta":{"w":4}}'),                    # tag missing
    (7, '{"id":7,"val":8,"tag":"T9","meta":{"w":5}}'),         # tag format
    (8, '{"id":8,"val":9,"tag":"t1","meta":{"w":29}}'),        # w > 25
    (9, '{"id":9,"val":'),                                     # truncated
    (10, '{"id":10,"val":null,"tag":"t1","meta":{"w":6}}'),    # null -> union
    (11, '{"id":11,"val":[1,2],"tag":"t1","meta":{"w":7}}'),   # array -> union
    (12, '{"id":12,"val":0,"tag":"t1","meta":{"w":8}}'),       # boundary lo
    (13, '{"id":13,"val":80.0,"tag":"t1","meta":{"w":9}}'),    # boundary hi
    (14, '{"id":14,"val":"v0","tag":"t1","meta":{}}'),         # w missing
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, doc string")


def _violations(spark, docs_df):
    rows = validate_json_column(
        docs_df, "doc", JSON_DOC_SPEC, key="doc_id").collect()
    out = {}
    for r in rows:
        out.setdefault(int(r.key), set()).add(r.check_id)
    return out


def test_violation_classes(spark, docs_df):
    v = _violations(spark, docs_df)
    assert set(v.get(3, ())) == {"val_union"}
    assert set(v.get(4, ())) == {"val_union"}
    assert set(v.get(5, ())) == {"val_union"}
    assert set(v.get(6, ())) == {"tag_required"}
    assert set(v.get(7, ())) == {"tag_format"}
    assert set(v.get(8, ())) == {"meta.w_range"}
    assert set(v.get(9, ())) == {"doc_parse"}
    assert set(v.get(10, ())) == {"val_union"}
    assert set(v.get(11, ())) == {"val_union"}
    assert set(v.get(14, ())) == {"meta.w_required"}
    for k in (0, 1, 2, 12, 13):
        assert k not in v, f"doc {k} should be clean: {v.get(k)}"


def test_union_dispatch_first_match_order(spark):
    # overlapping members: 1..10 ⊂ 0.. — first match in declaration
    # order wins, exactly the reference's try-each-in-order
    # (index.js:793-846)
    spec = {"@root": "#T", "T": {"val": [["1..10", "0.."]]}}
    df = spark.createDataFrame(
        [(1, '{"val":5}'), (2, '{"val":20}'), (3, '{"val":-1}'),
         (4, '{}'), (5, '{"val":"x"}')],
        "doc_id long, doc string")
    got = {int(r.key): r.member for r in
           union_dispatch_index(df, "doc", spec, "val", "doc_id").collect()}
    assert got == {1: 1, 2: 2, 3: 0, 4: -1, 5: 0}


def test_scalar_and_array_members(spark):
    # union over string / typed array — runtime tag dispatch incl.
    # per-element checks on the variant array
    spec = {"@root": "#T", "T": {"v": [["(a+)", "1..5[2,3]"]]}}
    df = spark.createDataFrame(
        [(1, '{"v":"aaa"}'), (2, '{"v":[1,2]}'), (3, '{"v":[1,9]}'),
         (4, '{"v":[1]}'), (5, '{"v":[2,3,4]}'), (6, '{"v":"b"}')],
        "doc_id long, doc string")
    viol = {int(r.key) for r in validate_json_column(
        df, "doc", spec, key="doc_id").collect()}
    assert viol == {3, 4, 6}


@pytest.mark.skipif(node is None, reason="node not installed")
def test_reference_verdict_parity(spark, docs_df):
    driver = r"""
const SJOT = require("/root/reference/index.js");
const input = JSON.parse(require("fs").readFileSync(0, "utf8"));
const out = input.docs.map(raw => {
  try { return SJOT.valid(JSON.parse(raw), "#JDoc", input.schema); }
  catch (e) { return false; }
});
console.log(JSON.stringify(out));
"""
    schema = {k: v for k, v in JSON_DOC_SPEC.items() if k != "@table"}
    p = subprocess.run(
        [node, "-e", driver],
        input=json.dumps(
            {"docs": [d for _, d in DOCS], "schema": schema}).encode(),
        capture_output=True, check=True)
    ref = json.loads(p.stdout)
    bad = set(_violations(spark, docs_df))
    ours = [k not in bad for k, _ in DOCS]
    assert ours == ref, list(zip([k for k, _ in DOCS], ours, ref))


def test_propsets_over_json_presence(spark):
    spec = {
        "@root": "#T",
        "T": {
            "p?": "number", "q?": "number", "m?": "number",
            "n?": "number", "d?": "number", "e?": "number",
            "@one": [["p", "q"]],
            "@dep": {"d": ["e"]},
        },
    }
    df = spark.createDataFrame(
        [(1, '{"p":1}'), (2, '{"p":1,"q":2}'), (3, '{}'),
         (4, '{"q":2,"d":1,"e":2}'), (5, '{"p":1,"d":1}')],
        "doc_id long, doc string")
    rows = validate_json_column(df, "doc", spec, key="doc_id").collect()
    got = {}
    for r in rows:
        got.setdefault(int(r.key), set()).add(r.check_id)
    assert 1 not in got
    assert got[2] == {"one_0"}          # both of @one present
    assert got[3] == {"one_0"}          # neither present
    assert 4 not in got                 # q + complete @dep
    assert got[5] == {"dep_d"}          # d without e


def test_column_backed_validation_stays_in_codegen(spark, tmp_path):
    """The at-scale shape — JSON read from storage as a string column —
    must survive whole-stage codegen with fallback DISABLED (the
    variant parse is CSE'd; janino limits are only hit when a huge
    doc-SYNTHESIS expression is fused into every check, as in the
    driver oracle query, which falls back to interpreted eval and is
    correctness-only)."""
    df = spark.createDataFrame(DOCS, "doc_id long, doc string")
    p = str(tmp_path / "jv")
    df.write.parquet(p)
    col_backed = spark.read.parquet(p)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        rows = validate_json_column(
            col_backed, "doc", JSON_DOC_SPEC, key="doc_id").collect()
        assert {r.check_id for r in rows} >= {"doc_parse", "val_union"}
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


def test_autovalidate_flags_shape_outliers(spark):
    """infer-then-validate: rows deviating from the sampled shape
    surface as typed violations (snapSJOT unification feeding the
    variant validator)."""
    from sjot_spark.jsonvalidate import autovalidate_json_column

    clean = [(i, '{"a":%d,"b":"x%d"}' % (i, i)) for i in range(50)]
    outliers = [
        (100, '{"a":"not-a-number","b":"y"}'),   # a: wrong runtime type
        (101, '{"b":"z"}'),                      # a missing
        (102, '{"a":1,"b":'),                    # unparseable
    ]
    df = spark.createDataFrame(clean + outliers,
                               "doc_id long, doc string").coalesce(1)
    spec, viol = autovalidate_json_column(
        df, "doc", key="doc_id", sample_rows=50)
    got = {}
    for r in viol.collect():
        got.setdefault(int(r.key), set()).add(r.check_id)
    assert all(k >= 100 for k in got), got
    assert any("a_" in c for c in got.get(100, ())), got
    assert any("required" in c for c in got.get(101, ())), got
    assert got.get(102) == {"doc_parse"}


def test_null_document_is_absent_not_invalid(spark):
    """A SQL-NULL JSON document yields NO violations — neither a parse
    violation nor per-path noise (r4 fix: path checks are gated on
    document presence; DuckDB twin: json_valid(NULL) is NULL, so NULL
    docs match no oracle predicate)."""
    spec = {"@root": "#T", "T": {"k": "0..79"}}
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, None), (3, '{"k": 99}'), (4, '{nope')],
        "doc_id long, doc string")
    rows = validate_json_column(df, "doc", spec, key="doc_id").collect()
    v = {}
    for r in rows:
        v.setdefault(int(r.key), set()).add(r.check_id)
    assert v == {3: {"k_range"}, 4: {"doc_parse"}}
    assert 2 not in v  # absent, not invalid


EMBEDDED_DOCS = [
    (1, '{"k": 5, "p": {"@sjot": {"@root": "string"}, "v": 1}}'),
    (2, '{"k": 5, "p": {"v": 1}}'),
    (3, '{"k": 5}'),
    (4, '{"k": 5, "p": 7}'),
]


def test_embedded_sjot_surfaces_typed_violation(spark):
    """A value typed `any` carrying an embedded runtime @sjot schema
    (reference index.js:111-131) is NOT silently accepted: it raises
    the typed *_embedded_sjot violation (a compiled fixed plan cannot
    load per-row schemas; route such rows to run_dispatched)."""
    spec = {"@root": "#T", "T": {"k": "0..79", "p?": "any"}}
    df = spark.createDataFrame(EMBEDDED_DOCS, "doc_id long, doc string")
    rows = validate_json_column(df, "doc", spec, key="doc_id").collect()
    got = {(int(r.key), r.check_id) for r in rows}
    assert got == {(1, "p_embedded_sjot")}

    # root typed `any`: the whole document is the value
    root_any = {"@root": "any"}
    rows2 = validate_json_column(
        df, "doc", root_any, key="doc_id").collect()
    assert {(int(r.key), r.check_id) for r in rows2} == set()
    carrier = spark.createDataFrame(
        [(9, '{"@sjot": {"@root": "string"}, "v": 1}')],
        "doc_id long, doc string")
    rows3 = validate_json_column(
        carrier, "doc", root_any, key="doc_id").collect()
    assert {(int(r.key), r.check_id) for r in rows3} == {
        (9, "root_embedded_sjot")}


@pytest.mark.skipif(node is None, reason="node not installed")
def test_embedded_sjot_reference_cross_check(spark):
    """Node cross-check of the reference's ACTUAL embedded-@sjot
    behavior (index.js:111-131): it loads and applies the embedded
    schema at runtime. Where the embedded schema REJECTS its carrier
    the reference returns invalid and our typed violation agrees; where
    it ACCEPTS, the reference returns valid while we still flag — the
    disclosed design limit of a compiled fixed plan (COVERAGE.md E6),
    surfaced as a typed row instead of a silent wrong 'pass'."""
    driver = r"""
const SJOT = require("/root/reference/index.js");
const docs = JSON.parse(require("fs").readFileSync(0, "utf8"));
console.log(JSON.stringify(docs.map(raw => {
  try { return SJOT.valid(JSON.parse(raw), "any", null); }
  catch (e) { return false; }
})));
"""
    cases = [
        # embedded schema rejects its carrier (object vs "string")
        '{"@sjot": {"@root": "string"}, "v": 1}',
        # embedded schema accepts its carrier
        '{"@sjot": {"@root": "#O", "O": {"v": "1..5"}}, "v": 3}',
        # no @sjot at all -> plain any, valid
        '{"v": 1}',
    ]
    p = subprocess.run(
        [node, "-e", driver], input=json.dumps(cases).encode(),
        capture_output=True, check=True)
    assert json.loads(p.stdout) == [False, True, True]

    df = spark.createDataFrame(
        list(enumerate(cases)), "doc_id long, doc string")
    flagged = {int(r.key) for r in validate_json_column(
        df, "doc", {"@root": "any"}, key="doc_id").collect()}
    # we flag BOTH @sjot carriers (0 agrees with the reference's
    # reject; 1 is the disclosed flag-instead-of-validate divergence)
    # and agree on the plain-any doc
    assert flagged == {0, 1}


def test_embedded_sjot_in_nested_any(spark):
    """`any` nested inside arrays / tuples / unions also rejects
    @sjot carriers (r4 review fix): the violation surfaces under the
    enclosing node's check id (*_array / *_tuple / *_union) because
    the carrier fails the `any` member predicate."""
    carrier = '{"@sjot": {"@root": "string"}, "v": 1}'
    spec = {"@root": "#T", "T": {"a?": "any[]", "u?": [["1..5", "any"]]}}
    df = spark.createDataFrame(
        [(1, f'{{"a": [1, {carrier}]}}'),      # carrier as array item
         (2, '{"a": [1, {"v": 2}, "x"]}'),     # plain objects fine
         (3, f'{{"u": {carrier}}}'),           # carrier via union any
         (4, '{"u": {"v": 3}}'),               # union any accepts
         (5, '{"u": 4}')],                     # union first member
        "doc_id long, doc string")
    got = {}
    for r in validate_json_column(df, "doc", spec, key="doc_id").collect():
        got.setdefault(int(r.key), set()).add(r.check_id)
    assert got == {1: {"a_array"}, 3: {"u_union"}}


def test_nested_object_props_validated_in_arrays_and_unions(spark):
    """r4: objects nested inside arrays / union members get FULL
    depth-bounded prop validation (required presence AND per-prop
    types), not just presence — matching the reference's unbounded
    recursion (index.js:760-909) down to OBJECT_RECURSION_DEPTH."""
    spec = {
        "@root": "#T",
        "T": {"items?": "#Item[]", "u?": [["1..5", {"w": "0..9"}]]},
        "Item": {"id": "0..", "name?": "(n\\d+)"},
    }
    df = spark.createDataFrame(
        [(1, '{"items": [{"id": 1, "name": "n1"}, {"id": 2}]}'),  # clean
         (2, '{"items": [{"id": -1}]}'),          # id out of range
         (3, '{"items": [{"name": "n1"}]}'),      # id missing
         (4, '{"items": [{"id": 1, "name": "X"}]}'),  # name format
         (5, '{"u": {"w": 3}}'),                  # union object ok
         (6, '{"u": {"w": 77}}'),                 # union object w bad
         (7, '{"u": 4}')],                        # union scalar ok
        "doc_id long, doc string")
    got = {}
    for r in validate_json_column(df, "doc", spec, key="doc_id").collect():
        got.setdefault(int(r.key), set()).add(r.check_id)
    assert got == {2: {"items_array"}, 3: {"items_array"},
                   4: {"items_array"}, 6: {"u_union"}}


def test_recursive_spec_terminates_with_depth_bound(spark):
    """A self-referential spec (tree type) compiles to a FINITE
    expression: recursion stops at OBJECT_RECURSION_DEPTH and deeper
    objects are checked shallowly (tag + required presence)."""
    spec = {"@root": "#N", "N": {"v": "0..9", "kids?": "#N[]"}}
    deep_ok = '{"v": 1, "kids": [{"v": 2, "kids": [{"v": 3}]}]}'
    deep_bad = '{"v": 1, "kids": [{"v": 2, "kids": [{"v": 99}]}]}'
    df = spark.createDataFrame(
        [(1, deep_ok), (2, deep_bad)], "doc_id long, doc string")
    got = {int(r.key) for r in validate_json_column(
        df, "doc", spec, key="doc_id").collect()}
    assert 1 not in got
    assert 2 in got  # depth-2 nesting still within the bound


@pytest.mark.skipif(node is None, reason="node not installed")
def test_nested_object_reference_parity(spark):
    """Node cross-check: verdicts for array-of-objects match the
    actual reference validator."""
    schema = {"T": {"items?": "#Item[]"},
              "Item": {"id": "0..", "name?": "(n\\d+)"}}
    docs = ['{"items": [{"id": 1, "name": "n1"}]}',
            '{"items": [{"id": -1}]}',
            '{"items": [{"name": "n1"}]}',
            '{"items": [{"id": 1, "name": "X"}]}',
            '{"items": []}',
            '{}']
    driver = r"""
const SJOT = require("/root/reference/index.js");
const input = JSON.parse(require("fs").readFileSync(0, "utf8"));
console.log(JSON.stringify(input.docs.map(raw => {
  try { return SJOT.valid(JSON.parse(raw), "#T", input.schema); }
  catch (e) { return false; }
})));
"""
    p = subprocess.run(
        [node, "-e", driver],
        input=json.dumps({"docs": docs, "schema": schema}).encode(),
        capture_output=True, check=True)
    ref = json.loads(p.stdout)
    spec = {"@root": "#T", **schema}
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, doc string")
    bad = {int(r.key) for r in validate_json_column(
        df, "doc", spec, key="doc_id").collect()}
    ours = [i not in bad for i in range(len(docs))]
    assert ours == ref, list(zip(docs, ours, ref))


# ------------------------- r5: @if/@then forced-member union dispatch

IFTHEN_SPEC = {
    "@root": "#T",
    "T": {"v": [[
        {"@if": "kind", "@then": {"kind": "string", "n": "1..10"}},
        {"other": "boolean"},
    ]]},
}
IFTHEN_DOCS = [
    (0, '{"v": {"kind": "x", "n": 5}}'),          # @then validates
    (1, '{"v": {"kind": "x", "n": 50, "other": true}}'),  # forced: @then
    #    FAILS and member B must NOT rescue it (reference rejects)
    (2, '{"v": {"kind": 5, "other": true}}'),     # @if prop wrong type ->
    #    discriminator does not fire -> falls through to B -> valid
    (3, '{"v": {"other": true}}'),                # no @if prop -> B
    (4, '{"v": {"neither": 1}}'),                 # nothing matches
    (5, '{"v": {"kind": "x"}}'),                  # @then: n required missing
]


def test_union_if_then_forced_member(spark):
    """An object matching a member's @if discriminator is validated by
    that member's @then ONLY — no fallback to other members
    (index.js:878-900: the t/v/d tables are consulted before try-all
    and a matching discriminator returns @then's verdict)."""
    df = spark.createDataFrame(IFTHEN_DOCS, "doc_id long, doc string")
    bad = {int(r.key) for r in validate_json_column(
        df, "doc", IFTHEN_SPEC, key="doc_id").collect()}
    assert bad == {1, 4, 5}


@pytest.mark.skipif(node is None, reason="node not installed")
def test_union_if_then_reference_cross_check(spark):
    """The exact divergence ADVICE r4 #2 named: a doc that matches A's
    @if but only validates against B is REJECTED by the reference —
    and now by the engine."""
    driver = r"""
const SJOT = require("/root/reference/index.js");
const input = JSON.parse(require("fs").readFileSync(0, "utf8"));
console.log(JSON.stringify(input.docs.map(raw => {
  try { return SJOT.valid(JSON.parse(raw), "#T", input.schema); }
  catch (e) { return false; }
})));
"""
    schema = {k: v for k, v in IFTHEN_SPEC.items() if k != "@root"}
    p = subprocess.run(
        [node, "-e", driver],
        input=json.dumps(
            {"docs": [d for _, d in IFTHEN_DOCS], "schema": schema},
        ).encode(),
        capture_output=True, check=True)
    ref = json.loads(p.stdout)
    df = spark.createDataFrame(IFTHEN_DOCS, "doc_id long, doc string")
    bad = {int(r.key) for r in validate_json_column(
        df, "doc", IFTHEN_SPEC, key="doc_id").collect()}
    ours = [k not in bad for k, _ in IFTHEN_DOCS]
    assert ours == ref, list(zip([k for k, _ in IFTHEN_DOCS], ours, ref))


def test_union_dispatch_index_if_then(spark):
    """Dispatch reporting under forced-member semantics: a matching
    discriminator is terminal — member index if @then validates, 0 if
    it fails (never the fall-through member)."""
    df = spark.createDataFrame(IFTHEN_DOCS, "doc_id long, doc string")
    got = {int(r.key): r.member for r in union_dispatch_index(
        df, "doc", IFTHEN_SPEC, "v", "doc_id").collect()}
    assert got == {0: 1, 1: 0, 2: 2, 3: 2, 4: 0, 5: 0}


# --------------------------------- r5: caller-tunable object depth

DEPTH_SPEC = {
    "@root": "#T",
    "T": {"xs": "#L1[]"},
    "L1": {"a": "#L2"}, "L2": {"b": "#L3"}, "L3": {"c": "#L4"},
    "L4": {"n": "1..5"},
}
DEPTH_DOCS = [
    (0, '{"xs": [{"a": {"b": {"c": {"n": 3}}}}]}'),     # clean
    (1, '{"xs": [{"a": {"b": {"c": {"n": "xx"}}}}]}'),  # L4 type wrong
    (2, '{"xs": [{"a": {"b": {"c": {}}}}]}'),           # L4 n missing
]


def test_object_depth_boundary_and_override(spark):
    """The depth bound is caller-tunable (validate_json_column
    object_depth). At the DEFAULT depth 3, an object 4 levels below a
    value (array item -> a -> b -> c) is checked shallowly: required
    presence still applies (doc 2 caught) but per-prop TYPES do not
    (doc 1 passes — the precisely-characterized divergence from the
    reference's unbounded recursion). At object_depth=4 the type check
    reaches L4 and doc 1 is caught, matching the reference."""
    df = spark.createDataFrame(DEPTH_DOCS, "doc_id long, doc string")
    bad_default = {int(r.key) for r in validate_json_column(
        df, "doc", DEPTH_SPEC, key="doc_id").collect()}
    assert bad_default == {2}  # presence yes, type no at depth 4
    bad_deep = {int(r.key) for r in validate_json_column(
        df, "doc", DEPTH_SPEC, key="doc_id", object_depth=4).collect()}
    assert bad_deep == {1, 2}


@pytest.mark.skipif(node is None, reason="node not installed")
def test_object_depth4_reference_parity(spark):
    """Node cross-check at depth 4: with object_depth=4 the engine's
    verdicts match the reference's unbounded recursion on the depth
    fixture."""
    driver = r"""
const SJOT = require("/root/reference/index.js");
const input = JSON.parse(require("fs").readFileSync(0, "utf8"));
console.log(JSON.stringify(input.docs.map(raw => {
  try { return SJOT.valid(JSON.parse(raw), "#T", input.schema); }
  catch (e) { return false; }
})));
"""
    schema = {k: v for k, v in DEPTH_SPEC.items() if k != "@root"}
    p = subprocess.run(
        [node, "-e", driver],
        input=json.dumps(
            {"docs": [d for _, d in DEPTH_DOCS], "schema": schema},
        ).encode(),
        capture_output=True, check=True)
    ref = json.loads(p.stdout)
    df = spark.createDataFrame(DEPTH_DOCS, "doc_id long, doc string")
    bad = {int(r.key) for r in validate_json_column(
        df, "doc", DEPTH_SPEC, key="doc_id", object_depth=4).collect()}
    ours = [k not in bad for k, _ in DEPTH_DOCS]
    assert ours == ref, list(zip([k for k, _ in DEPTH_DOCS], ours, ref))


def test_nested_union_member_propsets(spark):
    """r5: presence sets (@one here) apply to objects nested inside
    VALUES (union members / array items), not just root-path objects —
    they are presence-only so they hold even below the depth bound."""
    spec = {
        "@root": "#U",
        "U": {"box": [[
            {"p?": "number", "q?": "number", "@one": [["p", "q"]],
             "tagged": "boolean"},
            "string",
        ]]},
    }
    df = spark.createDataFrame(
        [(0, '{"box": {"tagged": true, "p": 1}}'),        # ok
         (1, '{"box": {"tagged": true, "p": 1, "q": 2}}'),  # @one violated
         (2, '{"box": "s"}'),                             # scalar member
         (3, '{"box": {"tagged": true}}')],               # @one: none
        "doc_id long, doc string")
    bad = {int(r.key) for r in validate_json_column(
        df, "doc", spec, key="doc_id").collect()}
    assert bad == {1, 3}


def test_classify_violations_routes_carriers(spark):
    """classify_violations tags embedded-@sjot carrier rows
    'unvalidatable' (route to run_dispatched, don't reject the data)
    and every other violation 'invalid'; the base 4-column contract
    is unchanged."""
    from sjot_spark.jsonvalidate import classify_violations

    spec = {"@root": "#T", "T": {"k": "0..79", "p?": "any"}}
    df = spark.createDataFrame(
        [(1, '{"k": 5, "p": {"@sjot": {"@root": "string"}, "v": 1}}'),
         (2, '{"k": 999}'),
         (3, 'not json')],
        "doc_id long, doc string")
    vdf = classify_violations(
        validate_json_column(df, "doc", spec, key="doc_id"))
    assert vdf.columns == ["key", "partition", "check_id", "detail",
                           "verdict_class"]
    got = {(int(r.key), r.check_id, r.verdict_class)
           for r in vdf.collect()}
    assert got == {
        (1, "p_embedded_sjot", "unvalidatable"),
        (2, "k_range", "invalid"),
        (3, "doc_parse", "invalid"),
    }
