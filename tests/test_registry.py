"""Schema sets / URI#name cross-schema references (SpecRegistry —
the sjot_reftype/sjot_load analog, /root/reference/index.js:1102-1191),
including executable node parity against the actual reference run on
the same schema set."""

import json
import shutil
import subprocess

import pytest

from sjot_spark.errors import SpecError
from sjot_spark.spec.registry import SpecRegistry
from sjot_spark.spec.spec import CheckSpec

TYPES_SCHEMA = {
    "@id": "https://example.org/types",
    "@root": "#Score",
    "Score": "0..100",
    "Tag": "(t\\d+)",
    "Bundle": {"score": "#Score", "tag?": "#Tag"},  # spec-local refs
}

MAIN_SCHEMA = {
    "@id": "https://example.org/main",
    "@root": "#Row",
    "Row": {
        "k": "string",
        "sc?": "https://example.org/types#Score",
        "tg?": "https://example.org/types#Tag",
        "rt?": "https://example.org/types#",        # URI# = remote root
    },
    "@table": {"key": "k"},
}


def make_registry():
    reg = SpecRegistry()
    reg.add(TYPES_SCHEMA)
    return reg, reg.add(MAIN_SCHEMA)


def test_cross_schema_refs_resolve_and_check():
    reg, main = make_registry()
    assert reg.check() is True
    t = main.resolve("https://example.org/types#Score")
    from sjot_spark.spec.typestr import Range
    assert isinstance(t, Range)
    # URI# resolves to the remote schema's ROOT (index.js:1127-1129)
    assert isinstance(main.resolve("https://example.org/types#"), Range)


def test_remote_object_keeps_its_home_namespace():
    """A borrowed object type's internal #refs must resolve in ITS
    schema, not the borrower's (qualify rewrite)."""
    reg, main = make_registry()
    bundle = main.resolve("https://example.org/types#Bundle")
    from sjot_spark.spec.typestr import ObjectT, Ref
    assert isinstance(bundle, ObjectT)
    refs = {p.name: p.type for p in bundle.props}
    assert isinstance(refs["score"], Ref)
    assert refs["score"].name == "https://example.org/types#Score"
    # and that qualified ref resolves from the borrowing spec
    assert main.resolve(refs["score"].name)


def test_unknown_uri_uses_loader_and_caches():
    calls = []

    def loader(uri):
        calls.append(uri)
        return TYPES_SCHEMA

    reg = SpecRegistry(loader=loader)
    main = reg.add(MAIN_SCHEMA)
    main.resolve("https://example.org/types#Score")
    main.resolve("https://example.org/types#Tag")
    assert calls == ["https://example.org/types"]  # cached after one load


def test_unknown_uri_without_loader_rejected():
    reg = SpecRegistry()
    main = reg.add(MAIN_SCHEMA)
    with pytest.raises(SpecError, match="unknown schema"):
        main.resolve("https://example.org/types#Score")


def test_cross_schema_ref_without_registry_rejected():
    spec = CheckSpec({"@root": "#R", "R": {"k": "https://x#T"},
                      "@table": {}})
    with pytest.raises(SpecError, match="SpecRegistry"):
        spec.resolve("https://x#T")


def test_loader_id_mismatch_rejected():
    """A loader answering with a different @id than requested must fail
    with a clear SpecError BEFORE polluting the set, every time."""
    calls = []

    def loader(uri):
        calls.append(uri)
        return {"@id": "https://example.org/other", "Score": "0..9"}

    reg = SpecRegistry(loader=loader)
    main = reg.add(MAIN_SCHEMA)
    for _ in range(2):
        with pytest.raises(SpecError, match="loader returned schema"):
            main.resolve("https://example.org/types#Score")
    assert calls == ["https://example.org/types"] * 2
    # the mismatched schema must NOT have been registered
    assert "https://example.org/other" not in reg._by_id


def test_duplicate_id_and_spaghetti_rejected():
    reg, _ = make_registry()
    with pytest.raises(SpecError, match="duplicate"):
        reg.add(TYPES_SCHEMA)
    reg2 = SpecRegistry()
    reg2.add({"@id": "u", "@root": "#A", "A": "#B", "B": "0..9"})
    with pytest.raises(SpecError, match="spaghetti"):
        reg2.resolve("u#A")


def test_engine_validates_through_cross_schema_refs(spark):
    reg, main = make_registry()
    from sjot_spark.engine import ValidationEngine

    eng = ValidationEngine(main)
    df = spark.createDataFrame(
        [("ok", 50, "t1", 100), ("bad", 101, "nope", -1)],
        "k string, sc int, tg string, rt int",
    )
    viol = {}
    for r in eng.run(df, persist_violations=False).violations.collect():
        viol.setdefault(r.key, set()).add(r.check_id)
    assert viol == {"bad": {"sc_range", "tg_format", "rt_range"}}


node = shutil.which("node")


@pytest.mark.skipif(node is None, reason="node not installed")
def test_schema_set_parity_with_reference():
    """The actual reference, given the same two-schema set, must agree
    on every verdict for values typed by cross-schema references."""
    # SJOT object props are required by default and @final is not set,
    # so per-prop verdicts are probed directly on the referenced types
    sjot_types = {"@id": "https://example.org/types",
                  "Score": "0..100", "Tag": "(t\\d+)"}
    cases = [
        ("https://example.org/types#Score", 50, True),
        ("https://example.org/types#Score", 101, False),
        ("https://example.org/types#Score", -1, False),
        ("https://example.org/types#Tag", "t1", True),
        ("https://example.org/types#Tag", "nope", False),
    ]
    driver = r"""
const SJOT = require("/root/reference/index.js");
const cases = JSON.parse(require("fs").readFileSync(0, "utf8"));
const out = cases.map(c => {
  try { return SJOT.valid(c.data, c.type, c.schemas); }
  catch (e) { return false; }
});
console.log(JSON.stringify(out));
"""
    payload = [
        {"data": v, "type": t, "schemas": [sjot_types]}
        for t, v, _ in cases
    ]
    p = subprocess.run([node, "-e", driver],
                       input=json.dumps(payload).encode(),
                       capture_output=True, check=True)
    ref_verdicts = json.loads(p.stdout)
    assert ref_verdicts == [ok for _, _, ok in cases]

    # our side: the engine verdicts for the same values through the
    # same cross-schema references (checked in
    # test_engine_validates_through_cross_schema_refs) — here assert
    # the registry resolves each probed type to the same semantics
    reg = SpecRegistry()
    reg.add(TYPES_SCHEMA)
    from sjot_spark.spec.pyeval import _scalar_ok

    for t, v, ok in cases:
        node_t = reg.resolve(t)
        dtype = "double" if isinstance(v, (int, float)) else "string"
        assert _scalar_ok(node_t, v, dtype, reg.resolve) is ok, (t, v)
