"""Golden end-to-end test — the engine analog of the reference's one
comprehensive test (/root/reference/dev/test.js): one spec covering
the check classes x one table with exactly one seeded corruption per
class; assert the exact violation rows and per-partition verdicts,
and that `tokens` passes through byte-identical (per-row invariant).
"""

import pytest

from sjot_spark.engine import ValidationEngine
from sjot_spark.fixtures import (
    SEQUENCE_SPEC, expected_violation_sites, make_allowed_sources,
    make_sequences,
)

N = 1000


@pytest.fixture(scope="module")
def result(spark):
    df = make_sequences(spark, N, violations=True)
    eng = ValidationEngine(SEQUENCE_SPEC)
    res = eng.run(df, dims={"allowed_sources": make_allowed_sources(spark)})
    res.violations.cache()
    return df, res


def test_violations_exactly_match_seeded_sites(result):
    _, res = result
    got = {}
    for r in res.violations.collect():
        got.setdefault(r.check_id, set()).add(r.key)
    exp_sites = expected_violation_sites(N)

    def doc(i):
        return f"doc{i:012d}"

    # row-level checks: violation key = doc_id of the corrupted row
    # (doc_id corruptions change the key itself)
    exp = {
        "tokens_element_range": {doc(i) for i in exp_sites["tokens_element_range"]},
        "tokens_not_null": {doc(i) for i in exp_sites["tokens_not_null"]},
        "tokens_len_bounds": {doc(i) for i in exp_sites["tokens_len_bounds"]},
        "n_tok_consistency": {doc(i) for i in exp_sites["n_tok_consistency"]},
        "n_tok_range": {doc(i) for i in exp_sites["n_tok_range"]},
        "doc_id_format": {"DOC-xyz"},
        # unique: one violation per duplicated VALUE; sites b and cross
        # both took a's doc_id, so the duplicated value is doc(a)
        "doc_id_unique": {doc(exp_sites["doc_id_unique"][0])},
        "source_ref": {doc(i) for i in exp_sites["source_ref"]},
    }
    assert got == exp, f"diff: {set(got) ^ set(exp)} / " + str({
        k: (got.get(k), exp.get(k)) for k in set(got) | set(exp)
        if got.get(k) != exp.get(k)
    })


def test_violation_detail_shape(result):
    _, res = result
    row = res.violations.where("check_id = 'tokens_element_range'").first()
    # SJOT-shaped diagnostic: `$.path value v is not of type t required by tp`
    assert row.detail.startswith("$.tokens value ")
    assert "is not of type 0..50256 required by /@root/Sequence/tokens[]" in row.detail
    row = res.violations.where("check_id = 'n_tok_range'").orderBy("key").first()
    assert "is not of type 1..8192" in row.detail


def test_verdicts_per_partition(result):
    _, res = result
    verd = {r.partition: r for r in res.verdicts.collect()}
    assert set(verd) >= {"web", "books"}  # skewed gen covers the big sources
    bad_parts = {
        r.partition for r in res.violations.collect()
    }
    for p, r in verd.items():
        assert r.verdict == ("fail" if p in bad_parts else "pass"), p
    # n_rows sums to N
    assert sum(r.n_rows for r in verd.values()) == N


def test_tokens_pass_through_unmutated(result, spark):
    df, res = result
    # per-row invariant: flags output carries every input row (incl.
    # tokens) byte-identical — compare multiset fingerprints, which is
    # robust to the seeded duplicate doc_ids
    from pyspark.sql import functions as F

    def fingerprint(d):
        h = F.xxhash64("doc_id", "tokens", "n_tok", "source")
        return d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(h.cast("decimal(38,0)")).alias("s"),
            F.expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source))").alias("x"),
        ).first()

    assert fingerprint(df) == fingerprint(
        res.flags.select("doc_id", "tokens", "n_tok", "source")
    )


def test_clean_table_all_pass(spark):
    df = make_sequences(spark, 500, violations=False)
    eng = ValidationEngine(SEQUENCE_SPEC)
    res = eng.run(df, dims={"allowed_sources": make_allowed_sources(spark)})
    assert res.violations.count() == 0
    assert res.passed() is True
    assert all(r.verdict == "pass" for r in res.verdicts.collect())


def test_approx_unique_metrics(spark):
    df = make_sequences(spark, 500, violations=False)
    eng = ValidationEngine(SEQUENCE_SPEC)
    m = eng.approx_unique_metrics(df)
    assert m["rows"] == 500
    # HLL++ default rsd=5%
    assert abs(m["approx_distinct_doc_id"] - 500) <= 50


def test_repair_is_separate_and_fills_defaults(spark):
    eng = ValidationEngine({
        "@root": "#T",
        "T": {"a": "string", "b?7": "int"},
        "@table": {"key": "a"},
    })
    df = spark.createDataFrame([("x", None), ("y", 3)], "a string, b int")
    fixed = eng.repair(df)
    assert {(r.a, r.b) for r in fixed.collect()} == {("x", 7), ("y", 3)}


def test_per_partition_spec_overrides(spark):
    """E6 analog: a stricter spec for one source, base spec elsewhere."""
    from sjot_spark.fixtures import VOCAB

    df = make_sequences(spark, 500, violations=False)
    strict = {
        "@root": "#Sequence",
        "Sequence": {
            "doc_id": "(doc\\d{12})",
            "tokens": f"0..{VOCAB - 1}[1,64]",   # much tighter len bound
            "n_tok": "1..64",
            "source": "string",
        },
        "@table": {"key": "doc_id", "partition_by": "source"},
    }
    eng = ValidationEngine(SEQUENCE_SPEC)
    res = eng.run_with_overrides(
        df, {"code": strict},
        dims={"allowed_sources": make_allowed_sources(spark)})
    viols = res.violations.collect()
    assert viols  # code rows longer than 64 tokens violate the override
    assert {r.partition for r in viols} == {"code"}
    assert {r.check_id for r in viols} <= {"tokens_len_bounds", "n_tok_range",
                                           "n_tok_consistency"}
    verd = {r.partition: r.verdict for r in res.verdicts.collect()}
    assert verd["code"] == "fail"
    assert verd.get("web") == "pass"


def test_repair_fills_null_array_elements(spark):
    # SJOT replaces null array elements with the element default
    # (index.js:182-190); our repair() does it opt-in, off the
    # validation path
    eng = ValidationEngine({
        "@root": "#T",
        "T": {"k": "string", "a?": "0..9[]"},
        "@table": {"key": "k"},
    })
    df = spark.createDataFrame(
        [("x", [1, None, 3]), ("y", None)], "k string, a array<int>")
    fixed = {r.k: r.a for r in eng.repair(df).collect()}
    assert fixed["x"] == [1, 0, 3]
    assert fixed["y"] is None  # optional column stays absent


def test_fast_detail_level(spark):
    """FAST-build analog: same violations, null details."""
    df = make_sequences(spark, 500, violations=True)
    dims = {"allowed_sources": make_allowed_sources(spark)}
    full = ValidationEngine(SEQUENCE_SPEC).run(df, dims=dims)
    fast = ValidationEngine(SEQUENCE_SPEC, detail_level="fast").run(df, dims=dims)
    a = {(r.key, r.check_id) for r in full.violations.collect()}
    b = {(r.key, r.check_id) for r in fast.violations.collect()}
    assert a == b
    row_checks = set(fast.check_ids)
    for r in fast.violations.collect():
        if r.check_id in row_checks:  # plan checks keep their details
            assert r.detail is None


def test_spec_load_from_filesystem(spark, tmp_path):
    import json

    from sjot_spark.spec.spec import CheckSpec

    p = tmp_path / "spec.json"
    p.write_text(json.dumps(SEQUENCE_SPEC))
    spec = CheckSpec.load(spark, f"file://{p}")
    assert spec.check() is True
    assert spec.root_name == "Sequence"


def test_empty_table(spark):
    """Zero-row input: empty violations, empty verdicts, passes."""
    eng = ValidationEngine(SEQUENCE_SPEC)
    df = make_sequences(spark, 0, violations=False).limit(0)
    res = eng.run(df, dims={"allowed_sources": make_allowed_sources(spark)})
    assert res.violations.count() == 0
    assert res.verdicts.count() == 0


def test_repair_sorts_sets_opt_in(spark):
    """r4 (VERDICT r3 #5): the reference's validator sorts sets in
    place (index.js:294-299); repair(sort_sets=True) is the opt-in
    analog. The default repair leaves set order untouched (validation
    path byte-equality), and element-default fill lands IN order."""
    eng = ValidationEngine({
        "@root": "#T",
        "T": {"k": "string", "s?": "string{1,4}", "n?": "0..9{1,4}"},
        "@table": {"key": "k"},
    })
    df = spark.createDataFrame(
        [("x", ["b", "a", "c"], [3, None, 1]), ("y", None, None)],
        "k string, s array<string>, n array<int>")
    plain = {r.k: (r.s, r.n) for r in eng.repair(df).collect()}
    assert plain["x"] == (["b", "a", "c"], [3, 0, 1])  # unsorted
    fixed = {r.k: (r.s, r.n) for r in
             eng.repair(df, sort_sets=True).collect()}
    assert fixed["x"] == (["a", "b", "c"], [0, 1, 3])  # fill THEN sort
    assert fixed["y"] == (None, None)


def test_repair_sets_node_parity(spark):
    """The sorted STRING set matches what the reference's in-place
    sort produces for the same instance (JS default comparator is
    lexicographic == value order for strings)."""
    import json as _json
    import shutil as _sh
    import subprocess as _sp

    node = _sh.which("node")
    if node is None:
        import pytest as _pt
        _pt.skip("node not installed")
    driver = r"""
const SJOT = require("/root/reference/index.js");
const data = JSON.parse(require("fs").readFileSync(0, "utf8"));
// the reference sorts the set in place during validation
SJOT.valid(data, "#T", {"T": {"s": "string{1,4}"}});
console.log(JSON.stringify(data.s));
"""
    inst = {"s": ["b", "a", "c"]}
    p = _sp.run([node, "-e", driver], input=_json.dumps(inst).encode(),
                capture_output=True, check=True)
    ref_sorted = _json.loads(p.stdout)

    eng = ValidationEngine({
        "@root": "#T", "T": {"k": "string", "s": "string{1,4}"},
        "@table": {"key": "k"},
    })
    df = spark.createDataFrame([("x", ["b", "a", "c"])],
                               "k string, s array<string>")
    ours = eng.repair(df, sort_sets=True).collect()[0].s
    assert ours == ref_sorted == ["a", "b", "c"]
