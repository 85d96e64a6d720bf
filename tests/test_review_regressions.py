"""Regression tests for the round-1 code-review findings — each was a
confirmed miscompilation or crash."""

import pytest

from pyspark.sql import functions as F

from sjot_spark.engine import ValidationEngine
from sjot_spark.errors import SpecError
from sjot_spark.inference import _fmt_float, _fmt_num
from sjot_spark.spec.spec import CheckSpec


def viol(spark, spec, rows, schema):
    res = ValidationEngine(spec).run(spark.createDataFrame(rows, schema))
    out = {}
    for r in res.violations.collect():
        out.setdefault(r.key, set()).add(r.check_id)
    return out


def test_union_with_null_member_still_checks_values(spark):
    # was: [["1..10","null"]] compiled to `range OR TRUE` -> accepted 50
    spec = {"@root": "#T", "T": {"k": "string", "x": [["1..10", "null"]]},
            "@table": {"key": "k"}}
    v = viol(spark, spec,
             [("ok", 5), ("isnull", None), ("bad", 50)],
             "k string, x int")
    assert v == {"bad": {"x_type"}}  # null admitted, 50 rejected


def test_integer_on_string_column_is_compile_error(spark):
    # was: silently compiled to no check
    for t in ["integer", "int", "byte"]:
        eng = ValidationEngine({"@root": "#T", "T": {"k": "string", "x": t},
                                "@table": {"key": "k"}})
        df = spark.createDataFrame([("a", "5")], "k string, x string")
        with pytest.raises(SpecError, match="non-numeric"):
            eng.run(df)


def test_true_type_on_string_column_is_compile_error(spark):
    eng = ValidationEngine({"@root": "#T", "T": {"k": "string", "x": "true"},
                            "@table": {"key": "k"}})
    df = spark.createDataFrame([("a", "x")], "k string, x string")
    with pytest.raises(SpecError, match="non-boolean"):
        eng.run(df)


def test_struct_field_null_type_not_inverted(spark):
    # was: required struct field of type "null" compiled to isNotNull()
    spec = {"@root": "#T", "T": {"k": "string", "o?": {"x": "null"}},
            "@table": {"key": "k"}}
    v = viol(spark, spec,
             [("ok", (None,)), ("bad", (5,))],
             "k string, o struct<x:int>")
    assert v == {"bad": {"o_type"}}


def test_inline_root_extends_is_flattened(spark):
    # was: inline @root dict skipped @extends flattening entirely
    spec = CheckSpec({
        "@root": {"@extends": "#Base", "x?": "int"},
        "Base": {"k": "(k\\d+)"},
    })
    props = {p.name for p in spec.root.props}
    assert props == {"k", "x"}
    v = viol(spark, spec.doc, [("k1", 1), ("zzz", 2)], "k string, x int")
    assert v == {"zzz": {"k_format"}}


def test_overrides_keep_null_partition_rows(spark):
    # was: rows with NULL partition value silently skipped validation
    spec = {"@root": "#T",
            "T": {"k": "string", "src?": "string", "x": "1..10"},
            "@table": {"key": "k", "partition_by": "src"}}
    eng = ValidationEngine(spec)
    df = spark.createDataFrame(
        [("a", "web", 5), ("b", None, 99), ("c", "code", 3)],
        "k string, src string, x int")
    res = eng.run_with_overrides(df, {"code": spec})
    keys = {r.key for r in res.violations.collect()}
    assert keys == {"b"}  # the NULL-partition violation is seen


def test_checkpoint_nonstring_and_null_partitions(spark, tmp_path):
    # was: TypeError on int partition values; NULL rows never validated
    from sjot_spark.manifest import run_checkpointed

    spec = {"@root": "#T",
            "T": {"k": "string", "grp?": "int", "x": "1..10"},
            "@table": {"key": "k", "partition_by": "grp"}}
    eng = ValidationEngine(spec)
    df = spark.createDataFrame(
        [("a", 1, 5), ("b", 2, 99), ("c", None, 77)],
        "k string, grp int, x int")
    m = run_checkpointed(eng, df, str(tmp_path / "out"))
    assert set(m) == {"1", "2", "_null_"} or set(m) == {1, 2, "_null_"}
    by = {str(p): e["verdict"] for p, e in m.items()}
    assert by["2"] == "fail" and by["_null_"] == "fail" and by["1"] == "pass"


def test_combinators_tolerate_absent_optional_columns(spark):
    # was: AnalysisException resolving a missing optional column
    spec = {"@root": "#T",
            "T": {"k": "string", "a?": "int", "b?": "int",
                  "@one": [["a", "b"]]},
            "@table": {"key": "k"}}
    v = viol(spark, spec, [("r1", 1), ("r2", None)], "k string, a int")
    # b is absent everywhere: @one holds iff a is present
    assert v == {"r2": {"one_a_b"}}


def test_fmt_num_never_scientific():
    assert _fmt_num(1e20) == "1" + "0" * 20
    assert _fmt_num(1e-05) == "0.00001"
    assert _fmt_float(2.0) == "2.0"
    assert "e" not in _fmt_num(123456789012345678.0).lower()


def test_infer_spec_handles_extreme_floats(spark):
    from sjot_spark.inference import infer_spec

    df = spark.createDataFrame(
        [("a", 1e-05, 10**16), ("b", 0.5, 5)],
        "k string, f double, big long")
    spec = infer_spec(df, type_name="T")
    assert spec.check()
    res = ValidationEngine(spec).run(df)
    assert res.violations.count() == 0


def test_quantize_preserves_caller_mx_column(spark):
    """r5 ADVICE: quantize_int8 staged max|x| under a hard-coded '_mx'
    name, silently overwriting (then dropping) a caller column of
    that name. The staging name must dodge collisions."""
    from sjot_spark.datapipe.quantize import quantize_int8

    df = spark.createDataFrame(
        [(1, [2.0, -4.0], "keep-me")], "id int, v array<double>, _mx string")
    out = quantize_int8(df, "v").collect()[0]
    assert out["_mx"] == "keep-me"
    assert out["q"] == [64, -127]
    assert abs(out["scale"] - 4.0 / 127.0) < 1e-12


def test_bpe_fallback_vocab_is_bounded(spark):
    """r5 ADVICE: the vocab=None fallback collected EVERY distinct
    pre-token; it must honor max_word_types (deterministic top-N) and
    still tokenize — words outside the cap go through the hash-id
    OOV space."""
    from sjot_spark.datapipe.bpe import default_merges, tokenize_documents_bpe

    df = spark.createDataFrame(
        [("d1", "the cat sat on the mat", "web"),
         ("d2", "the dog ran", "web")],
        "doc_id string, text string, source string")
    out = {r.doc_id: r for r in tokenize_documents_bpe(
        df, default_merges(), vocab=None, max_word_types=3).collect()}
    assert set(out) == {"d1", "d2"}
    for r in out.values():
        assert r.n_tok == len(r.tokens) > 0
        assert all(t is not None for t in r.tokens)
