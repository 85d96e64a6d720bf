"""Schema inference (snapSJOT analog): infer a CheckSpec from data,
then validate the same data with it — an inferred spec must accept
its own sample (the snapSJOT invariant)."""

from pyspark.sql import functions as F

from sjot_spark.engine import ValidationEngine
from sjot_spark.fixtures import make_sequences
from sjot_spark.inference import infer_spec
from sjot_spark.spec.typestr import ArrayOf, Primitive, Range


def test_infer_from_sequences(spark):
    df = make_sequences(spark, 500, violations=False)
    spec = infer_spec(df, type_name="Seq")
    root = spec.root
    props = {p.name: p for p in root.props}
    assert set(props) == {"doc_id", "tokens", "n_tok", "source"}
    assert isinstance(props["tokens"].type, ArrayOf)
    assert isinstance(props["tokens"].type.item, Range)
    assert isinstance(props["n_tok"].type, Range)
    assert not props["doc_id"].optional
    # doc_id observed unique -> table clauses
    assert spec.table.unique == ("doc_id",)
    assert spec.table.key == "doc_id"


def test_inferred_spec_accepts_own_sample(spark):
    df = make_sequences(spark, 500, violations=False)
    spec = infer_spec(df, type_name="Seq")
    res = ValidationEngine(spec).run(df)
    assert res.violations.count() == 0


def test_infer_formats_and_optionality(spark):
    rows = [
        ("2024-01-01", "deadbeef", None),
        ("2023-12-31", "0042", 5),
    ]
    df = spark.createDataFrame(rows, "d string, h string, x int")
    spec = infer_spec(df, type_name="T")
    props = {p.name: p for p in spec.root.props}
    assert isinstance(props["d"].type, Primitive) and props["d"].type.name == "date"
    assert isinstance(props["h"].type, Primitive) and props["h"].type.name == "hex"
    assert props["x"].optional  # had a null
    assert not props["d"].optional


def test_inferred_spec_flags_out_of_domain_rows(spark):
    df = make_sequences(spark, 500, violations=False)
    spec = infer_spec(df, type_name="Seq")
    # a row outside the inferred n_tok range must violate
    bad = df.limit(1).withColumn("n_tok", F.lit(10_000_000))
    res = ValidationEngine(spec).run(bad)
    assert {r.check_id for r in res.violations.collect()} >= {"n_tok_range",
                                                              "n_tok_consistency"} \
        or {r.check_id for r in res.violations.collect()} >= {"n_tok_range"}


def test_infer_struct_columns_recursively(spark):
    """snapSJOT-style recursive object unification: struct columns
    infer nested object types, with within-struct optionality from
    nulls observed while the parent struct is present."""
    rows = [
        ("a", (1, "x", None)),
        ("b", (5, "y", 7)),
        ("c", None),            # struct itself nullable
    ]
    df = spark.createDataFrame(
        rows, "k string, o struct<n:int, s:string, extra:int>")
    spec = infer_spec(df, type_name="T")
    props = {p.name: p for p in spec.root.props}
    assert props["o"].optional                 # struct null in one row
    from sjot_spark.spec.typestr import ObjectT, Range
    obj = props["o"].type
    assert isinstance(obj, ObjectT)
    sub = {p.name: p for p in obj.props}
    assert isinstance(sub["n"].type, Range)
    assert sub["n"].type.spec.source == "1..5"
    assert not sub["n"].optional               # never null when o present
    assert sub["extra"].optional               # null while o present
    # self-acceptance invariant holds through the nested object
    res = ValidationEngine(spec).run(df, persist_violations=False)
    assert res.violations.count() == 0
