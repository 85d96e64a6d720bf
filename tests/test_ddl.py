"""CheckSpec → StructType / Iceberg DDL emitters (ddl.py): one spec
both declares and validates a table."""

import pytest
from pyspark.sql import types as T

from sjot_spark.ddl import spec_to_ddl, spec_to_struct
from sjot_spark.errors import SpecError

SPEC = {
    "@root": "#Seq",
    "Seq": {
        "doc_id": "string",
        "tokens": "0..50257[]",
        "n_tok": "uint",
        "source": "(src\\d+)",
        "score?": "0.0..1.0",
        "meta?": {"lang": "char[2]", "flag?": "boolean"},
    },
    "@table": {"key": "doc_id", "partition_by": "source"},
}


def test_struct_nullability_and_types():
    st = spec_to_struct(SPEC)
    by = {f.name: f for f in st.fields}
    assert not by["doc_id"].nullable and not by["tokens"].nullable
    assert by["score"].nullable and by["meta"].nullable
    # required array elements: the null-scan-elision contract
    assert isinstance(by["tokens"].dataType, T.ArrayType)
    assert by["tokens"].dataType.containsNull is False
    # narrowest integral type covering 0..50257
    assert by["tokens"].dataType.elementType == T.IntegerType()
    assert by["n_tok"].dataType == T.LongType()   # uint needs 64-bit
    assert by["score"].dataType == T.DoubleType()  # float-literal range
    meta = by["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert not meta["lang"].nullable and meta["flag"].nullable


def test_ddl_text():
    ddl = spec_to_ddl(SPEC, "seqs")
    assert ddl.startswith("CREATE TABLE seqs (")
    assert "doc_id STRING NOT NULL" in ddl
    assert "tokens ARRAY<INT> NOT NULL" in ddl
    assert "score DOUBLE" in ddl and "score DOUBLE NOT NULL" not in ddl
    assert ddl.rstrip().endswith("USING iceberg\nPARTITIONED BY (source)")


def test_heterogeneous_union_rejected_with_pointer_to_jsonvalidate():
    spec = {"@root": "#T", "T": {"v": [["0..9", "string"]]}}
    with pytest.raises(SpecError, match="jsonvalidate"):
        spec_to_struct(spec)


def test_struct_round_trips_through_spark(spark):
    """The emitted schema is accepted by Spark and the same spec
    compiles against a table created with it."""
    from sjot_spark.engine import ValidationEngine

    st = spec_to_struct(SPEC)
    df = spark.createDataFrame(
        [("d1", [1, 2, 3], 3, "src1", 0.5, ("en", None))], schema=st)
    res = ValidationEngine(SPEC).run(df)
    assert res.violations.count() == 0
