"""Unit tests for boilerplate line removal (datapipe/linedup.py).
Hand-computed expectations; the full-corpus DuckDB cross-check runs
in test_oracle_parity (boilerplate_stats)."""

from pyspark.sql import functions as F

from sjot_spark.datapipe import linedup


def _docs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        "doc_id",
        linedup.token_window_lines(F.col("text"), 3).alias("lines"),
    )


def test_token_window_lines(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "   ")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["lines"]
        for r in df.select(
            "doc_id", linedup.token_window_lines(F.col("text"), 3).alias("lines")
        ).collect()
    }
    assert out[1] == ["a b c", "d e f", "g"]  # short tail window kept
    assert out[2] == ["x"]
    assert out[3] == []


def test_remove_boilerplate_rewrite(spark):
    # "nav bar here" appears in docs 1 and 2 -> boilerplate;
    # every other line is unique -> kept, order preserved
    docs = _docs(
        spark,
        [
            (1, "nav bar here own text one extra tail"),
            (2, "other intro aa nav bar here more own words"),
            (3, "fully unique document text here now"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in linedup.remove_boilerplate(
            docs, min_docs=2
        ).collect()
    }
    assert out[1]["n_lines"] == 3
    assert out[1]["n_removed"] == 1
    assert out[1]["text_clean"] == "own text one extra tail"
    assert out[2]["n_removed"] == 1
    assert out[2]["text_clean"] == "other intro aa more own words"
    # untouched doc comes back verbatim
    assert out[3]["n_removed"] == 0
    assert out[3]["text_clean"] == "fully unique document text here now"


def test_remove_boilerplate_full_removal_and_multiplicity(spark):
    # doc 1 repeats the shared line twice: BOTH instances removed;
    # doc 2 is nothing but the shared line -> empty rewrite
    docs = _docs(
        spark,
        [
            (1, "spam spam spam own words kept spam spam spam"),
            (2, "spam spam spam"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in linedup.remove_boilerplate(docs, min_docs=2).collect()
    }
    assert out[1]["n_lines"] == 3
    assert out[1]["n_removed"] == 2
    assert out[1]["text_clean"] == "own words kept"
    assert out[2]["n_removed"] == 1
    assert out[2]["text_clean"] == ""


def test_frequent_lines_counts_doc_frequency(spark):
    # in-doc repetition must NOT inflate the census: "a b c" twice in
    # doc 1 counts once; threshold 2 needs a second DOC
    docs = _docs(spark, [(1, "a b c a b c"), (2, "q r s")])
    assert linedup.frequent_lines(docs, min_docs=2).count() == 0
    docs2 = _docs(spark, [(1, "a b c a b c"), (2, "a b c")])
    rows = linedup.frequent_lines(docs2, min_docs=2).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 2


def test_linedup_plan_broadcasts_frequent_set(spark):
    docs = _docs(spark, [(1, "a b c d e f"), (2, "a b c")])
    plan = (
        linedup.remove_boilerplate(docs, min_docs=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the frequent-set flag join must be a map-side broadcast LEFT
    # OUTER (an anti join would drop all-boilerplate docs)
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "SortMergeJoin" not in plan
