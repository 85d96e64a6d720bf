"""All-features driver-contract query: the contract twin of the
reference's comprehensive golden test (/root/reference/dev/test.js:3-116).

One CheckSpec declaring every DSL feature class (P1-P12, A1-A6, C1-C6,
formats, refs, unions, @extends) validates a deterministic 34-column
table derived purely from ``documents.doc_id``. Every column's value —
and every seeded corruption — is a pure integer-modulo function of
doc_id, so the DuckDB oracle predicts the exact violation set
arithmetically without re-implementing the engine: the engine computes
(key, check_id) from the materialized values, the oracle derives the
same pairs from doc_id alone. Agreement means every check class
evaluates its values exactly as specified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALL_FEATURES_SPEC = {
    "@root": "#Everything",
    "Score": "0..100",                     # named type reference target
    "Base": {"inherited?": "boolean"},     # @extends base
    "Everything": {
        "@extends": "#Base",
        "id": "(row\\d+)",
        "b?": "boolean",
        "t?": "true",
        "i?": "int",
        "lng?": "long",
        "rng?": "-10..10",
        "xrng?": "<0..100>",
        "enm?": "-999,-1,0,1,999",
        "frng?": "1.0..2.0",
        "intg?": "integer",
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
        "arr?": "0..9[1,5]",
        "nest?": "string[][]",
        "st?": "int{1,10}",
        "tup?": ["0..9", "10..19"],
        "un?": [["(a+)", "0..9"]],
        "ref?": "#Score",
        "obj?": {"x": "0..9", "y?": "string"},
        "p?": "int", "q?": "int", "m?": "int", "n?": "int",
        "y1?": "int", "y2?": "int",
        "@one": [["p", "q"]],
        "@any": [["y1", "y2"]],
        "@all": [["m", "n"]],
        "@dep": {"m": ["n"]},
    },
    "@table": {"key": "id"},
}

N_DOCS = 500  # doc_id < N_DOCS slice keeps the table bounded at any sf


def build_table(docs: DataFrame) -> DataFrame:
    """The deterministic all-features table: one row per doc_id < 500,
    every column a closed-form function of doc_id. Corruption sites use
    pairwise-independent moduli so each check class has its own
    deterministic violation subset (mirrors the seeded-negative pattern
    of dev/test.js:64-112 / README.md:277-369)."""
    d = F.col("doc_id")

    def mod(k: int, r: int):
        return (d % k) == r

    i10 = (d % 10).cast("int")
    return docs.where(d < N_DOCS).select(
        F.concat(
            F.when(mod(31, 3), F.lit("bad")).otherwise(F.lit("row")),
            d.cast("string"),
        ).alias("id"),
        (d % 2 == 0).alias("inherited"),           # @extends'd, static
        F.lit(True).alias("b"),                    # boolean: static
        (~mod(29, 5)).alias("t"),                  # "true"
        F.when(mod(23, 7), F.lit(3000000000)).otherwise(d).alias("i"),
        F.when(mod(37, 11), F.lit(140737488355328)).otherwise(d).alias("lng"),
        ((d % 25) - 12).alias("rng"),              # -12..12 vs -10..10
        (d % 102).alias("xrng"),                   # 0..101 vs <0..100>
        F.when(mod(5, 4), d % 7)                   # 0..6: only 0,1 valid
        .when(mod(5, 0), F.lit(-999)).when(mod(5, 1), F.lit(-1))
        .when(mod(5, 2), F.lit(0)).otherwise(F.lit(1)).alias("enm"),
        (F.lit(0.5) + (d % 4).cast("double") * 0.5).alias("frng"),
        (d.cast("double")
         + F.when(mod(13, 2), F.lit(0.5)).otherwise(F.lit(0.0))).alias("intg"),
        F.lit("any").alias("s"),
        F.expr("repeat('c', CAST(doc_id % 12 AS INT))").alias("ch"),
        F.when(mod(9, 4), F.lit("ac")).otherwise(F.lit("abbc")).alias("rx"),
        F.when(mod(21, 2), F.lit("!!")).otherwise(F.lit("SGVsbG8=")).alias("b64"),
        F.when(mod(19, 1), F.lit("xyz")).otherwise(F.lit("deadBEEF")).alias("hx"),
        F.when(mod(15, 8), F.lit("nope"))
        .otherwise(F.lit("123e4567-e89b-12d3-a456-426614174000")).alias("uu"),
        F.when(mod(17, 9), F.lit("2024-1-1")).otherwise(F.lit("2024-01-31")).alias("dt"),
        F.when(mod(27, 3), F.lit("12:34")).otherwise(F.lit("12:34:56Z")).alias("tm"),
        F.when(mod(49, 5), F.lit("2024-01-31 12:34:56"))
        .otherwise(F.lit("2024-01-31T12:34:56Z")).alias("dtt"),
        F.when(mod(51, 7), F.lit("1Y")).otherwise(F.lit("P1Y2M3DT4H5M6S")).alias("dur"),
        F.when(mod(33, 6), F.array(i10, F.lit(77)))
        .when(mod(33, 17), F.array().cast("array<int>"))
        .otherwise(F.array(i10, ((d * 3) % 10).cast("int"))).alias("arr"),
        F.when(mod(35, 12),
               F.array(F.array(F.lit("a")), F.lit(None).cast("array<string>")))
        .otherwise(F.array(F.array(F.lit("a")))).alias("nest"),
        F.when(mod(39, 21), F.array(F.lit(1), F.lit(1), F.lit(2)))
        .otherwise(F.array(i10, (i10 + 10).cast("int"))).alias("st"),
        F.when(mod(41, 22), F.array(F.lit(77), F.lit(15)))
        .when(mod(41, 30), F.array(F.lit(5)))
        .otherwise(F.array(i10, (i10 + 10).cast("int"))).alias("tup"),
        F.when(mod(43, 23), F.lit("b")).otherwise(F.lit("aaa")).alias("un"),
        (d % 110).alias("ref"),
        F.struct(
            F.when(mod(45, 31), F.lit(55)).otherwise(i10).alias("x"),
            F.lit(None).cast("string").alias("y"),
        ).alias("obj"),
        F.when(d % 8 < 4, F.lit(1)).alias("p"),
        F.when((d % 8 >= 2) & (d % 8 <= 5), F.lit(2)).alias("q"),
        F.when(d % 6 < 3, F.lit(1)).alias("m"),
        F.when(d % 6 < 2, F.lit(1)).alias("n"),
        F.when(~mod(52, 35), F.lit(1)).alias("y1"),
        F.when((d % 52 != 35) & (d % 52 != 40), F.lit(1)).alias("y2"),
    )


def q_validate_all_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sjot_spark.engine import ValidationEngine

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = ValidationEngine(ALL_FEATURES_SPEC).run(
        build_table(docs), persist_violations=False)
    return res.violations.select("key", "check_id")


# (check_id, violating doc_id condition) — the arithmetic shadow of
# each corruption site in build_table; see module docstring.
_CASES = [
    ("id_format", "doc_id % 31 = 3"),
    ("t_type", "doc_id % 29 = 5"),
    ("i_range", "doc_id % 23 = 7"),
    ("lng_range", "doc_id % 37 = 11"),
    ("rng_range", "doc_id % 25 IN (0, 1, 23, 24)"),
    ("xrng_range", "doc_id % 102 IN (0, 100, 101)"),
    ("enm_range", "doc_id % 5 = 4 AND doc_id % 7 >= 2"),
    ("frng_range", "doc_id % 4 = 0"),
    ("intg_range", "doc_id % 13 = 2"),
    ("ch_len_bounds", "doc_id % 12 IN (0, 11)"),
    ("rx_format", "doc_id % 9 = 4"),
    ("b64_format", "doc_id % 21 = 2"),
    ("hx_format", "doc_id % 19 = 1"),
    ("uu_format", "doc_id % 15 = 8"),
    ("dt_format", "doc_id % 17 = 9"),
    ("tm_format", "doc_id % 27 = 3"),
    ("dtt_format", "doc_id % 49 = 5"),
    ("dur_format", "doc_id % 51 = 7"),
    ("arr_element_range", "doc_id % 33 = 6"),
    ("arr_len_bounds", "doc_id % 33 = 17"),
    ("nest_element_type", "doc_id % 35 = 12"),
    ("st_unique_items", "doc_id % 39 = 21"),
    ("tup_tuple_types", "doc_id % 41 IN (22, 30)"),
    ("tup_len_bounds", "doc_id % 41 = 30"),
    ("un_type", "doc_id % 43 = 23"),
    ("ref_range", "doc_id % 110 > 100"),
    ("obj_type", "doc_id % 45 = 31"),
    ("one_p_q", "doc_id % 8 IN (2, 3, 6, 7)"),
    ("any_y1_y2", "doc_id % 52 = 35"),
    ("all_m_n", "doc_id % 6 = 2"),
    ("dep_m", "doc_id % 6 = 2"),
]


def oracle_all_features() -> str:
    selects = [
        f"SELECT CASE WHEN doc_id % 31 = 3 THEN 'bad' ELSE 'row' END"
        f" || CAST(doc_id AS VARCHAR) AS key, '{cid}' AS check_id\n"
        f"FROM documents WHERE doc_id < {N_DOCS} AND ({cond})"
        for cid, cond in _CASES
    ]
    return "\nUNION ALL\n".join(selects)
