"""Compare Spark result dtypes vs DuckDB oracle Arrow types per contract
query. The driver's correctness gate hashes typed values; representational
mismatches (HUGEINT vs BIGINT, DECIMAL(38,s) vs DECIMAL(28,s)) hash-fail
even when values are equal (VERDICT.md round 1, 'What's wrong' #1).

Usage: python scripts/oracle_typediff.py [query ...]
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from sjot_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or sorted(oracles)
    n_diff = 0
    for name in names:
        sdf = queries[name](spark, SF_DIR)
        stypes = dict(sdf.dtypes)
        tbl = con.execute(oracles[name]).fetch_arrow_table()
        dtypes = {f.name: str(f.type) for f in tbl.schema}
        diffs = []
        for col in stypes:
            s, d = stypes[col], dtypes.get(col, "<missing>")
            # normalize naming across engines
            norm = {
                "bigint": "int64", "int": "int32", "smallint": "int16",
                "tinyint": "int8", "double": "double", "float": "float",
                "string": "string", "boolean": "bool",
                "date": "date32[day]",
            }
            sn = norm.get(s, s)
            if sn.startswith("decimal("):
                sn = sn.replace("decimal(", "decimal128(")
            if sn != d and not (sn == "string" and d == "large_string"):
                diffs.append(f"    {col}: spark={s} duckdb={d}")
        if diffs:
            n_diff += 1
            print(f"DIFF {name}")
            print("\n".join(diffs))
        else:
            print(f"ok   {name}")
    print(f"\n{n_diff} queries with type diffs")


if __name__ == "__main__":
    main()
