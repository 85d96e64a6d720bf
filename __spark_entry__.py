"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in sjot_spark.queries; the validation engine
itself is sjot_spark.engine (see SURVEY.md §2 for the operator map).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validate the sf0.001 documents table with the full
    engine (row checks in one codegen projection + broadcast-anti-join
    referential integrity + uniqueness agg) and return the typed
    violation rows."""
    from sjot_spark.queries import q_validate_violations

    return q_validate_violations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sjot_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sjot_spark.queries import ORACLES

    return dict(ORACLES)
