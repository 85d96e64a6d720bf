"""sjot_spark — a PySpark-native constraint-validation engine.

Reimplements the semantics of Genivia/SJOT (template-style schema
constraints, per-instance pass/fail verdicts, typed violation
diagnostics, schema checking/satisfiability, schema inference) as a
declarative CheckSpec DSL compiled into vectorized Spark Column
expressions evaluated in a single columnar pass per partition, plus
plan-level checks (uniqueness, referential integrity, distribution
drift) built from Spark aggregations and broadcast joins.

This is a from-scratch Spark-first design, NOT a port: the reference
(/root/reference, SJOT v1.4.4) is a row-at-a-time recursive-descent
JS interpreter; here the schema compiles once on the driver and every
check for every row evaluates inside whole-stage codegen.
"""

from sjot_spark.spec.registry import SpecRegistry
from sjot_spark.spec.spec import CheckSpec

__all__ = ["CheckSpec", "SpecRegistry", "ValidationEngine", "ValidationResult"]
__version__ = "0.1.0"


def __getattr__(name):
    # engine import is lazy so the pure-Python spec layer (parser,
    # checker) stays usable without a pyspark install
    if name in ("ValidationEngine", "ValidationResult"):
        from sjot_spark import engine

        return getattr(engine, name)
    raise AttributeError(name)
