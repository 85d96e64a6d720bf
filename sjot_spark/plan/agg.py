"""Skew-aware aggregation: explicit two-stage salted aggregation.

For heavily skewed group keys (the fixture's `source` is 55% one
value; real training corpora are worse), a single groupBy sends every
row of the hot key through one reducer task. Spark's partial (map-
side) aggregation already collapses most of the volume for algebraic
aggregates, and AQE can split skewed SHUFFLE partitions — but when
the number of distinct keys is tiny, partial aggregation output is
already small and the residual problem is the single reducer per hot
key during the merge of wide per-key state (think collect-style or
high-cardinality composite states).

``salted_agg`` makes the fix explicit and testable:

  stage 1: groupBy(key, salt = pmod(xxhash64(row-id-ish), n_salts))
           -> partial aggregates (n_salts cells per hot key)
  stage 2: groupBy(key) -> merge partials

Only aggregates with a documented partial/merge algebra are accepted:
count -> sum, sum -> sum, min -> min, max -> max,
approx_count_distinct is NOT mergeable here (use it directly — Spark
merges its HLL sketches internally).

The equivalence `salted_agg(df) == df.groupBy(key).agg(...)` is
property-tested in tests/test_salted_agg.py, and the count_distinct
algebra is DuckDB-oracled (queries.salted_distinct). Reference
analog: SJOT's uniqueness check lifted cross-row (set uniqueness,
/root/reference/index.js:294-299); the salting itself is the
north_star's "salted repartitioning for skewed sources" mechanism.
Honest scope note (measured, SCALING.md §Skew): Spark's planner
already two-phases exact distinct aggregation, so salted_agg earns
its keep for merge states the planner cannot split (collect-style
accumulations, custom high-cardinality states), not for plain
count_distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate name -> (stage1 fn, stage2 merge fn)
_ALGEBRA = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
    # EXACT only when the salt is derived from the counted column
    # itself: hash-salting on it partitions the distinct VALUE SPACE
    # into disjoint cells, so per-cell distinct counts sum to the
    # exact global distinct count (enforced in salted_agg). This is
    # the heavy-merge-state case salting exists for — a hot key's
    # dedup state spreads over n_salts reducers instead of one.
    "count_distinct": (lambda c: F.count_distinct(c), F.sum),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs``: output_name -> (agg_name, input_column); agg_name in
    {count,sum,min,max}. ``salt_on``: column whose hash spreads the
    hot key (defaults to a per-row monotonic id — any row-unique-ish
    column works; using a data column keeps the plan deterministic).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _ALGEBRA:
            raise ValueError(
                f"{fn} has no registered partial/merge algebra "
                f"(supported: {sorted(_ALGEBRA)})")
        if fn == "count_distinct" and (salt_on is None or salt_on != _col):
            raise ValueError(
                "count_distinct is only exact when salted on the "
                "counted column itself (salt_on=<that column>): the "
                "hash then partitions the distinct value space into "
                "disjoint cells whose counts sum exactly")
    salt_src = F.col(salt_on) if salt_on else F.monotonically_increasing_id()
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts))

    stage1 = df.withColumn("_salt", salt)
    partials = stage1.groupBy(*keys, "_salt").agg(*[
        _ALGEBRA[fn][0](F.lit(1) if col == "*" else F.col(col)).alias(f"_p_{name}")
        for name, (fn, col) in aggs.items()
    ])
    return partials.groupBy(*keys).agg(*[
        _ALGEBRA[fn][1](F.col(f"_p_{name}")).alias(name)
        for name, (fn, col) in aggs.items()
    ])
