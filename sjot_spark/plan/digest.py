"""Optimized-plan digests — the systematic form of the r5 "lambda
re-evaluation hunt"'s ad-hoc plan md5 comparisons.

Three optimizer rules were found silently re-inlining staged arrays
(CollapseProject single-consumer inlining, generator pre-filter
pushdown, constraint pushdown through grouping keys — see CLAUDE.md
and BENCH/BASELINE.md); each regression was invisible to value
correctness and cost 10-50x wall. A checked-in digest per contract
query turns "the plan changed" into a reviewable test failure: any
engine/compiler/optimizer-interaction change that alters a query's
OPTIMIZED LOGICAL plan flips its digest and must be re-committed
deliberately via scripts/plan_digests.py.

Digests hash the optimized plan string with the volatile parts
normalized away:
- expression ids (``name#123`` / ``#123L``) — fresh per session;
- plan ids (``plan_id=…``) — fresh per DataFrame;
- the scale-factor directory — so sf0.001 and sf0.01 digest alike.
Everything structural (operators, expression trees, join strategies
hints, pushed filters) stays.
"""

from __future__ import annotations

import hashlib
import re
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_STRING_CONFS = {
    "spark.sql.debug.maxToStringFields": "100000",
    "spark.sql.maxMetadataStringLength": "1000000",
}


@contextmanager
def _plan_string_confs(spark: SparkSession):
    """Temporarily raise the plan-stringification confs, restoring the
    caller's values (or unsetting) on exit — digesting must not leak
    verbose stringification into the shared session (ADVICE r6)."""
    prior: dict[str, str | None] = {}
    for k, v in _STRING_CONFS.items():
        prior[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in prior.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)

_EXPR_ID = re.compile(r"#\d+")
_PLAN_ID = re.compile(r"plan_id=\d+")
_SF_DIR = re.compile(r"/root/testdata/sf[0-9.]+")
# NamedLambdaVariable prints as `lambda x_1#57` — the numeric NAME
# suffix (x_1 vs x_3) is a session-global counter, fresh-history-
# dependent just like expr ids; every occurrence carries the
# `lambda ` prefix, so the rewrite can't touch real columns.
_LAMBDA_VAR = re.compile(r"lambda (\w+?)_\d+#")
# queries.load()'s scan-parallelism restoration repartitions to the
# session's defaultParallelism — a core-count constant that must not
# leak into digests (the regen script and the test session may run at
# different SPARK_GRAFT_CPUS)
_REPARTITION_N = re.compile(r"Repartition \d+")


def normalize_plan(plan: str) -> str:
    plan = _LAMBDA_VAR.sub(r"lambda \1_#", plan)
    plan = _REPARTITION_N.sub("Repartition <p>", plan)
    plan = _EXPR_ID.sub("#", plan)
    plan = _PLAN_ID.sub("plan_id=", plan)
    plan = _SF_DIR.sub("<sf>", plan)
    return plan


def optimized_plan_digest(df: DataFrame) -> str:
    """md5 of the normalized optimized logical plan."""
    spark = df.sparkSession
    # truncated plans hide offenders (CLAUDE.md) — and truncation
    # points drift with expr-id widths, so they also break stability.
    # A query whose construction persists a subtree (the engine's
    # violations cache) embeds that subtree's PHYSICAL plan in the
    # optimized logical plan via InMemoryRelation, where FileScan
    # metadata (DataFilters, ReadSchema, …) is cut at
    # maxMetadataStringLength (default 100) — measured from the RAW
    # string, so the visible prefix shifts with expr-id widths too.
    # The session-shared confs are restored afterwards (ADVICE r6:
    # leaking them left verbose plan stringification on the session).
    with _plan_string_confs(spark):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    return hashlib.md5(normalize_plan(plan).encode("utf-8")).hexdigest()


def all_query_digests(
    spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001"
) -> dict[str, str]:
    """Digest for every registered contract query, keyed by name.

    The cache manager substitutes InMemoryRelation into ANY plan whose
    subtree matches a persisted DataFrame (the CLAUDE.md trap) — e.g.
    the engine's internal violations persist — which would make a
    digest depend on what ran earlier in the session. Clearing the
    cache before each query pins every digest to the cold plan."""
    from sjot_spark.queries import QUERIES

    # Raise the string-length confs BEFORE any query construction:
    # a persisting query stringifies its cached physical plan during
    # construction, and FileSourceScanExec.metadata is a lazy val —
    # once evaluated under the default 100-char truncation it stays
    # truncated for that exec instance, poisoning the digest. Restored
    # on exit (ADVICE r6).
    out = {}
    with _plan_string_confs(spark):
        for name, q in QUERIES.items():
            spark.catalog.clearCache()
            out[name] = optimized_plan_digest(q(spark, sf_dir))
        spark.catalog.clearCache()
    return out
