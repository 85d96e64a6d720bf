"""ValidationEngine — run a compiled CheckSpec over a DataFrame.

Execution shape (SURVEY.md §3.4):

1. one shuffle-free projection pass evaluates every row-level check
   for every row inside whole-stage codegen (the columnar analog of
   SJOT's single-pass validation, /root/reference/README.md:28-29);
2. plan-fragment checks run as Spark plans: cross-row uniqueness is a
   key-partitioned aggregation (partial/merge — map-side combine
   removes the near-unique bulk before the shuffle), referential
   integrity is a broadcast left-anti join (never a shuffle of the
   fact side), drift checks are two-phase histogram aggregations;
3. violations = unpivot of failing flags → (key, partition, check_id,
   detail); detail strings are built ONLY for failing rows
   (when(fail, ...)) — the FAST-build analog;
4. verdicts = per-partition pass/fail + counts (partial+final agg).

The input `tokens`/data columns are never mutated (per-row invariant:
byte-equality with input). SJOT's default-insertion mutation is the
separate, opt-in `repair()` output.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sjot_spark.compiler import CompiledSpec, RowCheck, compile_spec
from sjot_spark.errors import SpecError
from sjot_spark.spec.spec import CheckSpec

VIOLATION_COLUMNS = ["key", "partition", "check_id", "detail"]


@dataclass
class ValidationResult:
    flags: DataFrame        # input columns + chk_<id> booleans + passed
    violations: DataFrame   # (key, partition, check_id, detail)
    verdicts: DataFrame     # per partition: n_rows, n_violations, verdict
    check_ids: list[str]

    def passed(self) -> bool:
        """Global verdict (driver-side; one small agg)."""
        return self.verdicts.agg(
            F.min(F.col("verdict") == "pass").alias("ok")
        ).first()["ok"]


class ValidationEngine:
    """Compile once, validate any number of DataFrames of that shape."""

    def __init__(self, spec: CheckSpec | dict | str, detail_level: str = "full",
                 assume_nonnull_elements: bool = False):
        """``detail_level``: 'full' builds SJOT-shaped diagnostic
        strings for failing rows; 'fast' emits null details — the
        analog of the reference's FAST build variant, which strips the
        error-detail paths (/root/reference/build.sh:19-26).

        ``assume_nonnull_elements``: treat every array column as if
        its schema declared non-null elements, eliding the per-element
        null scan (~20% of validation wall time on the token hot
        path). Plain parquet ALWAYS reports list elements nullable
        even when the writer never emits one; Iceberg `element:
        required` columns carry containsNull=False natively and get
        the elision automatically without this flag. Only set it when
        the producer contract genuinely forbids null elements."""
        if detail_level not in ("full", "fast"):
            raise SpecError("detail_level must be 'full' or 'fast'")
        self.detail_level = detail_level
        self.assume_nonnull_elements = assume_nonnull_elements
        self.spec = spec if isinstance(spec, CheckSpec) else CheckSpec(spec)
        self.spec.check()
        self._compiled: CompiledSpec | None = None

    def compile(self, df: DataFrame) -> CompiledSpec:
        return compile_spec(self.spec, df.schema,
                            self.assume_nonnull_elements)

    # ------------------------------------------------------------ run

    def run(
        self,
        df: DataFrame,
        dims: dict[str, DataFrame] | None = None,
        persist_violations: bool = True,
    ) -> ValidationResult:
        """``persist_violations`` caches the (small) violations output
        (memory+disk) so materializing violations AND verdicts costs
        one pass over the input, not two. Disable for streaming or
        when violations go straight to a sink."""
        dims = dims or {}
        comp = self.compile(df)
        key = comp.key or comp.columns[0]
        part = comp.partition_by
        part_col = F.col(part) if part else F.lit("_all")

        flags = self._flags_df(df, comp)
        # Referential integrity is FUSED into the row-check scan as a
        # broadcast LEFT join + membership flag (guide §2.4: a second
        # pruned scan + anti-join of the same input was pure extra
        # I/O): the dim side broadcasts exactly as before, the fact
        # side still never shuffles, and the violation rows/details
        # are identical to the standalone :meth:`_ref_violations`.
        dfj = df
        ref_checks: list[RowCheck] = []
        for rc in self.spec.table.refs:
            if rc.dim not in dims:
                raise SpecError(
                    f"@table.ref needs dimension table {rc.dim!r} in dims=")
            flag = f"_ref_ok_{rc.column}"
            dimk = (
                dims[rc.dim]
                .select(F.col(rc.dim_column).alias(rc.column)).distinct()
                .select(rc.column, F.lit(True).alias(flag))
            )
            dfj = dfj.join(F.broadcast(dimk), on=rc.column, how="left")
            ref_checks.append(RowCheck(
                check_id=f"{rc.column}_ref",
                passed=F.col(flag),
                detail=self._ref_detail(rc),
                typepath=f"/@table/ref/{rc.column}",
            ))
        row_viol = self._row_violations(dfj, comp, key, part_col,
                                        extra_checks=ref_checks)
        plan_viols = []
        if self.spec.table.unique:
            plan_viols.append(self._unique_violations(df, part_col))
        violations = reduce(DataFrame.unionByName, [row_viol, *plan_viols])
        if persist_violations:
            from pyspark import StorageLevel

            violations = violations.persist(StorageLevel.MEMORY_AND_DISK)

        # verdicts derive from the (tiny) violations output plus one
        # column-pruned row-count scan — NOT a second full check pass.
        # At sink scale the same shape applies: aggregate the
        # violations sink, never re-validate.
        row_check_ids = [c.check_id for c in comp.row_checks]
        verdicts = self._verdicts(df, violations, part, row_check_ids)
        return ValidationResult(
            flags=flags,
            violations=violations,
            verdicts=verdicts,
            check_ids=row_check_ids,
        )

    # ----------------------------------------------------- components

    def _flags_df(self, df: DataFrame, comp: CompiledSpec) -> DataFrame:
        """Input columns + one boolean per row-level check + passed.
        Pure projection: no shuffle, whole-stage codegen."""
        cols = [F.col(c) for c in df.columns]
        flag_cols = [
            F.coalesce(c.passed, F.lit(False)).alias(f"chk_{c.check_id}")
            for c in comp.row_checks
        ]
        passed = (
            reduce(and_, (F.coalesce(c.passed, F.lit(False))
                          for c in comp.row_checks))
            if comp.row_checks else F.lit(True)
        )
        return df.select(*cols, *flag_cols, passed.alias("passed"))

    def _row_violations(
        self, df: DataFrame, comp: CompiledSpec, key: str, part_col: Column,
        extra_checks: list[RowCheck] | None = None,
    ) -> DataFrame:
        """Unpivot failing checks into typed violation rows. Built as
        explode(filter(array<struct>)) so passing rows contribute
        nothing and detail strings are only computed on failure.
        ``extra_checks`` ride the same scan/filter/explode (run() fuses
        the referential-integrity membership flags here) without
        joining the flags/verdict row-check set."""
        checks = list(comp.row_checks) + list(extra_checks or ())
        if not checks:
            return self._empty_violations(df)
        # filter first: the scan evaluates each check once per row and
        # drops passing rows, so the struct-array + detail-string
        # projection below only ever runs on the (rare) failing rows
        all_pass = reduce(
            and_, (F.coalesce(c.passed, F.lit(False)) for c in checks)
        )
        fast = self.detail_level == "fast"
        # fast-mode detail stripping applies to the compiled ROW checks
        # only — fused extras (ref integrity) keep their details, like
        # the standalone _ref_violations always did
        n_row = len(comp.row_checks)
        structs = [
            F.struct(
                F.lit(c.check_id).alias("check_id"),
                F.coalesce(c.passed, F.lit(False)).alias("ok"),
                (F.lit(None).cast("string") if fast and i < n_row
                 else F.when(
                    ~F.coalesce(c.passed, F.lit(False)), c.detail
                )).alias("detail"),
            )
            for i, c in enumerate(checks)
        ]
        fails = F.filter(F.array(*structs), lambda s: ~s.getField("ok"))
        return (
            df.where(~all_pass)
            .select(
                F.col(key).cast("string").alias("key"),
                part_col.cast("string").alias("partition"),
                F.explode(fails).alias("v"),
            )
            .select("key", "partition", "v.check_id", "v.detail")
        )

    def _unique_violations(self, df: DataFrame, part_col: Column) -> DataFrame:
        """Cross-row key uniqueness (the scaled reinterpretation of
        SJOT's set-uniqueness, index.js:294-299): hash-partitioned
        count per key. Map-side partial aggregation collapses the
        near-unique bulk before the shuffle, so shuffled volume is
        ~one row per distinct key seen per input partition; AQE
        handles residual skew."""
        keys = list(self.spec.table.unique)
        grouped = (
            df.select(*keys, part_col.alias("partition"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.min("partition").alias("partition"))
            .where(F.col("cnt") > 1)
        )
        kcol = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
        return grouped.select(
            kcol.alias("key"),
            F.col("partition"),
            F.lit("_".join(keys) + "_unique").alias("check_id"),
            F.format_string(
                "$.%s value %s occurs %d times but must be unique",
                F.lit(",".join(keys)), kcol, F.col("cnt"),
            ).alias("detail"),
        )

    @staticmethod
    def _ref_detail(rc) -> Column:
        return F.format_string(
            "$.%s value %s is not a member of dimension %s.%s",
            F.lit(rc.column),
            F.coalesce(F.col(rc.column).cast("string"), F.lit("null")),
            F.lit(rc.dim), F.lit(rc.dim_column),
        )

    def _ref_violations(
        self, df: DataFrame, dim: DataFrame, rc, key: str, part_col: Column
    ) -> DataFrame:
        """Referential integrity = broadcast LEFT ANTI join against the
        dimension (C7 in SURVEY §2.4): fact side never shuffles.
        Standalone operator form; run() instead fuses the same check
        into the row-check scan as a broadcast LEFT join + membership
        flag (identical violation rows, one less scan of the input)."""
        dimk = (
            dim.select(F.col(rc.dim_column).alias(rc.column)).distinct()
        )
        bad = df.join(F.broadcast(dimk), on=rc.column, how="left_anti")
        return bad.select(
            F.col(key).cast("string").alias("key"),
            part_col.cast("string").alias("partition"),
            F.lit(f"{rc.column}_ref").alias("check_id"),
            self._ref_detail(rc).alias("detail"),
        )

    def _verdicts(
        self, df: DataFrame, violations: DataFrame, part: str | None,
        row_check_ids: list[str],
    ) -> DataFrame:
        """Per-partition pass/fail + counts, computed from the
        violations output (tiny) + a row-count scan that prunes to the
        partition column only — the expensive check expressions run
        exactly once, in the violations pass. ``n_bad_rows`` = number
        of distinct keys with a failing ROW-LEVEL check."""
        part_col = F.col(part) if part else F.lit("_all")
        row_stats = (
            df.groupBy(part_col.cast("string").alias("partition"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        vio_stats = (
            violations.groupBy("partition")
            .agg(
                F.count(F.lit(1)).alias("n_violations"),
                F.countDistinct(
                    F.when(F.col("check_id").isin(row_check_ids), F.col("key"))
                ).alias("n_bad_rows"),
            )
        )
        # FULL OUTER decomposed as LEFT ∪ ANTI (r7; the censusdrift
        # pattern): Spark has no broadcast strategy for full-outer, so
        # the two tiny per-partition aggregates were sort-merge-joined
        # (two extra exchanges + sorts); LEFT and LEFT ANTI both
        # broadcast. Row-for-row identical in every case, including
        # NULL partitions (null keys match in neither formulation:
        # full-outer emits both unmatched halves, which is exactly
        # left ∪ anti).
        joined = row_stats.join(vio_stats, "partition", "left")
        only_vio = vio_stats.join(
            row_stats.select("partition"), "partition", "left_anti"
        ).select(
            "partition", F.lit(None).cast("long").alias("n_rows"),
            "n_violations", "n_bad_rows",
        )
        return (
            joined.select("partition", "n_rows", "n_violations",
                          "n_bad_rows")
            .unionByName(only_vio)
            .select(
                "partition",
                F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
                F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
                F.coalesce("n_bad_rows", F.lit(0)).alias("n_bad_rows"),
                F.when(
                    F.coalesce("n_violations", F.lit(0)) == 0, "pass"
                ).otherwise("fail").alias("verdict"),
            )
        )

    def _empty_violations(self, df: DataFrame) -> DataFrame:
        return df.sparkSession.createDataFrame(
            [], "key string, partition string, check_id string, detail string"
        )

    # ------------------------------------------- per-partition overrides

    def run_with_overrides(
        self,
        df: DataFrame,
        overrides: dict[str, "CheckSpec | dict"],
        dims: dict[str, DataFrame] | None = None,
    ) -> ValidationResult:
        """Validate partition slices under specialized specs — the
        fixed-schema analog of SJOT's embedded per-object ``@sjot``
        schemas (/root/reference/index.js:111-131): instead of each
        record carrying its own schema, each ``partition_by`` value
        may carry its own spec; unlisted partitions use this engine's
        base spec. Violations/verdicts are unioned."""
        part = self.spec.table.partition_by
        if not part:
            raise SpecError("run_with_overrides needs @table.partition_by")
        listed = list(overrides)
        # NULL partition values fall to the base spec (a bare ~isin
        # would drop them: NULL NOT IN (...) is SQL NULL)
        base_res = self.run(
            df.where(F.coalesce(~F.col(part).isin(listed), F.lit(True))),
            dims=dims)
        results = [base_res]
        for value, spec in overrides.items():
            eng = ValidationEngine(spec)
            results.append(eng.run(df.where(F.col(part) == value), dims=dims))
        violations = reduce(
            DataFrame.unionByName, (r.violations for r in results))
        verdicts = reduce(
            DataFrame.unionByName, (r.verdicts for r in results))
        return ValidationResult(
            flags=base_res.flags,
            violations=violations,
            verdicts=verdicts,
            check_ids=sorted({c for r in results for c in r.check_ids}),
        )

    def run_dispatched(
        self,
        df: DataFrame,
        specs: dict[str, "CheckSpec | dict"],
        on: str,
        dims: dict[str, DataFrame] | None = None,
    ) -> ValidationResult:
        """Per-ROW spec dispatch over a discriminator column — the
        closest SCALABLE analog of SJOT's embedded per-object ``@sjot``
        schema (/root/reference/index.js:111-131). A Spark column
        cannot carry a runtime schema per row (fixed-schema columnar
        table), but a row CAN name its spec: each registered spec
        validates the slice whose ``on`` value names it, and rows
        naming an UNREGISTERED spec produce a typed
        ``dispatch_unknown_spec`` violation — the analog of the
        reference's ``throw "Invalid @sjot schema"`` (index.js:126).

        Scale shape: each slice is a filter of the same scan; lay the
        table out partitioned by ``on`` (Iceberg identity transform /
        hive layout) and every slice scan partition-prunes, so the
        union costs one logical pass over the data total — vs
        run_with_overrides this is strict (no base-spec fallback) and
        needs no @table.partition_by."""
        key = self.spec.table.key or df.columns[0]
        listed = list(specs)
        results = []
        for value, spec in specs.items():
            eng = ValidationEngine(spec)
            results.append(eng.run(df.where(F.col(on) == value), dims=dims))
        # NULL discriminators must dispatch to "unknown" too (a bare
        # ~isin yields SQL NULL which where() drops)
        unknown = df.where(
            F.coalesce(~F.col(on).isin(listed), F.lit(True)))
        on_str = F.coalesce(F.col(on).cast("string"), F.lit("null"))
        unknown_viol = unknown.select(
            F.col(key).cast("string").alias("key"),
            on_str.alias("partition"),
            F.lit("dispatch_unknown_spec").alias("check_id"),
            F.format_string(
                f"$.{on} value %s names no registered spec", on_str,
            ).alias("detail"),
        )
        unknown_verd = (
            unknown.groupBy(on_str.alias("partition"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(
                "partition", "n_rows",
                F.col("n_rows").alias("n_violations"),
                F.col("n_rows").alias("n_bad_rows"),
                F.lit("fail").alias("verdict"),
            )
        )
        violations = reduce(
            DataFrame.unionByName,
            [r.violations for r in results] + [unknown_viol])
        verdicts = reduce(
            DataFrame.unionByName,
            [r.verdicts for r in results] + [unknown_verd])
        # flags covers EVERY input row, like run(): the per-slice flags
        # frames union by name with missing chk_<id> columns null-filled
        # (NULL chk = "this check does not apply to this row's spec"),
        # and unknown-spec rows appear with passed=False (the analog of
        # the reference's throw on an invalid @sjot schema)
        unknown_flags = unknown.select("*", F.lit(False).alias("passed"))
        flags = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True),
            [r.flags for r in results] + [unknown_flags])
        return ValidationResult(
            flags=flags,
            violations=violations,
            verdicts=verdicts,
            check_ids=sorted(
                {c for r in results for c in r.check_ids}
                | {"dispatch_unknown_spec"}),
        )

    # ----------------------------------------------------------- drift

    def profile(self, df: DataFrame) -> dict[str, DataFrame]:
        """Build the baseline histogram profile for every @table.drift
        clause (persist these; they are the drift reference)."""
        from sjot_spark.plan import drift as _drift

        return {
            c.name: _drift.build_histogram(df, c) for c in self.spec.table.drift
        }

    def save_profile(
        self, baselines: dict[str, DataFrame], path: str
    ) -> None:
        """Persist a drift baseline profile (one parquet per clause)."""
        for name, hist in baselines.items():
            hist.write.mode("overwrite").parquet(f"{path}/{name}")

    def load_profile(self, spark, path: str) -> dict[str, DataFrame]:
        """Load a persisted drift baseline profile."""
        return {
            c.name: spark.read.parquet(f"{path}/{c.name}")
            for c in self.spec.table.drift
        }

    def drift(
        self, df: DataFrame, baselines: dict[str, DataFrame]
    ) -> list[dict]:
        """Run every @table.drift clause against stored baseline
        histograms; returns per-(check, group) verdict dicts. The
        heavy part is the histogram aggregation; the statistical test
        runs driver-side on the tiny merged histograms."""
        from sjot_spark.plan import drift as _drift

        out: list[dict] = []
        for c in self.spec.table.drift:
            if c.name not in baselines:
                raise SpecError(f"@table.drift needs baseline for {c.name!r}")
            cur = _drift.build_histogram(df, c)
            out.extend(_drift.drift_test(cur, baselines[c.name], c))
        return out

    # ---------------------------------------------------------- extras

    def approx_unique_metrics(self, df: DataFrame) -> dict:
        """Cheap global uniqueness metric: HLL++ distinct estimate vs
        exact row count — the sketch path from BASELINE.json
        (north_star: 'HyperLogLog for uniqueness')."""
        keys = list(self.spec.table.unique) or [df.columns[0]]
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            *[F.approx_count_distinct(k).alias(f"approx_distinct_{k}")
              for k in keys],
        ).first()
        return row.asDict()

    def repair(self, df: DataFrame, sort_sets: bool = False) -> DataFrame:
        """Opt-in analog of SJOT's default insertion: fill null
        OPTIONAL columns with their declared defaults (index.js:424-442)
        and replace null ARRAY ELEMENTS with the element type's zero
        value (index.js:182-190, sjot_default 1194-1244). Never applied
        on the validation path — the main pass must leave data
        byte-identical.

        ``sort_sets=True`` additionally normalizes ``type{n,m}`` SET
        columns to sorted order — the reference's validator sorts sets
        in place as a side effect of its uniqueness check
        (``data.sort().filter(...)``, index.js:294-299); here that
        mutation is opt-in like every repair. Ordering note: Spark's
        ``array_sort`` uses VALUE order while JS's default comparator
        is string-lexicographic, so node-parity holds for string sets
        (where the two orders coincide) and numeric sets get the sane
        numeric order instead of the reference's ["10" < "2"]
        artifact. Element-default fill runs BEFORE the sort so filled
        zeros land in order."""
        from sjot_spark.spec.typestr import (
            ArrayOf, Primitive, Range, Ref, SizedInt,
        )

        root = self.spec.root
        out = df
        cols = set(df.columns)
        for p in getattr(root, "props", ()):  # ObjectT only
            if p.name not in cols:
                continue
            if p.has_default:
                out = out.withColumn(
                    p.name, F.coalesce(F.col(p.name), F.lit(p.default))
                )
            t = p.type
            while isinstance(t, Ref):
                t = self.spec.resolve(t.name)
            if isinstance(t, ArrayOf):
                item = t.item
                if isinstance(item, (SizedInt, Range)):
                    dflt: object | None = 0
                elif isinstance(item, Primitive) and item.name in (
                        "string", "char"):
                    dflt = ""
                elif isinstance(item, Primitive) and item.name == "boolean":
                    dflt = False
                else:
                    dflt = None
                if dflt is not None:
                    out = out.withColumn(
                        p.name,
                        F.when(
                            F.col(p.name).isNotNull(),
                            F.transform(
                                F.col(p.name),
                                lambda x: F.coalesce(x, F.lit(dflt)),
                            ),
                        ),
                    )
                if t.is_set and sort_sets:
                    out = out.withColumn(
                        p.name, F.array_sort(F.col(p.name)))
        return out
