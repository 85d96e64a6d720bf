"""Per-row JSON document validation over a string column — the engine
analog of the reference's core entry point ``SJOT.validate(JSON.parse(s))``
(index.js:28-59) where every ROW carries its own JSON value, including
the depth-1 runtime union try/catch (index.js:760-909) that fixed-schema
columnar tables cannot express (COVERAGE.md C6 design limit, now lifted
for JSON/VARIANT columns).

Spark-first design: the document is parsed ONCE per row into a Spark 4
VARIANT (``try_parse_json`` — binary variant encoding, JVM-side), and
every check is a Column expression over ``try_variant_get`` /
``schema_of_variant``:

- runtime type tag      ``schema_of_variant(sub)`` canonicalized to the
                        reference's typeof classes (boolean / number /
                        string / array / object / null; JS has one
                        "number" class, index.js:801-846 — integer-ness
                        is a VALUE property, ``data % 1 == 0``)
- missing vs JSON null  SQL NULL from ``variant_get`` on an absent key
                        vs VOID tag for a present ``null``
- union dispatch        @if/@then object members are DISCRIMINATED
                        first (discriminator present + type-matching
                        ⇒ that @then member decides, no fallback —
                        index.js:878-900); the remaining members OR
                        their full predicates == the reference's
                        try-each-member-in-order semantics (first
                        success wins; order only matters for WHICH
                        member matched, reported by
                        ``union_dispatch_index``)

No Python UDFs anywhere: the whole validation is one whole-stage-codegen
projection per row, and violations use the same
filter-before-explode shape as ValidationEngine._row_violations so
passing rows contribute nothing.

At 100 TB this is the path for semi-structured sidecar columns
(``props``-style JSON): one variant parse amortizes across all checks,
the projection pipelines with the scan, and nothing shuffles.
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sjot_spark.compiler import range_pred
from sjot_spark.errors import SpecError
from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import (
    FORMAT_REGEX,
    ArrayOf,
    CharLen,
    ObjectT,
    Primitive,
    Range,
    Ref,
    Regex,
    SizedInt,
    Tuple,
    TypeNode,
    UnionT,
)


# ------------------------------------------------------------ type tags

def _canon_tag(sub: Column) -> Column:
    """Canonical runtime type class of a variant value — the engine's
    ``typeof`` (reference switch at index.js:786-846). NULL when the
    value is absent (missing key)."""
    s = F.upper(F.schema_of_variant(sub))
    return (
        F.when(sub.isNull(), F.lit(None).cast("string"))
        .when(F.is_variant_null(sub), F.lit("null"))
        .when(s.startswith("ARRAY"), F.lit("array"))
        .when(s.startswith("OBJECT") | s.startswith("STRUCT")
              | s.startswith("MAP"), F.lit("object"))
        .when(s == "STRING", F.lit("string"))
        .when(s == "BOOLEAN", F.lit("boolean"))
        .when(s == "VOID", F.lit("null"))
        .otherwise(F.lit("number"))  # TINYINT..BIGINT/DECIMAL/FLOAT/DOUBLE
    )


def _num(sub: Column) -> Column:
    return F.try_variant_get(sub, "$", "double")


def _str(sub: Column) -> Column:
    return F.try_variant_get(sub, "$", "string")


def _is_integral(c: Column) -> Column:
    return c == F.floor(c)


# ------------------------------------------------------- node predicate

OBJECT_RECURSION_DEPTH = 3


def _elem_pred_factory(node: TypeNode, resolve, depth: int):
    """Closure factory (CLAUDE.md rule: higher-order-function lambdas
    must capture via closure, never default args — and must stay
    unary for arity inspection)."""
    def elem_ok(e: Column) -> Column:
        return _vpred(node, e, _canon_tag(e), resolve, depth)
    return elem_ok


def _vpred(t: TypeNode, sub: Column, tag: Column, resolve,
           depth: int = OBJECT_RECURSION_DEPTH) -> Column:
    """Pass-predicate for one type node over a variant sub-value.
    Assumes the value is PRESENT (callers null-guard). Mirrors
    compiler.scalar_pred, but where scalar_pred dispatches statically on
    the column's one Spark type, this dispatches on the per-row tag —
    the lifted version of the reference's typeof switch.

    ``depth`` bounds OBJECT recursion (r4): nested objects inside
    arrays / tuples / union members get their props fully validated
    (the reference recurses unboundedly, index.js:760-909) down to
    ``depth`` object levels; below that an object is checked
    shallowly (tag + required presence). The bound exists because a
    column expression must be finite while SJOT specs may be
    RECURSIVE (a tree type referencing itself); each object level
    consumes one unit so self-referential specs terminate."""
    while isinstance(t, Ref):
        t = resolve(t.name)
    if isinstance(t, Range):
        # JSON numbers are one class: reference float-literal scan
        # semantics apply per value (ranges.py), integral values take
        # the int intervals, fractional the float prefix
        return (tag == "number") & range_pred(t.spec, _num(sub), True)
    if isinstance(t, SizedInt):
        n = _num(sub)
        return ((tag == "number") & _is_integral(n)
                & (n >= F.lit(float(t.lo))) & (n <= F.lit(float(t.hi))))
    if isinstance(t, Regex):
        return (tag == "string") & _str(sub).rlike(t.anchored)
    if isinstance(t, CharLen):
        ln = F.length(_str(sub))
        conds = [tag == F.lit("string")]
        b = t.bounds
        if b.exact:
            conds.append(ln == F.lit(b.lo))
        else:
            if b.lo is not None:
                conds.append(ln >= F.lit(b.lo))
            if b.hi is not None:
                conds.append(ln <= F.lit(b.hi))
        return reduce(and_, conds)
    if isinstance(t, ArrayOf):
        conds = [tag == F.lit("array")]
        b = t.bounds
        if not b.unbounded:
            ln = F.size(F.try_variant_get(sub, "$", "array<variant>"))
            if b.exact:
                conds.append(ln == F.lit(b.lo))
            else:
                if b.lo is not None:
                    conds.append(ln >= F.lit(b.lo))
                if b.hi is not None:
                    conds.append(ln <= F.lit(b.hi))
        item = t.item
        while isinstance(item, Ref):
            item = resolve(item.name)
        # NB: `any` items are NOT skipped — _vpred(any) rejects
        # embedded-@sjot carriers, so any[] arrays still scan elements
        elems = F.try_variant_get(sub, "$", "array<variant>")
        conds.append(
            F.forall(elems, _elem_pred_factory(item, resolve, depth)))
        return reduce(and_, conds)
    if isinstance(t, Tuple):
        elems = F.try_variant_get(sub, "$", "array<variant>")
        conds = [tag == F.lit("array"), F.size(elems) == len(t.items)]
        for i, it in enumerate(t.items):
            e = F.get(elems, i)
            conds.append(_vpred(it, e, _canon_tag(e), resolve, depth))
        return reduce(and_, conds)
    if isinstance(t, ObjectT) and t.if_then:
        # a lone @if/@then wrapper: discriminator must match and @then
        # must validate (single-entry when-chain — the wrapper carries
        # no type of its own; the reference only reads its @if/@then
        # keys, index.js:1919-1983)
        return _union_pred((t,), sub, tag, resolve, depth)
    if isinstance(t, ObjectT):
        # r4: FULL depth-bounded prop validation, not just presence —
        # the reference recurses into nested objects wherever they
        # appear (array items, tuple slots, union members; its object
        # arm discriminates then validates, index.js:878-899). The
        # root object is still path-flattened by compile_json_checks
        # (per-prop check ids); this branch covers objects nested
        # inside values. Presence SETS (@one/@any/@all/@dep) apply at
        # EVERY object level (r5): they are presence-only conditions
        # (no recursion), so they hold even below the depth bound —
        # root-path objects get theirs from compile_json_checks.walk,
        # value-nested objects get them here.
        conds = [tag == F.lit("object")]
        for p in t.props:
            if p.is_regex:
                continue
            psub = F.try_variant_get(sub, f"$.{p.name}", "variant")
            if not p.optional:
                conds.append(psub.isNotNull())
            if depth > 0:
                node = p.type
                while isinstance(node, Ref):
                    node = resolve(node.name)
                pred = _vpred(node, psub, _canon_tag(psub), resolve,
                              depth - 1)
                conds.append(
                    F.when(psub.isNull(), F.lit(True)).otherwise(pred))

        def pres(name: str) -> Column:
            return F.try_variant_get(sub, f"$.{name}", "variant") \
                .isNotNull()

        for group in t.one:
            n = reduce(Column.__add__,
                       (pres(g).cast("int") for g in group))
            conds.append(n == 1)
        for group in t.any:
            conds.append(reduce(or_, (pres(g) for g in group)))
        for group in t.all:
            n = reduce(Column.__add__,
                       (pres(g).cast("int") for g in group))
            conds.append((n == 0) | (n == len(group)))
        for name, needs in t.dep:
            conds.append(
                F.when(~pres(name), F.lit(True)).otherwise(
                    reduce(and_, (pres(d) for d in needs))))
        return reduce(and_, conds)
    if isinstance(t, UnionT):
        # depth-1 try/catch for non-discriminated members: any member's
        # FULL predicate passing validates the value (index.js:793-846).
        # Object members with @if/@then are runtime-DISCRIMINATED
        # (index.js:878-900, r5): when the object carries the @if prop
        # AND that prop's value validates against its declared type in
        # @then, the @then member DECIDES — no fallback to other
        # members (mirrors the static compiler, compiler.py:226-262).
        return _union_pred(t.members, sub, tag, resolve, depth)
    if isinstance(t, Primitive):
        n = t.name
        if n in FORMAT_REGEX:
            return (tag == "string") & _str(sub).rlike(FORMAT_REGEX[n])
        if n == "string":
            return tag == F.lit("string")
        if n == "char":
            return (tag == "string") & (F.length(_str(sub)) == 1)
        if n == "boolean":
            return tag == F.lit("boolean")
        if n in ("true", "false"):
            return ((tag == "boolean")
                    & (F.try_variant_get(sub, "$", "boolean")
                       == F.lit(n == "true")))
        if n == "integer":
            return (tag == "number") & _is_integral(_num(sub))
        if n in ("float", "double", "number"):
            return tag == F.lit("number")
        if n == "null":
            return tag == F.lit("null")
        if n == "atom":
            return tag.isin("string", "number", "boolean")
        if n == "object":
            return tag == F.lit("object")
        if n == "array":
            return tag == F.lit("array")
        if n == "any":
            # `any` accepts every value EXCEPT an embedded-@sjot
            # carrier (reference index.js:111-131 would validate it
            # against the schema it carries — a compiled fixed plan
            # cannot, so carriers must not silently pass; see
            # _no_embedded_sjot). This covers `any` wherever it nests:
            # array items, tuple slots, union members.
            return _no_embedded_sjot(sub)
    raise SpecError(f"jsonvalidate: unsupported node {t!r}")


def _union_members(members, sub, tag, resolve, depth):
    """Partition union members into discriminated @if/@then entries and
    fall-through predicates, mirroring the reference's union dispatch
    tables (index.js:1975-1977 build t/v/d; index.js:878-900 consult
    them BEFORE the try-all loop). Returns
    ``(discriminated, fallthrough)`` where ``discriminated`` is
    ``[(member_idx, cond, then_pred)]`` in declaration order — ``cond``
    is "value is an object AND the @if prop is present AND the prop
    value validates against its declared type in @then" (the reference
    try/catches ``item[when]`` against ``union[n].v[i]``,
    index.js:884-894) — and ``fallthrough`` is ``[(member_idx, pred)]``
    for every non-discriminated member."""
    discriminated, fallthrough = [], []
    for idx, m in enumerate(members):
        node = m
        while isinstance(node, Ref):
            node = resolve(node.name)
        if isinstance(node, ObjectT) and node.if_then:
            for ifprop, then in node.if_then:
                then_node = then
                while isinstance(then_node, Ref):
                    then_node = resolve(then_node.name)
                psub = F.try_variant_get(sub, f"$.{ifprop}", "variant")
                cond = (tag == F.lit("object")) & psub.isNotNull()
                p = (then_node.prop(ifprop)
                     if isinstance(then_node, ObjectT) else None)
                if p is not None:
                    vnode = p.type
                    while isinstance(vnode, Ref):
                        vnode = resolve(vnode.name)
                    cond = cond & F.coalesce(
                        _vpred(vnode, psub, _canon_tag(psub), resolve,
                               depth),
                        F.lit(False))
                discriminated.append((
                    idx, cond,
                    _vpred(then_node, sub, tag, resolve, depth)))
            continue
        fallthrough.append((idx, _vpred(node, sub, tag, resolve, depth)))
    return discriminated, fallthrough


def _union_pred(members, sub, tag, resolve, depth) -> Column:
    """Union pass-predicate with forced-member @if/@then semantics: the
    first matching discriminator DECIDES (its @then predicate is the
    verdict, true or false — no fallback), otherwise any fall-through
    member passing validates the value."""
    discriminated, fallthrough = _union_members(
        members, sub, tag, resolve, depth)
    fall = (reduce(or_, (p for _, p in fallthrough))
            if fallthrough else F.lit(False))
    if not discriminated:
        return fall
    chain = None
    for _, cond, then_p in discriminated:
        chain = (F.when(cond, then_p) if chain is None
                 else chain.when(cond, then_p))
    return chain.otherwise(fall)


def _no_embedded_sjot(sub: Column) -> Column:
    """Pass-predicate rejecting documents that carry an embedded
    runtime ``@sjot`` schema. The reference validates an object typed
    ``any`` against the schema the object itself carries under the
    ``@sjot`` key (/root/reference/index.js:111-131, throwing
    "Invalid @sjot schema" on a malformed one). A compiled fixed plan
    cannot load a per-row schema (COVERAGE.md E6/C6 design limit), so
    instead of SILENTLY accepting such documents as ``any`` — which
    would diverge from the reference whenever the embedded schema
    rejects its carrier — they surface as a typed
    ``*_embedded_sjot`` violation; route them to run_dispatched /
    per-partition overrides for actual validation."""
    return F.try_variant_get(sub, "$['@sjot']", "variant").isNull()


UNVALIDATABLE_SUFFIX = "_embedded_sjot"


def classify_violations(vdf: DataFrame) -> DataFrame:
    """Add a ``verdict_class`` column distinguishing the two kinds of
    violation rows validate_json_column emits: ``'invalid'`` (the data
    definitively breaks the spec) vs ``'unvalidatable'`` (an embedded
    ``@sjot`` carrier this compiled plan deliberately refuses to
    accept as ``any`` — see _no_embedded_sjot; the reference would
    validate it against its own carried schema, so route these rows
    to run_dispatched / per-partition overrides instead of rejecting
    the data). Additive: the base (key, partition, check_id, detail)
    contract is unchanged, and the tag is a pure Column expression
    derived from check_id."""
    return vdf.withColumn(
        "verdict_class",
        F.when(F.col("check_id").endswith(UNVALIDATABLE_SUFFIX),
               F.lit("unvalidatable")).otherwise(F.lit("invalid")),
    )


# ----------------------------------------------------------- check list

_CLASS_OF = [
    (Range, "range"), (SizedInt, "range"), (Regex, "format"),
    (CharLen, "len_bounds"), (ArrayOf, "array"), (Tuple, "tuple"),
    (UnionT, "union"), (ObjectT, "object"),
]


def _check_class(t: TypeNode) -> str:
    for cls, name in _CLASS_OF:
        if isinstance(t, cls):
            return name
    return "type"


def compile_json_checks(spec: CheckSpec, v: Column,
                        object_depth: int = OBJECT_RECURSION_DEPTH):
    """Flatten the root object into path-addressed checks over the
    parsed variant ``v``. Returns ``[(check_id, pass_col)]`` in
    deterministic spec order. Check ids mirror the static compiler's
    naming (``{path}_required`` / ``{path}_type`` / ``{path}_range`` …)
    with ``.``-joined nested paths.

    ``object_depth`` bounds recursion into objects nested inside
    VALUES (array items / tuple slots / union members) — the root
    object itself is path-flattened without consuming depth. See
    ``_vpred``; raising it trades plan size for reference parity on
    deeply nested documents (each level duplicates the nested check
    subtree into the parent predicate)."""
    root = spec.root
    while isinstance(root, Ref):
        root = spec.resolve(root.name)
    checks: list[tuple[str, Column]] = []

    def walk(obj: ObjectT, path: str, prefix: str):
        for p in obj.props:
            if p.is_regex:
                raise SpecError(
                    "jsonvalidate: regex property names need a "
                    "closed-world object; not supported on open JSON")
            ppath = f"{path}.{p.name}"
            pid = f"{prefix}{p.name}"
            sub = F.try_variant_get(v, ppath, "variant")
            present = sub.isNotNull()
            if not p.optional:
                checks.append((f"{pid}_required", present))
            node = p.type
            while isinstance(node, Ref):
                node = spec.resolve(node.name)
            if isinstance(node, ObjectT):
                # presence/type here, then recurse into nested props
                checks.append((
                    f"{pid}_type",
                    F.when(~present, F.lit(True))
                    .otherwise(_canon_tag(sub) == F.lit("object"))))
                walk(node, ppath, f"{pid}.")
                continue
            tag = _canon_tag(sub)
            if isinstance(node, Primitive) and node.name == "any":
                # the only check `any` carries is the embedded-@sjot
                # rejection; at prop level it gets its own typed id
                # instead of a generic always-true *_type
                checks.append((
                    f"{pid}_embedded_sjot",
                    F.when(~present, F.lit(True)).otherwise(
                        _no_embedded_sjot(sub))))
                continue
            cname = _check_class(node)
            ok = _vpred(node, sub, tag, spec.resolve, object_depth)
            checks.append((
                f"{pid}_{cname}",
                F.when(~present, F.lit(True)).otherwise(ok)))
        # object-level propsets (@one/@any/@all/@dep) over presence
        def pres(name: str) -> Column:
            return F.try_variant_get(v, f"{path}.{name}", "variant") \
                .isNotNull()

        for i, group in enumerate(obj.one):
            n = reduce(
                Column.__add__,
                (pres(g).cast("int") for g in group))
            checks.append((f"{prefix}one_{i}", n == 1))
        for i, group in enumerate(obj.any):
            checks.append(
                (f"{prefix}any_{i}",
                 reduce(or_, (pres(g) for g in group))))
        for i, group in enumerate(obj.all):
            n = reduce(
                Column.__add__, (pres(g).cast("int") for g in group))
            checks.append(
                (f"{prefix}all_{i}", (n == 0) | (n == len(group))))
        for name, needs in obj.dep:
            checks.append((
                f"{prefix}dep_{name}",
                F.when(~pres(name), F.lit(True)).otherwise(
                    reduce(and_, (pres(d) for d in needs)))))

    if isinstance(root, ObjectT):
        walk(root, "$", "")
    else:
        # scalar / union root: the whole document is the value
        sub = F.try_variant_get(v, "$", "variant")
        if isinstance(root, Primitive) and root.name == "any":
            checks.append(("root_embedded_sjot", _no_embedded_sjot(sub)))
        else:
            checks.append((
                f"root_{_check_class(root)}",
                _vpred(root, sub, _canon_tag(sub), spec.resolve,
                       object_depth)))
    return checks


# ------------------------------------------------------------ operators

def validate_json_column(
    df: DataFrame,
    json_col: str,
    spec: CheckSpec | dict,
    key: str,
    partition_by: str | None = None,
    object_depth: int = OBJECT_RECURSION_DEPTH,
) -> DataFrame:
    """Typed violation rows ``(key, partition, check_id, detail)`` for a
    string column of JSON documents — same output contract as
    ValidationEngine.run().violations (E1/E7). A document that fails to
    parse yields exactly one ``{json_col}_parse`` violation and no
    per-path noise (the reference throws on the first error of an
    instance; we gate all path checks on parse success). A SQL-NULL
    document is ABSENT, not invalid: it yields no violations at all —
    neither a parse violation nor per-path noise (path checks are
    gated on document presence; matches the DuckDB twin where
    ``json_valid(NULL)`` is NULL, so NULL docs match no predicate)."""
    if not isinstance(spec, CheckSpec):
        spec = CheckSpec(spec)
    v = F.try_parse_json(F.col(json_col))
    doc_null = F.col(json_col).isNull()
    parsed = v.isNotNull() | doc_null
    checks = [(f"{json_col}_parse", parsed)]
    checks += [
        (cid, F.when(doc_null | ~parsed, F.lit(True)).otherwise(c))
        for cid, c in compile_json_checks(spec, v, object_depth)
    ]
    part_col = (F.col(partition_by) if partition_by
                else F.lit("_all")).cast("string")
    # Evaluation-cost shape (measured at 500k rows): Spark's
    # subexpression elimination shares the variant parse/extract
    # subtrees across expressions inside ProjectExec/FilterExec, but
    # NOT inside a Generate (explode) input or a higher-order lambda —
    # so the check set must be evaluated exactly once, in a Project.
    # Stage 1 computes one boolean per check into an array (CSE
    # applies: ~10 checks cost barely more than one); the
    # monotonically_increasing_id barrier column is NONDETERMINISTIC,
    # which stops CollapseProject and predicate pushdown from
    # re-inlining the whole check set into downstream operators (each
    # re-inlined copy would re-evaluate every variant chain without
    # sharing — the naive shapes measured 6-25x slower). Stage 2
    # filters and explodes FAIL INDICES off the tiny boolean array;
    # check ids and details derive from a literal name array.
    names = F.lit([cid for cid, _ in checks])
    okarr = F.array(*[F.coalesce(c, F.lit(False)) for _, c in checks])
    staged = df.select(
        F.col(key).cast("string").alias("key"),
        part_col.alias("partition"),
        okarr.alias("_ok"),
        F.monotonically_increasing_id().alias("_barrier"),
    )
    fail_idx = F.filter(
        F.transform(F.col("_ok"),
                    lambda x, i: F.when(x, F.lit(-1)).otherwise(i)),
        lambda i: i >= 0,
    )
    check_id = F.get(names, F.col("i"))
    return (
        # No pre-filter AT ALL: the variant expressions inside the
        # checks are CodegenFallback nodes that subexpression
        # elimination cannot share, so the check set must appear
        # EXACTLY ONCE in the plan — and Catalyst substitutes any
        # filter predicate straight through the projection into the
        # scan (even past a nondeterministic barrier column),
        # duplicating the whole set (measured 2-4x slower for every
        # filtered shape). Explode IS the filter: a passing row's
        # fail-index array is empty and generates nothing, while the
        # Generate input references the MATERIALIZED _ok attribute
        # from the projection below, so checks run once per row
        staged.select("key", "partition", F.explode(fail_idx).alias("i"))
        .select(
            "key", "partition",
            check_id.alias("check_id"),
            F.format_string(
                "$.%s violation in JSON document", check_id,
            ).alias("detail"),
        )
    )


def union_dispatch_index(
    df: DataFrame,
    json_col: str,
    spec: CheckSpec | dict,
    prop: str,
    key: str,
    object_depth: int = OBJECT_RECURSION_DEPTH,
) -> DataFrame:
    """Which union member validated each row's ``prop`` value —
    1-based FIRST match in member order (the reference tries members in
    declaration order and the first success returns,
    index.js:793-846); 0 = no member matched (the union error path).
    @if/@then members are checked FIRST (the reference consults the
    discriminator tables before try-all, index.js:878-900): the first
    matching discriminator decides — its member index if @then
    validates, else 0 (forced member; no fallback).
    Returns ``(key, member)``."""
    if not isinstance(spec, CheckSpec):
        spec = CheckSpec(spec)
    root = spec.root
    while isinstance(root, Ref):
        root = spec.resolve(root.name)
    p = root.prop(prop) if isinstance(root, ObjectT) else None
    if p is None:
        raise SpecError(f"no property {prop!r} in root object")
    node = p.type
    while isinstance(node, Ref):
        node = spec.resolve(node.name)
    if not isinstance(node, UnionT):
        raise SpecError(f"property {prop!r} is not a union")
    v = F.try_parse_json(F.col(json_col))
    sub = F.try_variant_get(v, f"$.{prop}", "variant")
    tag = _canon_tag(sub)
    discriminated, fallthrough = _union_members(
        node.members, sub, tag, spec.resolve, object_depth)
    expr = F.lit(0)
    for i, p in reversed(fallthrough):
        expr = F.when(F.coalesce(p, F.lit(False)), F.lit(i + 1)) \
            .otherwise(expr)
    # discriminators wrap the fall-through chain so they are checked
    # first; a matching discriminator is terminal either way
    for i, cond, then_p in reversed(discriminated):
        expr = F.when(
            F.coalesce(cond, F.lit(False)),
            F.when(F.coalesce(then_p, F.lit(False)), F.lit(i + 1))
            .otherwise(F.lit(0)),
        ).otherwise(expr)
    return df.select(
        F.col(key).cast("string").alias("key"),
        F.when(sub.isNull(), F.lit(-1)).otherwise(expr).alias("member"),
    )


def autovalidate_json_column(
    df: DataFrame,
    json_col: str,
    key: str,
    partition_by: str | None = None,
    sample_rows: int = 10_000,
):
    """snapSJOT end-to-end: infer a CheckSpec from a bounded sample of
    the column (jsoninfer.infer_json_spec — the reference's snapSJOT
    unification) and validate EVERY row against it. Returns
    ``(spec, violations_df)`` — rows that deviate from the sampled
    shape (new types, missing props, unparseable docs) surface as
    typed violations. The sample is driver-side but bounded
    (``limit(sample_rows)``); validation is the one-projection
    variant pipeline."""
    from sjot_spark.jsoninfer import infer_json_spec

    spec = infer_json_spec(df, json_col, sample_rows=sample_rows)
    return spec, validate_json_column(
        df, json_col, spec, key=key, partition_by=partition_by)
