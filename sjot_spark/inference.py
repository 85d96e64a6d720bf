"""Schema inference: DataFrame -> CheckSpec (the snapSJOT analog,
/root/reference/dev/snapsjot.js:22-375, reimagined set-oriented).

snapSJOT walks one JSON value at a time and unifies types across
rows; here the Spark schema already gives exact types, and ONE
aggregation pass over a sample provides the value-domain evidence
(ranges, optionality, formats, array bounds) — the columnar analog of
snapSJOT's per-row unification:

- column dtype -> base SJOT type (int/long/double/string/boolean/...)
- observed nulls -> optional property (`col?`), mirroring snapSJOT's
  union-with-null => optional
- numeric columns -> range type "min..max" (widened by `slack`)
- string columns -> a format type (date/uuid/hex/...) if EVERY
  sampled value matches that format's regex (tried in specificity
  order), else "string"
- array columns -> element range + observed size bounds
- a column named like an id that is observed unique -> @table.unique
  candidate + key
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import FORMAT_REGEX

# most-specific first; hex before base64 (hex strings are a subset of
# the base64 alphabet, so the narrower format must win)
_FORMAT_ORDER = ["uuid", "datetime", "date", "time", "duration", "hex", "base64"]

_INT_BOUNDS = [
    ("byte", -128, 127), ("short", -32768, 32767),
    ("int", -2147483648, 2147483647),
]


def _fmt_num(v) -> str:
    """Plain-decimal literal (the SJOT range grammar has no scientific
    notation, so repr()-style '1e+16' / '1e-05' would be rejected)."""
    f = float(v)
    if f == int(f):
        return str(int(f))
    s = f"{f:.17f}".rstrip("0")
    return s + "0" if s.endswith(".") else s


def _fmt_float(v) -> str:
    """Like _fmt_num but guaranteed to carry a '.' so the range stays
    float-admitting."""
    s = _fmt_num(v)
    return s if "." in s else s + ".0"


def infer_spec(
    df: DataFrame,
    sample_rows: int = 100_000,
    type_name: str = "Inferred",
    slack: float = 0.0,
) -> CheckSpec:
    """Profile (a sample of) the DataFrame and return a checked
    CheckSpec. ``slack`` widens numeric ranges by that fraction of the
    observed span (0 = exact observed domain, snapSJOT-style)."""
    sample = df.limit(sample_rows)
    aggs, plan = [], []
    for f in sample.schema.fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{f.name}__nulls"))
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType,
                                   T.LongType, T.FloatType, T.DoubleType)):
            aggs += [F.min(c).alias(f"{f.name}__min"),
                     F.max(c).alias(f"{f.name}__max")]
            plan.append((f.name, "num", f.dataType))
        elif isinstance(f.dataType, T.StringType):
            for fmt in _FORMAT_ORDER:
                aggs.append(
                    F.sum((~c.rlike(FORMAT_REGEX[fmt])).cast("long"))
                    .alias(f"{f.name}__not_{fmt}"))
            aggs.append(F.countDistinct(c).alias(f"{f.name}__distinct"))
            plan.append((f.name, "str", f.dataType))
        elif isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            aggs += [
                F.min(F.array_min(c)).alias(f"{f.name}__emin"),
                F.max(F.array_max(c)).alias(f"{f.name}__emax"),
                F.min(F.size(c)).alias(f"{f.name}__szmin"),
                F.max(F.size(c)).alias(f"{f.name}__szmax"),
            ]
            plan.append((f.name, "intarray", f.dataType))
        elif isinstance(f.dataType, T.BooleanType):
            plan.append((f.name, "bool", f.dataType))
        else:
            plan.append((f.name, "other", f.dataType))
    aggs.append(F.count(F.lit(1)).alias("__rows"))
    prof = sample.agg(*aggs).first().asDict()
    n_rows = prof["__rows"]

    props: dict = {}
    unique_cols: list[str] = []
    for name, kind, dt in plan:
        optional = (prof[f"{name}__nulls"] or 0) > 0
        if kind == "num":
            lo, hi = prof[f"{name}__min"], prof[f"{name}__max"]
            if lo is None or not (math.isfinite(float(lo)) and math.isfinite(float(hi))):
                t = "number"  # empty sample or inf/nan: no range evidence
            else:
                if slack:
                    span = (hi - lo) * slack
                    lo, hi = lo - span, hi + span
                if isinstance(dt, (T.FloatType, T.DoubleType)):
                    t = f"{_fmt_float(lo)}..{_fmt_float(hi)}"
                else:
                    t = f"{_fmt_num(lo)}..{_fmt_num(hi)}"
        elif kind == "str":
            t = "string"
            for fmt in _FORMAT_ORDER:
                if prof[f"{name}__not_{fmt}"] == 0 and n_rows > 0:
                    t = fmt
                    break
            nn = n_rows - (prof[f"{name}__nulls"] or 0)
            if nn > 0 and prof[f"{name}__distinct"] == nn and not optional:
                unique_cols.append(name)
        elif kind == "intarray":
            emin, emax = prof[f"{name}__emin"], prof[f"{name}__emax"]
            szmin, szmax = prof[f"{name}__szmin"], prof[f"{name}__szmax"]
            if emin is None:
                t = "int[]"
            else:
                t = (f"{_fmt_num(emin)}..{_fmt_num(emax)}"
                     f"[{int(szmin)},{int(szmax)}]")
        elif kind == "bool":
            t = "boolean"
        else:
            t = "any"
        props[f"{name}?" if optional else name] = t

    doc: dict = {"@root": f"#{type_name}", type_name: props}
    table: dict = {}
    if unique_cols:
        table["unique"] = unique_cols[:1]
        table["key"] = unique_cols[0]
    if table:
        doc["@table"] = table
    spec = CheckSpec(doc)
    spec.check()
    return spec
