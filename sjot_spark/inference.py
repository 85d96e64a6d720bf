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
- struct columns -> nested object types, recursively: every nested
  field is profiled with the same evidence in the SAME single
  aggregation pass, and a field that is null in rows where its parent
  struct is present becomes optional WITHIN the nested object — the
  columnar analog of snapSJOT's recursive object unification
  (snapsjot.js:169-213, 304-375)
- a column named like an id that is observed unique -> @table.unique
  candidate + key
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sjot_spark.spec.spec import CheckSpec
from sjot_spark.spec.typestr import FORMAT_REGEX

# most-specific first; hex before base64 (hex strings are a subset of
# the base64 alphabet, so the narrower format must win)
_FORMAT_ORDER = ["uuid", "datetime", "date", "time", "duration", "hex", "base64"]

_NUMERIC_DT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType)
_INT_ELEM_DT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


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


class _Probe:
    """One profiled field (possibly nested); collects its aggregation
    columns and later turns the profile row into a SJOT type string."""

    def __init__(self, name: str, c: Column, dt: T.DataType, idx: list):
        self.name = name
        self.dt = dt
        self.key = f"f{len(idx)}"
        idx.append(self)
        self.children: list[_Probe] = []
        self.aggs = [F.sum(c.isNull().cast("long")).alias(f"{self.key}__nulls")]
        if isinstance(dt, _NUMERIC_DT):
            self.kind = "num"
            self.aggs += [F.min(c).alias(f"{self.key}__min"),
                          F.max(c).alias(f"{self.key}__max")]
        elif isinstance(dt, T.StringType):
            self.kind = "str"
            for fmt in _FORMAT_ORDER:
                self.aggs.append(
                    F.sum((~c.rlike(FORMAT_REGEX[fmt])).cast("long"))
                    .alias(f"{self.key}__not_{fmt}"))
            self.aggs.append(F.countDistinct(c).alias(f"{self.key}__distinct"))
        elif isinstance(dt, T.ArrayType) and isinstance(
                dt.elementType, _INT_ELEM_DT):
            self.kind = "intarray"
            self.aggs += [
                F.min(F.array_min(c)).alias(f"{self.key}__emin"),
                F.max(F.array_max(c)).alias(f"{self.key}__emax"),
                F.min(F.size(c)).alias(f"{self.key}__szmin"),
                F.max(F.size(c)).alias(f"{self.key}__szmax"),
            ]
        elif isinstance(dt, T.BooleanType):
            self.kind = "bool"
        elif isinstance(dt, T.StructType):
            self.kind = "struct"
            for f in dt.fields:
                self.children.append(
                    _Probe(f.name, c.getField(f.name), f.dataType, idx))
        else:
            self.kind = "other"

    def all_aggs(self):
        out = list(self.aggs)
        for ch in self.children:
            out += ch.all_aggs()
        return out

    def nulls(self, prof) -> int:
        return prof[f"{self.key}__nulls"] or 0

    def type_of(self, prof, n_rows: int, slack: float):
        """The inferred SJOT type (string or nested dict)."""
        k = self.key
        if self.kind == "num":
            lo, hi = prof[f"{k}__min"], prof[f"{k}__max"]
            if lo is None or not (math.isfinite(float(lo))
                                  and math.isfinite(float(hi))):
                return "number"  # empty sample or inf/nan: no evidence
            if slack:
                span = (hi - lo) * slack
                lo, hi = lo - span, hi + span
            if isinstance(self.dt, (T.FloatType, T.DoubleType)):
                return f"{_fmt_float(lo)}..{_fmt_float(hi)}"
            return f"{_fmt_num(lo)}..{_fmt_num(hi)}"
        if self.kind == "str":
            for fmt in _FORMAT_ORDER:
                if prof[f"{k}__not_{fmt}"] == 0 and n_rows > 0:
                    return fmt
            return "string"
        if self.kind == "intarray":
            emin, emax = prof[f"{k}__emin"], prof[f"{k}__emax"]
            if emin is None:
                return "int[]"
            return (f"{_fmt_num(emin)}..{_fmt_num(emax)}"
                    f"[{int(prof[f'{k}__szmin'])},{int(prof[f'{k}__szmax'])}]")
        if self.kind == "bool":
            return "boolean"
        if self.kind == "struct":
            # a child null in rows where the struct IS present means
            # optional-within-object (child nulls beyond the parent's
            # are genuine: getField on a null struct is null)
            obj: dict = {}
            for ch in self.children:
                opt = ch.nulls(prof) > self.nulls(prof)
                obj[f"{ch.name}?" if opt else ch.name] = \
                    ch.type_of(prof, n_rows, slack)
            return obj
        return "any"


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
    idx: list[_Probe] = []
    roots = [
        _Probe(f.name, F.col(f.name), f.dataType, idx)
        for f in sample.schema.fields
    ]
    aggs = [a for p in roots for a in p.all_aggs()]
    aggs.append(F.count(F.lit(1)).alias("__rows"))
    prof = sample.agg(*aggs).first().asDict()
    n_rows = prof["__rows"]

    props: dict = {}
    unique_cols: list[str] = []
    for p in roots:
        optional = p.nulls(prof) > 0
        props[f"{p.name}?" if optional else p.name] = \
            p.type_of(prof, n_rows, slack)
        if p.kind == "str":
            nn = n_rows - p.nulls(prof)
            if nn > 0 and prof[f"{p.key}__distinct"] == nn and not optional:
                unique_cols.append(p.name)

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
