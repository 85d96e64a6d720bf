"""CheckSpec — the engine's schema document.

Same template look-and-feel as an SJOT schema (/root/reference/
README.md:44-120): a flat dict of named types with a distinguished
``@root``, property types written as SJOT type strings. Extended with
an ``@table`` section for table-level clauses the reference has no
analog for at scale: key column, cross-row uniqueness, sibling-column
consistency, referential integrity against a dimension table,
distribution-drift checks, partition column.

Example::

    {
      "@root": "#Sequence",
      "Sequence": {
        "doc_id": "(doc\\\\d{12})",
        "tokens": "0..50256[1,8192]",
        "n_tok": "1..8192",
        "source": "string"
      },
      "@table": {
        "key": "doc_id",
        "partition_by": "source",
        "unique": ["doc_id"],
        "consistent": {"n_tok": "size(tokens)"},
        "ref": {"source": {"dim": "allowed_sources", "column": "source"}},
        "drift": {
          "len_hist":  {"kind": "length_histogram", "column": "tokens",
                         "bucket_width": 64, "group_by": "source"},
          "id_hist":   {"kind": "value_histogram", "column": "tokens",
                         "bucket_width": 1024, "group_by": "source"}
        }
      }
    }
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from sjot_spark.errors import SpecError
from sjot_spark.spec import checker
from sjot_spark.spec.typestr import ObjectT, Ref, TypeNode, parse_type

_TABLE_KEYS = {
    "key", "partition_by", "unique", "consistent", "ref", "drift",
}


@dataclass(frozen=True)
class RefClause:
    column: str
    dim: str          # name of the dimension table (resolved at run time)
    dim_column: str


@dataclass(frozen=True)
class DriftClause:
    name: str
    kind: str         # length_histogram | value_histogram
    column: str
    bucket_width: int
    group_by: str | None
    test: str = "chi2"       # chi2 | ks | psi (alpha = PSI threshold)
    alpha: float = 0.001


@dataclass(frozen=True)
class TableClauses:
    key: str | None = None
    partition_by: str | None = None
    unique: tuple[str, ...] = ()
    consistent: tuple[tuple[str, str], ...] = ()  # (col, "size(other)")
    refs: tuple[RefClause, ...] = ()
    drift: tuple[DriftClause, ...] = ()


def _flatten_extends(name: str, raw: dict, named_raw: dict, seen=()) -> dict:
    """@extends single-inheritance flattening (sjot_extends,
    /root/reference/index.js:969-1065): expand the base recursively,
    forbid overriding base props and extending @final bases,
    concatenate @one/@any/@all, merge @dep."""
    ext = raw.get("@extends")
    if ext is None:
        return raw
    if name in seen:
        raise SpecError(f"circular @extends at {name}")
    base_name = ext.lstrip("#")
    base_raw = named_raw.get(base_name)
    if not isinstance(base_raw, dict):
        raise SpecError(f"@extends {ext}: no such object type", name)
    base = _flatten_extends(base_name, base_raw, named_raw, (*seen, name))
    if base.get("@final"):
        raise SpecError(f"cannot @extends final type {ext}", name)
    merged: dict = {k: v for k, v in base.items() if k not in ("@root", "@id")}
    base_props = {k.partition("?")[0] for k in base if not k.startswith("@")}
    for k, v in raw.items():
        if k == "@extends":
            continue
        if k in ("@one", "@any", "@all"):
            merged[k] = list(base.get(k, [])) + list(v)
        elif k == "@dep":
            d = dict(base.get("@dep", {}))
            d.update(v)
            merged[k] = d
        elif not k.startswith("@") and k.partition("?")[0] in base_props:
            raise SpecError(f"@extends cannot override base property {k}", name)
        else:
            merged[k] = v
    return merged


class CheckSpec:
    """A parsed, checkable, compilable constraint specification."""

    def __init__(self, doc: dict | str, registry=None):
        if isinstance(doc, str):
            doc = json.loads(doc)  # E4: schema parse (index.js:32-33)
        if not isinstance(doc, dict):
            raise SpecError("spec must be a JSON object")
        self.doc = doc
        # schema-set membership: URI#name references route through the
        # registry (sjot_spark.spec.registry; index.js:1102-1191)
        self._registry = registry
        named_raw = {
            k: v for k, v in doc.items() if not k.startswith("@")
        }
        # @extends flattening happens once, driver-side (memoized in the
        # reference by mutating the schema; here we build a new dict)
        flat_raw = {
            k: _flatten_extends(k, v, named_raw) if isinstance(v, dict) else v
            for k, v in named_raw.items()
        }
        self.named: dict[str, TypeNode] = {
            k: parse_type(v, f"/{k}") for k, v in flat_raw.items()
        }
        self._root_name = self._resolve_root(doc)
        self.table = self._parse_table(doc.get("@table", {}))

    # -- root resolution (sjot_roottype, index.js:1068-1099)
    def _resolve_root(self, doc: dict) -> str:
        root = doc.get("@root")
        if root is not None:
            if isinstance(root, str) and root.startswith("#"):
                name = root[1:]
                if name not in self.named:
                    raise SpecError(f"@root {root}: no such type")
                return name
            # inline root type (flatten @extends against named types too)
            if isinstance(root, dict) and "@extends" in root:
                named_raw = {
                    k: v for k, v in doc.items() if not k.startswith("@")
                }
                root = _flatten_extends("@root", root, named_raw)
            self.named["@root"] = parse_type(root, "/@root")
            return "@root"
        if len(self.named) == 1:
            return next(iter(self.named))
        raise SpecError(
            "spec has no @root and no unique named type"
            if not self.named
            else "spec has no @root and more than one named type"
        )

    @property
    def root(self) -> TypeNode:
        return self.named[self._root_name]

    @property
    def root_name(self) -> str:
        return self._root_name

    def resolve(self, ref: str) -> TypeNode:
        """#name → named type; URI#name → cross-schema type through the
        owning SpecRegistry (sjot_reftype, index.js:1102-1163). Remote
        URIs load via the registry's loader callback (catalog or any
        Hadoop filesystem — the sjot_load analog, index.js:1166-1191 —
        never synchronous HTTP)."""
        if not ref.startswith("#"):  # URI#name / URI#
            if self._registry is None:
                raise SpecError(
                    f"cross-schema reference {ref!r} needs a SpecRegistry "
                    "(construct the spec via SpecRegistry.add)")
            return self._registry.resolve(ref)
        name = ref[1:]
        if name == "":  # "#" = root self-reference
            return self.root
        if name not in self.named:
            raise SpecError(f"no such type reference {ref}")
        return self.named[name]

    def _parse_table(self, t: dict) -> TableClauses:
        if not isinstance(t, dict):
            raise SpecError("@table must be an object")
        unknown = set(t) - _TABLE_KEYS
        if unknown:
            raise SpecError(f"unknown @table clauses: {sorted(unknown)}")
        refs = tuple(
            RefClause(col, spec["dim"], spec.get("column", col))
            for col, spec in t.get("ref", {}).items()
        )
        drift = tuple(
            DriftClause(
                name=name,
                kind=d["kind"],
                column=d["column"],
                bucket_width=int(d.get("bucket_width", 64)),
                group_by=d.get("group_by"),
                test=d.get("test", "chi2"),
                alpha=float(d.get("alpha", 0.001)),
            )
            for name, d in t.get("drift", {}).items()
        )
        for d in drift:
            if d.kind not in ("length_histogram", "value_histogram"):
                raise SpecError(f"unknown drift kind {d.kind}")
            if d.test not in ("chi2", "ks", "psi"):
                raise SpecError(f"unknown drift test {d.test}")
        return TableClauses(
            key=t.get("key"),
            partition_by=t.get("partition_by"),
            unique=tuple(t.get("unique", [])),
            consistent=tuple((k, v) for k, v in t.get("consistent", {}).items()),
            refs=refs,
            drift=drift,
        )

    # -- E3: SJOT.check analog
    def check(self) -> bool:
        """Structural + satisfiability check; raises SpecError on any
        problem, returns True otherwise (API parity with SJOT.check,
        index.js:80-102)."""
        for name, t in self.named.items():
            checker.check_type(t, self.resolve, f"/{name}")
        # table clauses must refer to root object columns
        root = self.root
        if isinstance(root, ObjectT):
            cols = {p.name for p in root.props if not p.is_regex}
            for c in self.table.unique:
                if c not in cols:
                    raise SpecError(f"@table.unique column {c} not in root object")
            for c, expr in self.table.consistent:
                if c not in cols:
                    raise SpecError(f"@table.consistent column {c} not in root object")
            for r in self.table.refs:
                if r.column not in cols:
                    raise SpecError(f"@table.ref column {r.column} not in root object")
            if self.table.key is not None and self.table.key not in cols:
                raise SpecError(f"@table.key {self.table.key} not in root object")
        return True

    @classmethod
    def from_json(cls, text: str) -> "CheckSpec":
        return cls(json.loads(text))

    @classmethod
    def load(cls, spark, path: str) -> "CheckSpec":
        """Load a spec document from any Hadoop-compatible filesystem
        (file://, s3://, hdfs://, ...) — the distributed-storage analog
        of the reference's remote URI#name schema loading
        (/root/reference/index.js:1166-1191), minus the synchronous
        HTTP: specs live next to the data they govern."""
        text = "\n".join(
            r[0] for r in spark.read.text(path, wholetext=True).collect()
        )
        return cls(json.loads(text))

    def to_json(self) -> str:
        return json.dumps(self.doc, indent=2)
