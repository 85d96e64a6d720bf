"""Schema sets: multiple CheckSpecs addressed by ``@id`` URI with
cross-spec ``URI#name`` references.

Reference semantics (sjot_reftype + sjot_load,
/root/reference/index.js:1102-1191; schema sets README.md:44-52):

- a schema SET is a collection of schemas, each carrying an ``@id``;
- ``URI#name`` resolves against the set member whose ``@id`` == URI;
  ``URI#`` resolves to that member's root type;
- an unknown URI triggers a load and the result is CACHED into the set
  (index.js:1149-1153) — here via a ``loader`` callback over the
  catalog / any Hadoop filesystem, never synchronous HTTP;
- "spaghetti references" (a named type that is itself a bare
  reference) are rejected (index.js:1116-1117).

Cross-spec context: a type fetched from schema B may contain B-local
``#x`` references; they are rewritten to fully-qualified ``B#x`` on
the way out, so the borrowing spec's resolver routes them back to B
through the registry (the reference achieves the same by threading the
owning schema through sjot_validate's recursion)."""

from __future__ import annotations

import json
from dataclasses import replace
from typing import Callable

from sjot_spark.errors import SpecError
from sjot_spark.spec.typestr import (
    ArrayOf, ObjectT, Ref, Tuple, TypeNode, UnionT,
)


def qualify(t: TypeNode, uri: str) -> TypeNode:
    """Rewrite spec-local references (#x, #) inside t to URI#x so they
    keep resolving in their home schema after t is lent to another."""
    if isinstance(t, Ref):
        return replace(t, name=f"{uri}{t.name}") if t.name.startswith("#") else t
    if isinstance(t, ArrayOf):
        return replace(t, item=qualify(t.item, uri))
    if isinstance(t, Tuple):
        return replace(t, items=tuple(qualify(i, uri) for i in t.items))
    if isinstance(t, UnionT):
        return replace(t, members=tuple(qualify(m, uri) for m in t.members))
    if isinstance(t, ObjectT):
        return replace(t, props=tuple(
            replace(p, type=qualify(p.type, uri)) for p in t.props
        ))
    return t


class SpecRegistry:
    """A schema set. ``loader(uri) -> dict|str`` supplies unknown
    schemas on demand (filesystem/catalog path keyed by URI)."""

    def __init__(self, specs=(), loader: Callable[[str], object] | None = None):
        from sjot_spark.spec.spec import CheckSpec

        self._spec_cls = CheckSpec
        self._by_id: dict[str, object] = {}
        self._loader = loader
        for s in specs:
            self.add(s)

    def add(self, doc):
        """Register one schema (dict/JSON string/CheckSpec); it must
        carry an ``@id``. Returns the CheckSpec."""
        spec = doc if isinstance(doc, self._spec_cls) \
            else self._spec_cls(doc, registry=self)
        uri = spec.doc.get("@id")
        if not isinstance(uri, str) or "#" in uri or not uri:
            raise SpecError(f"registry schemas need a #-free string @id, got {uri!r}")
        if uri in self._by_id:
            raise SpecError(f"duplicate schema @id {uri}")
        spec._registry = self
        self._by_id[uri] = spec
        return spec

    def get(self, uri: str):
        if uri not in self._by_id:
            if self._loader is None:
                raise SpecError(f"unknown schema {uri!r} and no loader configured")
            doc = self._loader(uri)
            raw = doc.doc if isinstance(doc, self._spec_cls) else (
                json.loads(doc) if isinstance(doc, str) else doc)
            got = raw.get("@id") if isinstance(raw, dict) else None
            if got != uri:
                # an @id mismatch must fail loudly BEFORE polluting the
                # set (the reference caches under the requested URI,
                # index.js:1149-1153; here @id is authoritative, so a
                # loader answering with a different identity is a bug)
                raise SpecError(
                    f"loader returned schema with @id {got!r} for "
                    f"requested URI {uri!r}")
            self.add(doc)  # cached, like sjot_load
        return self._by_id[uri]

    def resolve(self, ref: str) -> TypeNode:
        """``URI#name`` / ``URI#`` → the named (or root) type of the
        member schema, with its internal references qualified."""
        uri, _, name = ref.partition("#")
        spec = self.get(uri)
        if name == "":
            t = spec.root  # URI# = remote root (index.js:1127-1129)
        else:
            if name not in spec.named:
                raise SpecError(
                    f"schema {uri} has no named type {name!r} (ref {ref})")
            t = spec.named[name]
        if isinstance(t, Ref):
            # parity: index.js:1116-1117
            raise SpecError(
                f"spaghetti references to named types not permitted ({ref})")
        return qualify(t, uri)

    def check(self) -> bool:
        """Check every member schema (cross-spec references resolve
        through this registry, loading as needed)."""
        for spec in list(self._by_id.values()):
            spec.check()
        return True
