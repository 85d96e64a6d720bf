"""Array/set/char size-bounds suffixes: ``[]``, ``[n]``, ``[n,]``,
``[,m]``, ``[n,m]`` and the ``{...}`` set forms.

Mirrors sjot_validate_bounds (/root/reference/index.js:920-966) for
value semantics and sjot_check's non-negative / lo<=hi rules
(/root/reference/index.js:1556-1631).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from sjot_spark.errors import SpecError

_BOUNDS_RE = re.compile(r"^(?:(\d+)(,)?(\d+)?|(,)(\d+))?$")


@dataclass(frozen=True)
class Bounds:
    """lo/hi length bounds; None = unbounded. exact=True for [n]."""

    lo: int | None = None
    hi: int | None = None
    exact: bool = False

    def check_len(self, n: int) -> bool:
        if self.exact:
            return n == self.lo
        if self.lo is not None and n < self.lo:
            return False
        if self.hi is not None and n > self.hi:
            return False
        return True

    @property
    def unbounded(self) -> bool:
        return self.lo is None and self.hi is None


def parse_bounds(inner: str, typepath: str = "") -> Bounds:
    """Parse the text between '[' and ']' (or '{' and '}')."""
    m = _BOUNDS_RE.match(inner)
    if not m:
        raise SpecError(f"invalid size bounds [{inner}]", typepath)
    n, comma, m2, comma2, m3 = m.groups()
    if n is None and comma2 is None:
        return Bounds()  # "[]"
    if comma2 is not None:  # "[,m]"
        return Bounds(None, int(m3))
    if comma is None:  # "[n]"
        return Bounds(int(n), int(n), exact=True)
    if m2 is None:  # "[n,]"
        return Bounds(int(n), None)
    lo, hi = int(n), int(m2)  # "[n,m]"
    if lo > hi:
        raise SpecError(f"empty size bounds [{inner}]", typepath)
    return Bounds(lo, hi)
