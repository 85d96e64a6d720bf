"""SJOT numeric range/enumeration type strings.

Grammar (reference: /root/reference/README.md:78-84, validator scan at
/root/reference/index.js:543-663): a comma-separated list of items,
each one of

    n            exact value
    n..          at-least (inclusive), <n.. exclusive
    ..m          at-most (inclusive), ..m> exclusive
    n..m         inclusive range; <n..m / n..m> / <n..m> exclusivity

Float semantics (verified against the reference by execution): a
*float* data value is scanned against items **in order**; at the
first item whose checked literal(s) lack a '.' the scan breaks and
the value is rejected, even if a later all-float item would match.
An integral data value matches the plain union of all items. So
``1.5 ∉ "1..10"`` but ``1.5 ∈ "1.0..10.0"``, and ``1.5 ∉ "1,1.0..2.0"``
(the leading integral literal ``1`` breaks the scan for floats).

This module parses the grammar once on the driver and exposes:

- ``parse_range(s) -> RangeSpec`` (raises SpecError on bad grammar —
  analog of sjot_check's range rules, index.js:1633-1700)
- ``RangeSpec.match_py(v)`` — pure-Python evaluator (unit tests,
  reference-parity checks)
- ``RangeSpec.int_intervals`` / ``float_prefix_intervals`` — the two
  compiled interval unions the Spark compiler turns into
  ``between``/comparison Column expressions (sjot_spark.compiler).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from sjot_spark.errors import SpecError

# one range item, anchored; mirrors the shapes the validator scan accepts
_ITEM_RE = re.compile(
    r"""^(?:
        (?P<xlo><)?(?P<lo>-?\d+(?:\.\d+)?)\.\.(?:(?P<hi>-?\d+(?:\.\d+)?)(?P<xhi>>)?)?  # n.. | n..m forms
        | \.\.(?P<hi2>-?\d+(?:\.\d+)?)(?P<xhi2>>)?                                     # ..m forms
        | (?P<val>-?\d+(?:\.\d+)?)                                                     # single value
    )$""",
    re.VERBOSE,
)

_NUM_RE = r"-?\d+(?:\.\d+)?"
RANGE_STRING_RE = re.compile(
    rf"^(?:<?{_NUM_RE}\.\.(?:{_NUM_RE}>?)?|\.\.{_NUM_RE}>?|{_NUM_RE})"
    rf"(?:,(?:<?{_NUM_RE}\.\.(?:{_NUM_RE}>?)?|\.\.{_NUM_RE}>?|{_NUM_RE}))*$"
)


def _is_float_literal(lit: str | None) -> bool:
    return lit is not None and "." in lit


@dataclass(frozen=True)
class RangeItem:
    """One item: closed/open interval or point.

    ``lo``/``hi`` None = unbounded on that side. ``checked_literals``
    records, in the reference's check order, whether each bound
    literal the validator inspects is a float literal — this drives
    the float-data break semantics.
    """

    lo: float | None
    hi: float | None
    xlo: bool  # exclusive low
    xhi: bool  # exclusive high
    checked_float: tuple[bool, ...]  # per checked literal, in scan order

    @property
    def all_float(self) -> bool:
        return all(self.checked_float)

    def contains(self, v: float) -> bool:
        if self.lo is not None:
            if v < self.lo or (self.xlo and v == self.lo):
                return False
        if self.hi is not None:
            if v > self.hi or (self.xhi and v == self.hi):
                return False
        return True


@dataclass(frozen=True)
class RangeSpec:
    """Compiled range/enum type string."""

    source: str
    items: tuple[RangeItem, ...]

    @property
    def float_prefix(self) -> tuple[RangeItem, ...]:
        """Items a float value may match: the prefix before the first
        item containing an integral checked literal (index.js:566-571,
        592-597, 612-617, 642-647 — ``break`` on missing '.')."""
        out = []
        for it in self.items:
            if not it.all_float:
                break
            out.append(it)
        return tuple(out)

    def match_py(self, v: float) -> bool:
        """Pure-Python mirror of the validator scan (index.js:543-659).
        NaN never matches: every JS comparison with NaN is false."""
        if isinstance(v, float) and math.isnan(v):
            return False
        # infinities are integral per the reference (Math.floor(Inf)
        # is Inf); math.floor raises on them in Python
        isfloat = (not (isinstance(v, float) and math.isinf(v))
                   and math.floor(v) != v)
        items = self.float_prefix if isfloat else self.items
        return any(it.contains(v) for it in items)

    def bounds_hull(self) -> tuple[float | None, float | None]:
        """(min lo, max hi) over all items; None = unbounded side."""
        lows = [it.lo for it in self.items]
        highs = [it.hi for it in self.items]
        lo = None if any(l is None for l in lows) else min(lows)
        hi = None if any(h is None for h in highs) else max(highs)
        return lo, hi


def parse_range(s: str, typepath: str = "") -> RangeSpec:
    """Parse a range/enum type string; SpecError on bad grammar or an
    empty interval (sjot_check rules, index.js:1633-1700)."""
    if not s or not RANGE_STRING_RE.match(s):
        raise SpecError(f"{s!r} is not a valid numeric range type", typepath)
    items: list[RangeItem] = []
    for raw in s.split(","):
        m = _ITEM_RE.match(raw)
        if not m:  # unreachable given RANGE_STRING_RE, kept for safety
            raise SpecError(f"{raw!r} is not a valid range item", typepath)
        if m.group("val") is not None:
            lit = m.group("val")
            items.append(
                RangeItem(float(lit), float(lit), False, False,
                          (_is_float_literal(lit),))
            )
        elif m.group("hi2") is not None:
            lit = m.group("hi2")
            items.append(
                RangeItem(None, float(lit), False, m.group("xhi2") == ">",
                          (_is_float_literal(lit),))
            )
        else:
            lo_lit = m.group("lo")
            hi_lit = m.group("hi")
            xlo = m.group("xlo") == "<"
            xhi = m.group("xhi") == ">"
            if hi_lit is None:
                items.append(
                    RangeItem(float(lo_lit), None, xlo, False,
                              (_is_float_literal(lo_lit),))
                )
            else:
                lo, hi = float(lo_lit), float(hi_lit)
                if lo > hi or (lo == hi and (xlo or xhi)):
                    raise SpecError(f"empty range {raw!r} in {s!r}", typepath)
                items.append(
                    RangeItem(lo, hi, xlo, xhi,
                              (_is_float_literal(lo_lit),
                               _is_float_literal(hi_lit)))
                )
    return RangeSpec(s, tuple(items))
