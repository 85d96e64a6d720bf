"""Randomized reference parity: generate range type strings from the
SJOT grammar plus probe values, execute the REAL reference under node
on every (type, value) pair, and require our pure-Python evaluator to
agree exactly. Catches scan-order/exclusivity/float-break edge cases
a hand-written list would miss."""

import json
import math
import random
import shutil
import subprocess

import pytest

from sjot_spark.errors import SpecError
from sjot_spark.spec.ranges import parse_range

node = shutil.which("node")
pytestmark = pytest.mark.skipif(node is None, reason="node not installed")

_DRIVER = r"""
const SJOT = require("/root/reference/index.js");
const cases = JSON.parse(require("fs").readFileSync(0, "utf8"));
console.log(JSON.stringify(cases.map(c => {
  try { return SJOT.valid(c.v, c.t); } catch (e) { return false; }
})));
"""


def _rand_literal(rng):
    v = rng.choice([0, 1, 2, 5, 10, -1, -5, 100])
    if rng.random() < 0.4:
        return f"{v}.{rng.choice([0, 5])}"
    return str(v)


def _rand_item(rng):
    kind = rng.randrange(4)
    if kind == 0:  # single value
        return _rand_literal(rng)
    if kind == 1:  # ..m
        return f"..{_rand_literal(rng)}{'>' if rng.random() < 0.3 else ''}"
    if kind == 2:  # n..
        return f"{'<' if rng.random() < 0.3 else ''}{_rand_literal(rng)}.."
    lo, hi = sorted(
        [float(_rand_literal(rng)), float(_rand_literal(rng))]
    )

    def fmt(x):
        return str(int(x)) if x == int(x) and rng.random() < 0.6 else str(x)

    if lo == hi:
        hi = lo + rng.choice([1, 2])
    return (f"{'<' if rng.random() < 0.3 else ''}{fmt(lo)}..{fmt(hi)}"
            f"{'>' if rng.random() < 0.3 else ''}")


PROBES = [-6, -5, -1, -0.5, 0, 0.5, 1, 1.5, 2, 2.5, 5, 7.5, 10, 100, 101]


def test_random_ranges_match_reference():
    rng = random.Random(20260816)
    cases, ours = [], []
    for _ in range(120):
        t = ",".join(_rand_item(rng) for _ in range(rng.randrange(1, 4)))
        try:
            spec = parse_range(t)
        except SpecError:
            continue  # grammar-invalid (e.g. empty range) — checker territory
        for v in PROBES:
            cases.append({"t": t, "v": v})
            ours.append(spec.match_py(v))
    assert len(cases) > 800, "generator produced too few valid cases"
    expected = json.loads(subprocess.run(
        [node, "-e", _DRIVER], input=json.dumps(cases).encode(),
        capture_output=True, check=True,
    ).stdout)
    mismatches = [
        (c["t"], c["v"], e, g)
        for c, e, g in zip(cases, expected, ours) if e != g
    ]
    assert not mismatches, (
        f"{len(mismatches)} divergences from reference; first 10: "
        f"{mismatches[:10]}")
