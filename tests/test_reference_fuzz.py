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

_DRIVER_KIND = r"""
const SJOT = require("/root/reference/index.js");
const cases = JSON.parse(require("fs").readFileSync(0, "utf8"));
console.log(JSON.stringify(cases.map(c => {
  try { return SJOT.valid(c.data, c.type); } catch (e) { return false; }
})));
"""


def run_reference(cases):
    """cases: [{'kind': 'valid', 'data': ..., 'type': ...}]"""
    p = subprocess.run(
        [node, "-e", _DRIVER_KIND], input=json.dumps(cases).encode(),
        capture_output=True, check=True,
    )
    return json.loads(p.stdout)


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


def test_random_array_and_set_types_match_reference():
    """Array/set/bounds semantics fuzz: random int arrays vs random
    `elem[bounds]` / `elem{bounds}` type strings, judged by the real
    reference. (Null elements excluded: the reference mutates them to
    defaults; our engine flags them — documented divergence.)"""
    import random

    from sjot_spark.spec.typestr import parse_type, ArrayOf
    from sjot_spark.spec.pyeval import _array_ok

    rng = random.Random(77)
    cases, ours = [], []
    for _ in range(150):
        elem = rng.choice(["int", "0..9", "1,3..5", "-5..5", "ubyte"])
        brace = rng.choice("[{")
        close = "]" if brace == "[" else "}"
        b = rng.choice(["", "2", "1,3", ",4", "2,"])
        t = f"{elem}{brace}{b}{close}"
        try:
            node = parse_type(t)
        except Exception:
            continue
        if not isinstance(node, ArrayOf):
            continue
        for _ in range(6):
            arr = [rng.randint(-6, 12) for _ in range(rng.randint(0, 5))]
            cases.append({"kind": "valid", "data": arr, "type": t})
            ours.append(_array_ok(node, arr, "array<int>",
                                  lambda n: (_ for _ in ()).throw(KeyError(n))))
    assert len(cases) > 400
    expected = run_reference(cases)
    mismatches = [
        (c["type"], c["data"], e, g)
        for c, e, g in zip(cases, expected, ours) if e != g
    ]
    assert not mismatches, f"{len(mismatches)} divergences; first: {mismatches[:8]}"


def test_char_bounds_fuzz_vs_reference():
    import random

    from sjot_spark.spec.typestr import parse_type, CharLen

    rng = random.Random(99)
    cases, ours = [], []
    for _ in range(60):
        b = rng.choice(["1", "2,4", ",3", "2,", ""])
        t = f"char[{b}]"
        node = parse_type(t)
        for s in ["", "a", "ab", "abc", "abcd", "abcde"]:
            cases.append({"kind": "valid", "data": s, "type": t})
            if isinstance(node, CharLen):
                ours.append(node.bounds.check_len(len(s)))
            else:
                ours.append(len(s) == 1)
    expected = run_reference(cases)
    mismatches = [
        (c["type"], c["data"], e, g)
        for c, e, g in zip(cases, expected, ours) if e != g
    ]
    assert not mismatches, mismatches[:8]


_DRIVER_CHECK = r"""
const SJOT = require("/root/reference/index.js");
const cases = JSON.parse(require("fs").readFileSync(0, "utf8"));
console.log(JSON.stringify(cases.map(s => {
  try { SJOT.check(s); return true; } catch (e) { return false; }
})));
"""


def test_random_schema_checker_parity():
    """Spec-checker fuzz (S1-S3 parity): random object schemas with
    propset combinators, judged accept/reject by both SJOT.check and
    CheckSpec.check. Generator confined to the shared feature set."""
    import random

    from sjot_spark.errors import SpecError
    from sjot_spark.spec.spec import CheckSpec

    rng = random.Random(4242)
    types = ["int", "string", "boolean", "0..9", "1,3..5", "char[2,4]",
             "date", "int[]", "-5..5{1,3}"]
    schemas, ours = [], []
    for _ in range(150):
        props = {}
        names = [f"p{i}" for i in range(rng.randint(2, 5))]
        optional = []
        for n in names:
            opt = rng.random() < 0.7
            key = f"{n}?" if opt else n
            if opt:
                optional.append(n)
            props[key] = rng.choice(types)
        # random propset directives over a pool that may include
        # required props (invalid) or unknown names (invalid)
        pool = names + ["ghost"]
        for d in ("@one", "@any", "@all"):
            if rng.random() < 0.5 and len(pool) >= 2:
                props[d] = [rng.sample(pool, 2)]
        if rng.random() < 0.4:
            a, b = rng.sample(pool, 2)
            props["@dep"] = {a: [b]}
        schema = {"@root": "#T", "T": props}
        schemas.append(schema)
        try:
            CheckSpec(schema).check()
            ours.append(True)
        except SpecError:
            ours.append(False)
    p = subprocess.run(
        [node, "-e", _DRIVER_CHECK], input=json.dumps(schemas).encode(),
        capture_output=True, check=True,
    )
    expected = json.loads(p.stdout)
    mismatches = [
        (s["T"], e, g) for s, e, g in zip(schemas, expected, ours) if e != g
    ]
    assert not mismatches, (
        f"{len(mismatches)} checker divergences; first 3: {mismatches[:3]}")
