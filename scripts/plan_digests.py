"""Regenerate the checked-in optimized-plan digest fixture.

Usage:  python scripts/plan_digests.py [--diff]

--diff prints per-query digest changes against the committed fixture
instead of rewriting it. Run WITHOUT --diff after an intentional plan
change and commit the updated fixture together with the change that
caused it (tests/test_plans.py::test_plan_digests enforces this).
"""

from __future__ import annotations

import json
import os
import sys

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures",
    "plan_digests.json")


def main() -> int:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from sjot_spark.plan.digest import all_query_digests
    from sjot_spark.session import get_spark

    spark = get_spark(app_name="plan-digests", shuffle_partitions=8)
    digests = all_query_digests(spark)
    if "--diff" in sys.argv:
        with open(FIXTURE) as f:
            old = json.load(f)
        changed = sorted(
            k for k in set(old) | set(digests)
            if old.get(k) != digests.get(k))
        for k in changed:
            print(f"{k}: {old.get(k, '<new>')} -> {digests.get(k, '<gone>')}")
        print(f"{len(changed)} changed / {len(digests)} total")
        return 1 if changed else 0
    with open(FIXTURE, "w") as f:
        json.dump(dict(sorted(digests.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {len(digests)} digests -> {FIXTURE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
