"""Systematic physical-plan lint over the ENTIRE query registry.

tests/test_plans.py pins load-bearing plan properties per query;
this tool enforces two GLOBAL invariants across all ~175 registered
queries at once:

1. **No CartesianProduct anywhere.** Every legitimate cross join in this
   codebase broadcasts a one-row aggregate (BroadcastNestedLoopJoin Cross
   of a tiny side); a CartesianProduct node means two data-sized inputs
   met without keys.
2. **No unpartitioned window over data-sized input.** A
   `windowspecdefinition` whose first argument is an order spec (no
   PARTITION BY) serializes its input through one task. The explicit
   ALLOWLIST below names every query where this is by design — the window
   provably runs over a reduced table (one row per day / bucket / band) —
   with the reason, so a new unpartitioned window anywhere else fails the
   lint until it is either partitioned or consciously allowlisted.

Streaming queries are skipped: building them RUNS the stream (their
result is a drained memory table whose plan is a table scan — nothing to
lint); the batch twins cover the logic. Eager queries (kmeans/logreg/
GD fits) execute their driver-loop actions during build; the lint then
inspects the final plan like any other.

Usage: python tools/plan_lint.py [sf_dir]   (writes PLANLINT.json)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_iceberg_jobs_spark.plans.explain import formatted_plan  # noqa: E402
from spark_iceberg_jobs_spark.queries import registry  # noqa: E402
from spark_iceberg_jobs_spark.session import get_spark  # noqa: E402

#: query -> why its unpartitioned window is safe (input provably small).
#: Every OTHER query in the registry has fully partitioned windows — the
#: lint run confirms these are the complete set.
UNPARTITIONED_WINDOW_ALLOWLIST = {
    "events_max_concurrency": "carry-in window over per-day totals (one row per day)",
    "events_growth_accounting": "cumulative window over one row per day",
    "text_heaps_law": "running sums over one row per 50-doc bucket",
    "text_zipf_slope": "rank window over the vocabulary frequency table (reduced before ranking; head capped at 500)",
    "drift_ks_length": "CDF cumsums over one row per distinct document length (bounded domain)",
    "maintenance_time_travel": "supersession-commit window over one row per month (commit-log metadata)",
    "maintenance_incremental_scan": "supersession-commit window over one row per month (commit-log metadata)",
    "maintenance_rollback_plan": "supersession-commit window over one row per month (commit-log metadata)",
    "maintenance_delete_plan": "supersession-commit window over one row per month (commit-log metadata)",
}

_UNPARTITIONED = re.compile(r"windowspecdefinition\([^,()]*\s(ASC|DESC)\s")


def lint_plan(plan: str) -> list[str]:
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct")
    for line in plan.splitlines():
        if _UNPARTITIONED.search(line):
            problems.append("unpartitioned-window")
            break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-lint")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, list[str]] = {}
    skipped: list[str] = []
    violations: dict[str, list[str]] = {}
    for name, spec in registry().items():
        if name.startswith("streaming_"):
            skipped.append(name)
            continue
        try:
            plan = formatted_plan(spec.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            violations[name] = [f"build-error: {e}"]
            continue
        problems = lint_plan(plan)
        if not problems:
            continue
        report[name] = problems
        allowed = name in UNPARTITIONED_WINDOW_ALLOWLIST and problems == [
            "unpartitioned-window"
        ]
        if not allowed:
            violations[name] = problems
    out = {
        "checked": len(registry()) - len(skipped),
        "skipped_streaming": len(skipped),
        "flagged": report,
        "allowlisted": sorted(set(report) & set(UNPARTITIONED_WINDOW_ALLOWLIST)),
        "violations": violations,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANLINT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "flagged"}))
    for name, probs in violations.items():
        print(f"VIOLATION  {name}: {probs}")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
