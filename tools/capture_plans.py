"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  tag     e.g. r14  -> writes plans/r14/<query>_<suffix>.txt
  suffix  e.g. before | after
  query   optional subset; default = every headline query

The capture runs each query fn (lake queries build their tables — that part
is untimed in bench.py too) and records the formatted physical plan of the
RETURNED DataFrame, i.e. exactly the computation bench.py times through the
noop sink. AQE means this is the initial plan (isFinalPlan=false); plan
shape claims (Exchange count, join strategy, PushedFilters, Python eval
nodes) are readable from it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_iceberg_jobs_spark.queries import registry  # noqa: E402
from spark_iceberg_jobs_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> int:
    if len(sys.argv) < 3:
        print("usage: python tools/capture_plans.py <tag> <suffix> [query ...]")
        return 2
    tag = sys.argv[1]
    suffix = sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    reg = registry()
    # a misspelled query name must fail loudly, not silently capture
    # nothing (r15 ADVICE — a plan-evidence run that writes no file)
    unknown = sorted(only - set(reg))
    if unknown:
        print(f"UNKNOWN QUERY NAMES: {unknown}")
        spark.stop()
        return 1
    for name, spec in reg.items():
        if only and name not in only:
            continue
        if not only and not spec.headline:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            text = formatted_plan(df)
        except Exception as e:  # noqa: BLE001 - capture the rest
            failures.append(name)
            text = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"captured {name}")
    spark.stop()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
