"""Sweep every registered query's physical plan for 100 TB anti-patterns.

Flags per query:
- CARTESIAN: a CartesianProduct anywhere in the plan;
- GLOBAL_WINDOW: a Window operator fed by a SinglePartition shuffle
  (detected from the formatted plan's detail section + a tree ancestor
  walk that looks through Sort — see plans.scale_antipatterns).

Windows over cardinality-bounded aggregates are allowlisted by name
with their bounding argument (plans.GLOBAL_WINDOW_ALLOWLIST) and print
as ALLOWED rather than FLAG.

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    from multisql_spark import plans
    from multisql_spark.queries import load_all

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    flagged = 0
    for name, spec in load_all().items():
        if name.startswith("stream_"):
            continue  # streaming runs are exercised by their own tests
        try:
            plan = plans.formatted_plan(spec.fn(spark, sf_dir))
        except Exception as exc:  # build-time failure is itself a flag
            print(f"ERROR    {name}: {str(exc)[:120]}")
            flagged += 1
            continue
        problems = plans.audit_query(name, plan)
        if problems:
            flagged += 1
            print(f"FLAG     {name}: {', '.join(problems)}")
        elif "GLOBAL_WINDOW" in plans.scale_antipatterns(plan):
            print(
                f"ALLOWED  {name}: bounded global window — "
                f"{plans.GLOBAL_WINDOW_ALLOWLIST[name]}"
            )
    print(f"\n{flagged} flagged")
    return 0 if flagged == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
