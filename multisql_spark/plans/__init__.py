"""Physical-plan inspection helpers.

The optimizer work the reference hand-rolls (index-filter extraction, join
method selection, column pruning — SURVEY §4) is Catalyst's job here;
these helpers make the resulting plans auditable so tests can assert the
properties that matter at 100 TB: filters reach the parquet scan, scans
read only needed columns, small dimensions broadcast, and hot paths stay
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str = "") -> bool:
    """True if the parquet scan received pushed filters (optionally
    containing ``fragment``)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "[]" not in line:
            if fragment.lower() in line.lower():
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads (ReadSchema) —
    asserts column pruning."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            cols = line.split("struct<", 1)[-1].rstrip(">")
            out.append(
                [c.split(":")[0].strip() for c in cols.split(",") if c]
            )
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or (
        "BroadcastNestedLoopJoin" in formatted_plan(df)
    )


def scale_antipatterns(plan: str) -> list[str]:
    """100 TB anti-pattern flags for a formatted physical plan:

    - ``CARTESIAN``: a CartesianProduct anywhere;
    - ``GLOBAL_WINDOW``: an ``Exchange SinglePartition`` feeding a Window
      operator (an unpartitioned data-scale window — the classic scale
      killer).  A single-partition exchange feeding a final bounded
      aggregate is legitimate and not flagged.

    Shared by ``tools/audit_plans.py`` (full-registry CLI sweep) and
    ``tests/test_plan_audit.py`` (the in-suite regression gate)."""
    problems: list[str] = []
    if "CartesianProduct" in plan:
        problems.append("CARTESIAN")
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            for above in reversed(lines[:i]):
                s = above.strip().lstrip("+-: ")
                if not s:
                    continue
                if s.startswith("Window"):
                    problems.append("GLOBAL_WINDOW")
                break
    return sorted(set(problems))


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans in the executed plan (AQE hides them until
    the final plan exists, so this triggers execution)."""
    import re

    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    # codegen stages render as `*(n)` operator prefixes
    return len(set(re.findall(r"\*\((\d+)\)", executed)))
