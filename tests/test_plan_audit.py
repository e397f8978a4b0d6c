"""In-suite plan-to-scale regression gate (VERDICT r4 ask #8).

Builds every registered non-streaming query's physical plan at sf0.001
(plans only — nothing executes) and fails if any plan carries a 100 TB
anti-pattern: a CartesianProduct, or a single-partition exchange feeding
a Window.  A future query addition with either shape fails CI here
rather than waiting for a judge run of ``tools/audit_plans.py`` (which
shares the same ``plans.scale_antipatterns`` detector).
"""

from __future__ import annotations

from multisql_spark import plans
from multisql_spark.queries import load_all


def test_no_scale_antipatterns_in_any_registered_plan(spark, sf_dir):
    failures: list[str] = []
    for name, spec in load_all().items():
        if name.startswith("stream_"):
            continue  # streaming runs are exercised by their own tests
        try:
            plan = plans.formatted_plan(spec.fn(spark, sf_dir))
        except Exception as exc:  # a build-time failure is itself a flag
            failures.append(f"{name}: ERROR {str(exc)[:120]}")
            continue
        problems = plans.scale_antipatterns(plan)
        if problems:
            failures.append(f"{name}: {', '.join(problems)}")
    assert not failures, "\n".join(failures)
