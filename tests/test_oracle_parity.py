"""Every registered query with an oracle must match DuckDB exactly
(row count + column names + order-insensitive values) — the local mirror
of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from multisql_spark.queries import load_all
from multisql_spark.testing import compare

REGISTRY = load_all()
WITH_ORACLE = sorted(
    name for name, spec in REGISTRY.items() if spec.oracle is not None
)
NO_ORACLE = sorted(
    name for name, spec in REGISTRY.items() if spec.oracle is None
)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    result = compare(df, duck, spec.oracle)
    assert result["ok"], {k: v for k, v in result.items() if k != "ok"}


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(name, spark, sf_dir):
    """Weaker check for non-SQL-expressible ops: runs and yields a stable
    schema (mirrors the driver's fallback)."""
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns
    assert df.count() >= 0
