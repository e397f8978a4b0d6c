"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus beyond-reference
extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
Implementation lives in :mod:`multisql_spark.queries`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from multisql_spark.queries import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    registry = load_all()
    return registry["pricing_summary"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry = load_all()
    return {name: spec.fn for name, spec in registry.items()}


def oracle_sql() -> dict[str, str]:
    registry = load_all()
    return {
        name: spec.oracle
        for name, spec in registry.items()
        if spec.oracle is not None
    }
