"""Physical-plan audits: the properties that matter at 100 TB must hold in
the plans Catalyst actually produces (SURVEY §4) — filters pushed into the
parquet scan, column pruning, broadcast joins for small dimensions,
whole-stage codegen on the hot paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from multisql_spark import plans
from multisql_spark.queries import load_all
from multisql_spark.tables import load_tables

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = REGISTRY["scan_project_filter"].fn(spark, SF)
    assert plans.has_pushed_filter(df, "p_size")


def test_column_pruning(spark):
    df = REGISTRY["scan_project_filter"].fn(spark, SF)
    for cols in plans.read_schema_columns(df):
        # the scan must read only the 3 projected columns, not all 6
        assert set(cols) <= {"p_partkey", "p_name", "p_size"}


def test_point_lookup_pushdown(spark):
    t = load_tables(spark, SF, ["lineitem"])
    df = t["lineitem"].filter(F.col("l_orderkey") == 100)
    assert plans.has_pushed_filter(df, "l_orderkey")


def test_small_dim_joins_broadcast(spark):
    df = REGISTRY["join_multi_revenue"].fn(spark, SF)
    assert plans.uses_broadcast_join(df)


def test_aggregation_is_partial(spark):
    """Partial (map-side) aggregation must appear before the exchange —
    the reference's single-phase fold can't do this (SURVEY §4)."""
    plan = plans.formatted_plan(REGISTRY["pricing_summary"].fn(spark, SF))
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") != plan.rindex("HashAggregate")


def test_codegen_on_hot_path(spark):
    df = REGISTRY["pricing_summary"].fn(spark, SF)
    assert plans.codegen_stage_count(df) >= 1


def test_semi_anti_plans(spark):
    t = load_tables(spark, SF, ["customer", "orders"])
    c, o = t["customer"], t["orders"]
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    plan = plans.formatted_plan(semi)
    assert "LeftSemi" in plan
