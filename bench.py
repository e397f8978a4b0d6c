#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The first four queries mirror BASELINE.md's metrics (filter-to-few-rows,
point lookup, groupBy-sum into ~20k groups, join+groupBy) at the driver's
scale factor; the rest are the engine's flagship shapes. Tables are cached
(the reference's sled bench also runs warm after Criterion's 5s warmup);
each query runs twice and reports the best time, Criterion-style.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.0


def build_session() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("multisql_spark_bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )


def bench_queries(spark: SparkSession):
    from multisql_spark.queries import load_all
    from multisql_spark.tables import load_tables

    tables = load_tables(spark, SF_DIR)
    for name in ("lineitem", "part", "orders", "customer"):
        tables[name].cache().count()

    l, p = tables["lineitem"], tables["part"]
    registry = load_all()

    # baseline-mirror shapes (BASELINE.md: filter / point / groupby / join)
    cases = {
        "filter_range": lambda: l.filter(F.col("l_orderkey") < 100).collect(),
        "point_lookup": lambda: l.filter(
            F.col("l_orderkey") == 60_000
        ).collect(),
        "groupby_sum": lambda: l.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("s"))
        .collect(),
        "join_groupby_sum": lambda: l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_partkey")
        .agg(F.sum("l_quantity").alias("s"))
        .collect(),
        # flagship engine shapes at the same SF
        "pricing_summary": lambda: registry["pricing_summary"]
        .fn(spark, SF_DIR)
        .collect(),
        "join_multi_revenue": lambda: registry["join_multi_revenue"]
        .fn(spark, SF_DIR)
        .collect(),
        "window_topk": lambda: registry["window_topk_per_group"]
        .fn(spark, SF_DIR)
        .collect(),
        "dedup_exact": lambda: registry["dedup_exact"]
        .fn(spark, SF_DIR)
        .collect(),
        "text_token_stats": lambda: registry["text_token_stats"]
        .fn(spark, SF_DIR)
        .collect(),
        "sim_bruteforce_topk": lambda: registry["sim_bruteforce_topk"]
        .fn(spark, SF_DIR)
        .collect(),
    }

    timings: dict[str, float] = {}
    for name, fn in cases.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    return timings


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    timings = bench_queries(spark)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
