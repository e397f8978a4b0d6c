#!/usr/bin/env python
"""A/B harness for batch gap-sessionization (VERDICT r5 ask #7).

Variant A — the registered ``events_sessionize_batch``: lag → new-flag →
running-sum over ONE user_id exchange, then a groupBy sharing the same
partitioning.  Cost = 1 shuffle + per-user local sort feeding TWO window
passes + the final hash aggregate.

Variant B — Spark's native ``session_window`` aggregate: the sort-based
MergingSessionsExec aggregates WHILE merging, so the per-user history is
traversed once with no separate window passes; the per-user session
ordinal comes from one partitioned window over the (already tiny)
session rows.  Session ends merge INCLUSIVELY (a gap of exactly the
session duration merges), so an 1800-second gap reproduces A's strict
``gap > 1800`` split exactly — measured on the same floored unix
seconds A uses.

Usage: python tools/ab_sessionize.py [sf_dir] [iters]
Prints per-variant min-of-N seconds and asserts A ≡ B row-for-row
first (at the same sf_dir) so the timing compares equal work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variant_b(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from multisql_spark.tables import load_tables

    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"].select(
        "user_id", "event_id", "ts", F.unix_timestamp("ts").cast("long").alias("ts_sec")
    )
    # A's gap is measured on FLOORED unix seconds — feed session_window
    # the same second-grain timestamp or sub-second gaps diverge.  Spark
    # merges a session whose END (last + gap) touches the next event
    # INCLUSIVELY, so a gap of exactly 1800s merges — matching A's
    # strict `gap > 1800` split without adjustment.
    sess = e.groupBy(
        "user_id",
        F.session_window(
            F.timestamp_seconds(F.col("ts_sec")), "1800 seconds"
        ).alias("sw"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_sec") - F.min("ts_sec")).cast("long").alias("duration_sec"),
        F.min("event_id").alias("first_event_id"),
        F.min("ts_sec").alias("t0"),
    )
    idx = W.partitionBy("user_id").orderBy("t0", "first_event_id")
    return sess.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.row_number().over(idx).cast("int").alias("session_idx"),
        "n_events",
        "duration_sec",
        "first_event_id",
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import SparkSession

    from multisql_spark.queries import load_all

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    def run_a():
        return reg["events_sessionize_batch"].fn(spark, sf_dir)

    def run_b():
        return variant_b(spark, sf_dir)

    # parity first: identical multisets
    a_rows = sorted(map(tuple, run_a().collect()))
    b_rows = sorted(map(tuple, run_b().collect()))
    assert a_rows == b_rows, (
        f"parity FAILED: {len(a_rows)} vs {len(b_rows)} rows; "
        f"first diff: {next((x for x, y in zip(a_rows, b_rows) if x != y), None)}"
    )
    print(f"parity ok: {len(a_rows)} sessions identical")

    out = {}
    for label, fn in (("A_window_runsum", run_a), ("B_session_window", run_b)):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        out[label] = min(times)
        print(f"{label}: min-of-{iters} {out[label]:.3f}s  (all: "
              + ", ".join(f"{x:.3f}" for x in times) + ")")
    print(f"B/A ratio: {out['B_session_window'] / out['A_window_runsum']:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
