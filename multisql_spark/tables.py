"""Test-data table loading and session tuning.

The driver hands us an arbitrary SparkSession; we pin the runtime confs we
depend on (UTC session timezone so timestamp semantics line up with the
DuckDB oracle, AQE on, sane shuffle parallelism for local mode) — all of
these are runtime-settable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_SESSION_CONFS = {
    # DuckDB timestamps are UTC-naive; pin Spark to UTC so year()/window()
    # etc. agree with the oracle.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local-mode default of 200 over-parallelizes small data; AQE coalesces
    # but the initial hash partitioning still costs task setup.
    "spark.sql.shuffle.partitions": "32",
    # ... but 32 is a SMALL-DATA floor, not a scale ceiling: at derived
    # sf1000 a 600M-row hash aggregate split 32 ways put ~19M rows of
    # aggregation state in each of 32 concurrent tasks on one heap and
    # OOM'd (dedup_duplicated_spans, r10).  AQE coalesces DOWN from
    # initialPartitionNum by its size target, so a high initial count is
    # free at test scale (same post-coalesce partition count) and bounds
    # per-task state at 100x — exactly how a 1000-executor cluster would
    # be configured.
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "512",
    # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert below.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # micros-precision parquet timestamps otherwise infer as TIMESTAMP_NTZ
    # on Spark 4, which withWatermark rejects; under the UTC session
    # timezone LTZ carries identical values, so read them as TIMESTAMP.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def tune_session(spark: SparkSession) -> SparkSession:
    for key, value in _SESSION_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # conf not settable at runtime on this build — keep going
    _enable_fast_worker(spark)
    return spark


def _enable_fast_worker(spark: SparkSession) -> None:
    """Route Python workers through :mod:`pyspark_graft_worker` (repo
    root), which removes two fixed per-task worker costs — the
    per-task ``importlib.invalidate_caches()`` zip-directory rescan and
    the full-heap ``gc.collect()`` between reused tasks (~140 ms/task
    combined on this install; measured, see OPTIMIZATION_r11.md).

    The worker-module conf is read by the JVM's PythonWorkerFactory at
    first Python-stage execution, so setting it on the live SparkConf
    before any Python job still applies; the repo root is appended to
    the worker PYTHONPATH via the context's executor environment (the
    factory cache keys on (module, env), so existing sessions simply
    build a fresh daemon).  Best-effort: any failure leaves the stock
    worker path untouched, and ``SPARK_GRAFT_FAST_WORKER=0`` opts out.
    """
    import os

    if os.environ.get("SPARK_GRAFT_FAST_WORKER") == "0":
        return
    try:
        root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        if not os.path.exists(os.path.join(root, "pyspark_graft_worker.py")):
            return
        sc = spark.sparkContext
        jconf = sc._jsc.sc().conf()
        jconf.set("spark.python.worker.module", "pyspark_graft_worker")
        current = sc.environment.get("PYTHONPATH", "")
        if root not in current.split(":"):
            sc.environment["PYTHONPATH"] = (
                f"{current}:{root}" if current else root
            )
        # one BLAS thread per worker: tasks already use every core, so
        # letting each of 32 workers spawn its own OpenBLAS pool only
        # oversubscribes (guide §4.5 — heavyweight state per task);
        # must be in the env BEFORE the worker imports numpy.
        sc.environment.setdefault("OPENBLAS_NUM_THREADS", "1")
        sc.environment.setdefault("OMP_NUM_THREADS", "1")
    except Exception:
        pass


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read the driver-generated parquet tables and register temp views.

    Views are registered under their bare table names so SQL-form queries
    (and the engine layer) can reference them exactly like the DuckDB
    oracle does.
    """
    tune_session(spark)
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos-as-long → microsecond TimestampType (truncation matches
            # DuckDB's TIMESTAMP_NS → TIMESTAMP cast)
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
