"""Structured Streaming operators over the ``events`` table
(beyond-reference — the reference has no streaming surface, SURVEY §2.9).

Batch/stream unification: every windowed aggregation here is expressed so
the *same* logical plan runs in both modes — the batch form feeds the
DuckDB oracle; :func:`run_stream_to_memory` drives the identical
transformation through a real ``readStream`` → memory-sink query with
watermarking, proving the streaming plumbing.

Scale notes: tumbling/sliding windows are map-side bucketable (window
start is a pure function of ts) — state is only needed for lateness;
session windows keep per-key state bounded by the watermark horizon.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def tumbling_counts(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Tumbling-window counts/sums per event_type. Window start returned
    as epoch seconds (timezone-proof)."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, length_min: int = 10, slide_min: int = 5
) -> DataFrame:
    """Sliding windows: each event lands in length/slide windows."""
    w = F.window("ts", f"{length_min} minutes", f"{slide_min} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp("w.start").alias("win_start"),
            "event_type",
            "n",
        )
    )


def session_windows(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Session windows per user (gap-based). Uses the native
    ``session_window`` operator — state per (user, open session) only."""
    w = F.session_window("ts", f"{gap_min} minutes")
    return (
        events.groupBy(w.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("sess_start"),
            F.unix_timestamp("w.end").alias("sess_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    sf_dir: str,
    transform,
    query_name: str = "stream_out",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drive ``transform`` through a real Structured Streaming query:
    readStream(parquet) → withWatermark → transform → memory sink, run to
    completion (processAllAvailable). Returns the sink contents.

    In production the source is Kafka/files and the sink is a Delta
    table with checkpointing; the transformation is identical.
    """
    import os

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file-stream source wants a directory; expose just events.parquet
    # through a symlink dir so the other tables' schemas don't mix in
    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(
        f"{sf_dir}/events.parquet", os.path.join(stream_dir, "events.parquet")
    )
    stream = spark.readStream.schema(batch_schema).parquet(stream_dir)
    # nanos-as-long conversion mirror of tables.load_tables
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    agg = transform(stream.withWatermark("ts", watermark))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(query_name)
