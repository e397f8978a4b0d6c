"""Multimodal-column queries (operators in
:mod:`multisql_spark.operators.multimodal`): binary blob + typed metadata
plumbing, Arrow-batched feature extraction, frame sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multisql_spark.operators import multimodal as mm
from multisql_spark.queries import register
from multisql_spark.tables import load_tables


@register(
    "mm_metadata_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_assets,
           CAST(32 AS BIGINT) AS n_bytes_each,
           round(AVG((n_chars % 8) + 1), 4) AS avg_height,
           CAST(SUM((n_chars % 8) + 1) * 8 AS BIGINT) AS total_pixels
    FROM documents
    GROUP BY source
    """,
    tags=("multimodal", "metadata"),
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation over multimodal assets: reads the typed
    meta struct, never the blob bytes (column pruning keeps the binary
    chunk unread at 100 TB)."""
    t = load_tables(spark, sf_dir, ["documents"])
    assets = mm.attach_blobs(t["documents"]).join(
        t["documents"].select("doc_id", "source"), "doc_id"
    )
    return assets.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.max(F.col("meta.n_bytes")).cast("long").alias("n_bytes_each"),
        F.round(F.avg("meta.height"), 4).alias("avg_height"),
        F.sum(F.col("meta.height") * F.col("meta.width"))
        .cast("long")
        .alias("total_pixels"),
    )


@register("mm_feature_extract", oracle=None, tags=("multimodal", "features"))
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched (mapInPandas) fake-decode feature extraction — the
    real-decoder batch shape; rows-only check (not SQL-expressible: the
    decode stage is imperative per-batch Python)."""
    t = load_tables(spark, sf_dir, ["documents"])
    return mm.extract_features(mm.attach_blobs(t["documents"]))


@register("mm_frame_sample", oracle=None, tags=("multimodal", "frames"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-byte 'frame' sampling over blobs (JVM-side array algebra
    — the subsample-before-shuffle pattern)."""
    t = load_tables(spark, sf_dir, ["documents"])
    return mm.frame_sample(mm.attach_blobs(t["documents"]), every=4)
