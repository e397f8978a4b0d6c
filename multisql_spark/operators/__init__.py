"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, key: str | None = "doc_id") -> DataFrame:
    """Scale-adaptive fan-out ahead of an expensive per-row stage (codec
    decode, per-token hashing).

    When the upstream scan yields fewer partitions than the session's
    parallelism (single-file / single-row-group inputs — the shape of
    every local test table), hash-repartition the NARROW projection to
    ``defaultParallelism`` so the per-row work runs on every core.  At
    cluster scale a real table arrives in hundreds of splits, the
    condition is false, and this is a no-op — no exchange is added where
    the scan already parallelizes (guide §2.2/§2.5: partitioning must be
    scale-adaptive, never a local constant).  The exchange only ever
    moves the projected input columns (ids + text), never derived blobs,
    and hashing on a real key keeps the assignment deterministic under
    task retry (guide §2.5 vs round-robin-of-rand).
    """
    try:
        n = df.rdd.getNumPartitions()
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # streaming DataFrames have no .rdd — leave as-is
        return df
    if n >= target:
        return df
    if key is not None and key in df.columns:
        return df.repartition(target, F.col(key))
    return df.repartition(target)
