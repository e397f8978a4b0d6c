#!/usr/bin/env python
"""Build the zlib compression-ratio fixture parquet that gives
``text_compression_ratio`` a real SQL oracle.

zlib has no SQL equivalent, so the DuckDB oracle instead JOINs the
documents table to THIS fixture on md5(text).  The fixture is produced
here by direct Python zlib (level 6, round-half-even to 4 decimals —
the exact arithmetic the Arrow-batched UDF pins in
tests/test_pipeline_ops.py::test_compression_ratio_matches_python),
with no Spark and no multisql_spark import: a second, independent
implementation in the tools/heavy_oracle.py evidentiary tradition.

Coverage: every DISTINCT text across the base sf dirs (sf0.001 /
sf0.01 / sf0.1).  Derived scale dirs replicate texts verbatim (only key
columns get offsets — tools/make_scaled_sf.py), so they are covered by
construction.

Usage: python tools/make_zlib_fixture.py [out_parquet] [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def ratio(t: str) -> float:
    if not t:
        return 1.0
    raw = t.encode("utf-8")
    return round(len(zlib.compress(raw, 6)) / len(raw), 4)


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "fixtures",
            "zlib_ratio_fixture.parquet",
        )
    )
    sf_dirs = sys.argv[2:] or DEFAULT_SF_DIRS
    seen: dict[str, float] = {}
    for d in sf_dirs:
        fp = os.path.join(d, "documents.parquet")
        if not os.path.exists(fp):
            continue
        for batch in pq.ParquetFile(fp).iter_batches(columns=["text"]):
            for t in batch.column("text").to_pylist():
                key = hashlib.md5((t or "").encode()).hexdigest()
                if key not in seen:
                    seen[key] = ratio(t or "")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tbl = pa.table(
        {
            "text_md5": pa.array(sorted(seen), type=pa.string()),
            "compress_ratio": pa.array(
                [seen[k] for k in sorted(seen)], type=pa.float64()
            ),
        }
    )
    pq.write_table(tbl, out)
    print(f"{out}: {tbl.num_rows} distinct texts")


if __name__ == "__main__":
    main()
