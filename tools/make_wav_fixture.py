#!/usr/bin/env python
"""Build the WAV waveform-statistics fixture parquet that gives
``mm_wav_energy`` a real SQL oracle.

The engine side builds RIFF/WAVE PCM16 assets and decodes them with the
stdlib ``wave`` module; SQL cannot parse a RIFF container, so the
DuckDB oracle instead JOINs the documents table to THIS fixture on
md5(text).  The fixture is produced here by an INDEPENDENT
implementation (the tools/heavy_oracle.py evidentiary tradition):

- no Spark and no multisql_spark import;
- its own encoder (struct-built header, raw md5-chain payload);
- its own DECODER: a manual RIFF chunk walk (``struct`` only, no
  ``wave`` module), so the two decode paths share no code.

Stored per distinct text: n_samples, energy_sq (exact integer sum of
squared int16 samples), byte_sum (sum of raw data bytes — the quantity
``audio_chunk_plan``'s decode-free proxy totals to).  The sample RATE is
not stored: it derives from documents.n_chars on both sides
((n_chars % 4) * 4000 + 8000), and the engine reading it from the
header it wrote is pinned by tests/test_pipeline_ops.py.

Coverage: every DISTINCT text across the base sf dirs; derived scale
dirs replicate texts verbatim (tools/make_scaled_sf.py offsets keys
only), so they are covered by construction.

Usage: python tools/make_wav_fixture.py [out_parquet] [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def encode(t: str) -> bytes:
    raw = t.encode("utf-8")
    data = hashlib.md5(raw).digest() + hashlib.md5(b"x" + raw).digest()
    rate = 8000  # rate does not affect the stored statistics
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_riff(blob: bytes) -> bytes:
    """Manual RIFF walk to the data chunk — deliberately NOT the `wave`
    module, so this decoder is independent of the engine's."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt_ok = False
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, _rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if (tag, channels, bits) != (1, 1, 16):
                raise ValueError("fixture expects PCM16 mono")
            fmt_ok = True
        elif cid == b"data":
            if not fmt_ok:
                raise ValueError("data chunk before fmt chunk")
            return body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def stats(t: str) -> tuple[int, int, int]:
    data = decode_riff(encode(t))
    samples = struct.unpack(f"<{len(data) // 2}h", data)
    return (
        len(samples),
        sum(s * s for s in samples),
        sum(data),
    )


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "fixtures",
            "wav_energy_fixture.parquet",
        )
    )
    sf_dirs = sys.argv[2:] or DEFAULT_SF_DIRS
    seen: dict[str, tuple[int, int, int]] = {}
    for d in sf_dirs:
        fp = os.path.join(d, "documents.parquet")
        if not os.path.exists(fp):
            continue
        for batch in pq.ParquetFile(fp).iter_batches(columns=["text"]):
            for t in batch.column("text").to_pylist():
                key = hashlib.md5((t or "").encode()).hexdigest()
                if key not in seen:
                    seen[key] = stats(t or "")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    keys = sorted(seen)
    tbl = pa.table(
        {
            "text_md5": pa.array(keys, type=pa.string()),
            "n_samples": pa.array(
                [seen[k][0] for k in keys], type=pa.int64()
            ),
            "energy_sq": pa.array(
                [seen[k][1] for k in keys], type=pa.int64()
            ),
            "byte_sum": pa.array(
                [seen[k][2] for k in keys], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, out)
    print(f"{out}: {tbl.num_rows} distinct texts")


if __name__ == "__main__":
    main()
