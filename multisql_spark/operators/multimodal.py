"""Multimodal column plumbing (beyond-reference, BASELINE.json).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The actual codec step is STUBBED
(this image has no PIL/av/librosa): ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake is requested — but the
Spark-side plumbing (schema, batch iteration, partitioning) is real and
tested.

Scale notes: binary payloads dominate row size, so every plan here keeps
them out of shuffles — features are extracted in the scan stage
(mapInPandas before any exchange), and only fixed-width feature vectors /
metadata structs move. At 100 TB the blob column additionally lives in its
own parquet column chunk, so metadata-only queries never read bytes
(column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def attach_blobs(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary column + typed metadata from documents
    (deterministic: bytes = md5 digest chain of the text)."""
    blob = F.unhex(
        F.concat(F.md5("text"), F.md5(F.concat(F.lit("x"), F.col("text"))))
    )
    return docs.select(
        F.col("doc_id").cast("long"),
        blob.alias("blob"),
        F.struct(
            F.lit("fake_img").alias("format"),
            F.lit(8).alias("width"),
            ((F.col("n_chars") % 8) + 1).cast("int").alias("height"),
            F.octet_length(blob).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_audio_blobs(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque AUDIO binary column + typed metadata from
    documents (same md5-chain bytes as :func:`attach_blobs`, audio-typed
    meta): the modality lives in the metadata struct, not the bytes —
    exactly how a multimodal lakehouse distinguishes assets without
    decoding them.  sample_rate_hz varies per asset (8/12/16/24 kHz) so
    duration math exercises real heterogeneity."""
    blob = F.unhex(
        F.concat(F.md5("text"), F.md5(F.concat(F.lit("x"), F.col("text"))))
    )
    return docs.select(
        F.col("doc_id").cast("long"),
        blob.alias("blob"),
        F.struct(
            F.lit("fake_pcm").alias("codec"),
            ((F.col("n_chars") % 4) * 4000 + 8000)
            .cast("int")
            .alias("sample_rate_hz"),
            F.lit(2).cast("int").alias("bytes_per_sample"),
            F.octet_length(blob).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(blob: bytes, fake: bool = False) -> list[float]:
    """Decode an image blob to pixels. REAL decode needs PIL — not in this
    container; the deterministic fake derives FEATURE_DIM floats from the
    byte content (stable across engines/runs)."""
    if not fake:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "image decode requires PIL, not present in this image; "
                "pass fake=True for the deterministic stub"
            ) from exc
    chunk = max(1, len(blob) // FEATURE_DIM)
    return [
        float(sum(blob[i * chunk:(i + 1) * chunk]) % 256)
        for i in range(FEATURE_DIM)
    ]


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the blob column
    (mapInPandas: pandas DataFrames in, pandas DataFrames out — the
    batch shape a real decoder would use).

    The worker function is fully self-contained (no references to this
    module's globals): executors unpickle it by value, so the engine does
    not need to be importable on worker Python paths — the driver process
    may be the only place the package is installed."""
    dim = FEATURE_DIM

    def decode(blob: bytes) -> list[float]:
        # deterministic fake decode (mirrors decode_image(fake=True))
        chunk = max(1, len(blob) // dim)
        return [
            float(sum(blob[i * chunk:(i + 1) * chunk]) % 256)
            for i in range(dim)
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["blob"].map(lambda b: decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["blob"].map(len).astype("int32"),
                    "features": feats,
                    "feat_mean": feats.map(
                        lambda xs: round(sum(xs) / len(xs), 4)
                    ),
                }
            )

    schema = (
        "doc_id long, n_bytes int, features array<float>, feat_mean double"
    )
    return mm.select("doc_id", "blob").mapInPandas(run, schema)


def frame_sample(mm: DataFrame, every: int = 4) -> DataFrame:
    """'Frame sampling' over the blob (every N-th byte) — the video-frame
    subsampling shape: pure column algebra, no Python."""
    hexed = F.hex(F.col("blob"))
    idx = F.sequence(
        F.lit(1), (F.octet_length("blob") / every).cast("int")
    )
    frames = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(hexed, (i - 1) * every * 2 + 1, 2), 16, 10
        ).cast("int"),
    )
    return mm.select(
        "doc_id",
        frames.alias("sampled_bytes"),
        F.size(frames).alias("n_frames"),
    )


def resize_pool(mm: DataFrame) -> DataFrame:
    """'Resize' via 2×2 average pooling over the fake-decoded pixel grid
    (the 32 blob bytes as an 8×4 row-major scanline → a 4×2 pooled
    image) — the real-resize batch shape as an Arrow-batched
    ``mapInPandas`` stage.  A real decoder+PIL resize slots into the
    same worker function; everything Spark-side (schema, batching,
    keeping the binary out of any exchange) is identical.

    The pooled bytes are integer algebra on the blob content, so the
    DuckDB oracle reproduces them exactly (see ``mm_resize_pool``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def pool(blob: bytes) -> list[int]:
            # 8 wide x 4 high, row-major; 2x2 average pool -> 4x2
            out = []
            for k in range(8):
                r, c = k // 4, k % 4
                j1 = 16 * r + 2 * c
                out.append(
                    (blob[j1] + blob[j1 + 1] + blob[j1 + 8] + blob[j1 + 9])
                    // 4
                )
            return out

        for pdf in batches:
            pooled = pdf["blob"].map(lambda b: pool(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized_csv": pooled.map(
                        lambda xs: "-".join(str(x) for x in xs)
                    ),
                    "n_px_in": pdf["blob"].map(len).astype("int32"),
                    "n_px_out": pooled.map(len).astype("int32"),
                }
            )

    schema = "doc_id long, resized_csv string, n_px_in int, n_px_out int"
    return mm.select("doc_id", "blob").mapInPandas(run, schema)


def audio_chunk_plan(
    mm_audio: DataFrame, chunk_samples: int = 4, bytes_per_sample: int = 2
) -> DataFrame:
    """Sample-aligned chunking plan for opaque audio blobs — the
    segmentation step every speech/audio pipeline runs before decode
    (VAD windows, ASR segments, training clips).

    The plan derives every chunk's BYTE OFFSETS from typed metadata
    alone (sample rate, bytes/sample, blob length): chunk boundaries
    land on sample boundaries by construction
    (byte_start % bytes_per_sample == 0), the final partial chunk keeps
    its true length, and a decode-free energy proxy (sum of the chunk's
    byte values — pure JVM column algebra over hex pairs, the
    ``frame_sample`` trick) gives the silence-pruning signal without
    any codec.

    Scale shape: one row per (asset, chunk) carrying offsets + 3 ints —
    the blob bytes themselves never enter a shuffle; at 100 TB the
    decode stage reads each chunk's byte range from the parquet binary
    chunk it already sits in, driven by this plan table."""
    chunk_bytes = chunk_samples * bytes_per_sample
    hexed = F.hex(F.col("blob"))
    n_bytes = F.octet_length("blob")
    n_chunks = F.ceil(n_bytes / chunk_bytes).cast("int")
    chunk = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    base = mm_audio.select(
        "doc_id",
        F.col("meta.sample_rate_hz").alias("sample_rate_hz"),
        n_bytes.alias("n_bytes"),
        hexed.alias("hx"),
        chunk,
    )
    byte_start = F.col("chunk_id") * chunk_bytes
    byte_len = F.least(
        F.lit(chunk_bytes), F.col("n_bytes") - byte_start
    )
    # energy proxy: sum of byte values in [byte_start, byte_start+len)
    energy = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), byte_len),
            lambda j: F.conv(
                F.substring(
                    F.col("hx"), (byte_start + j - 1) * 2 + 1, 2
                ),
                16,
                10,
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return base.select(
        F.col("doc_id").cast("long"),
        F.col("chunk_id").cast("long"),
        byte_start.cast("long").alias("byte_start"),
        byte_len.cast("long").alias("byte_len"),
        (byte_len / bytes_per_sample).cast("long").alias("n_samples"),
        F.col("sample_rate_hz").cast("long").alias("sample_rate_hz"),
        energy.alias("energy_q"),
    ).withColumn(
        # integer microseconds: exact on both engines (no float time math)
        "duration_us",
        F.expr("(n_samples * 1000000) DIV sample_rate_hz"),
    )
