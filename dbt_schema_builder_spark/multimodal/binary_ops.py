"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata).

The container has no codec LIBRARIES, but uncompressed formats need
none: as of r10 the decode seam is REAL for binary PPM/PGM and
uncompressed BMP (pure-Python parsers in ``codecs.py``, dispatched by
``decode_image_stub`` and exercised end-to-end by
``decoded_image_features``). Compressed formats (JPEG/PNG/audio) still
raise a loud ValueError; ``image_features``/``audio_features`` keep
their deterministic fake kernels for byte-level stats. The Spark-side
plumbing is identical either way: binary column schema, metadata
struct, mapInPandas batch iteration, Arrow transfer of bytes, and
partition-sized batching — swapping in PIL/torchaudio/ffmpeg changes
only the inner function body.

Scale notes: binary payloads ride the same parquet scan as everything else;
``mapInPandas`` streams Arrow batches so a partition never fully
materializes in Python memory, and ``spark.sql.files.maxPartitionBytes``
bounds per-task input. For 100 TB of media, store payloads in parquet
binary columns (or pointers to object storage) partitioned by content
bucket, and keep feature extraction a pure map — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def attach_fake_image_bytes(documents: DataFrame) -> DataFrame:
    """Derive a deterministic opaque binary payload per document (stand-in
    for a real image column): the UTF-8 bytes of the text plus a fake
    header. Gives the multimodal operators a real binary column to chew
    on without bundling media files."""
    payload = F.encode(F.concat(F.lit("FAKEIMG1"), F.col("text")), "UTF-8")
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decode_image_stub(payload: bytes):
    """The real-decoder seam — REAL since r10 (carried r8 verdict #5):
    dispatches to the pure-Python codecs (binary PPM/PGM, uncompressed
    8/24-bit BMP — ``multimodal.codecs``). Compressed formats still
    need a codec library; they raise ValueError with the supported
    table, so a decode failure surfaces as a data error, never a wrong
    plane. The name keeps the historical seam: swapping in PIL for
    JPEG/PNG only widens the format dispatch."""
    from .codecs import decode_image

    return decode_image(payload)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("header_ok", IntegerType(), False),
        StructField("byte_entropy", DoubleType(), False),
    ]
)


def image_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: iterate
    Arrow batches, compute per-payload features with a deterministic fake
    "decoder" (header check + byte entropy). The batch shape — an iterator
    of pandas DataFrames in, iterator out — is exactly what a real decode /
    resize / embed stage uses."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "header_ok": pdf["payload"]
                .map(lambda b: 1 if bytes(b[:8]) == b"FAKEIMG1" else 0)
                .astype("int32"),
            }

            def entropy(b: bytes) -> float:
                # fixed-point micro-units (the repo convention for
                # reproducible float aggregates): each histogram term is
                # rounded to 1e-6 BEFORE summing, so the integer sum is
                # order-independent and an ANSI oracle replays it exactly.
                # Histogram via np.bincount over a zero-copy frombuffer
                # view (vectorized; the per-byte Python loop it replaced
                # was the batch bottleneck), same float64 ops bit-for-bit.
                if not b:
                    return 0.0
                counts = np.bincount(
                    np.frombuffer(b, dtype=np.uint8), minlength=256
                )
                p = counts[counts > 0] / len(b)
                micro = np.floor(-p * np.log2(p) * 1_000_000 + 0.5).sum()
                return float(micro) / 1_000_000

            out["byte_entropy"] = pdf["payload"].map(entropy).astype("float64")
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        extract, FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def resize_images(media: DataFrame, target_bytes: int = 512) -> DataFrame:
    """Resize stage shape: normalize every payload to a fixed size via a
    deterministic fake resampler (stride-sample when shrinking, cycle-pad
    when growing). A real pipeline swaps the byte math for
    PIL.Image.resize on the decoded image; the fixed-output-size
    mapInPandas contract — what downstream batch embedding models need —
    is identical."""

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if not b:
                    resized = bytes(target_bytes)
                elif len(b) >= target_bytes:
                    stride = len(b) / target_bytes
                    resized = bytes(
                        b[int(i * stride)] for i in range(target_bytes)
                    )
                else:
                    reps = -(-target_bytes // len(b))
                    resized = (b * reps)[:target_bytes]
                out_payloads.append(resized)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out_payloads,
                    "n_bytes": [len(p) for p in out_payloads],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        resample, RESIZED_SCHEMA
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("rms", DoubleType(), False),
        StructField("peak", IntegerType(), False),
    ]
)


def audio_features(media: DataFrame, chunk: int = 256) -> DataFrame:
    """Audio-shaped feature extraction: treat the payload as PCM-like
    samples, emit per-chunk RMS and peak via mapInPandas. A real
    pipeline swaps the byte math for torchaudio/librosa on the decoded
    waveform; the chunked one-to-many Arrow plumbing is identical."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx, start in enumerate(range(0, len(b), chunk)):
                    piece = b[start : start + chunk]
                    rms = math.sqrt(sum(x * x for x in piece) / len(piece))
                    rows.append((doc_id, idx, round(rms, 4), max(piece)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "rms", "peak"]
            )

    return media.select("doc_id", "payload").mapInPandas(extract, AUDIO_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every: int = 64) -> DataFrame:
    """Frame-sampling shape for video-like payloads: explode each payload
    into fixed-stride chunks ("frames"). Real video sampling swaps the
    chunker for an ffmpeg seek; the one-row-to-many mapInPandas plumbing
    is identical."""

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx, start in enumerate(range(0, len(b), every)):
                    rows.append((doc_id, idx, b[start : start + every]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes"]
            )

    return media.select("doc_id", "payload").mapInPandas(chunk, FRAMES_SCHEMA)


def frame_dedup(media: DataFrame, every: int = 256) -> DataFrame:
    """Cross-asset duplicate-frame detection — the multimodal analogue
    of chunk-level text dedup: frames (fixed-stride payload chunks via
    ``sample_frames``) are reduced to 16-byte md5 keys and grouped;
    a frame appearing in >= 2 distinct assets flags shared/duplicated
    media content (re-uploads, watermark boilerplate, still intros).
    With a real decoder the chunker swaps for keyframe extraction and
    the hash for a perceptual hash — the Spark shape (Arrow explode ->
    16-byte-key hash aggregation, map-side combined, never raw bytes
    past the hash) is the part that matters at 100 TB.

    Returns (frame_md5, n_docs, n_frames) for frames shared across
    assets."""
    frames = sample_frames(media, every=every)
    return (
        frames.select("doc_id", F.md5(F.col("frame_bytes")).alias("frame_md5"))
        .groupBy("frame_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .where(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# r10: REAL decode path (pure-Python PPM/BMP codecs, multimodal/codecs.py)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
        StructField("plane_hex", StringType(), False),
    ]
)


def attach_ppm_image_bytes(documents: DataFrame) -> DataFrame:
    """Synthesize a VALID binary PPM (P6, 4x4 RGB) per document: header
    + a 48-byte pixel plane derived from three md5 digests of the text.
    This is a real image file a real parser must decode — and because
    the plane derivation is md5, an ANSI oracle re-derives the expected
    pixels from the text without parsing PPM in SQL (the hex-plane
    pattern; same trick as the audio oracles)."""
    plane = F.concat(
        F.unhex(F.md5(F.col("text"))),
        F.unhex(F.md5(F.concat(F.col("text"), F.lit(":p1")))),
        F.unhex(F.md5(F.concat(F.col("text"), F.lit(":p2")))),
    )
    payload = F.concat(F.encode(F.lit("P6\n4 4\n255\n"), "UTF-8"), plane)
    return documents.select(
        "doc_id",
        F.lit("image/x-portable-pixmap").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decoded_image_features(media: DataFrame) -> DataFrame:
    """REAL decode + integer-exact features via mapInPandas: parse each
    payload with the pure-Python codecs, emit dimensions, exact int64
    per-channel sums, and the decoded plane as lowercase hex (the
    surface an oracle matches byte-for-byte when the pixel source is
    known — a wrong parse cannot hide). Grayscale planes report the
    single channel's sum in all three columns.

    Scale: a pure map over Arrow batches — no driver collect; cost is
    the decode itself, linear in payload bytes. The input repartitions
    to the session parallelism first (the r4 single-file-scan lesson:
    a CPU-bound map over one local file otherwise runs on one core; on
    a cluster reading many files, maxPartitionBytes already splits and
    the exchange is one narrow pass over the payload column)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import decode_image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                arr = img.array().reshape(-1, img.channels)
                sums = arr.sum(axis=0, dtype=np.int64)
                if img.channels == 1:
                    sr = sg = sb = int(sums[0])
                else:
                    sr, sg, sb = (int(s) for s in sums)
                rows.append(
                    (
                        int(doc_id),
                        img.width,
                        img.height,
                        img.channels,
                        sr,
                        sg,
                        sb,
                        img.plane.hex(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    parallelism = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.select("doc_id", "payload")
        .repartition(parallelism)
        .mapInPandas(extract, DECODED_SCHEMA)
    )
