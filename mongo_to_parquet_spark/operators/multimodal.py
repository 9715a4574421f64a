"""Multimodal column plumbing (SURVEY §2.3 N★).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery — schema, Arrow batching, mapInPandas
signatures, partition sizing — is real and tested; the actual media decode
is STUBBED (image/audio libs are not in this container): pass
``fake=True`` for a deterministic fake featurizer, otherwise the decode
raises ``NotImplementedError`` at execution time.

Scale notes: media rows are large and variable — the ingest path
repartitions by byte-size budget (``target_partition_bytes``) rather than
row count so a single task never holds too many blobs; feature extraction
streams Arrow batches through ``mapInPandas`` (never collects a partition
into one pandas frame at once).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata carried beside every media blob
MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),  # "image" | "audio" | "video"
        StructField("format", StringType()),      # "png", "wav", ...
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model fixture docs as media rows: payload = utf-8 bytes of the text.

    (The fixtures ship no real media; this exercises the exact schema and
    partition shape a real image/audio table would have.)
    """
    payload = F.col(text_col).cast("binary")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(buf: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake featurizer: byte-histogram-ish projection."""
    acc = [0] * dim
    for i, b in enumerate(buf):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [float(v) / 997.0 for v in acc]


def extract_features(media: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """Decode blobs → fixed-dim float features via Arrow-batched mapInPandas.

    Real decode (PIL/librosa/ffmpeg) is unavailable here → stubbed. The
    iterator-of-batches signature is the scalable shape: one Arrow batch in
    memory per task at a time, never the whole partition.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this container; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(lambda b: _fake_decode(bytes(b), dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes_in", LongType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def resize_media(
    media: DataFrame, scale_div: int = 4, fake: bool = False
) -> DataFrame:
    """Resize/downscale blobs -> smaller blobs via Arrow-batched mapInPandas.

    Real resize (PIL thumbnail / ffmpeg scale) is unavailable in this
    container -> stubbed behind ``fake=True`` with a deterministic
    byte-subsample (every ``scale_div``-th byte), which preserves exactly
    the property the Spark plumbing must handle: the output payload is a
    transformed SMALLER binary with its own size metadata. Same
    iterator-of-batches shape as extract_features -- one Arrow batch in
    flight per task, the whole partition never materializes; at 100 TB
    this is the standard map-only preprocessing pass in front of a
    GPU/vision featurizer (pair with repartition_by_bytes so tasks are
    byte-balanced, not row-balanced).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media resize requires image/video libraries not present "
                    "in this container; pass fake=True for the deterministic stub"
                )
            small = pdf["payload"].map(lambda b: bytes(b)[::scale_div])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": small,
                    "n_bytes_in": pdf["payload"].map(len).astype("int64"),
                    "n_bytes_out": small.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def repartition_by_bytes(
    media: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size partitions by payload bytes, not rows — blobs are skewed."""
    stats = media.select(F.sum(F.octet_length("payload")).alias("b")).collect()[0]
    n = max(1, int((stats["b"] or 0) // target_partition_bytes) + 1)
    return media.repartition(n)


def sample_frames(
    media: DataFrame,
    duration_col: str = "duration_s",
    interval_s: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling manifest: one row per sampled frame timestamp.

    The decode-side work (seek + JPEG encode) happens elsewhere; this is
    the Spark-side planning op that turns a media table into the frame
    work-list a GPU featurizer consumes — (id, frame_idx, ts_ms) every
    ``interval_s`` seconds from 0 through the clip duration. Pure
    ``sequence`` + ``posexplode`` (codegen'd Generate, zero shuffle, zero
    Python): the manifest for a 100 TB video corpus is a narrow map-only
    pass whose output partitioning inherits the input's. Integer math
    end-to-end so manifests are engine-reproducible.
    """
    n_last = F.floor(F.col(duration_col) / F.lit(interval_s)).cast("long")
    return media.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_last)).alias("frame_idx", "_t"),
    ).select(
        id_col,
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx").cast("long") * F.lit(1000 * interval_s)).alias("ts_ms"),
    )


def audio_windows(
    media: DataFrame,
    n_samples_col: str = "n_samples",
    sample_rate: int = 16000,
    win_ms: int = 400,
    hop_ms: int = 160,
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio feature-window manifest: one row per (overlapping) STFT-style
    analysis window — the audio twin of ``sample_frames``.

    Emits (id, win_idx, start_sample, end_sample, start_ms) for windows of
    ``win_ms`` every ``hop_ms``, covering [0, n_samples); clips shorter
    than one window yield no rows (the featurizer's contract). Like the
    frame manifest this is the PLANNING half — decode/FFT runs in the
    Arrow-batched featurizer (extract_features) — and it is a codegen'd
    sequence+posexplode: map-only, zero shuffle, integer-exact, so the
    work-list for a 100 TB audio corpus is reproducible across engines,
    retries, and partitionings. Window count per clip is
    floor((n_samples - win) / hop) + 1 — the hop, not the window, sets
    output volume (overlap factor win/hop ≈ 2.5 here).
    """
    win = sample_rate * win_ms // 1000
    hop = sample_rate * hop_ms // 1000
    n = F.col(n_samples_col).cast("long")
    return (
        media.filter(n >= win)
        .select(
            F.col(id_col),
            F.expr(f"({n_samples_col} - {win}) div {hop}").alias("_last"),
        )
        .select(
            id_col,
            F.posexplode(F.sequence(F.lit(0).cast("long"), F.col("_last"))).alias(
                "_i", "win_idx"
            ),
        )
        .select(
            id_col,
            F.col("win_idx").cast("long").alias("win_idx"),
            (F.col("win_idx") * hop).cast("long").alias("start_sample"),
            (F.col("win_idx") * hop + win).cast("long").alias("end_sample"),
            (F.col("win_idx") * hop_ms).cast("long").alias("start_ms"),
        )
    )


def extract_features_arrow(media: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """``extract_features`` on ``mapInArrow`` — pyarrow RecordBatches
    end-to-end, no pandas materialization.

    Same contract and output as the mapInPandas path (parity pinned in
    tests); the difference is purely the exchange: for binary-heavy media
    batches, skipping the Arrow→pandas→Arrow conversion avoids one full
    copy of every blob per batch, which at 100 TB of payload is the
    difference between the Python worker being copy-bound or
    decode-bound. Prefer this path when the per-row work consumes raw
    bytes (decoders); prefer mapInPandas when the work wants vectorized
    pandas semantics (numeric feature math).
    """
    import pyarrow as pa

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this container; pass fake=True for the deterministic stub"
                )
            ids = batch.column(batch.schema.get_field_index("doc_id"))
            payloads = batch.column(batch.schema.get_field_index("payload"))
            feats = [_fake_decode(p.as_py(), dim) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([len(p.as_py()) for p in payloads], type=pa.int64()),
                    pa.array(feats, type=pa.list_(pa.float32())),
                ],
                names=["doc_id", "n_bytes", "feature"],
            )

    return media.mapInArrow(run, schema=FEATURE_SCHEMA)


# ----------------------------------------------- container-header parsing --
# Real-spec byte layouts, parsed with expression-only binary slicing (no
# UDF, whole-stage codegen): a PNG's IHDR carries width/height as 4-byte
# BIG-endian ints at offsets 17/21 (1-based), a WAV's RIFF fmt chunk
# carries channels (2-byte) and sample rate (4-byte) LITTLE-endian at
# offsets 23/25. The fixtures ship no real media, so synth_media wraps
# the text bytes in REAL headers with doc_id-derived parameters — the
# parser is the production operator (it dispatches on magic bytes and
# reads spec offsets); the synthesizer exists only to give it bytes.

_PNG_MAGIC_HEX = "89504E470D0A1A0A"
_RIFF_MAGIC_HEX = "52494646"  # 'RIFF'


def _be4(col):
    """4-byte big-endian binary of an int column (PNG's int encoding)."""
    return F.unhex(F.lpad(F.hex(col.cast("bigint")), 8, "0"))


def _le(col, nbytes: int):
    """little-endian binary of an int column (RIFF's int encoding):
    byte-reverse the zero-padded hex string, two hex chars at a time."""
    h = F.lpad(F.hex(col.cast("bigint")), 2 * nbytes, "0")
    pairs = [F.substring(h, 2 * i + 1, 2) for i in range(nbytes)]
    return F.unhex(F.concat(*reversed(pairs)))


def _le_read(payload, pos: int, nbytes: int):
    """Read a little-endian int from payload bytes [pos, pos+nbytes)."""
    h = F.hex(F.expr(f"substring(payload, {pos}, {nbytes})"))
    pairs = [F.substring(h, 2 * i + 1, 2) for i in range(nbytes)]
    return F.conv(F.concat(*reversed(pairs)), 16, 10).cast("bigint")


def synth_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap each doc's bytes in a REAL container header — PNG for even
    doc_ids (width = 1 + id % 1024, height = 1 + (id // 7) % 768), WAV
    for odd (channels = 1 + (id // 3) % 2, rate = 8000·(1 + id % 5)) —
    so the parser below exercises genuine spec offsets and both endian
    conventions. Deterministic: every parameter is doc_id arithmetic,
    which is exactly what the oracle recomputes."""
    did = F.col("doc_id")
    body = F.col(text_col).cast("binary")
    png = F.concat(
        F.unhex(F.lit(_PNG_MAGIC_HEX)),
        F.unhex(F.lit("0000000D")),          # IHDR length = 13
        F.lit("IHDR").cast("binary"),
        _be4(F.lit(1) + did % 1024),          # width  @ 17, BE
        _be4(F.lit(1) + (did / 7).cast("bigint") % 768),  # height @ 21, BE
        F.unhex(F.lit("080600000000000000")),  # depth8/color6/comp/filt/interlace + CRC
        body,
    )
    wav = F.concat(
        F.lit("RIFF").cast("binary"),
        _le(F.octet_length(body) + 36, 4),    # chunk size, LE
        F.lit("WAVEfmt ").cast("binary"),
        _le(F.lit(16), 4),                    # fmt subchunk size
        _le(F.lit(1), 2),                     # PCM
        _le(F.lit(1) + (did / 3).cast("bigint") % 2, 2),  # channels @ 23
        _le(F.lit(8000) * (F.lit(1) + did % 5), 4),       # rate    @ 25
        _le(F.lit(8000) * (F.lit(1) + did % 5) * 2, 4),   # byte rate
        _le(F.lit(2), 2),                     # block align
        _le(F.lit(16), 2),                    # bits per sample
        F.lit("data").cast("binary"),
        _le(F.octet_length(body), 4),         # data chunk size
        body,
    )
    return docs.select(
        "doc_id",
        F.when(did % 2 == 0, png).otherwise(wav).alias("payload"),
    )


def parse_media_header(media: DataFrame) -> DataFrame:
    """Dispatch on MAGIC BYTES and read each container's spec offsets —
    the operator a real ingest runs before any decode: it needs only the
    first ~30 bytes of the blob, stays entirely in whole-stage codegen
    (binary substring + hex + conv — no UDF, no Python), and yields the
    typed metadata row (media_type, width, height, channels,
    sample_rate) that downstream routing/filtering joins on.

    At 100 TB this is the cheap pass that runs on EVERYTHING (headers
    only — with parquet column stats the payload column streams, never
    materializes whole), while the expensive decode (extract_features)
    runs on the filtered survivors."""
    magic8 = F.hex(F.expr("substring(payload, 1, 8)"))
    magic4 = F.hex(F.expr("substring(payload, 1, 4)"))
    is_png = magic8 == F.lit(_PNG_MAGIC_HEX)
    is_wav = magic4 == F.lit(_RIFF_MAGIC_HEX)
    be = lambda pos: F.conv(  # noqa: E731  (4-byte big-endian read)
        F.hex(F.expr(f"substring(payload, {pos}, 4)")), 16, 10
    ).cast("bigint")
    return media.select(
        "doc_id",
        F.when(is_png, F.lit("png"))
        .when(is_wav, F.lit("wav"))
        .otherwise(F.lit("unknown"))
        .alias("media_type"),
        F.when(is_png, be(17)).alias("width"),
        F.when(is_png, be(21)).alias("height"),
        F.when(is_wav, _le_read(F.col("payload"), 23, 2)).alias("channels"),
        F.when(is_wav, _le_read(F.col("payload"), 25, 4)).alias("sample_rate"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
    )
