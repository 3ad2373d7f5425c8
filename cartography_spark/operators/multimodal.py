"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions
over ``mapInPandas``.

The decode step is STUBBED (this environment ships no image/audio codecs):
``decode_image_meta`` parses a deterministic fake header instead of calling
Pillow/ffmpeg — the Spark-side contract (schema, batch iteration, partition
behavior, binary transport through Arrow) is real and tested. Swap
``_parse_header`` for a real decoder to productionize; the plan shape does
not change.

At scale: binary payloads stay in executor memory one Arrow batch at a
time (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
metadata extraction is a narrow transformation — no shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"FIMG"


def synthesize_image_column(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake image bytes per doc: a 12-byte header
    (magic, width, height derived from the text hash) + md5-derived body.
    Gives tests a real binary column without codec dependencies."""
    from cartography_spark.operators.dedup import portable_hash32

    h = F.unhex(F.md5(F.col(text_col)))
    width = (portable_hash32(F.col(text_col)) % 1920 + 1).cast("int")
    height = (portable_hash32(F.reverse(F.col(text_col))) % 1080 + 1).cast("int")
    header = F.concat(
        F.lit(FAKE_MAGIC),
        _int_be(width),
        _int_be(height),
    )
    return docs.select(F.col(id_col), F.concat(header, h).alias("image"))


def _int_be(col):
    """4-byte big-endian encoding of an int column (JVM-side)."""
    return F.unhex(F.lpad(F.hex(col), 8, "0"))


def _parse_header(payload: bytes) -> tuple[int, int, bool]:
    """STUB decoder: parse the fake header. A real implementation would be
    e.g. ``PIL.Image.open(io.BytesIO(payload))`` — deliberately not
    attempted here (no codec libs in this environment)."""
    if payload is None or len(payload) < 12 or payload[:4] != FAKE_MAGIC:
        return (0, 0, False)
    w, h_ = struct.unpack(">II", payload[4:12])
    return (w, h_, True)


def decode_image_meta(images: DataFrame, bin_col: str = "image", id_col: str = "doc_id") -> DataFrame:
    """Extract (width, height, n_bytes, valid) from the binary column via
    Arrow-batched mapInPandas."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[bin_col].map(_parse_header)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "n_bytes": pdf[bin_col].map(lambda b: 0 if b is None else len(b)),
                    "valid": meta.map(lambda m: m[2]),
                }
            )

    schema = f"{id_col} long, width int, height int, n_bytes int, valid boolean"
    return images.mapInPandas(extract, schema)


def resize_stub(images: DataFrame, target_w: int, target_h: int, bin_col: str = "image") -> DataFrame:
    """Resize contract: same schema out, payload replaced by a header with
    the new dimensions (STUB — a real impl re-encodes pixels)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr = FAKE_MAGIC + struct.pack(">II", target_w, target_h)
        for pdf in batches:
            out = pdf.copy()
            out[bin_col] = out[bin_col].map(lambda b: None if b is None else hdr + b[12:])
            yield out

    return images.mapInPandas(resize, images.schema)


FAKE_AUDIO_MAGIC = b"FAUD"
AUDIO_RATE = 16000


def synthesize_audio_column(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake audio bytes per doc: an 8-byte header (magic +
    sample rate) + md5(text) as the 16 'samples'."""
    header = F.concat(F.lit(FAKE_AUDIO_MAGIC), _int_be(F.lit(AUDIO_RATE)))
    return docs.select(
        F.col(id_col), F.concat(header, F.unhex(F.md5(F.col(text_col)))).alias("audio")
    )


def extract_audio_features(audio: DataFrame, bin_col: str = "audio", id_col: str = "doc_id") -> DataFrame:
    """Audio feature extraction through Arrow-batched mapInPandas:
    (sample_rate, n_samples, duration_ms, mean_amplitude). STUB decodes the
    fake format; a real impl would call soundfile/librosa in the same batch
    loop — the plan (narrow, no shuffle, Arrow transport) is identical."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats(payload):
            if payload is None or len(payload) < 8 or payload[:4] != FAKE_AUDIO_MAGIC:
                return (0, 0, 0.0, 0.0)
            rate = struct.unpack(">I", payload[4:8])[0]
            samples = payload[8:]
            n = len(samples)
            dur = n * 1000.0 / rate if rate else 0.0
            mean_amp = sum(samples) / n if n else 0.0
            return (rate, n, dur, mean_amp)

        for pdf in batches:
            m = pdf[bin_col].map(feats)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": m.map(lambda t: t[0]),
                    "n_samples": m.map(lambda t: t[1]),
                    "duration_ms": m.map(lambda t: t[2]),
                    "mean_amplitude": m.map(lambda t: t[3]),
                }
            )

    schema = f"{id_col} long, sample_rate int, n_samples int, duration_ms double, mean_amplitude double"
    return audio.mapInPandas(extract, schema)


def frame_sample_stub(videos: DataFrame, every_n: int, bin_col: str = "video", id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling contract for video: emits one row per sampled frame
    (explode-shaped mapInPandas). STUB: frames are 16-byte slices of the
    payload — a real impl would demux with ffmpeg."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[bin_col] or b""
                frames = [payload[i : i + 16] for i in range(0, len(payload), 16)]
                for fi, fr in enumerate(frames[::every_n]):
                    rows.append({id_col: r[id_col], "frame_no": fi * every_n, "frame": fr})
            yield pd.DataFrame(rows, columns=[id_col, "frame_no", "frame"])

    return videos.mapInPandas(sample, f"{id_col} long, frame_no int, frame binary")
