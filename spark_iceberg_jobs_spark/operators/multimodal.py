"""Multimodal column plumbing (EXTENSION X5): opaque binary payloads with
typed metadata, processed by Arrow-batched pandas functions.

The pattern for image/audio/video at 100 TB:

- the payload is an opaque ``binary`` column (or a (path, offset, length)
  pointer into object storage for very large blobs);
- typed metadata (mime, width, duration, ...) travels in a sibling struct so
  filters/pruning never touch the bytes;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  over Arrow record batches — one Python worker per partition, zero-copy
  into numpy; partition sizing keeps batches in memory.

This container has no image codec libraries (PIL/opencv), but that only
rules out *compressed* formats: ``decode_image`` REALLY decodes binary PGM
(P5) rasters — header parse + numpy frombuffer/reshape — through the
mapInPandas plumbing, and ``attach_image_payload`` synthesizes genuine PGM
bytes JVM-side so the whole binary→decode→features path runs and verifies
end-to-end. JPEG/PNG would swap the frombuffer line for a PIL call; the
schema, batching, and partitioning stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of extract_payload_features — declared once, used by tests.
FEATURE_SCHEMA = "doc_id bigint, byte_len bigint, payload_md5 string, mime string"


def attach_binary_payload(documents: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text as the payload
    plus a typed metadata struct. On a real corpus the payload column comes
    straight from the source (parquet/Iceberg ``binary``)."""
    return documents.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def extract_payload_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas`` receives pandas DataFrames per Arrow batch; bytes arrive
    as Python ``bytes`` objects. Features here are deterministic (length,
    md5) so the operator is oracle-able; a real decoder returns embeddings /
    pixel stats through the same signature.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return multimodal.mapInPandas(extract, schema=FEATURE_SCHEMA)


def attach_image_payload(
    documents: DataFrame, *, width: int = 16, height: int = 16
) -> DataFrame:
    """Synthesize a REAL binary image column: a valid binary PGM (P5)
    grayscale image per doc, raster bytes derived from md5(doc_id:row) —
    deterministic, so the downstream decode is oracle-able. Built entirely
    JVM-side (md5 → unhex → binary concat, whole-stage codegen): each md5
    hex digest is exactly 16 raster bytes, one digest per row.

    On a real corpus the payload column comes from the source table; this
    generator stands in for it while exercising the identical dataflow.
    """
    if width != 16:
        raise ValueError("md5-derived rasters are 16 bytes wide: width must be 16")
    header = F.lit(bytearray(f"P5\n{width} {height}\n255\n".encode()))
    row_hex = [
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{r}")))
        for r in range(height)
    ]
    return documents.select(
        "doc_id",
        F.concat(header, F.unhex(F.concat(*row_hex))).alias("payload"),
        F.struct(
            F.lit("image/x-portable-graymap").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
        ).alias("meta"),
    )


#: Output schema of decode_image — declared once, used by tests.
DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, mean_pixel double, "
    "min_pixel int, max_pixel int"
)


def decode_image(multimodal: DataFrame) -> DataFrame:
    """REAL image decode (binary PGM / P5) via Arrow-batched mapInPandas:
    parse the header, ``np.frombuffer`` the raster, reshape to HxW, emit
    per-image pixel statistics. This is the actual decode dataflow — for
    JPEG/PNG swap the frombuffer for a codec call (PIL), same signature,
    same batching, same schema discipline (stats out, never raw pixels,
    unless the next stage needs them).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                magic, _, rest = data.partition(b"\n")
                if magic != b"P5":
                    raise ValueError(
                        f"unsupported image magic {magic[:8]!r}: only binary PGM (P5) "
                        "decodes without a codec library; JPEG/PNG need PIL"
                    )
                dims, _, rest = rest.partition(b"\n")
                maxval, _, raster = rest.partition(b"\n")
                w, h = map(int, dims.split())
                if int(maxval) != 255:
                    raise ValueError(f"only 8-bit PGM supported, maxval={maxval!r}")
                img = np.frombuffer(raster[: w * h], dtype=np.uint8).reshape(h, w)
                out.append(
                    (
                        doc_id,
                        w,
                        h,
                        float(img.mean()),
                        int(img.min()),
                        int(img.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "mean_pixel",
                    "min_pixel",
                    "max_pixel",
                ],
            )

    return multimodal.mapInPandas(decode, schema=DECODE_SCHEMA)


def _wav_header(n_samples: int, sample_rate: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for PCM mono s16le."""
    import struct

    data_size = 2 * n_samples
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", data_size)
    )


def attach_audio_payload(
    documents: DataFrame, *, n_samples: int = 256, sample_rate: int = 8000
) -> DataFrame:
    """Synthesize a REAL audio column: a valid RIFF/WAVE (PCM mono s16le)
    clip per doc, samples derived from md5(wav:doc_id:row) — deterministic,
    so the downstream decode is oracle-able. Built JVM-side (md5 → unhex →
    binary concat); each digest is 16 bytes = 8 samples."""
    if n_samples % 8:
        raise ValueError("n_samples must be a multiple of 8 (8 samples per digest)")
    header = F.lit(bytearray(_wav_header(n_samples, sample_rate)))
    row_hex = [
        F.md5(F.concat(F.lit("wav:"), F.col("doc_id").cast("string"), F.lit(f":{r}")))
        for r in range(n_samples // 8)
    ]
    return documents.select(
        "doc_id",
        F.concat(header, F.unhex(F.concat(*row_hex))).alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(n_samples).alias("n_samples"),
        ).alias("meta"),
    )


#: Output schema of decode_audio — declared once, used by tests.
AUDIO_SCHEMA = (
    "doc_id bigint, n_samples int, sample_rate int, duration_sec double, "
    "rms double, peak int"
)


def decode_audio(multimodal: DataFrame) -> DataFrame:
    """REAL audio decode (RIFF/WAVE PCM s16le) via Arrow-batched
    mapInPandas: validate the RIFF header, read the fmt chunk's sample
    rate, ``np.frombuffer`` the PCM data as int16, emit per-clip signal
    statistics. Compressed codecs (mp3/opus) would swap the frombuffer
    for a codec call — same signature, batching, and schema."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                    raise ValueError(
                        f"unsupported audio container {data[:4]!r}: only RIFF/WAVE "
                        "PCM decodes without a codec library; mp3/opus need one"
                    )
                audio_format, channels = struct.unpack("<HH", data[20:24])
                (sample_rate,) = struct.unpack("<I", data[24:28])
                (bits,) = struct.unpack("<H", data[34:36])
                if (audio_format, channels, bits) != (1, 1, 16):
                    raise ValueError("only PCM mono s16le supported")
                (data_size,) = struct.unpack("<I", data[40:44])
                pcm = np.frombuffer(data[44 : 44 + data_size], dtype="<i2")
                samples = pcm.astype(np.float64)
                out.append(
                    (
                        doc_id,
                        len(pcm),
                        sample_rate,
                        len(pcm) / sample_rate,
                        float(np.sqrt(np.mean(samples * samples))),
                        int(np.max(np.abs(pcm.astype(np.int32)))),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_samples",
                    "sample_rate",
                    "duration_sec",
                    "rms",
                    "peak",
                ],
            )

    return multimodal.mapInPandas(decode, schema=AUDIO_SCHEMA)


def resize_stub(multimodal: DataFrame, *, factor: int = 4) -> DataFrame:
    """Deterministic stand-in for image resize: keeps every ``factor``-th
    byte of the payload as the 'thumbnail' (a real implementation decodes,
    bilinear-resamples, re-encodes — same mapInPandas signature, same
    binary-in/binary-out schema)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumbnail": pdf["payload"].map(lambda b: bytes(b)[::factor]),
                    "thumb_len": pdf["payload"].map(lambda b: len(bytes(b)[::factor])).astype("int64"),
                }
            )

    return multimodal.mapInPandas(
        resize, schema="doc_id bigint, thumbnail binary, thumb_len bigint"
    )


def sample_frames_stub(multimodal: DataFrame, *, every_n_bytes: int = 64) -> DataFrame:
    """Deterministic stand-in for video frame sampling: emits one row per
    ``every_n_bytes`` offset of the payload (as a real frame sampler emits
    one row per sampled frame). Demonstrates the 1→N mapInPandas expansion
    shape (explode-like output cardinality) used by frame extraction."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for off in range(0, len(data), every_n_bytes):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_offset": off,
                            "frame_byte": int(data[off]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_offset", "frame_byte"])

    return multimodal.mapInPandas(
        sample, schema="doc_id bigint, frame_offset bigint, frame_byte bigint"
    )


#: Output schema of image_histogram — declared once, used by tests.
HISTOGRAM_SCHEMA = "doc_id bigint, bin int, cnt bigint"


def image_histogram(multimodal: DataFrame, *, bins: int = 16) -> DataFrame:
    """Feature EXTRACTION (not just stats) from the decoded image: a
    ``bins``-bin intensity histogram per image via Arrow-batched
    mapInPandas — the shape of any per-image featurizer (embeddings,
    SIFT, perceptual hash: same batching, same decode, different numpy).
    Emits (doc_id, bin, cnt) rows for NON-EMPTY bins only, matching what
    a SQL GROUP BY over the replayed pixels produces — which is exactly
    how the oracle verifies the featurizer.

    256 must divide evenly into ``bins`` so the bin edges are integral
    (bin = pixel // (256/bins)) — integer math, no float binning drift.
    """
    if bins < 1 or 256 % bins != 0:
        raise ValueError(f"bins must divide 256 evenly, got {bins}")
    width = 256 // bins

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bs, cs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                magic, _, rest = data.partition(b"\n")
                if magic != b"P5":
                    raise ValueError(f"unsupported image magic {magic[:8]!r}")
                dims, _, rest = rest.partition(b"\n")
                maxval, _, raster = rest.partition(b"\n")
                w, h = map(int, dims.split())
                img = np.frombuffer(raster[: w * h], dtype=np.uint8)
                counts = np.bincount(img // width, minlength=bins)
                nz = np.nonzero(counts)[0]
                ids.extend([doc_id] * len(nz))
                bs.extend(int(b) for b in nz)
                cs.extend(int(counts[b]) for b in nz)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "bin": pd.Series(bs, dtype="int32"),
                    "cnt": pd.Series(cs, dtype="int64"),
                }
            )

    return multimodal.mapInPandas(featurize, schema=HISTOGRAM_SCHEMA)


#: Output schema of resize_image — a real re-encoded PGM plus its stats.
RESIZE_SCHEMA = (
    "doc_id bigint, out_width int, out_height int, thumb_len bigint, "
    "mean_pixel double, min_pixel int, max_pixel int"
)


def resize_image(multimodal: DataFrame, *, factor: int = 2) -> DataFrame:
    """REAL image resize (average pooling) via Arrow-batched mapInPandas:
    decode the binary PGM, block-average ``factor x factor`` pixel
    neighborhoods (the standard box-filter downsample — bilinear at
    integer factors), RE-ENCODE the thumbnail as a valid PGM, and emit it
    with its stats. Replaces the byte-striding resize_stub as the real
    decode -> resample -> re-encode dataflow; for JPEG the numpy pooling
    swaps for a codec round-trip, same signature.

    Pixel math is integer-exact (sum of factor² uint8 values // factor²,
    floor division), so a SQL oracle reconstructs every thumbnail pixel
    from the md5 raster replay — the resize itself is hash-verifiable.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {k: [] for k in (
            "doc_id", "out_width", "out_height", "thumb_len",
            "mean_pixel", "min_pixel", "max_pixel",
        )}
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                magic, _, rest = data.partition(b"\n")
                if magic != b"P5":
                    raise ValueError(f"unsupported image magic {magic[:8]!r}")
                dims, _, rest = rest.partition(b"\n")
                maxval, _, raster = rest.partition(b"\n")
                w, h = map(int, dims.split())
                if w % factor or h % factor:
                    raise ValueError(f"{w}x{h} not divisible by factor {factor}")
                img = np.frombuffer(raster[: w * h], dtype=np.uint8).reshape(h, w)
                ow, oh = w // factor, h // factor
                pooled = (
                    img.reshape(oh, factor, ow, factor)
                    .sum(axis=(1, 3), dtype=np.int64)
                    // (factor * factor)
                ).astype(np.uint8)
                thumb = f"P5\n{ow} {oh}\n255\n".encode() + pooled.tobytes()
                out["doc_id"].append(doc_id)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["thumb_len"].append(len(thumb))
                out["mean_pixel"].append(float(pooled.mean()))
                out["min_pixel"].append(int(pooled.min()))
                out["max_pixel"].append(int(pooled.max()))
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    return multimodal.mapInPandas(resize, schema=RESIZE_SCHEMA)


#: Output schema of audio_features — declared once, used by tests.
AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, n_crossings bigint, mean_abs double, n_loud bigint"
)


def audio_features(multimodal: DataFrame, *, loud_threshold: int = 24576) -> DataFrame:
    """Audio FEATURE extraction beyond summary stats (the X5 twin of
    image_histogram): per clip, the zero-crossing count (the classic
    cheap voicing / noisiness signal), mean absolute amplitude, and the
    count of near-clipping samples (|s| >= ``loud_threshold``). Decodes
    the RIFF/WAVE PCM inside Arrow-batched mapInPandas; all three
    features are integer-exact or exact-ratio arithmetic over the s16le
    samples, so the md5 sample replay verifies the featurizer itself."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                    raise ValueError(f"unsupported audio container {data[:4]!r}")
                (data_size,) = struct.unpack("<I", data[40:44])
                pcm = np.frombuffer(data[44 : 44 + data_size], dtype="<i2").astype(
                    np.int32
                )
                # crossing: strict sign change between consecutive samples
                # (zero counts as non-negative — mirrors the SQL replay)
                sgn = np.where(pcm >= 0, 1, -1)
                crossings = int((sgn[1:] != sgn[:-1]).sum())
                out.append(
                    (
                        doc_id,
                        crossings,
                        float(np.abs(pcm).mean()),
                        int((np.abs(pcm) >= loud_threshold).sum()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_crossings", "mean_abs", "n_loud"]
            )

    return multimodal.mapInPandas(featurize, schema=AUDIO_FEATURE_SCHEMA)
