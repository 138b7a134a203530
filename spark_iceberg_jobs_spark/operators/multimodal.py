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

This container has no image/audio libraries, so ``decode_image`` is an
explicit NotImplementedError stub and the feature extractor computes real,
deterministic byte-level features (length, md5) through the exact same
mapInPandas plumbing a PIL/torchvision decoder would use — swap the body,
keep the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def decode_image(multimodal: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Stub: image decode requires PIL/opencv, not present in this container.

    The real implementation mirrors extract_payload_features: mapInPandas,
    decode each ``payload`` to HxWxC numpy, emit (doc_id, width, height,
    mean_rgb array<float>). Plumbing (schema, batching, partitioning) is
    identical to the tested feature extractor above.
    """
    raise NotImplementedError(
        "image decoding needs PIL/opencv; use extract_payload_features for the "
        "tested byte-level path — the mapInPandas plumbing is identical"
    )


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
