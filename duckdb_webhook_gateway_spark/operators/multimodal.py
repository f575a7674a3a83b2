"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via ``mapInPandas``.

The engine treats image/audio/video as ``binary`` columns.  The Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested; the actual media decoding is STUBBED because no image/audio
libraries exist in this environment:

- ``decode_image`` / ``decode_audio`` raise ``NotImplementedError`` with
  the intended signature documented, and
- ``extract_features`` runs a deterministic fake "decode" (byte length,
  md5 content hash, a frame count derived from length) so the batch
  pipeline is exercised end to end and oracle-checkable.

Scale notes: ``mapInPandas`` streams Arrow record batches through Python —
one python worker per core, zero driver involvement, no collect.  For real
media, bound batch memory with ``spark.sql.execution.arrow.maxRecordsPerBatch``
(payloads are MBs, not bytes) and repartition by size class before decode
so a partition of 4K videos doesn't sit behind one of thumbnails.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, byte_len bigint, content_hash string, n_frames int"


def to_binary_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model a media table: (id, blob binary, media_type, byte metadata)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("blob"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(text_col).alias("declared_len"),
    )


def decode_image(blob: bytes) -> "object":
    """STUB — real impl would be PIL/opencv decode -> ndarray(h, w, c).

    Kept as an explicit hole: the container has no imaging libraries.
    """
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/cv2); not available "
        "in this environment — wire it in here, signature stays the same"
    )


def decode_audio(blob: bytes) -> "object":
    """STUB — real impl would be soundfile/ffmpeg decode -> pcm ndarray."""
    raise NotImplementedError(
        "audio decode requires an audio library (soundfile/ffmpeg); not "
        "available in this environment"
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: the Arrow/pandas plumbing is real, the
    media math is a stand-in (len, md5, len-derived frame count)."""
    blobs = pdf["blob"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "byte_len": blobs.map(len).astype("int64"),
            "content_hash": blobs.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            "n_frames": (blobs.map(len) % 7 + 1).astype("int32"),
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
