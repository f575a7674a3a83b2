"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via ``mapInPandas``.

The engine treats image/audio/video as ``binary`` columns.  Decoding is
REAL for the formats expressible without external media libraries:

- ``decode_audio`` — 16-bit PCM WAV via the stdlib ``wave`` module
  (``encode_wav_pcm16`` is its inverse);
- ``decode_image`` — uncompressed 24-bit BMP via pure struct parsing
  (``encode_bmp24`` is its inverse); other image formats route through
  PIL when importable and raise ``NotImplementedError`` otherwise
  (this container ships no imaging libs — the plumbing is unchanged once
  one is wired in).

``audio_features`` / ``image_features`` run those decoders inside
``mapInPandas`` over synthesized-but-real WAV/BMP blobs whose content is
a deterministic function of (doc_id, n_chars) — so the DuckDB oracle
reproduces every feature from first principles and the driver
value-hashes a genuine encode→decode→aggregate round trip.
``extract_features`` keeps the format-agnostic path (byte length, md5,
length-derived frame count) for opaque blobs.

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


def encode_bmp24(pixels: "object") -> bytes:
    """Encode an (h, w, 3) uint8 RGB ndarray as an uncompressed 24-bit BMP
    (BI_RGB, bottom-up rows, 4-byte row padding) — pure struct packing,
    no imaging library."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    row_len = (w * 3 + 3) & ~3
    img = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        img += row + b"\x00" * (row_len - len(row))
    header_size = 14 + 40
    file_size = header_size + len(img)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
        + bytes(img)
    )


def decode_image(blob: bytes) -> "object":
    """Decode an image blob -> uint8 ndarray (h, w, 3) RGB.

    Real decoder for uncompressed 24-bit BMP (pure struct parsing — no
    imaging library needed, the inverse of :func:`encode_bmp24`); other
    formats route through PIL when available and raise
    ``NotImplementedError`` otherwise (this container ships no imaging
    libraries; the signature and the Spark-side plumbing are identical
    once PIL is wired in).
    """
    import struct

    import numpy as np

    if blob[:2] == b"BM":
        offset = struct.unpack_from("<I", blob, 10)[0]
        (hdr, w, h, _planes, bpp, comp) = struct.unpack_from("<IiiHHI", blob, 14)
        if bpp != 24 or comp != 0:
            raise NotImplementedError(f"BMP variant unsupported: bpp={bpp} comp={comp}")
        row_len = (w * 3 + 3) & ~3
        rows = []
        for y in range(abs(h)):
            start = offset + y * row_len
            row = np.frombuffer(blob, dtype=np.uint8, count=w * 3, offset=start)
            rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
        arr = np.stack(rows)
        return arr[::-1] if h > 0 else arr  # bottom-up -> top-down
    try:
        from PIL import Image  # type: ignore
        import io

        return np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            "non-BMP image decode requires an imaging library (PIL/cv2); "
            "not available in this environment — wire it in here, the "
            "signature stays the same"
        )


def encode_wav_pcm16(samples: "object", sample_rate: int = 8000) -> bytes:
    """Encode an int16 ndarray as a mono 16-bit PCM WAV (stdlib wave)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_audio(blob: bytes) -> "tuple":
    """Decode an audio blob -> (samples ndarray[int16, frames×channels],
    sample_rate).

    Real decoder for PCM WAV via the stdlib ``wave`` module (16-bit; the
    inverse of :func:`encode_wav_pcm16`).  Compressed formats would route
    through soundfile/ffmpeg — not available in this container, so they
    raise ``NotImplementedError`` with the same signature.
    """
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(blob), "rb") as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError(
                    f"only 16-bit PCM supported, got width={w.getsampwidth()}"
                )
            frames = np.frombuffer(
                w.readframes(w.getnframes()), dtype="<i2"
            ).reshape(-1, w.getnchannels())
            return frames, w.getframerate()
    except wave.Error as e:
        raise NotImplementedError(
            f"non-WAV audio decode requires soundfile/ffmpeg; not available "
            f"in this environment ({e})"
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


# ---------------------------------------------------------------------------
# Real codec round-trips over synthesized media.  Sample/pixel values are
# deterministic integer functions of (doc_id, n_chars) so the DuckDB
# oracle reproduces every downstream feature without parsing WAV/BMP —
# what the driver then hashes is a genuine encode→decode→aggregate path.
#
# Contract: doc_id >= 0.  The formulas use `%`, and the two engines
# disagree on negative dividends (numpy returns the non-negative residue,
# DuckDB the sign of the dividend) — a negative doc_id would synthesize
# DIFFERENT media than the oracle replays.  All test corpora (driver
# parquet, fuzz generators) use non-negative ids; real pipelines feed
# real blobs and never touch these synth devices.

AUDIO_SAMPLE_RATE = 8000
AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, "
    "duration_s double, rms double"
)
IMAGE_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def _synth_samples(doc_id: int, n: int):
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 31 + i * 7) % 65536 - 32768).astype("<i2")


def _synth_pixels(doc_id: int, n_chars: int):
    import numpy as np

    w = n_chars % 31 + 2
    h = n_chars % 17 + 2
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (doc_id + 3 * x + 5 * y) % 256
    g = (doc_id * 7 + x + 2 * y) % 256
    b = (doc_id + x * y) % 256
    return np.stack(
        [np.broadcast_to(c, (h, w)) for c in (r, g, b)], axis=-1
    ).astype("uint8")


def synth_audio_table(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): one real PCM-WAV blob per document (n_chars
    samples, values derived from doc_id)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), encode_wav_pcm16(_synth_samples(int(d), int(n)), AUDIO_SAMPLE_RATE))
                for d, n in zip(pdf["doc_id"], pdf["n_chars"])
                if int(n) > 0
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])

    return docs.select("doc_id", "n_chars").mapInPandas(
        synth, schema="doc_id bigint, blob binary"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV blobs (REAL stdlib decode) -> per-doc audio stats.

    rms is computed from an exact int64 sum of squares, then one double
    division + sqrt — bit-identical across engines.
    """
    import math

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["blob"]):
                frames, rate = decode_audio(bytes(blob))
                s = frames[:, 0].astype(np.int64)
                n = len(s)
                ss = int(np.sum(s * s))
                out.append(
                    (
                        int(d),
                        rate,
                        n,
                        # the DECODED rate, not the synth constant — a
                        # 16 kHz upload must not report half its duration
                        round(n / float(rate), 6) if rate else 0.0,
                        # zero-frame WAVs are well-formed: rms 0, no
                        # ZeroDivisionError killing the task
                        round(math.sqrt(ss / n), 4) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "sample_rate", "n_samples", "duration_s", "rms"],
            )

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def synth_image_table(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): one real 24-bit BMP per document (dimensions and
    pixels derived from doc_id / n_chars)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), encode_bmp24(_synth_pixels(int(d), int(n))))
                for d, n in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])

    return docs.select("doc_id", "n_chars").mapInPandas(
        synth, schema="doc_id bigint, blob binary"
    )


def image_features(media: DataFrame) -> DataFrame:
    """Decode BMP blobs (REAL struct-level decode) -> per-doc image stats.

    Channel means come from exact integer pixel sums over the DECODED
    array divided once — engine-portable to the last bit.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_image(bytes(blob)).astype(np.int64)
                h, w, _ = arr.shape
                sums = arr.sum(axis=(0, 1))
                out.append(
                    (
                        int(d),
                        w,
                        h,
                        round(int(sums[0]) / (w * h), 6),
                        round(int(sums[1]) / (w * h), 6),
                        round(int(sums[2]) / (w * h), 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Video: YUV4MPEG2 (.y4m) — a REAL uncompressed video container (plain
# header + raw planar frames) encodable/decodable without media libs.
VIDEO_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, n_sampled int, "
    "mean_y double"
)


def encode_y4m(frames: "object", fps: int = 25) -> bytes:
    """Encode (n, h, w, 3) uint8 YUV frames as YUV4MPEG2, C444 planar."""
    n, h, w, _ = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()]
    for f in frames:
        out.append(b"FRAME\n")
        for plane in range(3):
            out.append(f[:, :, plane].tobytes())
    return b"".join(out)


def decode_y4m(blob: bytes) -> "tuple":
    """Parse a YUV4MPEG2 stream -> ((n, h, w, 3) uint8, width, height).

    Handles the C444 planar layout this engine writes; chroma-subsampled
    variants (C420 etc.) and parameterized FRAME headers raise
    ``NotImplementedError`` with the signature intact (same contract as
    the BMP/WAV decoders: wire in a real AV lib for exotic inputs)."""
    import numpy as np

    nl = blob.index(b"\n")
    header = blob[:nl].decode("ascii")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    params = {p[0]: p[1:] for p in header.split()[1:]}
    w, h = int(params["W"]), int(params["H"])
    if params.get("C", "420") != "444":
        raise NotImplementedError(f"chroma mode unsupported: C{params.get('C')}")
    fsize = w * h
    frames = []
    pos = nl + 1
    while pos < len(blob):
        if blob[pos : pos + 6] != b"FRAME\n":
            raise NotImplementedError("parameterized FRAME headers unsupported")
        pos += 6
        planes = np.frombuffer(blob[pos : pos + 3 * fsize], dtype=np.uint8)
        frames.append(planes.reshape(3, h, w).transpose(1, 2, 0))
        pos += 3 * fsize
    return np.stack(frames), w, h


def _synth_frames(doc_id: int, n_chars: int):
    import numpy as np

    w = n_chars % 8 + 2
    h = n_chars % 6 + 2
    n = n_chars % 13 + 1
    f = np.arange(n, dtype=np.int64)[:, None, None]
    y = np.arange(h, dtype=np.int64)[None, :, None]
    x = np.arange(w, dtype=np.int64)[None, None, :]
    yv = (doc_id * 11 + f * 17 + x * 3 + y * 5) % 256
    u = (doc_id * 5 + f * 3 + x * 7 + y) % 256
    v = (doc_id + f * 13 + x + y * 9) % 256
    return np.stack(
        [np.broadcast_to(c, (n, h, w)) for c in (yv, u, v)], axis=-1
    ).astype("uint8")


def synth_video_table(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): one real .y4m clip per document (dims, frame count
    and pixels all deterministic functions of doc_id / n_chars)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), encode_y4m(_synth_frames(int(d), int(n))))
                for d, n in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])

    return docs.select("doc_id", "n_chars").mapInPandas(
        synth, schema="doc_id bigint, blob binary"
    )


def video_features(media: DataFrame, sample_stride: int = 2) -> DataFrame:
    """Decode .y4m blobs (REAL container parse) and frame-sample: every
    ``sample_stride``-th frame contributes to the luma mean — the
    decode → frame-sample → feature-extract pipeline stage for video
    corpora.  Luma mean is an exact int64 sum over sampled Y planes with
    one final double division, so the oracle reproduces it bit-exactly."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr, w, h = decode_y4m(bytes(blob))
                n = arr.shape[0]
                sampled = arr[::sample_stride, :, :, 0].astype(np.int64)
                ns = sampled.shape[0]
                out.append(
                    (
                        int(d),
                        w,
                        h,
                        n,
                        ns,
                        round(int(sampled.sum()) / (ns * w * h), 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "n_frames", "n_sampled", "mean_y",
                ],
            )

    return media.mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
RESIZE_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "mean_r8 double, mean_g8 double, mean_b8 double"
)


def resize_nn(arr: "object", out_w: int, out_h: int) -> "object":
    """Nearest-neighbor resize of an (h, w, c) array via integer source
    mapping: src_x = out_x·w DIV out_w (floor) — pure index arithmetic,
    so the oracle can address the same source pixels symbolically."""
    import numpy as np

    h, w = arr.shape[:2]
    sx = (np.arange(out_w, dtype=np.int64) * w) // out_w
    sy = (np.arange(out_h, dtype=np.int64) * h) // out_h
    return arr[sy[:, None], sx[None, :]]


PHASH_SCHEMA = "doc_id bigint, dhash bigint, b0 int, b1 int, b2 int, b3 int"


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over decoded images: decode →
    nearest-neighbor resample the integer GRAY SUM (r+g+b — scaling-free,
    exact int) to a 9×8 grid → 64 bits, bit(ty·8+tx) = 1 iff
    gray(ty,tx+1) > gray(ty,tx).  Pure integer ops end to end (the
    resample is :func:`resize_nn`'s floor index mapping), so a SQL
    oracle replays the hash from pixel formulas symbolically.

    Near-identical images (small pixel perturbations, recompression)
    keep most adjacent-pixel ORDERINGS, so their dHashes sit within a
    small Hamming radius — the classic image near-dup fingerprint
    (same public aHash/dHash family as imagehash).  Returns one row per
    image: the packed 64-bit hash plus its four 16-bit bands b0..b3 —
    the LSH-style banding columns (two hashes within Hamming radius r
    collide on ≥1 of 4 bands whenever their differing bits cluster in
    ≤3 bands; with r ≤ 3, a collision is guaranteed by pigeonhole).

    Scale shape: one Arrow decode pass, no shuffle — banding/join/top-k
    live in :func:`near_dup_images_phash`.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_image(bytes(blob)).astype(np.int64)
                gray = arr.sum(axis=2)  # (h, w) exact r+g+b
                # 9 columns × 8 rows of NN-sampled gray sums
                h, w = gray.shape
                sx = (np.arange(9, dtype=np.int64) * w) // 9
                sy = (np.arange(8, dtype=np.int64) * h) // 8
                gs = gray[sy[:, None], sx[None, :]]
                bits = (gs[:, 1:] > gs[:, :-1]).ravel()  # 64 bits
                hv = np.uint64(0)
                for i, bit in enumerate(bits):
                    if bit:
                        hv |= np.uint64(1) << np.uint64(i)
                bands = [
                    int((hv >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                    for b in range(4)
                ]
                out.append((int(d), int(hv.view(np.int64)), *bands))
            yield pd.DataFrame(
                out, columns=["doc_id", "dhash", "b0", "b1", "b2", "b3"]
            )

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def banded_hamming_topk(
    hashes_p: DataFrame,
    hashes_c: DataFrame,
    hash_col: str,
    n_bands: int,
    k: int = 3,
    max_probes: int = 65536,
) -> DataFrame:
    """Shared spine of the multimodal near-dup family: for each probe
    fingerprint, the ``k`` nearest corpus fingerprints by Hamming
    distance, candidates restricted to BAND COLLISIONS — the LSH
    banding pattern (never all-pairs): a candidate must share at least
    one of the ``n_bands`` 16-bit hash bands (columns ``b0..b{n-1}``)
    with the probe, so the corpus-side work is an equi-join on
    (band, value) instead of N×M hash comparisons.

    Scale shape (100 TB posture): corpus fingerprints arrive from one
    Arrow decode pass and are banded by an in-row ``stack`` (no
    shuffle); the probe side is small by contract and BROADCAST, so
    candidate generation is map-side; the only shuffles are the
    candidate ``distinct`` (band-cardinality keys) and the
    WindowGroupLimit top-k.  Hamming is ``bit_count(xor)`` on the JVM —
    no Python in the verify step.  Returns
    (probe_id, match_id, hamming, rank), ties on lowest match_id.

    PROBE-CARDINALITY CONTRACT: "probe side small" is load-bearing —
    the banded probe table is broadcast, so probes are bounded by
    ``max_probes`` (default 65536 ≈ single-digit MB banded) and the
    operator REJECTS a larger probe side with a descriptive error
    instead of OOMing the broadcast (the same loud-reject convention
    as the ANN family's centroid/group guards).  A probe set past the
    bound is a corpus-x-corpus self-join in disguise: run the
    symmetric corpus pass (band both sides, shuffle-join on
    (band, val)) instead of raising the bound.
    """
    # Materialize the probe fingerprints ONCE, BOUNDED (the probe side
    # usually comes from a Python decode pass that cannot be
    # column-pruned): the limit caps the decode at max_probes+1 rows
    # even when a caller misuses a corpus-scale probe side — the guard
    # must fail fast, not decode 10^8 media blobs first — and on the
    # success path the checkpoint (at most max_probes rows, so the
    # limit truncated nothing) feeds both the count and the broadcast,
    # one decode pass total.  An over-bound call leaks at most
    # max_probes+1 tiny fingerprint rows of checkpoint storage until
    # GC; it is the BROADCAST the bound protects.
    hashes_p = hashes_p.limit(max_probes + 1).localCheckpoint(eager=True)
    if hashes_p.count() > max_probes:
        raise ValueError(
            f"banded_hamming_topk: probe side exceeds max_probes="
            f"{max_probes} — the banded probe table is BROADCAST, so "
            "probe cardinality must stay dimension-sized. For "
            "corpus-scale probe sets use a symmetric (band, val) "
            "shuffle join, not this broadcast spine."
        )
    stack_args = ", ".join(f"{i}, b{i}" for i in range(n_bands))
    band_expr = f"stack({n_bands}, {stack_args}) as (band, val)"
    p_bands = hashes_p.selectExpr(
        "doc_id as probe_id", f"{hash_col} as probe_hash", band_expr
    )
    c_bands = hashes_c.selectExpr(
        "doc_id as match_id", f"{hash_col} as match_hash", band_expr
    )
    cand = (
        c_bands.join(F.broadcast(p_bands), ["band", "val"])
        .filter(F.col("probe_id") != F.col("match_id"))
        .select("probe_id", "probe_hash", "match_id", "match_hash")
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.asc("hamming"), F.asc("match_id")
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr("bit_count(probe_hash ^ match_hash)").cast("int"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "match_id", "hamming", "rank")
    )


def near_dup_images_phash(
    probe_media: DataFrame, corpus_media: DataFrame, k: int = 3
) -> DataFrame:
    """Banded perceptual-hash image near-dup search:
    :func:`image_dhash` fingerprints (64 bits, four 16-bit bands)
    through the shared :func:`banded_hamming_topk` spine."""
    return banded_hamming_topk(
        image_dhash(probe_media), image_dhash(corpus_media), "dhash", 4, k
    )


def _synth_chirp(doc_id: int, n: int, level_shift: int = 0):
    """Quadratic-phase chirp samples: s(i) = (31·d + 7·i²) mod 65536 −
    32768 (+ clamped level shift).  Unlike the linear ``_synth_samples``
    ramp — whose every local statistic is monotone over a ≤577-sample
    clip, collapsing any ordering-based fingerprint to a constant — the
    i² phase wraps ~35× per clip, so window energies vary richly and
    the acoustic fingerprint genuinely discriminates.  ``level_shift``
    models the re-encode/gain near-dup class (int16-clamped add)."""
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    s = (doc_id * 31 + 7 * i * i) % 65536 - 32768 + level_shift
    return np.clip(s, -32768, 32767).astype("<i2")


def synth_audio_chirp_table(
    docs: DataFrame, id_offset: int = 0, level_shift: int = 0
) -> DataFrame:
    """(doc_id, blob): one real PCM-WAV chirp clip per document.
    ``id_offset`` separates a probe id space from the corpus so a probe
    can match its own source clip (the banding spine excludes equal
    ids); ``level_shift`` perturbs the probe copies."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (
                    int(d) + id_offset,
                    encode_wav_pcm16(
                        _synth_chirp(int(d), int(n), level_shift),
                        AUDIO_SAMPLE_RATE,
                    ),
                )
                for d, n in zip(pdf["doc_id"], pdf["n_chars"])
                if int(n) > 0
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])

    return docs.select("doc_id", "n_chars").mapInPandas(
        synth, schema="doc_id bigint, blob binary"
    )


def video_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over decoded VIDEO clips: decode the
    .y4m container → temporal SUM of the luma plane (exact int64 per
    pixel — scaling-free, so no division; robust to frame drops and
    re-encodes the way a temporal mean is) → 9×8 nearest-neighbor
    resample → 64 adjacent-ordering bits + four 16-bit bands, exactly
    the :func:`image_dhash` packing.  Pure integer ops end to end; one
    Arrow decode pass, no shuffle — banding/join/top-k live in
    :func:`near_dup_videos_phash`."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr, w, h = decode_y4m(bytes(blob))
                sum_y = arr[:, :, :, 0].astype(np.int64).sum(axis=0)
                sx = (np.arange(9, dtype=np.int64) * w) // 9
                sy = (np.arange(8, dtype=np.int64) * h) // 8
                gs = sum_y[sy[:, None], sx[None, :]]
                bits = (gs[:, 1:] > gs[:, :-1]).ravel()
                hv = np.uint64(0)
                for i, bit in enumerate(bits):
                    if bit:
                        hv |= np.uint64(1) << np.uint64(i)
                bands = [
                    int((hv >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                    for b in range(4)
                ]
                out.append((int(d), int(hv.view(np.int64)), *bands))
            yield pd.DataFrame(
                out, columns=["doc_id", "dhash", "b0", "b1", "b2", "b3"]
            )

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def near_dup_videos_phash(
    probe_media: DataFrame, corpus_media: DataFrame, k: int = 3
) -> DataFrame:
    """Banded perceptual-hash video near-dup search:
    :func:`video_dhash` fingerprints (64 bits, four 16-bit bands)
    through the shared :func:`banded_hamming_topk` spine."""
    return banded_hamming_topk(
        video_dhash(probe_media), video_dhash(corpus_media), "dhash", 4, k
    )


AUDIO_FP_SCHEMA = "doc_id bigint, afp bigint, b0 int, b1 int"


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Acoustic fingerprint over decoded WAVs: 33 anchored 16-sample
    windows at start(w) = w·(n−16) DIV 32, exact int64 energy per
    window (sum of squared int16 samples), 32 bits of energy-delta
    SIGN — bit(w) = 1 iff E(w+1) > E(w) — packed with two 16-bit
    bands.  The duration-normalized anchor grid makes the fingerprint
    length-invariant (same device as the image dHash's 9×8 resample),
    and energy-ordering bits survive small amplitude perturbations —
    the re-encode/level-shift near-dup class (the same
    energy-difference sign family as the classic Haitsma-Kalker audio
    fingerprint, reduced to one band).  Pure integer ops end to end,
    so a SQL oracle replays every bit from the sample formulas.

    Clips shorter than 16 samples carry no window and are skipped —
    filter both engines identically.  One Arrow decode pass, no
    shuffle; banding/join/top-k live in :func:`near_dup_audio_fp`.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["blob"]):
                frames, _rate = decode_audio(bytes(blob))
                s = frames[:, 0].astype(np.int64)
                n = len(s)
                if n < 16:
                    continue
                starts = (np.arange(33, dtype=np.int64) * (n - 16)) // 32
                idx = starts[:, None] + np.arange(16, dtype=np.int64)[None, :]
                e = (s[idx] ** 2).sum(axis=1)  # exact int64
                bits = e[1:] > e[:-1]
                hv = 0
                for i, bit in enumerate(bits):
                    if bit:
                        hv |= 1 << i
                out.append((int(d), hv, hv & 0xFFFF, (hv >> 16) & 0xFFFF))
            yield pd.DataFrame(out, columns=["doc_id", "afp", "b0", "b1"])

    return media.mapInPandas(run, schema=AUDIO_FP_SCHEMA)


def near_dup_audio_fp(
    probe_media: DataFrame, corpus_media: DataFrame, k: int = 3
) -> DataFrame:
    """Banded acoustic-fingerprint audio near-dup search:
    :func:`audio_fingerprint` (32 bits, two 16-bit bands) through the
    shared :func:`banded_hamming_topk` spine."""
    return banded_hamming_topk(
        audio_fingerprint(probe_media),
        audio_fingerprint(corpus_media),
        "afp",
        2,
        k,
    )


def resized_image_features(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Decode BMP blobs, nearest-neighbor resize to out_w×out_h, and
    aggregate the thumbnail's channel means — the decode → resize →
    feature stage of an image-corpus pipeline.  Integer-exact sums over
    the fixed-size thumbnail (one division by out_w·out_h)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_image(bytes(blob))
                h, w, _ = arr.shape
                small = resize_nn(arr, out_w, out_h).astype(np.int64)
                sums = small.sum(axis=(0, 1))
                n = out_w * out_h
                out.append(
                    (
                        int(d),
                        w,
                        h,
                        round(int(sums[0]) / n, 6),
                        round(int(sums[1]) / n, 6),
                        round(int(sums[2]) / n, 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "mean_r8", "mean_g8", "mean_b8"],
            )

    return media.mapInPandas(run, schema=RESIZE_FEATURE_SCHEMA)
