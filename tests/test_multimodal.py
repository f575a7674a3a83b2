"""Real media codec round-trips (WAV via stdlib wave, BMP via struct)
plus the mapInPandas feature pipelines over synthesized blobs."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_webhook_gateway_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    encode_bmp24,
    encode_wav_pcm16,
)


def test_wav_roundtrip():
    samples = np.array([-32768, -1, 0, 1, 12345, 32767], dtype=np.int16)
    blob = encode_wav_pcm16(samples, sample_rate=8000)
    frames, rate = decode_audio(blob)
    assert rate == 8000
    assert frames.shape == (6, 1)
    assert np.array_equal(frames[:, 0], samples)


def test_bmp_roundtrip_with_row_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the padding math
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    blob = encode_bmp24(img)
    assert blob[:2] == b"BM"
    out = decode_image(blob)
    assert np.array_equal(out, img)


def test_non_wav_audio_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01not-a-wav-file" * 4)


def test_non_bmp_image_raises_not_implemented_without_pil():
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; fallback untestable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_audio_features_pipeline(spark):
    from conftest import sf_dir
    from duckdb_webhook_gateway_spark.workloads.datapipe import (
        multimodal_audio_features,
    )

    rows = multimodal_audio_features(spark, sf_dir()).collect()
    assert rows and all(r.sample_rate == 8000 and r.rms > 0 for r in rows)


def test_image_features_pipeline(spark):
    from conftest import sf_dir
    from duckdb_webhook_gateway_spark.workloads.datapipe import (
        multimodal_image_features,
    )

    rows = multimodal_image_features(spark, sf_dir()).collect()
    assert rows
    for r in rows:
        assert 2 <= r.width <= 32 and 2 <= r.height <= 18
        assert 0 <= r.mean_r < 256


def test_y4m_roundtrip():
    import numpy as np

    from duckdb_webhook_gateway_spark.operators.multimodal import (
        _synth_frames,
        decode_y4m,
        encode_y4m,
    )

    fr = _synth_frames(42, 257)
    back, w, h = decode_y4m(encode_y4m(fr))
    assert np.array_equal(fr, back)
    assert (w, h) == (fr.shape[2], fr.shape[1])


def test_y4m_unsupported_chroma_raises():
    import pytest

    from duckdb_webhook_gateway_spark.operators.multimodal import decode_y4m

    blob = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\nFRAME\n" + bytes(6)
    with pytest.raises(NotImplementedError):
        decode_y4m(blob)


def test_video_features_pipeline(spark):
    from duckdb_webhook_gateway_spark.operators.multimodal import (
        synth_video_table,
        video_features,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 50), (2, "y" * 123)], ["doc_id", "text"]
    ).selectExpr("doc_id", "length(text) AS n_chars")
    rows = {r.doc_id: r for r in video_features(synth_video_table(docs)).collect()}
    assert rows[1].n_frames == 50 % 13 + 1
    assert rows[1].width == 50 % 8 + 2 and rows[1].height == 50 % 6 + 2
    assert rows[1].n_sampled == (rows[1].n_frames + 1) // 2
    assert 0.0 <= rows[2].mean_y <= 255.0


def test_resize_nn_maps_corners_and_means(spark):
    import numpy as np

    from duckdb_webhook_gateway_spark.operators.multimodal import resize_nn

    arr = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    small = resize_nn(arr, 8, 8)
    assert small.shape == (8, 8, 3)
    assert (small[0, 0] == arr[0, 0]).all()  # top-left fixed point
    # last output row/col maps to floor(7*h/8), floor(7*w/8) — never OOB
    assert (small[7, 7] == arr[(7 * 3) // 8, (7 * 5) // 8]).all()


def test_resized_image_features_pipeline(spark):
    from duckdb_webhook_gateway_spark.operators.multimodal import (
        resized_image_features,
        synth_image_table,
    )

    docs = spark.createDataFrame([(3, 77)], ["doc_id", "n_chars"])
    r = resized_image_features(synth_image_table(docs)).collect()[0]
    assert r.width == 77 % 31 + 2 and r.height == 77 % 17 + 2
    assert 0.0 <= r.mean_r8 <= 255.0


def test_image_dhash_planted_near_dups(spark):
    """Approx-quality gate for the phash family: PLANTED near-duplicate
    images (same picture, small pixel perturbations — the
    recompression/watermark class) must surface at the top with small
    Hamming distance, and INDEPENDENT random images must not be called
    near-dups.  Uses real encode->decode BMP blobs end to end."""
    from duckdb_webhook_gateway_spark.operators.multimodal import (
        image_dhash,
        near_dup_images_phash,
    )

    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    exact = base.copy()
    perturbed = base.copy()
    # +8 on a 4x4 patch: visually invisible, flips at most the few
    # orderings whose margin was < 24 gray-sum units inside the patch
    perturbed[5:9, 7:11] = np.clip(
        perturbed[5:9, 7:11].astype(np.int64) + 8, 0, 255
    ).astype(np.uint8)
    rows = [(0, bytearray(encode_bmp24(base)))]
    corpus_rows = [
        (1, bytearray(encode_bmp24(exact))),
        (2, bytearray(encode_bmp24(perturbed))),
    ] + [
        (10 + i, bytearray(encode_bmp24(
            rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        )))
        for i in range(6)
    ]
    probe = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, blob binary")

    got = {
        r.match_id: (r.hamming, r.rank)
        for r in near_dup_images_phash(probe, corpus, k=8).collect()
    }
    # exact copy: hamming 0 at rank 1; perturbed copy: small hamming next
    assert got[1] == (0, 1), got
    assert 2 in got and got[2][0] <= 6 and got[2][1] == 2, got
    # random images: either no band collision at all, or far in hamming
    for mid, (ham, _rank) in got.items():
        if mid >= 10:
            assert ham > 12, (mid, ham)

    # hash sanity: bands are exact 16-bit slices of the packed hash
    hrow = image_dhash(probe).collect()[0]
    hv = np.uint64(hrow.dhash & 0xFFFFFFFFFFFFFFFF)
    for b, col in enumerate(["b0", "b1", "b2", "b3"]):
        assert getattr(hrow, col) == int(
            (hv >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        )


def test_audio_fingerprint_planted_near_dups(spark):
    """Approx-quality gate for the acoustic-fingerprint family: a
    level-shifted and a lightly-noised re-encode of a clip must surface
    at the top with small Hamming distance; independent random clips
    must not be called near-dups.  Real encode->decode WAV end to end."""
    from duckdb_webhook_gateway_spark.operators.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
        near_dup_audio_fp,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(-20000, 20000, size=400, dtype=np.int64)
    shifted = np.clip(base + 50, -32768, 32767)
    noised = np.clip(
        base + rng.integers(-30, 31, size=400), -32768, 32767
    )
    rows = [(0, bytearray(encode_wav_pcm16(base.astype(np.int16))))]
    corpus_rows = [
        (1, bytearray(encode_wav_pcm16(shifted.astype(np.int16)))),
        (2, bytearray(encode_wav_pcm16(noised.astype(np.int16)))),
    ] + [
        (10 + i, bytearray(encode_wav_pcm16(
            rng.integers(-20000, 20000, size=400).astype(np.int16)
        )))
        for i in range(6)
    ]
    probe = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, blob binary")

    got = {
        r.match_id: (r.hamming, r.rank)
        for r in near_dup_audio_fp(probe, corpus, k=8).collect()
    }
    assert 1 in got and got[1][0] <= 3, got     # level shift: tiny hamming
    assert 2 in got and got[2][0] <= 6, got     # additive noise: small
    for mid, (ham, _rank) in got.items():
        if mid >= 10:                           # random clips: far or absent
            assert ham > 8, (mid, ham)

    # band slices are exact 16-bit pieces of the packed 32-bit print
    hrow = audio_fingerprint(probe).collect()[0]
    assert hrow.b0 == (hrow.afp & 0xFFFF)
    assert hrow.b1 == ((hrow.afp >> 16) & 0xFFFF)


def test_video_dhash_planted_near_dups(spark):
    """Approx-quality gate for the video phash: an identical clip, a
    frame-dropped re-encode and a lightly-noised re-encode must surface
    with small Hamming distance; independent random clips must not.
    Real encode->decode .y4m end to end."""
    from duckdb_webhook_gateway_spark.operators.multimodal import (
        encode_y4m,
        near_dup_videos_phash,
        video_dhash,
    )

    rng = np.random.default_rng(11)

    def smooth_clip(r):
        # Real video is SPATIALLY smooth — iid pixel noise is the one
        # content class where dropping a frame decorrelates the
        # temporal sum.  Block-coarse luma + gentle per-frame drift
        # models an actual clip: frame-drop then scales every pixel's
        # sum coherently, preserving the orderings the hash reads.
        # 4x4 blocks + a 1/column luma ramp: blocky-smooth like real
        # footage, and the ramp breaks exact ties between thumbnail
        # samples that land in the same block (a tie bit flips on ANY
        # noise — that's quantizer edge behavior, not near-dup recall).
        # Range capped so the +3/frame drift never saturates at 255.
        coarse = r.integers(0, 200, size=(6, 8))
        up = (
            np.kron(coarse, np.ones((4, 4), dtype=np.int64))
            + np.arange(32, dtype=np.int64)[None, :]
        )  # 24x32
        f = np.arange(8)[:, None, None]
        y = up[None, :, :] + 3 * f
        return np.stack([y, y, y], axis=-1).astype(np.uint8)

    base = smooth_clip(rng)
    dropped = base[:-1]                      # last frame dropped
    # ±2 noise keeps the dHash within Hamming 3 — the radius the
    # 4-band pigeonhole GUARANTEES a collision for (±4 measured
    # hamming 4, which can spread one flip into every band and
    # legitimately miss: LSH recall, not a bug)
    noised = np.clip(
        base.astype(np.int64) + rng.integers(-2, 3, size=base.shape),
        0, 255,
    ).astype(np.uint8)
    rows = [(0, bytearray(encode_y4m(base)))]
    corpus_rows = [
        (1, bytearray(encode_y4m(base.copy()))),
        (2, bytearray(encode_y4m(dropped))),
        (3, bytearray(encode_y4m(noised))),
    ] + [
        (10 + i, bytearray(encode_y4m(smooth_clip(rng))))
        for i in range(6)
    ]
    probe = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, blob binary")

    got = {
        r.match_id: (r.hamming, r.rank)
        for r in near_dup_videos_phash(probe, corpus, k=9).collect()
    }
    assert got[1] == (0, 1), got                       # identical: exact
    assert 2 in got and got[2][0] <= 6, got            # frame drop: small
    assert 3 in got and got[3][0] <= 6, got            # noise: small
    for mid, (ham, _rank) in got.items():
        if mid >= 10:
            assert ham > 12, (mid, ham)                # random: far/absent

    hrow = video_dhash(probe).collect()[0]
    hv = np.uint64(hrow.dhash & 0xFFFFFFFFFFFFFFFF)
    for b, col in enumerate(["b0", "b1", "b2", "b3"]):
        assert getattr(hrow, col) == int(
            (hv >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        )


def test_banded_hamming_topk_probe_cardinality_contract(spark):
    """The banded probe table is BROADCAST, so the operator must reject
    an over-bound probe side with a descriptive error instead of OOMing
    the broadcast (the ANN family's loud-reject convention,
    similarity.py's centroid/group guards).  Under the bound the same
    frame passes through unchanged."""
    import pytest

    from duckdb_webhook_gateway_spark.operators.multimodal import (
        banded_hamming_topk,
    )

    hashes = spark.range(0, 12).selectExpr(
        "id as doc_id",
        "id * 1103515245 as h",
        "cast(id % 7 as int) as b0",
        "cast(id % 5 as int) as b1",
    )
    with pytest.raises(ValueError, match="max_probes"):
        banded_hamming_topk(hashes, hashes, "h", 2, k=2, max_probes=8)
    # at/below the bound: runs and keeps the (probe, match, rank) shape
    out = banded_hamming_topk(hashes, hashes, "h", 2, k=2, max_probes=12)
    rows = out.collect()
    assert rows and all(r.probe_id != r.match_id for r in rows)
    assert out.columns == ["probe_id", "match_id", "hamming", "rank"]
