"""Stdlib image decode (operators/multimodal.py): PPM round-trip, BMP
parse, injectable-seam precedence, and the no-setup default."""

from __future__ import annotations

import struct

import pytest

from qa_data_pipeline_rag_llm_spark.operators.multimodal import (
    _PPM_H,
    _PPM_W,
    decode_image,
    default_decode,
    render_ppm,
)


def test_ppm_render_decode_roundtrip():
    img = decode_image(render_ppm("hello world"))
    assert (img["width"], img["height"], img["maxval"]) == (_PPM_W, _PPM_H, 255)
    px = img["pixels"]
    assert len(px) == _PPM_W * _PPM_H * 3
    cps = [ord(c) % 256 for c in "hello world"]
    assert list(px) == [cps[i % len(cps)] for i in range(len(px))]


def test_ppm_empty_text_is_black():
    img = decode_image(render_ppm(""))
    assert set(img["pixels"]) == {0}


def test_p3_ascii_ppm_decodes():
    p3 = b"P3\n# comment\n2 1\n255\n10 20 30  40 50 60\n"
    img = decode_image(p3)
    assert (img["width"], img["height"]) == (2, 1)
    assert list(img["pixels"]) == [10, 20, 30, 40, 50, 60]


def _tiny_bmp(w, h, rgb_rows):
    """Build a 24bpp bottom-up BMP from top-down RGB row tuples."""
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(rgb_rows):  # file stores bottom-up
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        body += line + b"\x00" * (stride - len(line))
    off = 54
    header = b"BM" + struct.pack(
        "<IHHI", off + len(body), 0, 0, off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + body


def test_bmp_24bpp_decodes_topdown_rgb():
    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    img = decode_image(_tiny_bmp(2, 2, rows))
    assert (img["width"], img["height"]) == (2, 2)
    assert list(img["pixels"]) == list(range(1, 13))


def test_unknown_magic_raises_with_seam_hint():
    with pytest.raises(ValueError, match="inject decoder="):
        default_decode(b"\x89PNG....")


def test_injected_decoder_wins():
    marker = object()
    assert decode_image(b"P6 anything", decoder=lambda b: marker) is marker


def test_patch_grid_degenerate_dims_emit_zero_patches(spark):
    """width/height of 0 (corrupt media) must produce NO patches —
    sequence(0, -1) yields a DESCENDING [0, -1] and the pre-r03 shape
    emitted phantom patches with negative offsets (review r03)."""
    from pyspark.sql import functions as F

    from qa_data_pipeline_rag_llm_spark.operators.multimodal import patch_grid

    blobs = spark.createDataFrame(
        [(1, 0, 240), (2, 320, 0), (3, 320, 240)],
        "doc_id long, w int, h int",
    ).select(
        "doc_id", F.struct(F.col("w").alias("width"), F.col("h").alias("height")).alias("meta")
    )
    got = patch_grid(blobs).collect()
    assert {r["doc_id"] for r in got} == {3}
    assert all(r["x_off"] >= 0 and r["y_off"] >= 0 for r in got)
    assert all(r["pw"] > 0 and r["ph"] > 0 for r in got)


# ----------------------------------------------------------------- audio


def test_wav_render_decode_roundtrip():
    """The RIFF container must round-trip exactly: every sample is
    (utf8_byte - 128) << 8, rate 8 kHz, PCM16 mono."""
    from qa_data_pipeline_rag_llm_spark.operators.multimodal import (
        decode_wav,
        render_wav,
    )

    text = "ab z!"
    dec = decode_wav(render_wav(text))
    assert dec["rate"] == 8000
    assert dec["samples"] == [(b - 128) * 256 for b in text.encode()]


def test_wav_empty_and_multibyte_text():
    """Empty text yields a valid zero-frame WAV; multibyte UTF-8 chars
    contribute one sample per BYTE (the oracle's hex replay depends on
    byte semantics, not code points); payloads cap at 2048 samples."""
    from qa_data_pipeline_rag_llm_spark.operators.multimodal import (
        _WAV_MAX_SAMPLES,
        decode_wav,
        render_wav,
    )

    assert decode_wav(render_wav(""))["n_samples"] == 0
    assert decode_wav(render_wav("é"))["n_samples"] == 2
    assert (
        decode_wav(render_wav("x" * 5000))["n_samples"] == _WAV_MAX_SAMPLES
    )


def test_audio_frames_drop_partial_tails(spark):
    """Only full 80-sample frames emit: 79 bytes -> 0 rows, 80 -> 1,
    161 -> 2; zero crossings count strict sign flips only."""
    from pyspark.sql import functions as F

    from qa_data_pipeline_rag_llm_spark.operators.multimodal import (
        attach_wav_blobs,
        audio_frame_features,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 79), (2, "a" * 80), (3, "a" * 161)],
        "doc_id long, text string",
    )
    rows = audio_frame_features(attach_wav_blobs(docs)).collect()
    per = {}
    for r in rows:
        per[r.doc_id] = per.get(r.doc_id, 0) + 1
    assert per == {2: 1, 3: 2}
    # 'a' = 97 -> sample -7936 everywhere: no sign flips, peak exact
    assert all(r.zero_crossings == 0 and r.peak == 7936 for r in rows)


def test_audio_frames_vectorized_parity(spark):
    """The r12 numpy-vectorized frame kernel must be bit-identical to the
    original per-sample Python reference (exact integer arithmetic:
    sum|s|, peak, strict sign-flip count per 80-sample frame), across
    empty / partial-frame / multibyte / capped payloads."""
    from qa_data_pipeline_rag_llm_spark.operators.multimodal import (
        _WAV_FRAME,
        attach_wav_blobs,
        audio_frame_features,
        decode_wav,
        render_wav,
    )

    texts = [
        (1, ""),
        (2, "a" * 79),
        (3, "ab z!" * 40),          # sign flips (space < 128 < letters)
        (4, "é" * 50),              # multibyte: one sample per byte
        (5, "x" * 5000),            # capped at _WAV_MAX_SAMPLES
        (6, "".join(chr(32 + (i * 7) % 90) for i in range(500))),
    ]

    # pure-Python reference: the pre-r12 per-sample loop
    expected = set()
    for doc_id, text in texts:
        s = decode_wav(render_wav(text))["samples"]
        for f_idx in range(len(s) // _WAV_FRAME):
            fr = s[f_idx * _WAV_FRAME : (f_idx + 1) * _WAV_FRAME]
            zc = sum(
                1 for a, b in zip(fr, fr[1:]) if (a < 0 < b) or (b < 0 < a)
            )
            expected.add(
                (doc_id, f_idx, len(fr), sum(abs(x) for x in fr),
                 max(abs(x) for x in fr), zc)
            )

    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r.doc_id, r.frame_idx, r.n_samples, r.sum_abs, r.peak,
         r.zero_crossings)
        for r in audio_frame_features(attach_wav_blobs(docs)).collect()
    }
    assert got == expected


def test_resize_nearest_neighbor_geometry():
    """Resize must be pure index remapping: a 2x2 image upscaled 2x
    replicates each source pixel into a 2x2 block, downscale to 1x1
    keeps the top-left pixel."""
    from qa_data_pipeline_rag_llm_spark.operators.multimodal import (
        resize_image,
    )

    # 2x2 RGB: pixels distinct per position
    px = bytes(range(12))
    img = {"width": 2, "height": 2, "maxval": 255, "pixels": px}
    up = resize_image(img, 4, 4)
    assert up["width"] == 4 and up["height"] == 4
    # row 0 of the 4x4: src pixels (0,0),(0,0),(0,1),(0,1)
    assert up["pixels"][:12] == px[0:3] + px[0:3] + px[3:6] + px[3:6]
    down = resize_image(img, 1, 1)
    assert down["pixels"] == px[0:3]
